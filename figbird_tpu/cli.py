"""CLI alias: ``python -m figbird_tpu.cli Config.json`` == ``python -m figbird_tpu``."""

from .__main__ import main

if __name__ == "__main__":
    raise SystemExit(main())
