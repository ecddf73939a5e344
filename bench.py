#!/usr/bin/env python
"""Benchmark: reads aligned+assigned per second per chip.

Runs one full partial-fill iteration (align -> pair -> model -> triage ->
batched EM fill -> splice) on an E. coli-scale simulated dataset
(BASELINE.json config 1: ~4.6 Mb draft, ~50 gaps, 2x100bp, insert ~200) and
reports throughput of the end-to-end iteration.

Baseline: measured by scripts/measure_baseline.py, which compiles the
reference's Preprocess/FillGaps/Figbird sources (g++ -O2), runs them on an
injected SAM over the SAME simulated dataset, and combines their measured
times with a generous bowtie2 estimate (its archive is a missing blob) and a
granted perfect 8-way fill scaling.  The result lives in
BASELINE_MEASURED.json (``baseline_reads_per_sec``); a documented estimate is
the fallback when that file is absent.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import logging
import os
import sys
import time

import numpy as np

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

_FALLBACK_BASELINE_RPS = 50_000.0  # documented estimate, see header


def _baseline_rps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as fh:
            return float(json.load(fh)["baseline_reads_per_sec"])
    except (OSError, KeyError, ValueError):
        return _FALLBACK_BASELINE_RPS


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    # Persistent compile cache (the reference's analogue: its g++ binaries
    # persist between runs).  Must be set via jax.config — the axon
    # sitecustomize imports jax before this script's env assignments.
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
    from figbird_tpu.pipeline import Pipeline
    from figbird_tpu.simulate import SimConfig, simulate

    import jax

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    sim = simulate(SimConfig(
        genome_len=int(4_600_000 * scale),
        n_contigs=4,
        n_gaps=max(int(50 * scale), 8),
        gap_len_range=(10, 120),
        read_len=101,
        insert_mean=200,
        insert_sd=20,
        coverage=10.0,
        error_rate=0.005,
        seed=1,
    ))
    n_reads = 2 * len(sim.reads1)
    print(f"# genome={sim.truth.total_length()} reads={n_reads} "
          f"gaps={len(sim.draft.find_gaps())}", file=sys.stderr)

    cfg = FigbirdConfig(
        draft_genome="", output_folder="",
        read_pairs=[ReadLibrary("", "", avg_insert_size=200,
                                max_read_length=101)],
        parameters=Parameters(trim_len=0),
    )
    # pass 1: warms every jit cache (compile included); pass 2 on a fresh
    # pipeline over the SAME inputs is the steady-state production iteration
    t0 = time.time()
    warm = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)])
    st = warm.run_iteration("p", 0)
    print(f"# warm-up iteration (incl. compile) {time.time()-t0:.1f}s",
          file=sys.stderr)

    pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)])
    t0 = time.time()
    st = pipe.run_iteration("p", 0)
    wall = time.time() - t0

    filled_frac = 1 - st.n_after / max(st.n_before, 1)
    reads_per_sec = n_reads / wall
    align_rps = pipe._aligned_reads / max(pipe._align_seconds, 1e-9)
    print(f"# iteration wall={wall:.1f}s  align-only={align_rps:.0f} r/s  "
          f"N {st.n_before}->{st.n_after} ({filled_frac:.1%} filled)",
          file=sys.stderr)
    pipe.timer.report()

    print(json.dumps({
        "metric": "reads_aligned_assigned_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / _baseline_rps(), 3),
    }))


if __name__ == "__main__":
    main()
