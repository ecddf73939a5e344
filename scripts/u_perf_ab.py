"""A/B the u-pass wall: unroll on/off, capped vs uncapped scan, with fill
timers at INFO."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)
logging.getLogger("figbird_tpu.fill").setLevel(logging.WARNING)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.pipeline import Pipeline
from figbird_tpu.simulate import SimConfig, simulate

sim = simulate(SimConfig(
    genome_len=4_600_000, n_contigs=4, n_gaps=50, gap_len_range=(10, 120),
    read_len=101, insert_mean=200, insert_sd=20, coverage=10.0,
    error_rate=0.005, seed=1))
cfg = FigbirdConfig(
    draft_genome="", output_folder="",
    read_pairs=[ReadLibrary("", "", avg_insert_size=200,
                            max_read_length=101)],
    parameters=Parameters(trim_len=0),
)


def run(label, **fill_kwargs):
    t0 = time.time()
    pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                    fill_kwargs=fill_kwargs)
    pipe.run_iteration("u", 0)
    w = time.time() - t0
    st = {k: v for k, v in pipe.last_fill_stats.items()
          if k.startswith(("t_", "esc_", "scan_inst"))}
    print(f"# {label}: wall={w:.1f}s {st}", flush=True)
    return w


import json

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "capped"):
    run("capped96 cold", max_scan_lengths=96)
    run("capped96 warm", max_scan_lengths=96)
if which in ("all", "uncapped"):
    run("uncapped cold")
    run("uncapped warm")
