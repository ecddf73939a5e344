"""chr14-scale run (BASELINE.json config 4): ~88 Mb draft, thousands of gaps.

Simulates a human-chr14-sized draft (8 scaffolds x 11 Mb, N_GAPS gaps,
2x101bp at 10x coverage), runs ONE full partial-fill iteration on the
device, and prints the stage table plus the host-side pre-analysis share —
the VERDICT r3 concern was per-gap host Python (plan_gaps/_neg_gap_merge/
_find_perfect_mim/_build_gap_arrays) hitting a wall at 10^3-10^5 gaps.

Usage: python scripts/chr14_scale.py [n_gaps] [genome_mb]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_GAPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
GENOME_MB = float(sys.argv[2]) if len(sys.argv) > 2 else 88.0

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import logging

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.pipeline import Pipeline
from figbird_tpu.simulate import SimConfig, simulate

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
t0 = time.time()
sim = simulate(SimConfig(
    genome_len=int(GENOME_MB * 1e6),
    n_contigs=8,
    n_gaps=N_GAPS,
    gap_len_range=(10, 120),
    read_len=101,
    insert_mean=200,
    insert_sd=20,
    coverage=10.0,
    error_rate=0.005,
    seed=14,
))
n_reads = 2 * len(sim.reads1)
print(f"# simulate {time.time()-t0:.1f}s  genome={sim.truth.total_length()} "
      f"reads={n_reads} gaps={len(sim.draft.find_gaps())}", file=sys.stderr)

cfg = FigbirdConfig(
    draft_genome="", output_folder="",
    read_pairs=[ReadLibrary("", "", avg_insert_size=200,
                            max_read_length=101)],
    parameters=Parameters(trim_len=0),
)
pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)])
t0 = time.time()
st = pipe.run_iteration("p", 0)
wall = time.time() - t0
print(f"# iteration wall={wall:.1f}s  N {st.n_before}->{st.n_after} "
      f"({1 - st.n_after / max(st.n_before, 1):.1%} filled)  "
      f"rps={n_reads / wall:.0f}", file=sys.stderr)
pipe.timer.report()

print("# rerun (warm) ------------------------------------", file=sys.stderr)
pipe2 = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)])
t0 = time.time()
st2 = pipe2.run_iteration("p", 0)
wall2 = time.time() - t0
print(f"# warm iteration wall={wall2:.1f}s  rps={n_reads / wall2:.0f}",
      file=sys.stderr)
pipe2.timer.report()
