"""Bisect the u-mode default-vs-reference_exact divergence (BENCH r5: 44/50).

Runs the bench dataset's u iteration under intermediate configurations to
attribute which throughput cap changes the filled strings.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

logging.basicConfig(stream=sys.stderr, level=logging.WARNING)

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
n_reads = 2 * len(sim.reads1)
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
    s = pipe.result.gap_history[0][1]
    print(f"# {label}: wall={time.time()-t0:.1f}s", file=sys.stderr)
    return s


ref = run("reference_exact", reference_exact=True)
configs = [
    ("default", {}),
    ("uncapped_scan", {"max_scan_lengths": 0}),
]
for label, kw in configs:
    s = run(label, **kw)
    diffs = [i for i, (a, b) in enumerate(zip(s, ref))
             if not np.array_equal(a, b)]
    print(f"{label}: {len(s) - len(diffs)}/{len(s)} equal; diff gaps {diffs}")
