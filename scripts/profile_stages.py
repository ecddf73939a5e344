"""Stage-level profiling on the real chip: align / model / triage / fill.

Times each device stage twice (compile vs steady-state) at E. coli scale.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.pipeline import Pipeline, _learn_model
from figbird_tpu.triage import Triage
from figbird_tpu.fill import fill_gaps

scale = float(os.environ.get("BENCH_SCALE", "1.0"))
print(f"# device: {jax.devices()[0]}", file=sys.stderr)

t0 = time.time()
sim = simulate(SimConfig(
    genome_len=int(4_600_000 * scale), n_contigs=4,
    n_gaps=max(int(50 * scale), 8), gap_len_range=(10, 120),
    read_len=100, insert_mean=200, insert_sd=20,
    coverage=10.0, error_rate=0.005, seed=1))
r1, r2 = sim.reads1, sim.reads2
n_reads = 2 * len(r1)
print(f"# sim {time.time()-t0:.1f}s  genome={sim.truth.total_length()} reads={n_reads}")

t0 = time.time()
idx = build_index(sim.draft, k=15)
print(f"# index build {time.time()-t0:.1f}s ({len(idx.sorted_codes)} kmers)")

al = Aligner(idx, AlignParams())
# warm-up compile on one batch
t0 = time.time()
_ = al.align(r1.seq[:al.batch_size], r1.length[:al.batch_size])
print(f"# align compile+first batch {time.time()-t0:.1f}s")

t0 = time.time()
a1 = al.align(r1.seq, r1.length)
a2 = al.align(r2.seq, r2.length)
dt = time.time() - t0
print(f"# align steady {dt:.1f}s = {n_reads/dt:.0f} reads/s")

t0 = time.time()
pt = build_pair_table(idx, a1, a2, r1.length, r2.length, 200)
print(f"# pair table {time.time()-t0:.1f}s")

t0 = time.time()
model, n_model = _learn_model(idx, pt, a1, a2, r1, r2, sim.draft.lengths,
                              partial_flag=True, partial_len=100)
print(f"# model learn {time.time()-t0:.1f}s ({n_model} pairs)")

gaps = sim.draft.find_gaps()
t0 = time.time()
tri = Triage(gaps, max_distance=200, read_mean=200, is_jump=False)
tri.collect_partial(pt, r1, r2)
print(f"# triage {time.time()-t0:.1f}s "
      f"(partial reads: {sum(b.n_partial for b in tri.bundles)})")

for rep in range(2):
    t0 = time.time()
    res = fill_gaps(sim.draft, gaps, tri.bundles, model,
                    partial_mode=True, partial_len=100,
                    max_scan_lengths=48)
    print(f"# fill[{rep}] {time.time()-t0:.1f}s "
          f"(filled {res.stats['filled']}, scans {res.stats['scan_instances']})")

new_genome = sim.draft.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
print(f"# N {sim.draft.count_n()} -> {new_genome.count_n()}")
