"""Golden-harness smoke: run the reference post-alignment stages and ours on
the SAME injected SAM; print timings + artifact diffs.

Usage: python scripts/golden_smoke.py [scale]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
# env-var pinning alone still initialises the axon TPU plugin (and hangs when
# the tunnel is busy); the config pin is authoritative.
# FIGBIRD_GOLDEN_TPU=1 keeps the real device: golden parity THROUGH the
# TPU-only Pallas kernels (band scores, fused cascade fold).
if os.environ.get("FIGBIRD_GOLDEN_TPU", "") in ("", "0", "false"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.io.fasta import write_fasta
from figbird_tpu.io.sam import write_sam, read_sam_pairs
from figbird_tpu.golden import ReferenceHarness, reference_available
from figbird_tpu.pipeline import _learn_model
from figbird_tpu.triage import Triage
from figbird_tpu.fill import fill_gaps
from figbird_tpu.dtypes import decode

assert reference_available(), "reference sources not found"

if len(sys.argv) > 1 and sys.argv[1] == "--bench":
    # EXACTLY the bench.py dataset (BASELINE.json config 1, E. coli scale):
    # full-scale golden parity vs the compiled reference
    INSERT = 200
    sim = simulate(SimConfig(
        genome_len=4_600_000, n_contigs=4, n_gaps=50,
        gap_len_range=(10, 120), read_len=101, insert_mean=INSERT,
        insert_sd=20, coverage=10.0, error_rate=0.005, seed=1))
else:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    INSERT = 300
    sim = simulate(SimConfig(
        genome_len=int(120_000 * scale), n_contigs=2,
        n_gaps=max(int(10 * scale), 4), gap_len_range=(8, 60),
        read_len=101, insert_mean=INSERT, insert_sd=25,
        coverage=15.0, error_rate=0.003, seed=7))
r1, r2 = sim.reads1, sim.reads2
print(f"# sim: genome={sim.truth.total_length()} pairs={len(r1)} "
      f"gaps={len(sim.draft.find_gaps())}")

work = "/tmp/golden_work"
os.makedirs(work, exist_ok=True)
draft_fa = f"{work}/draft.fa"
# reference uses 1-indexed contig numbers as names? no - contig names looked up
# via hash table; use simple names
write_fasta(draft_fa, sim.draft.to_fasta(), width=60)

t0 = time.time()
idx = build_index(sim.draft, k=15)
al = Aligner(idx, AlignParams())
a1 = al.align(r1.seq, r1.length)
a2 = al.align(r2.seq, r2.length)
pt = build_pair_table(idx, a1, a2, r1.length, r2.length, INSERT)
print(f"# our align {time.time()-t0:.1f}s  "
      f"(aligned {a1['aligned'].sum()}+{a2['aligned'].sum()}, "
      f"concordant {pt.concordant.sum()})")

sam_path = f"{work}/injected.sam"
nrec = write_sam(sam_path, idx, sim.draft.names, r1, r2, a1, a2, pt=pt)
print(f"# wrote {nrec} SAM records")

# ---- reference side ------------------------------------------------------
h = ReferenceHarness(work)
t0 = time.time()
h.build()
print(f"# ref compile {h.timings['compile']:.1f}s")
dt_pre = h.run_preprocess(draft_fa, sam_path, max_distance=INSERT, samflag=1)
print(f"# ref preprocess {dt_pre:.1f}s")
dt_fill = h.run_fillgaps(draft_fa, max_distance=INSERT, max_read_len=101,
                         itr=1, partial_flag=1, unmapped=0, threads=1,
                         neg_overlap=30, partial_readlen=101,
                         insert_mean=INSERT)
print(f"# ref fillgaps {dt_fill:.1f}s (incl. Figbird g++)")
ref_gapinfo = h.read_gap_info()
ref_gapout = h.read_gapout()
ref_fa = h.read_filled_fasta()

# ---- our side from the SAME SAM -----------------------------------------
t0 = time.time()
rr1, rr2, ra1, ra2 = read_sam_pairs(sam_path, idx, sim.draft.names)
rpt = build_pair_table(idx, ra1, ra2, rr1.length, rr2.length, INSERT)
model, n_model = _learn_model(idx, rpt, ra1, ra2, rr1, rr2, sim.draft.lengths,
                              partial_flag=True, partial_len=101)
gaps = sim.draft.find_gaps()
tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False)
tri.collect_partial(rpt, rr1, rr2)
res = fill_gaps(sim.draft, gaps, tri.bundles, model, partial_mode=True,
                partial_len=101, reference_exact=True)
ours = sim.draft.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
print(f"# ours from SAM {time.time()-t0:.1f}s (model pairs {n_model})")

# ---- diff ----------------------------------------------------------------
my_gapinfo = [(g.contig, g.start, g.length) for g in gaps]
print(f"# gapInfo equal: {my_gapinfo == ref_gapinfo} "
      f"({len(my_gapinfo)} vs {len(ref_gapinfo)})")

n_match = n_diff = 0
for row in ref_gapout:
    gi, ci, gs, glen, slen, seq = row
    mine = decode(res.gap_strings[gi]) if len(res.gap_strings[gi]) else ""
    flag = "==" if mine == seq else "!="
    if mine == seq:
        n_match += 1
    else:
        n_diff += 1
        if n_diff <= 12:
            print(f"  gap {gi} (orig {glen}): ref[{len(seq)}] {seq[:70]}")
            print(f"            ours[{len(mine)}] {mine[:70]}")
truth_strs = []
for gi, g in enumerate(gaps):
    t = decode(sim.truth.contigs[g.contig][g.start : g.start + g.length])
    truth_strs.append(t)
ref_correct = sum(1 for row in ref_gapout
                  if row[5] == truth_strs[row[0]])
our_correct = sum(1 for gi in range(len(gaps))
                  if decode(res.gap_strings[gi]) == truth_strs[gi]
                  if len(res.gap_strings[gi]))
print(f"# gapout: {n_match} identical, {n_diff} differ | "
      f"exact-truth: ref {ref_correct}/{len(gaps)} ours {our_correct}/{len(gaps)}")

my_fa = {nm: decode(c) for nm, c in zip(ours.names, ours.contigs)}
same = sum(1 for k in ref_fa if my_fa.get(k) == ref_fa[k])
print(f"# filled FASTA contigs identical: {same}/{len(ref_fa)}")
print(f"# ref N-count {h.read_ncount()}")
