"""Dev driver: unmapped-pass golden parity (jump-style, no genome reduction).

Injects our aligner's local SAM (samflag=1 pass: model + partial bundles)
and e2e SAM (samflag=2 pass: unmapped bundles) into the compiled reference,
runs FillGaps partial_flag=0 unmapped=1, and diffs gap strings + filled
FASTA against our unmapped fill from the same SAMs.
"""
import logging, os, sys, shutil
logging.basicConfig(level=logging.INFO, format="# %(message)s")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
# FIGBIRD_GOLDEN_TPU=1 keeps the real device (parity through the TPU
# Pallas kernels); default pins CPU
if os.environ.get("FIGBIRD_GOLDEN_TPU", "") in ("", "0", "false"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.io.fasta import write_fasta
from figbird_tpu.io.sam import write_sam, read_sam_pairs
from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.align.core import e2e_params
from figbird_tpu.pipeline import _learn_model
from figbird_tpu.triage import Triage
from figbird_tpu.fill import fill_gaps
from figbird_tpu.golden import ReferenceHarness
from figbird_tpu.dtypes import decode

INSERT = 600
MAXD2 = int(INSERT * 1.15)
RL = 101

work = "/tmp/golden_unm"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

sim = simulate(SimConfig(
    genome_len=60_000, n_contigs=2, n_gaps=6, gap_len_range=(8, 60),
    read_len=RL, insert_mean=INSERT, insert_sd=40,
    coverage=15.0, error_rate=0.003, seed=7))
r1, r2 = sim.reads1, sim.reads2
draft_fa = f"{work}/draft.fa"
write_fasta(draft_fa, sim.draft.to_fasta(), width=60)

idx = build_index(sim.draft, k=15)

# pass 1: local alignment (model + partial)
al = Aligner(idx, AlignParams())
a1 = al.align(r1.seq, r1.length)
a2 = al.align(r2.seq, r2.length)
pt = build_pair_table(idx, a1, a2, r1.length, r2.length, INSERT)
sam1 = f"{work}/result1.sam"
write_sam(sam1, idx, sim.draft.names, r1, r2, a1, a2, pt=pt)

# pass 2: end-to-end alignment (unmapped candidates)
al2 = Aligner(idx, e2e_params(AlignParams()))
b1 = al2.align(r1.seq, r1.length)
b2 = al2.align(r2.seq, r2.length)
pt2 = build_pair_table(idx, b1, b2, r1.length, r2.length, MAXD2)
sam2 = f"{work}/result2.sam"
write_sam(sam2, idx, sim.draft.names, r1, r2, b1, b2, pt=pt2)

# ---- reference side -------------------------------------------------------
h = ReferenceHarness(work)
h.build()
h.run_preprocess(draft_fa, sam1, max_distance=INSERT, samflag=1)
myout_partial = (h.work / "myout.sam").read_text()
h.run_preprocess(draft_fa, sam2, max_distance=MAXD2, samflag=2)
print("# ref myout lines after samflag2:",
      len((h.work / "myout.sam").read_text().splitlines()))
h.run_fillgaps(draft_fa, max_distance=MAXD2, max_read_len=RL, itr=1,
               partial_flag=0, unmapped=1, threads=1, neg_overlap=30,
               partial_readlen=RL, insert_mean=INSERT)
print("# ref fill done; Ncount:", h.read_ncount())

# ---- our side (from the same injected SAMs) -------------------------------
rr1, rr2, ra1, ra2 = read_sam_pairs(sam1, idx, sim.draft.names)
rpt = build_pair_table(idx, ra1, ra2, rr1.length, rr2.length, INSERT)
# model: reference FillGaps reads the samflag=2 myout (jump pre-pass rewrote it)
er1, er2, ea1, ea2 = read_sam_pairs(sam2, idx, sim.draft.names)
ept = build_pair_table(idx, ea1, ea2, er1.length, er2.length, MAXD2)
model, n_model = _learn_model(idx, ept, ea1, ea2, er1, er2,
                              sim.draft.lengths, partial_flag=False,
                              partial_len=RL)
print("# our model pairs:", n_model, "mean:", model.insert_mean,
      "cutoff:", model.gap_prob_cutoff,
      "thr:", model.insert_threshold_min, model.insert_threshold_max)
gaps = sim.draft.find_gaps()
tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False)
tri.collect_partial(rpt, rr1, rr2)
tri2 = Triage(gaps, max_distance=MAXD2, read_mean=float(model.insert_mean),
              is_jump=True)
tri2.collect_unmapped(ept, er1, er2)
for bu, bp in zip(tri2.bundles, tri.bundles):
    bp.u_seq, bp.u_pos, bp.u_rev = bu.u_seq, bu.u_pos, bu.u_rev
print("# bundle sizes (p,u):",
      [(b.n_partial, b.n_unmapped) for b in tri.bundles])
res = fill_gaps(sim.draft, gaps, tri.bundles, model, partial_mode=False,
                partial_len=RL, reference_exact=True)
ours = sim.draft.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))

# ---- compare --------------------------------------------------------------
ref_rows = h.read_gapout()
ndiff = 0
for gi, ci, gs, glen, slen, seq in ref_rows:
    mine = decode(res.gap_strings[gi]) if len(res.gap_strings[gi]) else ""
    mark = "==" if mine == seq else "!!"
    if mine != seq:
        ndiff += 1
        print(f"{mark} gap{gi} len{glen} ref({len(seq)}):{seq[:70]}")
        print(f"   {'':>12} our({len(mine)}):{mine[:70]}")
print(f"# gap strings: {len(ref_rows)-ndiff}/{len(ref_rows)} equal")
ref_fa = h.read_filled_fasta()
ok = all(decode(c) == ref_fa[nm] for nm, c in zip(ours.names, ours.contigs))
print("# filled fasta equal:", ok)
