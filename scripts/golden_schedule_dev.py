"""Dev driver: multi-iteration schedule golden parity (p -> u -> p) with
negative-gap merges, chained on the filled assembly each iteration.

Each iteration injects our aligner's SAM(s) for the CURRENT genome into the
compiled reference and asserts the filled FASTA is bit-equal; iteration 2+
partial models come from the iteration-1 myout snapshot (myout_temp).
"""
import logging, os, shutil, sys
sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.WARNING)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.io.fasta import write_fasta
from figbird_tpu.io.sam import write_sam, read_sam_pairs
from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.align.core import e2e_params
from figbird_tpu.pipeline import _learn_model, Pipeline
from figbird_tpu.model.error_model import compute_gap_prob_cutoff, finalize_model
from figbird_tpu.triage import Triage
from figbird_tpu.fill import fill_gaps
from figbird_tpu.golden import ReferenceHarness
from figbird_tpu.dtypes import decode

INSERT = 300
MAXD2 = int(INSERT * 1.15)
RL = 101
SCHEDULE = ["p", "u", "p"]

work = "/tmp/golden_sched"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

sim = simulate(SimConfig(
    genome_len=60_000, n_contigs=2, n_gaps=6, gap_len_range=(40, 140),
    read_len=RL, insert_mean=INSERT, insert_sd=25,
    coverage=9.0, error_rate=0.004, seed=11,
    neg_gap_count=2))
r1, r2 = sim.reads1, sim.reads2
h = ReferenceHarness(work)
h.build()

genome = sim.draft
snapshot_model = None
all_ok = True
for it, mode in enumerate(SCHEDULE, start=1):
    cur_fa = f"{work}/genome_{it}.fa"
    write_fasta(cur_fa, genome.to_fasta(), width=60)
    idx = build_index(genome, k=15)
    gaps = genome.find_gaps()
    print(f"== itr {it} mode {mode}: N={genome.count_n()} gaps={len(gaps)}",
          flush=True)
    if not gaps:
        print("no gaps left; stopping")
        break

    al = Aligner(idx, AlignParams())
    a1, a2 = al.align_many([(r1.seq, r1.length), (r2.seq, r2.length)])
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length, INSERT)
    sam1 = f"{work}/result1_{it}.sam"
    write_sam(sam1, idx, genome.names, r1, r2, a1, a2, pt=pt)
    h.run_preprocess(cur_fa, sam1, max_distance=INSERT, samflag=1)
    if it == 1:
        shutil.copy(f"{work}/myout.sam", f"{work}/myout_temp.sam")

    rr1, rr2, ra1, ra2 = read_sam_pairs(sam1, idx, genome.names)
    rpt = build_pair_table(idx, ra1, ra2, rr1.length, rr2.length, INSERT)

    if mode == "u":
        al2 = Aligner(idx, e2e_params(AlignParams()))
        b1, b2 = al2.align_many([(r1.seq, r1.length), (r2.seq, r2.length)])
        pt2 = build_pair_table(idx, b1, b2, r1.length, r2.length, MAXD2)
        sam2 = f"{work}/result2_{it}.sam"
        write_sam(sam2, idx, genome.names, r1, r2, b1, b2, pt=pt2)
        h.run_preprocess(cur_fa, sam2, max_distance=MAXD2, samflag=2)
        myout_lines = sum(1 for _ in open(f"{work}/myout.sam"))
        use_snapshot = myout_lines < 1000
        h.run_fillgaps(cur_fa, max_distance=MAXD2, max_read_len=RL, itr=it,
                       partial_flag=0, unmapped=1, threads=1, neg_overlap=30,
                       partial_readlen=RL, insert_mean=INSERT,
                       myout=(f"{work}/myout_temp.sam" if use_snapshot
                              else None))
        er1, er2, ea1, ea2 = read_sam_pairs(sam2, idx, genome.names)
        ept = build_pair_table(idx, ea1, ea2, er1.length, er2.length, MAXD2)
        if use_snapshot:
            st, hist = snapshot_model.snapshot
            model = finalize_model(st, genome.lengths, partial_flag=False,
                                   partial_len=RL)
            model.gap_prob_cutoff = compute_gap_prob_cutoff(model, hist=hist)
        else:
            model, _ = _learn_model(idx, ept, ea1, ea2, er1, er2,
                                    genome.lengths, partial_flag=False,
                                    partial_len=RL)
        read_mean = float(model.insert_mean) if MAXD2 > 250 else INSERT
        tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT,
                     is_jump=False)
        tri.collect_partial(rpt, rr1, rr2)
        tri2 = Triage(gaps, max_distance=MAXD2, read_mean=read_mean,
                      is_jump=MAXD2 > 250)
        tri2.collect_unmapped(ept, er1, er2)
        for bu, bp in zip(tri2.bundles, tri.bundles):
            bp.u_seq, bp.u_pos, bp.u_rev = bu.u_seq, bu.u_pos, bu.u_rev
        res = fill_gaps(genome, gaps, tri.bundles, model, partial_mode=False,
                        partial_len=RL, reference_exact=True)
    else:
        if it == 1:
            model, _ = _learn_model(idx, rpt, ra1, ra2, rr1, rr2,
                                    genome.lengths, partial_flag=True,
                                    partial_len=RL)
            snapshot_model = model
        else:
            st, hist = snapshot_model.snapshot
            model = finalize_model(st, genome.lengths, partial_flag=True,
                                   partial_len=RL)
            model.gap_prob_cutoff = compute_gap_prob_cutoff(model, hist=hist)
        h.run_fillgaps(cur_fa, max_distance=INSERT, max_read_len=RL, itr=it,
                       partial_flag=1, unmapped=0, threads=1, neg_overlap=30,
                       partial_readlen=RL, insert_mean=INSERT,
                       myout=(f"{work}/myout_temp.sam" if it > 1 else None))
        tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT,
                     is_jump=False)
        tri.collect_partial(rpt, rr1, rr2)
        res = fill_gaps(genome, gaps, tri.bundles, model, partial_mode=True,
                        partial_len=RL, reference_exact=True)

    ours = genome.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
    ref_fa = h.read_filled_fasta()
    neg = int(res.stats.get("neg_merged", 0))
    mine = {nm: decode(c) for nm, c in zip(ours.names, ours.contigs)}
    eq = all(mine[nm] == ref_fa.get(nm, "") for nm in mine)
    print(f"   itr {it}: neg_merged={neg} filled fasta equal: {eq} "
          f"(ref N={sum(s.count('N') for s in ref_fa.values())}, "
          f"ours N={ours.count_n()})", flush=True)
    if not eq:
        all_ok = False
        for nm in mine:
            a, b = mine[nm], ref_fa.get(nm, "")
            if a != b:
                i = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                         min(len(a), len(b)))
                print(f"   contig {nm}: len {len(a)} vs {len(b)}, "
                      f"first diff @{i}: ours {a[i:i+40]} ref {b[i:i+40]}")
        break
    genome = ours

print("SCHEDULE PARITY:", "OK" if all_ok else "FAIL")
