"""Golden parity for a multi-iteration p -> u -> p schedule (VERDICT r2
item 3): injected SAMs drive the compiled reference and our stages on the
SAME genome each iteration; the filled FASTA must be bit-equal at EVERY
step, chaining on the (equal) filled assembly.  The fixture includes
negative-gap overlap merges (find_contig_match -> gaptofill skip counts)
and exercises the iteration-1 myout snapshot semantics (myout_temp)."""

import shutil

import numpy as np
import pytest

from figbird_tpu.golden import ReferenceHarness, reference_available
from figbird_tpu.simulate import SimConfig, simulate

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference sources/g++ unavailable")

INSERT = 300
MAXD2 = int(INSERT * 1.15)
RL = 101
SCHEDULE = ["p", "u", "p"]


def test_schedule_bit_identical(tmp_path):
    from figbird_tpu.align import (Aligner, AlignParams, build_index,
                                   build_pair_table)
    from figbird_tpu.align.core import e2e_params
    from figbird_tpu.dtypes import decode
    from figbird_tpu.fill import fill_gaps
    from figbird_tpu.io.fasta import write_fasta
    from figbird_tpu.io.sam import read_sam_pairs, write_sam
    from figbird_tpu.model.error_model import (compute_gap_prob_cutoff,
                                               finalize_model)
    from figbird_tpu.pipeline import _learn_model
    from figbird_tpu.triage import Triage

    work = str(tmp_path)
    sim = simulate(SimConfig(
        genome_len=60_000, n_contigs=2, n_gaps=6, gap_len_range=(40, 140),
        read_len=RL, insert_mean=INSERT, insert_sd=25,
        coverage=9.0, error_rate=0.004, seed=11, neg_gap_count=2))
    r1, r2 = sim.reads1, sim.reads2
    h = ReferenceHarness(work)
    h.build()

    genome = sim.draft
    snapshot = None
    neg_merges = 0
    iterations_checked = 0
    for it, mode in enumerate(SCHEDULE, start=1):
        cur_fa = f"{work}/genome_{it}.fa"
        write_fasta(cur_fa, genome.to_fasta(), width=60)
        idx = build_index(genome, k=15)
        gaps = genome.find_gaps()
        if not gaps:
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

        def from_snapshot(partial_flag):
            st, hist = snapshot.snapshot
            m = finalize_model(st, genome.lengths, partial_flag=partial_flag,
                               partial_len=RL)
            m.gap_prob_cutoff = compute_gap_prob_cutoff(m, hist=hist)
            return m

        if mode == "u":
            al2 = Aligner(idx, e2e_params(AlignParams()))
            b1, b2 = al2.align_many([(r1.seq, r1.length),
                                     (r2.seq, r2.length)])
            pt2 = build_pair_table(idx, b1, b2, r1.length, r2.length, MAXD2)
            sam2 = f"{work}/result2_{it}.sam"
            write_sam(sam2, idx, genome.names, r1, r2, b1, b2, pt=pt2)
            h.run_preprocess(cur_fa, sam2, max_distance=MAXD2, samflag=2)
            use_snap = sum(1 for _ in open(f"{work}/myout.sam")) < 1000
            h.run_fillgaps(cur_fa, max_distance=MAXD2, max_read_len=RL,
                           itr=it, partial_flag=0, unmapped=1, threads=1,
                           neg_overlap=30, partial_readlen=RL,
                           insert_mean=INSERT,
                           myout=(f"{work}/myout_temp.sam" if use_snap
                                  else None))
            er1, er2, ea1, ea2 = read_sam_pairs(sam2, idx, genome.names)
            ept = build_pair_table(idx, ea1, ea2, er1.length, er2.length,
                                   MAXD2)
            model = from_snapshot(False) if use_snap else _learn_model(
                idx, ept, ea1, ea2, er1, er2, genome.lengths,
                partial_flag=False, partial_len=RL)[0]
            tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT,
                         is_jump=False)
            tri.collect_partial(rpt, rr1, rr2)
            tri2 = Triage(gaps, max_distance=MAXD2,
                          read_mean=float(model.insert_mean),
                          is_jump=MAXD2 > 250)
            tri2.collect_unmapped(ept, er1, er2)
            for bu, bp in zip(tri2.bundles, tri.bundles):
                bp.u_seq, bp.u_pos, bp.u_rev = bu.u_seq, bu.u_pos, bu.u_rev
            res = fill_gaps(genome, gaps, tri.bundles, model,
                            partial_mode=False, partial_len=RL,
                            reference_exact=True)
        else:
            if it == 1:
                model, _ = _learn_model(idx, rpt, ra1, ra2, rr1, rr2,
                                        genome.lengths, partial_flag=True,
                                        partial_len=RL)
                snapshot = model
            else:
                model = from_snapshot(True)
            h.run_fillgaps(cur_fa, max_distance=INSERT, max_read_len=RL,
                           itr=it, partial_flag=1, unmapped=0, threads=1,
                           neg_overlap=30, partial_readlen=RL,
                           insert_mean=INSERT,
                           myout=(f"{work}/myout_temp.sam" if it > 1
                                  else None))
            tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT,
                         is_jump=False)
            tri.collect_partial(rpt, rr1, rr2)
            res = fill_gaps(genome, gaps, tri.bundles, model,
                            partial_mode=True, partial_len=RL,
                            reference_exact=True)

        ours = genome.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
        ref_fa = h.read_filled_fasta()
        for nm, c in zip(ours.names, ours.contigs):
            assert decode(c) == ref_fa[nm], f"itr {it} contig {nm} differs"
        neg_merges += int(res.stats.get("neg_merged", 0))
        iterations_checked += 1
        genome = ours

    assert iterations_checked >= 3, "schedule ended too early to be a test"
    assert neg_merges >= 1, "fixture lost its negative-gap coverage"
    assert genome.count_n() == 0  # the schedule converged
