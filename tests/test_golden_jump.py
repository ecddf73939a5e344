"""Golden parity for a TRUE long-insert jump library (VERDICT r3 item 7).

frag(insert 200) + jump(insert 3000) libraries over one truth genome: the
jump pass drives the reference's samflag=2 maxDistance>250 pre-pass
(Preprocess.cpp:2313-2445 — concordant pairs to myout, measured read_mean
relearn) and the jump checkPos geometry; our unmapped fill from the SAME
injected SAMs must be bit-identical (gap strings + filled FASTA).
"""

import numpy as np
import pytest

from figbird_tpu.golden import ReferenceHarness, reference_available
from figbird_tpu.simulate import SimConfig, simulate

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference sources/g++ unavailable")

INSERT1 = 200        # frag library (partial/model pass)
INSERT2 = 3000       # jump library (unmapped pass)
MAXD2 = int(INSERT2 * 1.15)
RL = 101


@pytest.fixture(scope="module")
def golden_jump(tmp_path_factory):
    from figbird_tpu.align import (Aligner, AlignParams, build_index,
                                   build_pair_table)
    from figbird_tpu.align.core import e2e_params
    from figbird_tpu.io.fasta import write_fasta
    from figbird_tpu.io.sam import write_sam, read_sam_pairs
    from figbird_tpu.pipeline import _learn_model
    from figbird_tpu.triage import Triage
    from figbird_tpu.fill import fill_gaps

    work = str(tmp_path_factory.mktemp("golden_jump"))
    sim = simulate(SimConfig(
        genome_len=160_000, n_contigs=2, n_gaps=6, gap_len_range=(8, 60),
        read_len=RL, insert_mean=INSERT1, insert_sd=20,
        coverage=12.0, error_rate=0.003, seed=23))
    simj = simulate(SimConfig(
        genome_len=160_000, n_contigs=2, n_gaps=6, gap_len_range=(8, 60),
        read_len=RL, insert_mean=INSERT2, insert_sd=200,
        coverage=12.0, error_rate=0.003, seed=24), truth=sim.truth)
    r1, r2 = sim.reads1, sim.reads2
    j1, j2 = simj.reads1, simj.reads2
    draft_fa = f"{work}/draft.fa"
    write_fasta(draft_fa, sim.draft.to_fasta(), width=60)
    idx = build_index(sim.draft, k=15)

    # frag local SAM (samflag=1: model + partial bundles)
    al = Aligner(idx, AlignParams())
    a1 = al.align(r1.seq, r1.length)
    a2 = al.align(r2.seq, r2.length)
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length, INSERT1)
    sam1 = f"{work}/result1.sam"
    write_sam(sam1, idx, sim.draft.names, r1, r2, a1, a2, pt=pt)

    # jump e2e SAM (samflag=2: the 3kb-insert pre-pass regime)
    al2 = Aligner(idx, e2e_params(AlignParams()))
    b1 = al2.align(j1.seq, j1.length)
    b2 = al2.align(j2.seq, j2.length)
    pt2 = build_pair_table(idx, b1, b2, j1.length, j2.length, MAXD2)
    sam2 = f"{work}/result2.sam"
    write_sam(sam2, idx, sim.draft.names, j1, j2, b1, b2, pt=pt2)

    h = ReferenceHarness(work)
    h.build()
    h.run_preprocess(draft_fa, sam1, max_distance=INSERT1, samflag=1)
    h.run_preprocess(draft_fa, sam2, max_distance=MAXD2, samflag=2)
    h.run_fillgaps(draft_fa, max_distance=MAXD2, max_read_len=RL, itr=1,
                   partial_flag=0, unmapped=1, threads=1, neg_overlap=30,
                   partial_readlen=RL, insert_mean=INSERT2)

    rr1, rr2, ra1, ra2 = read_sam_pairs(sam1, idx, sim.draft.names)
    rpt = build_pair_table(idx, ra1, ra2, rr1.length, rr2.length, INSERT1)
    er1, er2, ea1, ea2 = read_sam_pairs(sam2, idx, sim.draft.names)
    ept = build_pair_table(idx, ea1, ea2, er1.length, er2.length, MAXD2)
    # the jump pre-pass relearns the model from its own concordant pairs and
    # drives checkPos with the MEASURED insert mean (Preprocess.cpp:2427)
    model, n_model = _learn_model(idx, ept, ea1, ea2, er1, er2,
                                  sim.draft.lengths,
                                  partial_flag=False, partial_len=RL)
    assert n_model > 500, "jump lib produced too few concordant pairs"
    gaps = sim.draft.find_gaps()
    tri = Triage(gaps, max_distance=INSERT1, read_mean=INSERT1, is_jump=False)
    tri.collect_partial(rpt, rr1, rr2)
    tri2 = Triage(gaps, max_distance=MAXD2,
                  read_mean=float(model.insert_mean), is_jump=True)
    tri2.collect_unmapped(ept, er1, er2)
    for bu, bp in zip(tri2.bundles, tri.bundles):
        bp.u_seq, bp.u_pos, bp.u_rev = bu.u_seq, bu.u_pos, bu.u_rev
    res = fill_gaps(sim.draft, gaps, tri.bundles, model, partial_mode=False,
                    partial_len=RL, reference_exact=True)
    ours = sim.draft.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
    return sim, gaps, res, ours, h, model


def test_jump_read_mean_matches_reference_regime(golden_jump):
    sim, gaps, res, ours, h, model = golden_jump
    # the measured mean must sit in the 3kb jump regime (not the configured
    # value, not the frag insert)
    assert 2500 < model.insert_mean < 3500


def test_jump_gap_strings_equal(golden_jump):
    from figbird_tpu.dtypes import decode

    sim, gaps, res, ours, h, model = golden_jump
    ref_rows = h.read_gapout()
    assert len(ref_rows) == len(gaps)
    diffs = []
    for gi, ci, gs, glen, slen, seq in ref_rows:
        mine = decode(res.gap_strings[gi]) if len(res.gap_strings[gi]) else ""
        if mine != seq:
            diffs.append((gi, seq[:40], mine[:40]))
    assert not diffs, f"{len(diffs)} gap strings differ: {diffs[:3]}"


def test_jump_filled_fasta_equal(golden_jump):
    from figbird_tpu.dtypes import decode

    sim, gaps, res, ours, h, model = golden_jump
    ref_fa = h.read_filled_fasta()
    mine = {nm: decode(c) for nm, c in zip(ours.names, ours.contigs)}
    assert set(mine) == set(ref_fa)
    for nm in mine:
        assert mine[nm] == ref_fa[nm], f"contig {nm} differs"
