"""Reference-parity golden test (VERDICT round-1 task 3).

Compiles the reference's post-alignment stages (Preprocess.cpp, FillGaps.cpp
with its per-thread Figbird.cpp recompile — RunFigbird.sh:285,352) and runs
them on an injected SAM produced by our aligner; our post-alignment stages
run from the SAME SAM.  The reference is deterministic given a SAM (SURVEY
§4), so the filled FASTA must match bit-for-bit.
"""

import numpy as np
import pytest

from figbird_tpu.golden import ReferenceHarness, reference_available
from figbird_tpu.simulate import SimConfig, simulate

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference sources/g++ unavailable")

INSERT = 300


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    from figbird_tpu.align import (Aligner, AlignParams, build_index,
                                   build_pair_table)
    from figbird_tpu.io.fasta import write_fasta
    from figbird_tpu.io.sam import write_sam, read_sam_pairs
    from figbird_tpu.pipeline import _learn_model
    from figbird_tpu.triage import Triage
    from figbird_tpu.fill import fill_gaps

    work = str(tmp_path_factory.mktemp("golden"))
    sim = simulate(SimConfig(
        genome_len=60_000, n_contigs=2, n_gaps=6, gap_len_range=(8, 60),
        read_len=101, insert_mean=INSERT, insert_sd=25,
        coverage=15.0, error_rate=0.003, seed=7))
    r1, r2 = sim.reads1, sim.reads2
    draft_fa = f"{work}/draft.fa"
    write_fasta(draft_fa, sim.draft.to_fasta(), width=60)

    idx = build_index(sim.draft, k=15)
    al = Aligner(idx, AlignParams())
    a1 = al.align(r1.seq, r1.length)
    a2 = al.align(r2.seq, r2.length)
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length, INSERT)
    sam_path = f"{work}/injected.sam"
    write_sam(sam_path, idx, sim.draft.names, r1, r2, a1, a2, pt=pt)

    h = ReferenceHarness(work)
    h.build()
    h.run_preprocess(draft_fa, sam_path, max_distance=INSERT, samflag=1)
    h.run_fillgaps(draft_fa, max_distance=INSERT, max_read_len=101, itr=1,
                   partial_flag=1, unmapped=0, threads=1, neg_overlap=30,
                   partial_readlen=101, insert_mean=INSERT)

    rr1, rr2, ra1, ra2 = read_sam_pairs(sam_path, idx, sim.draft.names)
    rpt = build_pair_table(idx, ra1, ra2, rr1.length, rr2.length, INSERT)
    model, n_model = _learn_model(idx, rpt, ra1, ra2, rr1, rr2,
                                  sim.draft.lengths, partial_flag=True,
                                  partial_len=101)
    gaps = sim.draft.find_gaps()
    tri = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False)
    tri.collect_partial(rpt, rr1, rr2)
    res = fill_gaps(sim.draft, gaps, tri.bundles, model, partial_mode=True,
                    partial_len=101, reference_exact=True)
    ours = sim.draft.splice_gaps(gaps, res.gap_strings, list(res.gaptofill))
    return sim, gaps, res, ours, h


def test_gapinfo_equal(golden):
    sim, gaps, res, ours, h = golden
    assert [(g.contig, g.start, g.length) for g in gaps] == h.read_gap_info()


def test_gapout_strings_equal(golden):
    from figbird_tpu.dtypes import decode

    sim, gaps, res, ours, h = golden
    ref_rows = h.read_gapout()
    assert len(ref_rows) == len(gaps)
    diffs = []
    for gi, ci, gs, glen, slen, seq in ref_rows:
        mine = decode(res.gap_strings[gi]) if len(res.gap_strings[gi]) else ""
        if mine != seq:
            diffs.append((gi, seq, mine))
    assert not diffs, f"{len(diffs)} gap strings differ: {diffs[:3]}"


def test_filled_fasta_equal(golden):
    from figbird_tpu.dtypes import decode

    sim, gaps, res, ours, h = golden
    ref_fa = h.read_filled_fasta()
    mine = {nm: decode(c) for nm, c in zip(ours.names, ours.contigs)}
    assert set(mine) == set(ref_fa)
    for nm in mine:
        assert mine[nm] == ref_fa[nm], f"contig {nm} differs"
