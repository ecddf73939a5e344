"""Triage tests: reads land in the right gaps with correct encodings."""

import numpy as np
import pytest

from figbird_tpu.align import Aligner, build_index, build_pair_table
from figbird_tpu.align.core import _revcomp_batch
from figbird_tpu.dtypes import decode, revcomp
from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.triage import Triage

INSERT = 250


@pytest.fixture(scope="module")
def setup():
    # mix of small and large gaps: truly-unmapped mates only arise when a read
    # sits mostly inside a gap (>~70bp interior for 100bp reads)
    sim = simulate(SimConfig(genome_len=150_000, n_contigs=1, n_gaps=6,
                             insert_mean=INSERT, insert_sd=20, coverage=12,
                             gap_len_range=(30, 140), seed=21, error_rate=0.003))
    idx = build_index(sim.draft, k=15)  # align against the DRAFT (with N gaps)
    al = Aligner(idx, batch_size=4096)
    a1 = al.align(sim.reads1.seq, sim.reads1.length)
    a2 = al.align(sim.reads2.seq, sim.reads2.length)
    pt = build_pair_table(idx, a1, a2, sim.reads1.length, sim.reads2.length,
                          max_insert=int(INSERT * 1.15))
    import jax.numpy as jnp

    def oriented(batch, a):
        rc = np.asarray(_revcomp_batch(jnp.asarray(batch.seq), jnp.asarray(batch.length)))
        return np.where(a["strand"][:, None] == 1, rc, batch.seq)

    o1, o2 = oriented(sim.reads1, a1), oriented(sim.reads2, a2)
    gaps = sim.draft.find_gaps()
    return sim, idx, pt, gaps, o1, o2


def test_unmapped_assignment(setup):
    sim, idx, pt, gaps, o1, o2 = setup
    tr = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False)
    tr.collect_unmapped(pt, sim.reads1, sim.reads2)
    # large gaps (reads mostly inside fail to align) should attract mates
    big = [b for b in tr.bundles if b.gap.length >= 100]
    if not big:
        pytest.skip("no large gaps in sim")
    assert any(b.n_unmapped > 2 for b in big)
    # the stored mate, genome-oriented, should match the TRUTH inside the gap
    b = next(b for b in big if b.n_unmapped > 2)
    g = b.gap
    truth = sim.truth.contigs[g.contig]
    hits = 0
    for seq, pos, rev in zip(b.u_seq, b.u_pos, b.u_rev):
        # best ungapped placement of seq near the gap in the truth
        lo = max(g.start - len(seq), 0)
        hi = min(g.start + g.length + len(seq), len(truth) - len(seq))
        best = max(
            (np.mean(truth[s : s + len(seq)] == seq), s) for s in range(lo, hi)
        )
        if best[0] > 0.9:
            hits += 1
    assert hits / b.n_unmapped > 0.6


def test_partial_assignment(setup):
    sim, idx, pt, gaps, o1, o2 = setup
    tr = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False)
    tr.collect_partial(pt, sim.reads1, sim.reads2, o1, o2)
    counts = [b.n_partial for b in tr.bundles]
    assert sum(counts) > 0
    # check clipped_index semantics: read chars after clipped_index (match 1/4)
    # continue the truth INTO the gap
    checked = 0
    good = 0
    for b in tr.bundles:
        g = b.gap
        truth = sim.truth.contigs[g.contig]
        for seq, ci, mt in zip(b.p_seq, b.p_clip, b.p_match):
            if mt in (1, 4) and 0 <= ci < len(seq) - 5:
                into_gap = seq[ci + 1 : ci + 1 + min(len(seq) - ci - 1, g.length)]
                tr_gap = truth[g.start : g.start + len(into_gap)]
                checked += 1
                if len(into_gap) and np.mean(into_gap == tr_gap) > 0.85:
                    good += 1
    assert checked > 0
    assert good / checked > 0.75


def test_right_clipped_partial(setup):
    sim, idx, pt, gaps, o1, o2 = setup
    tr = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False,
                use_right_clipped=True)
    tr.collect_partial(pt, sim.reads1, sim.reads2, o1, o2)
    # match 2/3 reads: chars before clipped_index run backwards into the gap
    checked = good = 0
    for b in tr.bundles:
        g = b.gap
        truth = sim.truth.contigs[g.contig]
        ge = g.start + g.length
        for seq, ci, mt in zip(b.p_seq, b.p_clip, b.p_match):
            if mt in (2, 3) and 5 <= ci <= len(seq):
                k = min(ci, g.length)
                into_gap = seq[ci - k : ci]
                tr_gap = truth[ge - k : ge]
                checked += 1
                if np.mean(into_gap == tr_gap) > 0.85:
                    good += 1
    if checked:  # right-clipped reads exist for most sims
        assert good / checked > 0.7


def test_caps_and_dedup(setup):
    sim, idx, pt, gaps, o1, o2 = setup
    tr = Triage(gaps, max_distance=INSERT, read_mean=INSERT, is_jump=False,
                unmapped_limit=5)
    tr.collect_unmapped(pt, sim.reads1, sim.reads2)
    assert max(b.n_unmapped for b in tr.bundles) <= 5
    # duplicate sequences rejected
    b = tr.bundles[0]
    n0 = b.n_unmapped
    if n0:
        tr._add_unmapped(0, 100, 1, b.u_seq[0].copy())
        assert tr.bundles[0].n_unmapped == n0
