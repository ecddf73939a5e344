"""Aligner tests: seeding, extension, soft clips, pairing — against simulation truth."""

import numpy as np
import pytest

from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.dtypes import encode, revcomp
from figbird_tpu.genome import Genome
from figbird_tpu.simulate import SimConfig, simulate


@pytest.fixture(scope="module")
def sim():
    return simulate(SimConfig(genome_len=100_000, n_contigs=2, n_gaps=8,
                              coverage=4, seed=7, error_rate=0.005))


@pytest.fixture(scope="module")
def idx(sim):
    return build_index(sim.truth, k=15)


def test_index_roundtrip(idx, sim):
    # every indexed k-mer decodes back to the right genome position
    m = len(idx.sorted_pos)
    take = np.linspace(0, m - 1, 50).astype(int)
    for i in take:
        p = idx.sorted_pos[i]
        code = 0
        for j in range(idx.k):
            code = code * 4 + int(idx.flat[p + j])
        assert code == idx.sorted_codes[i]


def test_flat_contig_conversion(idx):
    ci, local = idx.flat_to_contig(np.array([idx.offsets[1] + 5]))
    assert ci[0] == 1 and local[0] == 5
    assert idx.contig_to_flat(np.array([1]), np.array([5]))[0] == idx.offsets[1] + 5


def test_align_exact_reads(idx, sim):
    al = Aligner(idx, batch_size=512)
    n = 400
    res = al.align(sim.reads1.seq[:n], sim.reads1.length[:n])
    flat_true = idx.contig_to_flat(sim.true_contig[:n], sim.true_pos[:n])
    ref_start = res["pos"] + res["clip_start"]
    ok = res["aligned"] & (res["strand"] == 0)
    # mate1 is forward at fragment start
    assert ok.mean() > 0.95
    correct = (ref_start == flat_true)[ok].mean()
    assert correct > 0.98


def test_align_mate2_reverse(idx, sim):
    al = Aligner(idx, batch_size=512)
    n = 400
    res = al.align(sim.reads2.seq[:n], sim.reads2.length[:n])
    ok = res["aligned"]
    assert ok.mean() > 0.95
    assert (res["strand"][ok] == 1).mean() > 0.98
    # reverse mate aligns at fragment end - L
    L = sim.reads2.seq.shape[1]
    flat_true = idx.contig_to_flat(
        sim.true_contig[:n], sim.true_pos[:n] + sim.true_insert[:n] - L
    )
    ref_start = res["pos"] + res["clip_start"]
    assert (ref_start == flat_true)[ok].mean() > 0.95


def test_soft_clip_detection(idx, sim):
    # construct a read whose right half is random junk: expect right clip
    c = sim.truth.contigs[0]
    true_start = 30_000
    left = c[true_start : true_start + 60]
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 4, size=40, dtype=np.int8)
    read = np.concatenate([left, junk])[None, :]
    al = Aligner(idx, batch_size=8)
    res = al.align(read.astype(np.int8), np.array([100], np.int32))
    assert res["aligned"][0]
    assert res["clip_start"][0] == 0
    assert res["clip_end"][0] >= 30  # most of junk clipped
    assert res["pos"][0] + res["clip_start"][0] == idx.offsets[0] + true_start


def test_left_clip_detection(idx, sim):
    c = sim.truth.contigs[0]
    true_start = 40_000
    right = c[true_start : true_start + 60]
    rng = np.random.default_rng(1)
    junk = rng.integers(0, 4, size=40, dtype=np.int8)
    read = np.concatenate([junk, right])[None, :]
    al = Aligner(idx, batch_size=8)
    res = al.align(read.astype(np.int8), np.array([100], np.int32))
    assert res["aligned"][0]
    cs = int(res["clip_start"][0])
    assert cs >= 30  # most junk clipped (chance matches may extend a little)
    # aligned segment maps consistently: read char cs <-> true_start - (40 - cs)
    assert res["pos"][0] + cs == idx.offsets[0] + true_start - (40 - cs)


def test_mismatch_mask(idx, sim):
    c = sim.truth.contigs[0]
    s = 20_000
    read = c[s : s + 100].copy()
    read[10] = (read[10] + 1) % 4
    read[70] = (read[70] + 2) % 4
    al = Aligner(idx, batch_size=8)
    res = al.align(read[None, :].astype(np.int8), np.array([100], np.int32))
    assert res["aligned"][0] and res["n_mis"][0] == 2
    assert set(np.flatnonzero(res["mism"][0])) == {10, 70}


def test_unaligned_read(idx):
    rng = np.random.default_rng(3)
    read = rng.integers(0, 4, size=(1, 100)).astype(np.int8)
    al = Aligner(idx, batch_size=8)
    res = al.align(read, np.array([100], np.int32))
    assert not res["aligned"][0]


def test_pairing(idx, sim):
    al = Aligner(idx, batch_size=1024)
    n = 1000
    a1 = al.align(sim.reads1.seq[:n], sim.reads1.length[:n])
    a2 = al.align(sim.reads2.seq[:n], sim.reads2.length[:n])
    pt = build_pair_table(idx, a1, a2, sim.reads1.length[:n], sim.reads2.length[:n],
                          max_insert=int(1.15 * 500))
    assert pt.concordant.mean() > 0.9
    m = pt.concordant
    # insert sizes match simulation truth
    match = (pt.insert[m] == sim.true_insert[:n][m]).mean()
    assert match > 0.95
    assert pt.model.mean() > 0.7


def test_align_reads_spanning_gap_flank(sim):
    # index the DRAFT (with N gaps): reads overlapping a gap get clipped at the edge
    idx_d = build_index(sim.draft, k=15)
    gaps = sim.draft.find_gaps()
    g = gaps[0]
    c_true = sim.truth.contigs[g.contig]
    # read starting 50 before the gap: 50 flank chars + gap interior chars
    start = g.start - 50
    read = c_true[start : start + 100][None, :].astype(np.int8)
    al = Aligner(idx_d, batch_size=8)
    res = al.align(read, np.array([100], np.int32))
    assert res["aligned"][0]
    assert res["strand"][0] == 0
    ref_start = res["pos"][0] + res["clip_start"][0]
    assert ref_start == idx_d.offsets[g.contig] + start
    # clipped at the gap edge: ~50 chars aligned
    assert res["clip_end"][0] >= 40


def test_end_to_end_mode():
    """Unmapped-pass preset (RunFigbird.sh:329-333, default bowtie2): no free
    clipping — a gap-edge overhanging read that local mode clips must be
    REJECTED in e2e mode, while clean full-length reads still align."""
    import numpy as np
    from figbird_tpu.align import Aligner, AlignParams, build_index
    from figbird_tpu.align.core import e2e_params
    from figbird_tpu.genome import Genome
    from figbird_tpu.dtypes import N

    rng = np.random.default_rng(3)
    truth = rng.integers(0, 4, 4000, dtype=np.int8)
    draft = truth.copy()
    draft[2000:2040] = N  # a 40bp gap
    genome = Genome(["c"], [draft])
    idx = build_index(genome, k=15)

    L = 100
    clean = truth[500:600].copy()
    overhang = truth[1950:2050].copy()  # 50 flank chars + 50 into the gap
    reads = np.stack([clean, overhang])
    lens = np.full(2, L, np.int32)

    local = Aligner(idx, AlignParams(), batch_size=64, two_tier=False,
                    indel_tier=False)
    a_loc = local.align(reads, lens)
    assert a_loc["aligned"][0] and a_loc["aligned"][1]
    assert a_loc["clip_end"][1] >= 45  # local mode clips the gap overhang

    e2e = Aligner(idx, e2e_params(AlignParams()), batch_size=64,
                  two_tier=False, indel_tier=False)
    a_e2e = e2e.align(reads, lens)
    assert a_e2e["aligned"][0]
    assert not a_e2e["aligned"][1]  # e2e: 50 N-mismatches sink the read
    assert a_e2e["clip_start"][0] == 0 and a_e2e["clip_end"][0] == 0
    assert a_e2e["n_mis"][0] == 0


def test_e2e_min_score_matches_bowtie2_formula():
    """Validate the e2e acceptance bar against hand-computed bowtie2
    decisions (VERDICT r3 item 6a).

    bowtie2's default end-to-end scoring: 0 per match, -6 per high-quality
    mismatch (--mp 6,2 at Q40), min-score ``L,-0.6,-0.6`` => accept iff
    -6*m >= -0.6 - 0.6*L  <=>  m <= 0.1*L + 0.1.  Our +2/-6 scorer with the
    ``1.2*L - 0.8`` bar (core.py e2e_min_*): 2L - 8m >= 1.2L - 0.8  <=>
    m <= 0.1*L + 0.1 — the identical decision boundary.  Drive ~20 cases
    (L = 50/101/150, m around the boundary) end-to-end through the aligner
    and assert each accept/reject matches bowtie2's formula.
    """
    import math

    from figbird_tpu.align.core import e2e_params

    rng = np.random.default_rng(42)
    L_cases = [(50, (3, 4, 5, 6, 7)),
               (101, (8, 9, 10, 11, 12)),
               (150, (13, 14, 15, 16, 17))]
    genome_seq = rng.integers(0, 4, size=400_000, dtype=np.int8)
    g = Genome(["c0"], [genome_seq])
    idx = build_index(g, k=15)
    Lmax = 150
    reads, lens, expect = [], [], []
    pos_cursor = 1000
    for L, mcounts in L_cases:
        for m in mcounts:
            src = genome_seq[pos_cursor : pos_cursor + L].copy()
            # plant m mismatches AFTER an intact 20bp seed prefix so seeding
            # always finds the placement; spread them out
            slots = np.linspace(22, L - 2, m).astype(int)
            for s in slots:
                src[s] = (src[s] + 1) % 4
            row = np.full(Lmax, 4, np.int8)
            row[:L] = src
            reads.append(row)
            lens.append(L)
            # bowtie2 accept: m <= 0.1*L + 0.1
            expect.append(m <= 0.1 * L + 0.1)
            pos_cursor += 2000
    reads = np.stack(reads)
    lens = np.asarray(lens, np.int32)
    al = Aligner(idx, e2e_params(AlignParams()), two_tier=False,
                 indel_tier=False, batch_size=64)
    out = al.align(reads, lens)
    for i, exp in enumerate(expect):
        assert bool(out["aligned"][i]) == exp, (
            f"case {i}: L={lens[i]} expected aligned={exp}, "
            f"score={out['score'][i]}")


def test_cheap_pass_seed_shadow_escalates():
    """Adversarial fixture for the two-tier soundness hole (VERDICT r4 #7):
    a read whose TRUE placement hides its mismatches inside both cheap-pass
    seed k-mers (so the cheap 2-seed pass cannot find it) while a DECOY
    placement with more mismatches — all outside the seed windows — looks
    clean.  The <=1-mismatch confidence bar must escalate the read to the
    full pass, which finds the true placement via its interior seeds."""
    rng = np.random.default_rng(42)
    L, k = 101, 15
    read = rng.integers(0, 4, size=L, dtype=np.int8)

    # true region: equals the read except 2 mismatches, one inside each
    # cheap seed window (offsets 0 and L-k)
    true_region = read.copy()
    for pos in (7, L - k + 7):
        true_region[pos] = (true_region[pos] + 1) % 4
    # decoy region: 3 mismatches, all OUTSIDE the seed windows
    decoy_region = read.copy()
    for pos in (30, 50, 70):
        decoy_region[pos] = (decoy_region[pos] + 1) % 4

    pad = lambda n: rng.integers(0, 4, size=n, dtype=np.int8)
    contig = np.concatenate([pad(500), true_region, pad(500),
                             decoy_region, pad(500)])
    true_pos = 500
    genome = Genome(["c"], [contig])
    idx = build_index(genome, k=k)

    reads = read[None, :]
    lens = np.array([L], np.int32)
    true_flat = int(idx.contig_to_flat(np.array([0]), np.array([true_pos]))[0])
    full = Aligner(idx, batch_size=8, two_tier=False,
                   indel_tier=False).align(reads, lens)
    two = Aligner(idx, batch_size=8, two_tier=True,
                  indel_tier=False).align(reads, lens)
    # the full pass finds the true (2-mismatch) placement ...
    assert int(full["pos"][0]) == true_flat, full["pos"]
    # ... and the two-tier aligner must agree (escalation fired)
    assert int(two["pos"][0]) == true_flat, \
        f"two-tier settled on decoy at {int(two['pos'][0])}"
    assert int(two["n_mis"][0]) == 2
