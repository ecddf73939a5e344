"""GapFiller EM tests with hand-constructed bundles (aligner bypassed).

Ground truth comes from a synthetic contig; reads are cut directly from the
truth so the EM's job is isolated from alignment quality.
"""

import numpy as np
import pytest

from figbird_tpu.dtypes import N
from figbird_tpu.genome import GapInfo, Genome
from figbird_tpu.model.error_model import ModelStats, finalize_model
from figbird_tpu.triage.assign import GapBundle
from figbird_tpu.fill import fill_gaps

L = 100
INSERT = 200


@pytest.fixture(scope="module")
def model():
    """A plain model: ~0.5% error, insert 200+/-15."""
    st = ModelStats(L)
    rng = np.random.default_rng(0)
    ins = rng.normal(INSERT, 15, size=20000).astype(int)
    np.add.at(st.insert_counts, np.clip(ins, 1, st.max_insert_size - 1), 1)
    st.error_pos += 50        # ~0.5% with 10k reads covering each cycle
    st.read_lengths[L - 1] = 10000
    st.error_types += np.full((5, 5), 2)
    st.base_counts += 10000 * L // 4
    st.unique_mapped = 10000
    m = finalize_model(st, np.array([100000]))
    m.gap_prob_cutoff = 6
    return m


def _mk_draft(gap_len, seed=3, contig_len=3000, gap_at=1500):
    rng = np.random.default_rng(seed)
    truth = rng.integers(0, 4, size=contig_len, dtype=np.int8)
    draft = truth.copy()
    draft[gap_at : gap_at + gap_len] = N
    genome = Genome(["c"], [draft])
    gap = GapInfo(0, gap_at, gap_len)
    return truth, genome, gap


def _partial_bundle(truth, gap, starts):
    """Left-anchored overhanging reads cut from truth (match 1)."""
    b = GapBundle(gap)
    for s in starts:
        seq = truth[s : s + L].copy()
        b.p_seq.append(seq)
        b.p_clip.append(gap.start - (s + 1))  # writePartialSam: gap_s - pos1
        b.p_match.append(1)
        b.p_pos.append(s + 1)
        b.p_refpos.append(-1)
        b.p_qual.append(np.full(L, 1e-3, np.float32))
    return b


def _right_partial(b, truth, gap, starts):
    """Right-anchored reads (match 2): start at gap end - k, clipped_index=k."""
    ge = gap.start + gap.length
    for s in starts:
        seq = truth[s : s + L].copy()
        k = ge - s  # chars of the read inside/before the flank boundary
        b.p_seq.append(seq)
        b.p_clip.append(k)
        b.p_match.append(2)
        b.p_pos.append(ge + 1)
        b.p_refpos.append(-1)
        b.p_qual.append(np.full(L, 1e-3, np.float32))
    return b


def _unmapped_bundle(truth, gap, starts, model):
    """Interior reads with forward anchors placed to give insert ~INSERT."""
    b = GapBundle(gap)
    for s in starts:
        seq = truth[s : s + L].copy()
        b.u_seq.append(seq)
        # anchor fwd: tempInsert = cpos - pos1 + L == INSERT at true cpos
        b.u_pos.append(s - INSERT + L)
        b.u_rev.append(1)
        b.p_qual  # unused
    return b


def test_partial_fill_exact(model):
    truth, genome, gap = _mk_draft(24)
    starts = list(range(gap.start - 90, gap.start - 8, 4))
    b = _partial_bundle(truth, gap, starts)
    _right_partial(b, truth, gap, range(gap.start + gap.length - 88,
                                        gap.start + gap.length - 10, 4))
    res = fill_gaps(genome, [gap], [b], model, partial_mode=True,
                    partial_len=L, max_scan_lengths=40)
    s = res.gap_strings[0]
    tr = truth[gap.start : gap.start + gap.length]
    assert len(s) == gap.length, f"length {len(s)} != {gap.length}"
    assert np.array_equal(s, tr), f"fill mismatch: {s} vs {tr}"


def test_partial_fill_with_read_errors(model):
    truth, genome, gap = _mk_draft(20, seed=5)
    rng = np.random.default_rng(7)
    starts = list(range(gap.start - 92, gap.start - 8, 3))
    b = _partial_bundle(truth, gap, starts)
    _right_partial(b, truth, gap, range(gap.start + gap.length - 90,
                                        gap.start + gap.length - 12, 3))
    # inject 1% errors
    for seq in b.p_seq:
        errs = rng.random(L) < 0.01
        seq[errs] = (seq[errs] + 1) % 4
    res = fill_gaps(genome, [gap], [b], model, partial_mode=True,
                    partial_len=L, max_scan_lengths=40)
    s = res.gap_strings[0]
    tr = truth[gap.start : gap.start + gap.length]
    assert len(s) == gap.length
    assert (s == tr).mean() >= 0.9


def test_unmapped_fill(model):
    truth, genome, gap = _mk_draft(120, seed=9)
    # dense interior coverage: reads starting inside/around the gap
    starts = list(range(gap.start - 80, gap.start + gap.length - 20, 3))
    b = _unmapped_bundle(truth, gap, starts, model)
    res = fill_gaps(genome, [gap], [b], model, partial_mode=False,
                    partial_len=L, max_scan_lengths=24)
    s = res.gap_strings[0]
    tr = truth[gap.start : gap.start + len(s)]
    assert len(s) > 0
    filled = s != N
    assert filled.mean() > 0.5, f"mostly unfilled: {filled.mean()}"
    assert (s[filled] == tr[: len(s)][filled]).mean() > 0.9


def test_empty_bundle_skips(model):
    truth, genome, gap = _mk_draft(30)
    b = GapBundle(gap)
    res = fill_gaps(genome, [gap], [b], model, partial_mode=True, partial_len=L)
    assert np.all(res.gap_strings[0] == N)
    assert res.stats["skipped"] == 1


def test_negative_gap_merge(model):
    # construct overlapping flanks: right flank prefix == left flank suffix
    rng = np.random.default_rng(11)
    truth = rng.integers(0, 4, size=2000, dtype=np.int8)
    ov = 8
    gap_at, gl = 1000, 10
    draft = truth.copy()
    # make right flank start repeat the left flank's last `ov` chars
    draft[gap_at + gl : gap_at + gl + ov] = draft[gap_at - ov : gap_at]
    draft[gap_at : gap_at + gl] = N
    genome = Genome(["c"], [draft])
    gap = GapInfo(0, gap_at, gl)
    # a partial read verifying the junction: left flank ++ right-after-overlap
    b = GapBundle(gap)
    merged = np.concatenate([
        draft[gap_at - 60 : gap_at],
        draft[gap_at + gl + ov : gap_at + gl + ov + 40],
    ])
    b.p_seq.append(merged.astype(np.int8))
    b.p_clip.append(59)
    b.p_match.append(1)
    b.p_pos.append(gap_at - 60 + 1)
    b.p_refpos.append(-1)
    b.p_qual.append(np.full(100, 1e-3, np.float32))
    res = fill_gaps(genome, [gap], [b], model, partial_mode=True, partial_len=L,
                    neg_overlap=30)
    assert res.stats["neg_merged"] == 1
    assert res.gaptofill[0] == ov
    assert len(res.gap_strings[0]) == 0


def test_find_perfect_mim():
    """checkMIM equivalent: a read = left flank + insert + right flank implies
    the true gap length (Preprocess.cpp:885-925, gaplen = i_len + 1)."""
    from figbird_tpu.fill.driver import GapPlan, _find_perfect_mim
    from figbird_tpu.genome import GapInfo
    from figbird_tpu.triage.assign import GapBundle

    rng = np.random.default_rng(3)
    lf = rng.integers(0, 4, 30, dtype=np.int8)
    rf = rng.integers(0, 4, 30, dtype=np.int8)
    gap = GapInfo(0, 100, 8)
    b = GapBundle(gap)
    insert = rng.integers(0, 4, 7, dtype=np.int8)  # true content, 7 bases
    b.p_seq.append(np.concatenate([lf[-20:], insert, rf[:20]]))
    plan = GapPlan(gap, b, lf, rf, 30)
    flag, plen = _find_perfect_mim(plan)
    assert flag == 1
    assert plen == 8  # i_len + 1

    # no structure -> no flag
    b2 = GapBundle(gap)
    b2.p_seq.append(rng.integers(0, 4, 60, dtype=np.int8))
    plan2 = GapPlan(gap, b2, lf, rf, 30)
    assert _find_perfect_mim(plan2) == (0, 0)

    # large gaps are gated off
    gap3 = GapInfo(0, 100, 40)
    b3 = GapBundle(gap3)
    b3.p_seq.append(np.concatenate([lf[-20:], insert, rf[:20]]))
    assert _find_perfect_mim(GapPlan(gap3, b3, lf, rf, 30)) == (0, 0)


def test_recheck_partial_guard():
    """recheck_partial (Figbird.cpp:4750-4873) — defined but never called in
    the reference; unit-tested directly on constructed placements."""
    from figbird_tpu.fill.driver import _recheck_partial

    gl = 60
    # case A: clean consensus with a big N region and two-sided coverage -> 1
    cons = np.zeros(gl, np.int8)
    cons[15:45] = N  # 30 >= min_N=21
    counts = np.ones((gl, 5), np.float32)
    pos = np.array([-40, 20], np.int64)
    lens = np.array([50, 50], np.int64)
    accept = np.array([True, True])
    assert _recheck_partial(cons.copy(), counts.copy(), pos, lens, accept) == 1

    # case B: no N region, reads only on the left -> "extreme problem" (-1)
    cons = np.zeros(gl, np.int8)
    pos = np.array([-40, -30], np.int64)
    lens = np.array([50, 50], np.int64)
    assert _recheck_partial(cons.copy(), counts.copy(), pos, lens,
                            np.array([True, True])) == -1

    # case C: discontinuous join (left read ends exactly where right read
    # starts) -> N-out at the junction, erode 10 chars each side, return 0
    cons = np.zeros(gl, np.int8)
    pos = np.array([-20, 30], np.int64)   # left covers [0,30), right [30,..)
    lens = np.array([50, 50], np.int64)
    counts = np.ones((gl, 5), np.float32)
    c2 = cons.copy()
    rv = _recheck_partial(c2, counts, pos, lens, np.array([True, True]))
    assert rv == 0
    assert c2[30] == N                      # junction N-ed out
    assert (counts[20:30, :4] == 0).all()   # 10 eroded before the region
    assert (counts[31:41, :4] == 0).all()   # 10 eroded after
    assert (counts[:20, :4] == 1).all()

    # case D: small N region (< 21) with both sides covered -> erode to 21
    cons = np.zeros(gl, np.int8)
    cons[28:33] = N  # 5-wide region
    counts = np.ones((gl, 5), np.float32)
    pos = np.array([-40, 20], np.int64)
    lens = np.array([50, 50], np.int64)
    rv = _recheck_partial(cons.copy(), counts, pos, lens,
                          np.array([True, True]))
    assert rv == 0
    # rem = 21 - 32 + 28 = 17 -> remove_char = 9
    assert (counts[28 - 9 : 28, :4] == 0).all()
    assert (counts[33 : 33 + 9, :4] == 0).all()
    assert (counts[:19, :4] == 1).all()


def test_second_best_tracked(model):
    """secondBestString parity (Figbird.cpp:6360-6383, write-only there)."""
    truth, genome, gap = _mk_draft(24)
    b = _partial_bundle(truth, gap, [1430, 1445, 1460, 1470])
    _right_partial(b, truth, gap, [1510, 1520])
    res = fill_gaps(genome, [gap], [b], model, partial_mode=True,
                    partial_len=L, max_scan_lengths=24)
    sb = res.second_best[0]
    assert sb is not None
    slen, sstr = sb
    assert slen != len(res.gap_strings[0]) or not np.array_equal(
        sstr[:slen], res.gap_strings[0])


def _garbage_reads(rng, n):
    return [rng.integers(0, 4, size=L, dtype=np.int8) for _ in range(n)]


def test_precision_escalation_unmapped(model):
    """Lazy precision mode (exact_soft=None, production default) must be
    bit-identical to the full cascade (exact_soft=True) when gap-zone rows
    are covered only by astronomically-unlikely placements — the f32
    underflow case the cascade exists for (VERDICT r4 #1)."""
    truth, genome, gap = _mk_draft(120, seed=11)
    starts = list(range(gap.start - 80, gap.start + 20, 4))
    b = _unmapped_bundle(truth, gap, starts, model)
    # middle/right of the gap covered ONLY by garbage reads: their soft
    # weights underflow f32 (~e^-200), so plain-f32 rows there total 0
    rng = np.random.default_rng(13)
    for k, s in enumerate(range(gap.start + 30,
                                gap.start + gap.length - 10, 6)):
        b.u_seq.append(rng.integers(0, 4, size=L, dtype=np.int8))
        b.u_pos.append(s - INSERT + L)
        b.u_rev.append(1)

    kw = dict(partial_mode=False, partial_len=L, max_scan_lengths=24)
    res_auto = fill_gaps(genome, [gap], [b], model, exact_soft="auto", **kw)
    res_exact = fill_gaps(genome, [gap], [b], model, exact_soft=True, **kw)
    assert any(k.startswith("esc_exact") for k in res_auto.stats), \
        f"no precision escalation fired: {res_auto.stats}"
    assert np.array_equal(res_auto.gap_strings[0], res_exact.gap_strings[0])


def test_precision_escalation_partial(model):
    truth, genome, gap = _mk_draft(40, seed=12)
    starts = list(range(gap.start - 90, gap.start - 60, 4))
    b = _partial_bundle(truth, gap, starts)
    # left-anchored reads whose overhang into the gap is garbage: legal
    # positions covering the deep gap interior score ~1e-4/char -> the
    # pow(10, lnP) soft weight (p^ln10) underflows f32
    rng = np.random.default_rng(14)
    for s in range(gap.start - 40, gap.start - 4, 4):
        seq = truth[s : s + L].copy()
        over = gap.start - s  # chars before the gap
        seq[over:] = rng.integers(0, 4, size=L - over, dtype=np.int8)
        b.p_seq.append(seq)
        b.p_clip.append(gap.start - (s + 1))
        b.p_match.append(1)
        b.p_pos.append(s + 1)
        b.p_refpos.append(-1)
        b.p_qual.append(np.full(L, 1e-3, np.float32))

    kw = dict(partial_mode=True, partial_len=L, max_scan_lengths=40)
    res_auto = fill_gaps(genome, [gap], [b], model, exact_soft="auto", **kw)
    res_exact = fill_gaps(genome, [gap], [b], model, exact_soft=True, **kw)
    assert np.array_equal(res_auto.gap_strings[0], res_exact.gap_strings[0])
