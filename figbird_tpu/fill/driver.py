"""Host orchestration of the gap-fill EM.

Replaces FillGaps.cpp scheduling + the sequential control flow of
Figbird.cpp::fillGap/finalize with:

1. host pre-analysis per gap (flanks, repeat detection, negative-gap merge,
   findFrac length ranges — analyzeGap/find_contig_match/findFrac);
2. a *batched* device scan over gap-length candidates (`fill_batch`), whose
   sequential early-exit heuristics are replayed on the host from the full
   likelihood vector (fillGap 6298-6482) so the chosen length matches the
   reference's serial scan;
3. a finalize pass re-placing reads against the best string
   (finalize 4929-5399) followed by the host guard battery
   (5404-5641, recheck_sequence/recheck_partial/recompute/check_update).

The reference's thread balancer (FillGaps.cpp:456-679) is replaced by shape
bucketing: gaps are grouped by (read-count, window) bucket so each device
launch is a dense batch.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("figbird_tpu.fill")

from ..dtypes import GAP_CODE, N
from ..genome import GapInfo, Genome
from ..model.error_model import ErrorModel
from ..triage.assign import GapBundle
from .em import (LN10, FillConfig, fill_batch, fill_batch_gathered,
                 finalize_batch, finalize_batch_gathered)

SIDE_LIMIT = 30
GAPTHRESH = 400          # FillGaps.cpp:22 (mid_limitu)
PARTIAL_SAME = 4         # fillGap 6258
JUMP_SAME = 50
PARTIAL_THRESHOLD = 2    # setParameters


@dataclass
class GapPlan:
    gap: GapInfo
    bundle: GapBundle
    left_flank: np.ndarray   # up to side_limit chars
    right_flank: np.ndarray
    side_limit: int
    skip: bool = False       # repeat/empty -> leave as N
    neg_merge: int = 0       # >0: close gap, skip this many chars after
    lengths: list = field(default_factory=list)
    side_flag: bool = False
    large_gap: bool = False
    perfect_flag: int = 0    # checkMIM equivalent (Preprocess.cpp:885-925)
    perfect_len: int = 0
    # unmapped small-gap probe failed (checkGapReads, Figbird.cpp:6121-6153):
    # the reference then finalizes with saved_reads still all-zero
    # (allocate:1709; 6369 never ran), and unmapped finalize acceptance
    # requires saved_reads==1 (5128) — so nothing is accepted and the gap
    # stays N.  Replicated by zeroing the finalize saved-flags.
    less_read: bool = False


@dataclass
class FillResult:
    gap_strings: list       # np.int8 arrays (the filled gap content)
    gaptofill: np.ndarray   # per-gap skip counts
    stats: dict
    placements: list = None  # per-gap [(read_idx, gap_pos, seq)] (draw trace)
    # per-gap (second_best_len, second_best_consensus) or None — the
    # reference's secondBestString/secondMaxGapEstimate (Figbird.cpp
    # 6243-6246, 6360-6383).  Write-only state there (set, then only
    # deleted at 6594); surfaced here for inspection/parity.
    second_best: list = None
    # per-gap (perfectread_gap, perfectread_gaplen) — the checkMIM flags the
    # reference records in stat2.txt (Preprocess.cpp:2626-2629)
    mim: np.ndarray = None


# ---------------------------------------------------------------- analysis

def _count_nonoverlap_hits(reads: np.ndarray, lens: np.ndarray,
                           pat: np.ndarray) -> np.ndarray:
    """Per-read: does ``pat`` occur >= 2 times (non-overlapping, as
    ``bytes.count``) in the read?  Vectorised sliding-window compare."""
    P, L = reads.shape
    m = len(pat)
    if m == 0 or m > L:
        return np.zeros(P, bool)
    nw = L - m + 1
    # windows (P, nw, m) as a strided view — no copy
    w = np.lib.stride_tricks.sliding_window_view(reads, m, axis=1)
    hit = (w == pat[None, None, :]).all(axis=2)  # (P, nw)
    hit &= np.arange(nw)[None, :] + m <= lens[:, None]
    out = np.zeros(P, bool)
    for r in np.flatnonzero(hit.sum(axis=1) >= 2):
        # non-overlapping greedy count, only on candidate rows (rare)
        posns = np.flatnonzero(hit[r])
        cnt, nxt = 0, -1
        for p in posns:
            if p >= nxt:
                cnt += 1
                nxt = p + m
        out[r] = cnt >= 2
    return out


def _find_repeats(plan: GapPlan, partial_mode: bool) -> tuple[bool, bool]:
    """findRepeat (1799-1911): flank substrings occurring >=2x in a partial read.

    Returns (two_sided, one_sided).  The reference scans flank suffixes
    (left) / prefixes (right) longest-first and stops at the first with >=2
    non-overlapping occurrences; occurrence counts are monotone in substring
    containment, so the scan is equivalent to testing only the SHORTEST
    candidate — the (n_min+1)-char left-flank suffix / right-flank prefix —
    which vectorises to one sliding-window compare over the read matrix.
    """
    gl = plan.left_flank
    gr = plan.right_flank
    n_min = 20
    if not plan.bundle.p_seq:
        return False, False
    L = max(len(s) for s in plan.bundle.p_seq)
    reads, lens = _pad_reads(plan.bundle.p_seq, L, len(plan.bundle.p_seq),
                             fill=-1)
    fl = np.zeros(len(reads), bool)
    fr = np.zeros(len(reads), bool)
    if len(gl) > n_min:
        fl = _count_nonoverlap_hits(reads, lens, gl[-(n_min + 1):])
    if len(gr) > n_min:
        fr = _count_nonoverlap_hits(reads, lens, gr[: n_min + 1])
    return bool((fl & fr).any()), bool((fl | fr).any())


def _neg_gap_merge(plan: GapPlan, neg_overlap: int) -> int:
    """find_contig_match (2176-2267): flank overlap verified by a partial read.

    Returns the overlap length (chars to skip after the gap) or 0.
    """
    g = plan.gap
    if g.length > neg_overlap:
        return 0
    s1 = plan.left_flank
    s2 = plan.right_flank
    err_thresh = 2
    for i in range(max(plan.side_limit - 3, 0)):
        s3 = s1[i:]
        s4 = s2[: len(s2) - i]
        if len(s4) == 0 or len(s3) < len(s4):
            continue
        # exact containment of s4 in s3
        pos = -1
        s3b, s4b = s3.tobytes(), s4.tobytes()
        pos = s3b.find(s4b)
        if pos < 0:
            continue
        rem = s2[len(s4):]
        # verify junction against a partial read: the FULL left flank s1 must
        # occur (<=2 mismatches), followed by rem (2202-2258)
        for seq in plan.bundle.p_seq:
            if len(seq) <= len(s1):
                continue
            best_match, best_pos = -1, -1
            for j in range(len(seq) - len(s1)):
                mism = int((seq[j : j + len(s1)] != s1).sum())
                match = len(s1) - mism
                if match > best_match:
                    best_match, best_pos = match, j
            if len(s1) - best_match <= err_thresh:
                newpos = best_pos + len(s1)
                if len(rem) == 0:
                    return len(s4)
                tail = seq[newpos : newpos + len(rem)]
                if len(tail) == len(rem) and (tail != rem).sum() <= err_thresh:
                    return len(s4)
    return 0


def _find_perfect_mim(plan: GapPlan, max_orig: int = 20,
                      mism_tol: int = 1) -> tuple[int, int]:
    """checkMIM equivalent (Preprocess.cpp:885-925 via 1360/1446/1691).

    The reference spots bowtie2 ``xMyIzM`` alignments — a read matching the
    left flank, carrying the true gap content as an insertion, then matching
    the right flank — and records the implied gap length (i_len + 1) in
    stat2.txt.  Our aligner is gapless, so the same read arrives as a clipped
    partial; we detect the structure directly: a left-flank suffix inside the
    read followed, after ``ilen`` inserted bases, by the right-flank prefix.
    """
    g = plan.gap
    if g.length > max_orig:  # the EM bonus only applies to gaps <= 20
        return 0, 0
    lf, rf = plan.left_flank, plan.right_flank
    a = min(len(lf), 15)
    if a < 10 or len(rf) < 8:
        return 0, 0
    la = lf[-a:]
    nr = len(rf)
    for s in plan.bundle.p_seq:
        n = len(s)
        if n <= a + 8:
            continue
        # left-anchor candidates: sliding-window mismatch vs the flank suffix
        wl = np.lib.stride_tricks.sliding_window_view(s, a)
        cand_p = np.flatnonzero(
            (wl[: n - a - 8] != la[None, :]).sum(axis=1) <= mism_tol)
        if not cand_p.size:
            continue
        # diagonal mismatch prefix sums vs rf: D[q, b] = mism(s[q:q+b], rf[:b])
        nw = n - 8 + 1
        wr = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([s, np.full(nr, -1, s.dtype)]), nr)[:nw]
        D = np.concatenate(
            [np.zeros((nw, 1), np.int32),
             np.cumsum(wr != rf[None, :], axis=1, dtype=np.int32)], axis=1)
        for p in cand_p:
            end_l = int(p) + a
            hi = min(n - end_l - 7, 3 * max_orig)
            for ilen in range(1, hi):
                q = end_l + ilen
                b = min(nr, n - q)
                if b < 8:
                    break
                if D[q, b] <= mism_tol:
                    return 1, ilen + 1
    return 0, 0


def _find_frac(orig: int, partial_mode: bool, partial_len: int,
               mid_limitu: int = GAPTHRESH) -> tuple[float, float, bool]:
    """findFrac (6879-6906): length-range fractions + large-gap flag."""
    factor = 3 * partial_len
    mid_limitp = 2 * partial_len
    if partial_mode:
        if orig <= mid_limitp // 2:
            return 1e-5, factor / max(orig, 1), False
        if orig <= mid_limitp:
            return 1e-5, 5.0, False
        return 1.0, 1.0, False
    else:
        if orig <= mid_limitu // 3:
            return 0.3, factor / max(orig, 1), False
        if orig <= mid_limitu:
            return 0.5, 2.5, False
        return 1.0, 1.0, True


def plan_gaps(genome: Genome, gaps: list[GapInfo], bundles: list[GapBundle],
              partial_mode: bool, partial_len: int, neg_overlap: int,
              max_scan_lengths: int = 160) -> list[GapPlan]:
    plans = []
    for g, b in zip(gaps, bundles):
        contig = genome.contigs[g.contig]
        lmd = min(g.start, 10**9)
        rroom = len(contig) - (g.start + g.length)
        sl = min(SIDE_LIMIT, lmd, rroom)
        lf = contig[max(g.start - sl, 0) : g.start]
        rf = contig[g.start + g.length : g.start + g.length + sl]
        plan = GapPlan(g, b, lf, rf, sl)

        if b.n_partial == 0 and b.n_unmapped == 0:
            plan.skip = True
            plans.append(plan)
            continue

        two, one = _find_repeats(plan, partial_mode)
        if partial_mode and (two or (one and g.length > 6 * partial_len)):
            plan.skip = True
            plans.append(plan)
            continue

        if sl > 0 and not one:
            plan.neg_merge = _neg_gap_merge(plan, neg_overlap)
            if plan.neg_merge > 0:
                plans.append(plan)
                continue

        if partial_mode and b.n_partial:
            if getattr(b, "mim_flag", 0):
                # native MIM from the banded aligner tier (checkMIM parity)
                plan.perfect_flag, plan.perfect_len = b.mim_flag, b.mim_len
            else:
                plan.perfect_flag, plan.perfect_len = _find_perfect_mim(plan)

        if sl < 10:
            plan.side_flag = True
            plan.lengths = [g.length]
            plans.append(plan)
            continue

        f1, f2, lgf = _find_frac(g.length, partial_mode, partial_len)
        plan.large_gap = lgf
        lo = int(g.length * f1)
        hi = int(g.length * f2)
        lengths = list(range(lo, hi + 1))
        if g.length not in lengths:
            lengths.append(g.length)
        if max_scan_lengths and len(lengths) > max_scan_lengths:
            # budget cap: keep a stride-sampled scan plus the original length
            # (the reference scans every length; pass max_scan_lengths=0 /
            # reference_exact=True for the uncapped scan)
            stride = -(-len(lengths) // max_scan_lengths)
            kept = sorted(set(lengths[::stride]) | {g.length})
            logger.info(
                "gap %d: length scan reduced %d -> %d candidates "
                "(stride %d; reference scans all — use reference_exact)",
                g.start, len(lengths), len(kept), stride)
            lengths = kept
        plan.lengths = lengths
        plans.append(plan)
    return plans


# ---------------------------------------------------------------- batching

def _model_arrays(model: ErrorModel, L: int):
    e = np.asarray(model.error_pos_dist, np.float32)
    ip = np.asarray(model.in_pos_dist, np.float32)
    dp = np.asarray(model.del_pos_dist, np.float32)

    def at(v, idx):
        return v[np.clip(idx, 0, len(v) - 1)]

    j = np.arange(L)
    jr = L - 1 - j
    e_fwd = at(e, j)
    e_rev = at(e, jr)
    a_fwd = np.log(np.maximum(1 - at(e, j) - at(ip, j) - at(dp, j), 1e-30))
    a_rev = np.log(np.maximum(1 - at(e, jr) - at(ip, jr) - at(dp, jr), 1e-30))
    b_fwd = np.log(np.maximum(e_fwd, 1e-30))
    b_rev = np.log(np.maximum(e_rev, 1e-30))
    et = np.asarray(model.error_type_probs, np.float32)
    ln_et = np.log(np.maximum(et, 1e-30))
    ln_ins = np.log(np.maximum(np.asarray(model.insert_dist_smoothed, np.float64),
                               1e-300)).astype(np.float32)
    return dict(
        e_fwd=jnp.asarray(e_fwd), e_rev=jnp.asarray(e_rev),
        a_fwd=jnp.asarray(a_fwd), a_rev=jnp.asarray(a_rev),
        b_fwd=jnp.asarray(b_fwd), b_rev=jnp.asarray(b_rev),
        et=jnp.asarray(et), ln_et=jnp.asarray(ln_et),
        ln_ins=jnp.asarray(ln_ins),
    )


def _pad_reads(seqs, L, n_pad, fill=GAP_CODE):
    out = np.full((n_pad, L), fill, np.int8)
    lens = np.zeros(n_pad, np.int32)
    for i, s in enumerate(seqs[:n_pad]):
        k = min(len(s), L)
        out[i, :k] = s[:k]
        lens[i] = k
    return out, lens


def _build_instances(genome: Genome, items: list[tuple[GapPlan, int]],
                     cfg: FillConfig) -> dict:
    """items: (plan, gap_length_candidate) -> padded instance arrays."""
    G = len(items)
    W, L = cfg.W, cfg.L
    tmpl = np.full((G, W), 5, np.int8)
    arr = dict(
        gap_len=np.zeros(G, np.int32), orig_gap=np.zeros(G, np.int32),
        gap_start=np.zeros(G, np.int32), side_limit=np.zeros(G, np.int32),
        perfect_gap=np.zeros(G, np.int32), perfect_gaplen=np.zeros(G, np.int32),
        ur=np.full((G, cfg.R, L), GAP_CODE, np.int8),
        u_len=np.zeros((G, cfg.R), np.int32),
        u_pos=np.zeros((G, cfg.R), np.int32),
        u_rev=np.zeros((G, cfg.R), np.int8),
        u_valid=np.zeros((G, cfg.R), bool),
        pr=np.full((G, cfg.P, L), GAP_CODE, np.int8),
        p_len=np.zeros((G, cfg.P), np.int32),
        p_clip=np.zeros((G, cfg.P), np.int32),
        p_match=np.ones((G, cfg.P), np.int32),
        p_pos=np.zeros((G, cfg.P), np.int32),
        p_refpos=np.full((G, cfg.P), -1, np.int32),
        p_valid=np.zeros((G, cfg.P), bool),
        p_qerr=np.zeros((G, cfg.P, L), np.float32),
    )
    for i, (plan, glen) in enumerate(items):
        g = plan.gap
        contig = genome.contigs[g.contig]
        arr["gap_len"][i] = glen
        arr["orig_gap"][i] = g.length
        arr["gap_start"][i] = g.start
        arr["side_limit"][i] = plan.side_limit
        arr["perfect_gap"][i] = plan.perfect_flag
        arr["perfect_gaplen"][i] = plan.perfect_len
        # template: left flank chars at [WL-k, WL); gap zone = 4 (set via codes);
        # right flank at [WL+glen, ...)
        ls = max(g.start - cfg.WL, 0)
        lchars = contig[ls : g.start]
        tmpl[i, cfg.WL - len(lchars) : cfg.WL] = lchars
        tmpl[i, cfg.WL : cfg.WL + glen] = 4
        rs = g.start + g.length
        rchars = contig[rs : rs + (W - cfg.WL - glen)]
        tmpl[i, cfg.WL + glen : cfg.WL + glen + len(rchars)] = rchars

        b = plan.bundle
        if cfg.unmapped_mode and b.n_unmapped:
            seq, lens = _pad_reads(b.u_seq, L, cfg.R)
            n = min(b.n_unmapped, cfg.R)
            arr["ur"][i] = seq
            arr["u_len"][i] = lens
            arr["u_pos"][i, :n] = np.asarray(b.u_pos[:n], np.int32)
            arr["u_rev"][i, :n] = np.asarray(b.u_rev[:n], np.int8)
            arr["u_valid"][i, :n] = True
        if b.n_partial:
            seq, lens = _pad_reads(b.p_seq, L, cfg.P)
            n = min(b.n_partial, cfg.P)
            arr["pr"][i] = seq
            arr["p_len"][i] = lens
            arr["p_clip"][i, :n] = np.asarray(b.p_clip[:n], np.int32)
            arr["p_match"][i, :n] = np.asarray(b.p_match[:n], np.int32)
            arr["p_pos"][i, :n] = np.asarray(b.p_pos[:n], np.int32)
            arr["p_refpos"][i, :n] = np.asarray(b.p_refpos[:n], np.int32)
            arr["p_valid"][i, :n] = True
            for k in range(n):
                q = b.p_qual[k]
                arr["p_qerr"][i, k, : min(len(q), L)] = q[:L]
    arr["tmpl"] = tmpl
    return {k: jnp.asarray(v) for k, v in arr.items()}


# ---------------------------------------------------------------- scan replay

def _replay_scan(lengths, lik, valid, orig, partial_mode, extras=None):
    """Replay fillGap's sequential plateau/early-exit logic (6398-6478).

    Returns (best_index, evaluated_count, used_read_varied, exited,
    second_best_index) — exited
    is True when a break fired (the gap needs no further candidate lengths,
    even if the prefix boundary coincides with the break point).
    """
    same_thresh = PARTIAL_SAME if partial_mode else JUMP_SAME
    best_i = 0
    second = -np.inf
    second_i = -1
    best_lik = -np.inf
    same = 0
    sec_same = sec_same2 = stuck = 0
    prev_lik = 0.0
    prev_best = -1
    prev_u = -1
    n_eval = 0
    exited = False
    for j, (le, lk, vc) in enumerate(zip(lengths, lik, valid)):
        n_eval = j + 1
        if lk > best_lik:
            # second-best consensus tracking (6358-6383): the displaced best
            # becomes second best.  Write-only state in the reference —
            # secondBestString is set here and only ever deleted (6594) —
            # tracked for parity and exposed via FillResult.second_best.
            second = best_lik
            second_i = best_i if np.isfinite(best_lik) else -1
            best_lik = lk
            best_i = j
            prev_u = vc
        elif lk > second:
            second = lk
            second_i = j
        diff = abs(prev_lik - lk)
        same = same + 1 if diff <= 0.9 else 0
        prev_lik = lk
        if same == same_thresh:
            exited = True
            break
        if not partial_mode and extras is not None:
            curr_u = vc
            if best_i == prev_best and abs(curr_u - prev_u) <= 2:
                sec_same += 1
            else:
                prev_best = best_i
                sec_same = 0
            if sec_same >= 2 * same_thresh:
                exited = True
                break
            if orig <= 30:
                fl = extras["edge"][j]
                sec_same2 = 0 if fl else sec_same2 + 1
                if sec_same2 >= int(1.5 * same_thresh):
                    exited = True
                    break
            if extras["discont"][j] and vc < 5:
                stuck += 1
            else:
                stuck = 0
            if stuck > 3 * same_thresh:
                exited = True
                break
    used = np.asarray(valid[:n_eval])
    varied = bool(len(used) > 1 and np.any(used != used[0]))
    return best_i, n_eval, varied, exited, second_i


# ---------------------------------------------------------------- host guards

def _host_consensus(counts: np.ndarray, gap_len: int, cov_thresh: int = 0
                    ) -> np.ndarray:
    """computeSequence(1,0) on the gap zone counts (maxG,5) -> codes with N."""
    c = counts[:gap_len]
    mx = c.max(axis=1)
    arg = c.argmax(axis=1)
    out = np.where((mx > 0) & (mx > cov_thresh), arg, N).astype(np.int8)
    return out


def _find_region(cons: np.ndarray) -> list[tuple[int, int]]:
    """findRegion (4594-4621): maximal N runs as (start, end) inclusive."""
    isn = cons == N
    if not isn.any():
        return []
    d = np.diff(isn.astype(np.int8))
    starts = list(np.flatnonzero(d == 1) + 1)
    ends = list(np.flatnonzero(d == -1))
    if isn[0]:
        starts = [0] + starts
    if isn[-1]:
        ends = ends + [len(cons) - 1]
    return list(zip(starts, ends))


def _find_discontinuous(pos: np.ndarray, lens: np.ndarray, accept: np.ndarray
                        ) -> list[int]:
    """findDiscontinous (4623-4666): adjacent overlap in [0, 2] -> N position."""
    order = np.argsort(np.where(accept, pos, -200))
    sp = np.where(accept, pos, -200)[order]
    sl = lens[order]
    out = []
    for i in range(len(sp) - 1):
        if sp[i] == -200:
            continue
        diff = sp[i] + sl[i] - sp[i + 1]
        if 0 <= diff <= 2:  # match_count_discont/2
            out.append(int(sp[i] + sl[i]))
    return out


def _recheck_sequence(cons, pos, lens, accept, orig_gap, region_perct) -> int:
    """recheck_sequence (4668-4743): N-out discontinuities + erode around
    unfilled regions. Mutates ``cons``; returns 1 => full reset."""
    gl = len(cons)
    for dp in _find_discontinuous(pos, lens, accept):
        if 0 <= dp < gl:
            cons[dp] = N
    regions = _find_region(cons)
    flag = len(_find_discontinuous(pos, lens, accept))
    if orig_gap < 400:
        red = 1.0
    elif orig_gap < 1200:
        red = 1.5
    else:
        red = 2.0
    readchar = 30
    if len(regions) <= 1:
        if len(regions) == 1:
            if region_perct < 0.75 or flag > 0:
                r0, r1 = regions[0]
                i = r0 - 1
                while i >= max(r0 - int(red * readchar), 0):
                    cons[i] = N
                    i -= 1
                j = r1 + 1
                while j < min(r1 + 1 + int(red * readchar), gl):
                    cons[j] = N
                    j += 1
                if i < 0 and j == gl:
                    return 1
    else:
        start = regions[0][0]
        end = regions[-1][1]
        cons[start:end] = N
        i = start - 1
        while i > start - 1 - int(red * readchar) and i >= 0:
            cons[i] = N
            i -= 1
        j = end + 1
        while j < end + 1 + int(red * readchar) and j < gl:
            cons[j] = N
            j += 1
        if i < 0 and j == gl:
            return 1
    return 0


def _recheck_partial(cons: np.ndarray, counts: np.ndarray, pos: np.ndarray,
                     lens: np.ndarray, accept: np.ndarray) -> int:
    """recheck_partial (Figbird.cpp:4750-4873).

    NOTE: the reference *defines* this guard but never calls it — there is no
    call site anywhere in Figbird.cpp (only the definition at 4750).  It is
    implemented here for component completeness and exposed for opt-in use /
    testing; the default fill path matches the reference by not invoking it.

    Mutates ``cons`` (may N-out a discontinuity) and ``counts`` (zeroes ACGT
    columns around unsupported regions).  Returns:
      -1  "extreme problem" — one-sided coverage or reads wrongly spanning;
       0  characters eroded around a too-small/discontinuous region;
       1  consensus accepted as-is (or full-gap N region already present).
    """
    gap_len = len(cons)
    regions = _find_region(cons)
    ps = np.where(accept, pos, -200)
    rcountleft = int(np.sum(accept & (pos < 0)))
    rcountright = int(np.sum(accept & (pos > 0)))
    readcover = int(np.sum(accept & (pos < 0) & (pos + lens >= gap_len)))

    discont = False
    if len(regions) == 0 and rcountleft > 0 and rcountright > 0 \
            and readcover == 0:
        order = np.argsort(ps, kind="stable")
        sp, sl = ps[order], lens[order]
        for i in range(len(sp) - 1):
            if sp[i] != -200 and sp[i] < 0 and sp[i + 1] > 0:
                diff = sp[i] + sl[i] - sp[i + 1]
                if diff == 0:
                    discont = True
                    cons[int(sp[i + 1])] = N
                    regions = _find_region(cons)
                    break

    if not discont and len(regions) == 0 and (
            readcover > 0 or rcountleft == 0 or rcountright == 0):
        return -1

    if len(regions) > 1:
        start, end = regions[0][0], regions[-1][1]
        counts[start : end + 1, :4] = 0
    elif len(regions) == 1:
        start, end = regions[0]
    else:
        return 1

    min_n = 21
    remove_char = 10
    if not discont and end - start >= min_n and rcountright > 0 \
            and rcountleft > 0:
        return 1
    if discont or end - start < min_n:
        if not discont:
            rem = min_n - end + start
            remove_char = rem // 2 + rem % 2
        lo = max(start - remove_char, 0)
        counts[lo:start, :4] = 0
        hi = min(end + 1 + remove_char, gap_len)
        counts[end + 1 : hi, :4] = 0
    return 0


def _detect_overlap_host(plan: GapPlan, accept, pos, gap_len,
                         saved_pair: list | None = None) -> tuple[int, int]:
    """Host detect_overlap_gapestimate for the finalize pass (5517).

    Returns (ret0, ret1): 300 perfect; max_overlap; 0; ret1=-1 false overlap.
    Mirrors the device ``_detect_overlap_partial``: flank-gated pair
    verification (find_partial_match, 2690-2700), sm_flag spanning match-2/3
    reads in right_cross with shifted common substrings (2704-2722), and
    equal-length common strings required for a pair to count.
    ``saved_pair`` (optional 2-list) receives the winning pair indices.
    """
    seqs = plan.bundle.p_seq
    matches = plan.bundle.p_match
    P = len(seqs)
    sl = plan.side_limit
    lf, rf = plan.left_flank, plan.right_flank
    l_max, r_min = -1 << 20, 1 << 20
    for k in range(P):
        if not accept[k]:
            continue
        p = int(pos[k])
        ln = len(seqs[k])
        reach = min(p + ln, gap_len) - 1
        if matches[k] in (1, 4) or p < 0:
            l_max = max(l_max, reach)
        elif p < gap_len:
            r_min = min(r_min, max(p, 0))
    if l_max == -1 << 20:
        l_max = -1
    if r_min == 1 << 20:
        r_min = gap_len

    def _lflank_ok(k, thresh, min_len):
        """find_partial_match(gap_left, get_read_frag(read, p<0), 0, ...).

        The perfect-read gate (min_len 8) uses <= thresh, the pair gate
        (min_len 4) strict < — mirroring the device _flank_frac's
        0.08 / (0.2 - eps) handling (ADVICE r4 #4: thresh is now used)."""
        p, s = int(pos[k]), seqs[k]
        f = min(-p, sl)
        if f < min_len or len(lf) < f:
            return False
        frag = s[-p - f : -p]
        if len(frag) != f:
            return False
        frac = (lf[-f:] != frag).mean()
        return frac <= thresh if min_len == 8 else frac < thresh

    def _rflank_ok(k, thresh, min_len):
        p, s = int(pos[k]), seqs[k]
        startr = gap_len - p
        if startr < 0 or startr > len(s):
            return False
        f = min(sl, len(s) - startr)
        if f < min_len or len(rf) < f:
            return False
        frag = s[startr : startr + f]
        frac = (rf[:f] != frag).mean()
        return frac <= thresh if min_len == 8 else frac < thresh

    # perfect spanning read (2604-2624) + checkMIM flag (2638)
    for k in range(P):
        if not accept[k]:
            continue
        p, s = int(pos[k]), seqs[k]
        if p < 0 and p + len(s) > gap_len:
            if _lflank_ok(k, 0.08, 8) and _rflank_ok(k, 0.08, 8):
                return 300, 0
    if (plan.perfect_flag == 1 and plan.gap.length <= 20
            and gap_len == plan.perfect_len):
        return 300, 0

    if r_min > l_max:
        return 0, 0
    left_cross = [k for k in range(P) if accept[k] and pos[k] < 0
                  and min(pos[k] + len(seqs[k]), gap_len) - 1 >= r_min
                  and pos[k] + len(seqs[k]) <= gap_len][:1000]
    right_cross = [(k, False) for k in range(P)
                   if accept[k] and 0 < pos[k] <= l_max]
    right_cross += [(k, True) for k in range(P)
                    if accept[k] and pos[k] < 0
                    and pos[k] + len(seqs[k]) > gap_len
                    and matches[k] in (2, 3)]
    right_cross = sorted(right_cross)[:1000]
    max_ov, false_flag = 0, 0
    for i in left_cross:
        for j, sm in right_cross:
            if i == j:
                continue
            p1, l1 = int(pos[i]), len(seqs[i])
            p2, l2 = int(pos[j]), len(seqs[j])
            dg = max(p1 + l1 - gap_len, 0)
            ov = (p1 + l1 - 1) - p2 + 1 - dg
            if ov < 5:
                continue
            if not (_lflank_ok(i, 0.2, 4) and _rflank_ok(j, 0.2, 4)):
                continue
            xabs = -p2 if sm else 0
            cmp_len = ov - xabs
            a1s = l1 - ov + xabs - dg
            if cmp_len <= 0 or a1s < 0 or xabs + cmp_len > l2:
                continue
            cl = seqs[i][a1s : a1s + cmp_len]
            cr = seqs[j][xabs : xabs + cmp_len]
            frac = (cl != cr).mean()
            if frac <= 0.1:
                if cmp_len > max_ov:
                    max_ov = cmp_len
                    if saved_pair is not None:
                        saved_pair[:] = [i, j]
            else:
                false_flag = -1
    if (false_flag == 0 and max_ov >= 5) or (false_flag == -1 and max_ov >= 10):
        return max_ov, 0
    if false_flag == -1 or max_ov < 5:
        if saved_pair is not None:
            saved_pair[:] = [-1, -1]
        return 0, -1
    return 0, 0


def _check_update(cnt_row, qual_row) -> int:
    """check_update (4535-4581): ambiguous-column resolution by quality."""
    order = np.argsort(-cnt_row[:4], kind="stable")
    maxp, sec_p = int(order[0]), int(order[1])
    mx, sec = cnt_row[maxp], cnt_row[sec_p]
    diff = mx - sec
    if diff >= PARTIAL_THRESHOLD:
        if mx > 3 and sec > 3:
            return maxp if qual_row[maxp] <= qual_row[sec_p] else sec_p
        return 50
    else:
        if mx >= 1 and sec >= 1:
            return maxp if qual_row[maxp] <= qual_row[sec_p] else sec_p
        return -1


# ---------------------------------------------------------------- main entry

def _round_up(x, mults=(8, 16, 32, 64, 128, 256, 512, 1024, 2048, 3072)):
    for m in mults:
        if x <= m:
            return m
    return x


# Quantized shape buckets: every (window, read-count) combination maps to one
# of a small fixed set of compiled programs, so compiles are shared across
# gaps, iterations and runs (persistent cache).  Replaces FillGaps.cpp's
# size-aware thread partition (456-649) — here "load balancing" is making
# every gap pay only its own bucket's padded shape.
#
# Buckets are deliberately coarse: padded read rows / window columns are
# nearly free on the MXU, while every extra (gap, count) combination is one
# more XLA compile — and compiles dominate warm-up on tunnel-attached TPUs.
GAP_BUCKETS = (128, 512, 1024, 2048, 4096, 8192)
COUNT_BUCKETS = (128, 1024, 3072)


def _quant(x: int, buckets) -> int:
    for b in buckets:
        if x <= b:
            return b
    return x


def _build_gap_arrays(genome: Genome, plans_sub: list[GapPlan],
                      cfg: FillConfig) -> dict:
    """Per-GAP padded arrays (built & transferred once per bucket).

    The template halves (``left_win``/``right_win``) are stored separately;
    the per-candidate-length window is assembled on device
    (:func:`..fill.em.build_tmpl`), so candidate lengths cost no host work
    and no H2D beyond two int32 vectors.
    """
    G = len(plans_sub)
    L = cfg.L
    RW = cfg.max_gap_len + L
    arr = dict(
        orig_gap=np.zeros(G, np.int32), gap_start=np.zeros(G, np.int32),
        side_limit=np.zeros(G, np.int32),
        perfect_gap=np.zeros(G, np.int32), perfect_gaplen=np.zeros(G, np.int32),
        left_win=np.full((G, cfg.WL), 5, np.int8),
        right_win=np.full((G, RW), 5, np.int8),
        ur=np.full((G, cfg.R, L), GAP_CODE, np.int8),
        u_len=np.zeros((G, cfg.R), np.int32),
        u_pos=np.zeros((G, cfg.R), np.int32),
        u_rev=np.zeros((G, cfg.R), np.int8),
        u_valid=np.zeros((G, cfg.R), bool),
        pr=np.full((G, cfg.P, L), GAP_CODE, np.int8),
        p_len=np.zeros((G, cfg.P), np.int32),
        p_clip=np.zeros((G, cfg.P), np.int32),
        p_match=np.ones((G, cfg.P), np.int32),
        p_pos=np.zeros((G, cfg.P), np.int32),
        p_refpos=np.full((G, cfg.P), -1, np.int32),
        p_valid=np.zeros((G, cfg.P), bool),
        p_qerr=np.zeros((G, cfg.P, L), np.float32),
    )
    for i, plan in enumerate(plans_sub):
        g = plan.gap
        contig = genome.contigs[g.contig]
        arr["orig_gap"][i] = g.length
        arr["gap_start"][i] = g.start
        arr["side_limit"][i] = plan.side_limit
        arr["perfect_gap"][i] = plan.perfect_flag
        arr["perfect_gaplen"][i] = plan.perfect_len
        ls = max(g.start - cfg.WL, 0)
        lchars = contig[ls : g.start]
        arr["left_win"][i, cfg.WL - len(lchars) :] = lchars
        rs = g.start + g.length
        rchars = contig[rs : rs + RW]
        arr["right_win"][i, : len(rchars)] = rchars

        b = plan.bundle
        if cfg.unmapped_mode and b.n_unmapped:
            seq, lens = _pad_reads(b.u_seq, L, cfg.R)
            n = min(b.n_unmapped, cfg.R)
            arr["ur"][i] = seq
            arr["u_len"][i] = lens
            arr["u_pos"][i, :n] = np.asarray(b.u_pos[:n], np.int32)
            arr["u_rev"][i, :n] = np.asarray(b.u_rev[:n], np.int8)
            arr["u_valid"][i, :n] = True
        if b.n_partial:
            seq, lens = _pad_reads(b.p_seq, L, cfg.P)
            n = min(b.n_partial, cfg.P)
            arr["pr"][i] = seq
            arr["p_len"][i] = lens
            arr["p_clip"][i, :n] = np.asarray(b.p_clip[:n], np.int32)
            arr["p_match"][i, :n] = np.asarray(b.p_match[:n], np.int32)
            arr["p_pos"][i, :n] = np.asarray(b.p_pos[:n], np.int32)
            arr["p_refpos"][i, :n] = np.asarray(b.p_refpos[:n], np.int32)
            arr["p_valid"][i, :n] = True
            for k in range(n):
                q = b.p_qual[k]
                arr["p_qerr"][i, k, : min(len(q), L)] = q[:L]
    out = {k: jnp.asarray(v) for k, v in arr.items()}
    # per-gap partial-stack halves, computed once per bucket on device
    # (em.partial_stack_full): removes the stack build from every scan
    # instance (~30% of a dispatch), bit-exactly
    from .em import partial_stack_full_batch

    sl_, sr_, bm_, cm_ = partial_stack_full_batch(
        out["pr"], out["p_clip"], out["p_match"], out["p_len"],
        out["p_valid"], cfg.L)
    out["stackL"], out["stackR"] = sl_, sr_
    out["stack_base_max"], out["stack_clip_max"] = bm_, cm_
    return out


def _probe_lengths(orig: int) -> list[int]:
    """checkGapReads probe grid (Figbird.cpp:6121-6153)."""
    if orig < 30:
        step = 10 if orig < 15 else 20
        return list(range(0, 80, step))
    return [orig // 2, orig, 2 * orig, 3 * orig]


def fill_gaps(
    genome: Genome,
    gaps: list[GapInfo],
    bundles: list[GapBundle],
    model: ErrorModel,
    partial_mode: bool,
    partial_len: int,
    neg_overlap: int = 30,
    read_len: int | None = None,
    em_iters_unmapped: int = 48,
    instance_batch: int | None = None,
    # stride-sampled candidate-length budget.  Default: 96 in partial mode
    # (identical strings to the UNCAPPED scan on the E. coli bench dataset,
    # re-checked by bench.py's outputs_equal every run) and UNCAPPED (0) in
    # unmapped mode — the reference's plateau exit there is 50 consecutive
    # non-improving lengths (Figbird.cpp:6258 jump branch), so nearly every
    # candidate is evaluated and stride sampling DID change 6/50 bench gap
    # strings (r5 bisect); the block-lazy replay reproduces the plateau
    # exit instead.
    max_scan_lengths: int | None = None,
    scan_block: int = 64,
    mesh=None,
    reference_exact: bool = False,
    exact_soft: bool | None = None,
    soft_levels: int | None = None,
) -> FillResult:
    """Fill all gaps for one iteration (one FillGaps.cpp run equivalent).

    ``reference_exact=True`` disables every throughput cap that could diverge
    from the reference's exhaustive behaviour: the candidate-length scan cap
    (``max_scan_lengths``), the overlap-bonus pair cap, and f32 soft-count
    underflow (``exact_soft`` cascade) — used by the golden parity tests.

    ``exact_soft``: ``None``/``True`` (production default) = the full
    6-level double-range cascade on every dispatch — bit-identical to the
    reference's C-double soft accumulation by construction (the
    golden-parity configuration; ~2.2x the plain-f32 scan cost, v5e).
    ``"hybrid"`` (experimental) = fast 3-level mini-cascade in length-scan/
    probe dispatches, exact cascade in every output-producing dispatch
    (winner/orig/second re-runs, finalize) — measured r5: scan-precision
    knife-edges flip candidate-length choices (1/50 bench p gaps), so this
    is NOT precision-equal in general.  ``"auto"`` = lazy escalation (fast
    pass + underflow detection + exact re-runs of flagged instances; kept
    for experiments — detection flags ~94% of scan instances, so it costs
    more than exact-everywhere).  ``False`` = plain f32 only, no detection
    (bench.py's precision-attribution trial).
    """
    if exact_soft is None:
        exact_soft = True
    prec_escalate = exact_soft == "auto"
    use_exact_soft = exact_soft in (True, "hybrid")
    # "hybrid" (experimental, NOT default): length-SCAN dispatches (incl.
    # probes) run the fast mini-cascade; every output-producing dispatch
    # (winner/orig/second re-run, finalize) runs the full exact cascade.
    # Measured r5: scan-precision knife-edges DO flip candidate-length
    # choices (1/50 bench p gaps diverged), so the production default keeps
    # the exact cascade in the scan too.
    scan_fast = exact_soft == "hybrid"
    if soft_levels is None:
        # fast-path mini-cascade depth (em.FillConfig.soft_levels): 3 levels
        # stack into ONE accumulate matmul (_CASCADE_GROUP), so the flag
        # threshold drops to e^(78-3*140) ~ 1e-146 at near-m=1 cost;
        # explicit exact_soft=False (attribution trials) keeps plain f32
        import os as _os

        soft_levels = 1 if exact_soft is False else int(
            _os.environ.get("FIGBIRD_SOFT_LEVELS", "3"))
    if max_scan_lengths is None:
        max_scan_lengths = 96 if partial_mode else 0
    if reference_exact:
        max_scan_lengths = 0
        em_iters_unmapped = 200  # reference num_itr (Figbird.cpp:6225)
    # NOTE: measured on the E. coli bench — capped scans still early-exit
    # enough (4.6k of 7.5k candidates evaluated) that block-lazy waves beat
    # one-shot dispatch despite the extra tunnel syncs; keep scan_block.
    if instance_batch is None:
        # tunnel-attached TPUs are dispatch-latency-bound: big batches;
        # CPU (tests) pays padded compute for real: small batches
        instance_batch = 768 if jax.default_backend() == "tpu" else 64
    n_gaps = len(gaps)
    out_strings: list[np.ndarray] = [None] * n_gaps
    gaptofill = np.zeros(n_gaps, np.int64)
    placements: list = [[] for _ in range(n_gaps)]
    second_best: list = [None] * n_gaps
    stats = {"skipped": 0, "neg_merged": 0, "filled": 0, "scan_instances": 0,
             "buckets": 0}

    import time as _time

    _t0 = _time.time()
    plans = plan_gaps(genome, gaps, bundles, partial_mode, partial_len,
                      neg_overlap, max_scan_lengths)
    stats["t_plan"] = round(_time.time() - _t0, 3)
    mim = np.asarray([(p.perfect_flag, p.perfect_len) for p in plans],
                     np.int64).reshape(n_gaps, 2)

    active: list[int] = []
    for gi, plan in enumerate(plans):
        if plan.skip:
            out_strings[gi] = np.full(plan.gap.length, N, np.int8)
            stats["skipped"] += 1
        elif plan.neg_merge > 0:
            out_strings[gi] = np.zeros(0, np.int8)
            gaptofill[gi] = plan.neg_merge
            stats["neg_merged"] += 1
        else:
            active.append(gi)

    if not active:
        return FillResult(out_strings, gaptofill, stats, mim=mim)

    # ---- shape buckets ---------------------------------------------------
    L = int(read_len or max(
        max((len(s) for p in (plans[i] for i in active)
             for s in (p.bundle.p_seq + p.bundle.u_seq)), default=100), 50))

    def _bucket_key(gi):
        plan = plans[gi]
        need_g = max(max(plan.lengths, default=plan.gap.length),
                     plan.gap.length,
                     max(_probe_lengths(plan.gap.length))
                     if (not partial_mode and not plan.large_gap
                         and plan.gap.length <= GAPTHRESH) else 0)
        gb = _quant(need_g, GAP_BUCKETS)
        pb = _quant(max(plan.bundle.n_partial, 1), COUNT_BUCKETS)
        rb = 1 if partial_mode else _quant(max(plan.bundle.n_unmapped, 1),
                                           COUNT_BUCKETS)
        return (gb, pb, rb, plan.large_gap)

    buckets: dict[tuple, list[int]] = {}
    for gi in active:
        buckets.setdefault(_bucket_key(gi), []).append(gi)
    stats["buckets"] = len(buckets)
    stats["bucket_shapes"] = {str(k): len(v) for k, v in buckets.items()}
    logger.info("fill buckets: %s", stats["bucket_shapes"])

    marr = _model_arrays(model, L)
    for (gb, pb, rb, large), gids in sorted(buckets.items()):
        cfg = FillConfig(
            W=L + gb + L, Wp=L + gb, L=L, WL=L, max_gap_len=gb, R=rb, P=pb,
            partial_mode=partial_mode, unmapped_mode=not partial_mode,
            em_iters=3 if partial_mode else em_iters_unmapped,
            gap_prob_cutoff=float(model.gap_prob_cutoff),
            insert_tmin=int(model.insert_threshold_min),
            insert_tmax=int(model.insert_threshold_max),
            bonus_cap=pb if reference_exact else 24,
            exact_soft=use_exact_soft,
            detect_prec=prec_escalate,
            soft_levels=soft_levels,
        )
        # memory-capped instance batch: live bytes per instance scale with
        # read count x (read one-hots + weight mats — the exact-cascade
        # re-runs stack _CASCADE_GROUP levels per matmul, the worst case);
        # cap the batch near 1.5 GB of HBM so big-count buckets shrink but
        # common buckets dispatch in large, low-overhead batches
        from .em import _CASCADE_GROUP as _CG

        per_inst = max(pb, rb) * (5 * cfg.L + (1 + _CG) * cfg.Wp) * 8
        ib = max(4, min(instance_batch, int(1.5e9) // max(per_inst, 1)))
        if mesh is not None:  # instance axis must divide over the mesh
            nrd = mesh.shape["reads"]
            ib = -(-ib // nrd) * nrd
        _fill_bucket(genome, plans, gids, cfg, marr, large, partial_mode,
                     ib, scan_block, out_strings, placements, stats,
                     second_best, mesh=mesh,
                     staged_scan=not reference_exact,
                     prec_escalate=prec_escalate,
                     scan_fast=scan_fast, scan_soft_levels=soft_levels)
    logger.info("fill timers: %s scan_instances=%d",
                {k: v for k, v in stats.items() if k.startswith("t_")},
                stats.get("scan_instances", 0))

    return FillResult(out_strings, gaptofill, stats, placements, second_best,
                      mim=mim)


def _fill_bucket(genome, plans, gids, cfg, marr, large_flag, partial_mode,
                 instance_batch, scan_block, out_strings, placements, stats,
                 second_best=None, mesh=None, staged_scan=True,
                 prec_escalate=False, scan_fast=False, scan_soft_levels=3):
    """Scan + winner re-run + finalize for one shape bucket.

    Tunnel-aware phasing: every D2H transfer pays a ~0.3 s fixed cost on a
    tunnel-attached TPU, so each phase fetches ONE packed array:

    1. SCAN — all candidate lengths dispatched in fixed-size batches whose
       packed (IB, 8) replay scalars accumulate into a device buffer; one
       fetch per wave, then the reference's sequential early-exit logic
       replays on host (fillGap 6398-6478).
    2. WINNER RE-RUN — the chosen and original lengths re-run with full
       outputs (consensus/accept/pos/saved) as one packed matrix.
    3. FINALIZE — re-placement against the best string; counts/flags packed.
    4. host guard battery (unchanged).
    """
    import time as _time

    from ..fill.em import (fill_batch_full_packed, fill_batch_scan,
                           finalize_batch_packed, finalize_packed_layout,
                           full_packed_layout)

    _t0 = _time.time()
    gap_arrays = _build_gap_arrays(genome, [plans[g] for g in gids], cfg)
    stats["t_build"] = stats.get("t_build", 0) + round(_time.time() - _t0, 3)
    row_of = {gi: r for r, gi in enumerate(gids)}

    if mesh is not None:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _shd = NamedSharding(mesh, _P("reads"))
        gap_arrays = _jax.device_put(gap_arrays, NamedSharding(mesh, _P()))
        marr = _jax.device_put(marr, NamedSharding(mesh, _P()))
        put_i = lambda x: None if x is None else _jax.device_put(x, _shd)
    else:
        put_i = lambda x: x
    # converge-or-escalate staging for the unmapped EM while-loop: a batch
    # runs until its SLOWEST lane converges (comp stable 5x) or hits the
    # cap, so most dispatches pay tail-lane depth.  Stage 1 runs everyone
    # with an 8-iteration cap; lanes that bail re-run from scratch at the
    # full cap, and lanes STILL bailed there at the reference's num_itr=200
    # (Figbird.cpp:6225) — identical trajectories, so converged-lane outputs
    # are bit-equal to a single full-cap pass.  reference_exact skips
    # staging.  ``prec_escalate``: lanes whose fast f32 soft-count pass
    # flagged underflow risk re-run with the exact cascade (em.FillConfig
    # .detect_prec; VERDICT r4 #1) — the escalated trajectory is the
    # golden-verified exact_soft one.
    STAGE_ITERS = 8
    REF_EM_ITERS = 200
    staged = (not partial_mode and staged_scan
              and cfg.em_iters > STAGE_ITERS)
    from dataclasses import replace as _replace_cfg

    # precision bases: scan tiers may run the fast mini-cascade (hybrid
    # mode); re-run tiers ("x" prefix) and finalize always run cfg (exact
    # when the production default) — the scan only selects lengths/replay
    # scalars, the re-run produces every output string
    _scan_base = (_replace_cfg(cfg, exact_soft=False, detect_prec=False,
                               soft_levels=scan_soft_levels)
                  if scan_fast else cfg)
    _tier_cfgs = {"full": _scan_base, "xfull": cfg}
    if staged:
        _tier_cfgs["fast"] = _replace_cfg(_scan_base, em_iters=STAGE_ITERS)
        _tier_cfgs["xfast"] = _replace_cfg(cfg, em_iters=STAGE_ITERS)

    def _cfg_for(tier: str) -> FillConfig:
        c = _tier_cfgs.get(tier)
        if c is None:
            if tier.startswith("exact"):
                base = _replace_cfg(cfg, exact_soft=True, detect_prec=False)
            elif tier.startswith("x"):
                base = cfg
            else:
                base = _scan_base
            iters = REF_EM_ITERS if tier.endswith("200") \
                else max(cfg.em_iters, 1)
            c = _replace_cfg(base, em_iters=iters)
            _tier_cfgs[tier] = c
        return c

    _tier0 = "fast" if staged else "full"
    _rtier0 = "xfast" if staged else "xfull"

    # width classes for scan/probe dispatches: every legal placement of a
    # candidate length ``glen`` lives in window offsets [WL-L, WL+glen+L)
    # (_legal_unmapped rng / the partial bands), so an instance with
    # glen <= gbs runs BIT-IDENTICALLY in a cfg resized to max_gap_len=gbs
    # — same formulas, smaller W.  The bucket's gb is the per-GAP maximum
    # over its whole scan; most candidates are far shorter (all 50 bench u
    # gaps landed in gb=512 while 2/3 of candidates fit 128), so dispatching
    # each wave at the tightest class cuts the scan's padded compute ~2x.
    _w_classes = sorted({w for w in GAP_BUCKETS if w < cfg.max_gap_len}
                        | {cfg.max_gap_len})

    def _wclass(ln: int) -> int:
        for w in _w_classes:
            if ln <= w:
                return w
        return cfg.max_gap_len

    def _cfg_for_w(tier: str, width: int) -> FillConfig:
        key = (tier, width)
        c = _tier_cfgs.get(key)
        if c is None:
            base = _cfg_for(tier)
            c = base if width == cfg.max_gap_len else _replace_cfg(
                base, max_gap_len=width, W=cfg.L + width + cfg.L,
                Wp=cfg.L + width)
            _tier_cfgs[key] = c
        return c

    def run_scan(gi_, gl_, tier="full", width=None):
        c = _cfg_for_w(tier, width or cfg.max_gap_len)
        return fill_batch_scan(c, gap_arrays, put_i(gi_),
                               put_i(gl_), marr, finalize_flag=large_flag)

    # checkGapReads probes run with finalize extras ON but no large-gap
    # break (run(i,fp,g,1,1) — Figbird.cpp:6097)
    def run_probe(gi_, gl_, tier="full", width=None):
        c = _cfg_for_w(tier, width or cfg.max_gap_len)
        return fill_batch_scan(c, gap_arrays, put_i(gi_),
                               put_i(gl_), marr, finalize_flag=True,
                               large_break=False)

    def run_full(gi_, gl_, tier="full", width=None):
        # full-packed outputs are layout-dependent on max_gap_len — the
        # caller groups instances per width class and parses with that
        # class's full_packed_layout
        c = _cfg_for_w(tier, width or cfg.max_gap_len)
        return fill_batch_full_packed(c, gap_arrays, put_i(gi_),
                                      put_i(gl_), marr,
                                      finalize_flag=large_flag)

    run_fin = lambda gi_, gl_, bs, sv, svl, svr, width: \
        finalize_batch_packed(
            _cfg_for_w("xfull", width), gap_arrays, put_i(gi_), put_i(gl_),
            marr, put_i(bs), put_i(sv), put_i(svl), put_i(svr))

    nb = instance_batch

    def _pad_chunk(r, le, width=None):
        width = width or nb
        pad = width - len(r)
        gi_ = jnp.asarray(np.asarray(list(r) + [0] * pad, np.int32))
        gl_ = jnp.asarray(np.asarray(list(le) + [1] * pad, np.int32))
        return gi_, gl_

    def _chunk_sizes(m: int, batch: int):
        """Chunk m instances: full ``batch`` chunks + ONE rounded-up tail
        from a fixed ladder (bounds both padded compute — a 118-lane
        escalation wave used to pad to the full 494 batch, 4x its work —
        and program count)."""
        ladder = [s for s in (64, 128, 256) if s < batch]
        out = []
        while m > 0:
            if m >= batch:
                out.append(batch)
                m -= batch
            else:
                out.append(next((s for s in ladder if m <= s), batch))
                m = 0
        return out

    def _dispatch_rows(fn, rows, lens, tier, batch, widths=False,
                       t_disp=None, t_get=None):
        """Dispatch (row, len) instances; returns the packed (n, C) host
        matrix in input order.  ``widths=True`` partitions instances into
        the tightest width class (scan/probe programs only — identical
        results at any width >= the candidate length, see _w_classes)."""
        n = len(rows)
        if not n:
            return np.zeros((0, 1), np.float32)
        if widths and len(_w_classes) > 1:
            cls = np.asarray([_wclass(l) for l in lens])
            groups = [(w, np.flatnonzero(cls == w)) for w in _w_classes
                      if int(np.sum(cls == w))]
        else:
            groups = [(None, np.arange(n))]
        _td = _time.time()
        parts = []
        for w, idx in groups:
            c0 = 0
            for sz in _chunk_sizes(len(idx), batch):
                sel = idx[c0 : c0 + sz]
                c0 += sz
                gi_, gl_ = _pad_chunk([rows[i] for i in sel],
                                      [lens[i] for i in sel], sz)
                parts.append((sel, fn(gi_, gl_, tier=tier, width=w)))
        if t_disp:
            stats[t_disp] = stats.get(t_disp, 0) + round(
                _time.time() - _td, 3)
        _td = _time.time()
        hosts = jax.device_get([p for _, p in parts])
        out = None
        for (sel, _), h in zip(parts, hosts):
            h = np.asarray(h)
            if out is None:
                out = np.zeros((n, h.shape[1]), h.dtype)
            out[sel] = h[: len(sel)]
        if t_get:
            stats[t_get] = stats.get(t_get, 0) + round(_time.time() - _td, 3)
        return out

    def _escalate(fn, rows, lens, host, bail_col, prec_col, batch, label,
                  xtier=False, widths=False):
        """Escalation chain, in place on ``host``:
        bailed -> full-cap -> 200-cap;  prec -> exact (-> exact 200-cap).
        ``xtier``: use the exact-precision ("x") tier family (re-runs)."""
        pre = "x" if xtier else ""

        def _rerun(sel, tier, counter):
            if not sel.size:
                return
            _td = _time.time()
            sub = _dispatch_rows(fn, [rows[i] for i in sel],
                                 [lens[i] for i in sel], tier, batch,
                                 widths=widths)
            host[sel] = sub
            stats[counter] = stats.get(counter, 0) + int(sel.size)
            stats["t_scan_esc"] = stats.get("t_scan_esc", 0) + round(
                _time.time() - _td, 3)

        if staged:
            _rerun(np.flatnonzero(host[:, bail_col] != 0), pre + "full",
                   f"esc_full_{label}")
            _rerun(np.flatnonzero(host[:, bail_col] != 0), pre + "full200",
                   f"esc_200_{label}")
        if prec_escalate:
            _rerun(np.flatnonzero(host[:, prec_col] != 0), "exact",
                   f"esc_exact_{label}")
            if not partial_mode:
                _rerun(np.flatnonzero(host[:, bail_col] != 0), "exact200",
                       f"esc_exact200_{label}")
        left = int(np.sum(host[:, bail_col] != 0))
        if left and (staged or prec_escalate):
            logger.warning(
                "%s: %d lanes still unconverged at the reference 200-"
                "iteration cap (accepted, matching num_itr=200 behaviour)",
                label, left)

    def scan_wave(rows, lens, probe=False):
        """Dispatch a wave of scan instances; one list fetch (the packed
        (IB, SCAN_COLS) outputs are tiny, and a donated device accumulator
        measured 3x SLOWER on the tunnel backend — donation serialises
        dispatches).  With staging on, unmapped instances run the
        8-iteration program first and only bailed lanes pay deeper
        programs; prec-flagged lanes re-run with the exact cascade.
        Returns (n, SCAN_COLS)."""
        fn = run_probe if probe else run_scan
        host = _dispatch_rows(fn, rows, lens, _tier0, nb, widths=True,
                              t_disp="t_scan_disp", t_get="t_scan_get")
        stats["scan_instances"] += len(rows)
        _escalate(fn, rows, lens, host, 7, 8, nb,
                  "probe" if probe else "scan", widths=True)
        return host

    # ---- read-count probe for small unmapped gaps (checkGapReads) --------
    if not partial_mode:
        probe_rows, probe_lens, probe_owner = [], [], []
        for gi in gids:
            plan = plans[gi]
            if plan.large_gap or plan.gap.length > GAPTHRESH or plan.side_flag:
                continue
            pls = _probe_lengths(plan.gap.length)
            probe_rows += [row_of[gi]] * len(pls)
            probe_lens += pls
            probe_owner += [gi] * len(pls)
        if probe_rows:
            hostp = scan_wave(probe_rows, probe_lens, probe=True)
            probe_acc: dict[int, list] = {}
            for t, gi in enumerate(probe_owner):
                probe_acc.setdefault(gi, []).append(int(hostp[t, 1]))
            for gi, counts in probe_acc.items():
                strict_gt = plans[gi].gap.length < 30
                logger.info("probe gap %d lens %s used %s",
                            gi, _probe_lengths(plans[gi].gap.length), counts)
                thresh = 3
                enough = any((c > thresh) if strict_gt else (c >= thresh)
                             for c in counts)
                if not enough:
                    # less_read_flag==1 -> finalize at the original length
                    # with zero saved-flags (no reads accepted)
                    plans[gi].lengths = [plans[gi].gap.length]
                    plans[gi].less_read = True

    # ---- block-lazy length scan (packed scalars only) --------------------
    acc = {gi: [] for gi in gids}   # rows of the packed scan matrix
    evl = {gi: [] for gi in gids}
    nxt = {gi: 0 for gi in gids}
    done = {gi: False for gi in gids}
    replayed = {}

    def _replay_gap(gi):
        plan = plans[gi]
        a = np.asarray(acc[gi])
        prefix = len(a)
        lik = a[:, 0]
        valid = a[:, 1].astype(np.int64)
        gext = None
        if not partial_mode:
            edge = (a[:, 3] != 0) | (a[:, 4] != 0) | (a[:, 5] != 0)
            gext = {"edge": edge, "discont": a[:, 2] != 0}
        return _replay_scan(plan.lengths[:prefix], lik, valid,
                            plan.gap.length, partial_mode, gext) + (prefix,)

    while True:
        rows, lens, owners = [], [], []
        for gi in gids:
            if done[gi]:
                continue
            plan = plans[gi]
            block = plan.lengths[nxt[gi] : nxt[gi] + scan_block]
            rows += [row_of[gi]] * len(block)
            lens += block
            owners += [gi] * len(block)
            nxt[gi] += len(block)
        if not rows:
            break
        host = scan_wave(rows, lens)
        for t, gi in enumerate(owners):
            acc[gi].append(host[t])
            evl[gi].append(lens[t])
        for gi in dict.fromkeys(owners):
            best_j, n_eval, varied, exited, second_j, prefix = _replay_gap(gi)
            if exited or nxt[gi] >= len(plans[gi].lengths):
                done[gi] = True
                replayed[gi] = (best_j, n_eval, varied, second_j)

    # the original length is needed whenever a guard falls back to it
    extra_rows, extra_lens, extra_owner = [], [], []
    orig_eval_j = {}
    for gi in gids:
        plan = plans[gi]
        oj = plan.lengths.index(plan.gap.length)
        if oj < len(acc[gi]):
            orig_eval_j[gi] = oj
        else:
            orig_eval_j[gi] = None
            extra_rows.append(row_of[gi])
            extra_lens.append(plan.gap.length)
            extra_owner.append(gi)
    if extra_rows:
        host = scan_wave(extra_rows, extra_lens)
        for t, gi in enumerate(extra_owner):
            acc[gi].append(host[t])
            evl[gi].append(extra_lens[t])
            orig_eval_j[gi] = len(acc[gi]) - 1

    # ---- optional scan trace (debug/profiling; see utils/trace.py) -------
    import os as _os

    _trace_path = _os.environ.get("FIGBIRD_SCAN_TRACE")
    if _trace_path:
        import json as _json

        with open(_trace_path, "a") as _fh:
            for gi in gids:
                a = np.asarray(acc[gi])
                best_j, n_eval, varied, second_j = replayed[gi]
                _fh.write(_json.dumps({
                    "gap": gi, "start": int(plans[gi].gap.start),
                    "orig": int(plans[gi].gap.length),
                    "lengths": [int(x) for x in evl[gi]],
                    "lik": [float(x) for x in a[:, 0]],
                    "valid": [int(x) for x in a[:, 1]],
                    "best_j": int(best_j), "n_eval": int(n_eval),
                    "varied": bool(varied)}) + "\n")

    # ---- per-gap decision ------------------------------------------------
    chosen = {}
    for gi in gids:
        plan = plans[gi]
        a = np.asarray(acc[gi])
        valid = a[:, 1].astype(np.int64)
        best_j, n_eval, varied, second_j = replayed[gi]
        orig_j = orig_eval_j[gi]
        if not partial_mode:
            if not varied and not plan.side_flag:
                best_j = orig_j  # check_change==0 -> original (6533)
        else:
            if valid[best_j] == 0:
                best_j = orig_j
        chosen[gi] = (best_j, orig_j, second_j)

    # ---- winner + original re-run (full packed outputs) ------------------
    # width-classed like the scan: each GAP gets the tightest class that
    # covers every length it re-runs (and finalizes) at — bit-identical
    # (see _w_classes), and at chr14's 5k gaps it cuts the padded re-run/
    # finalize compute 2-3x.  Consensus/counts pad back to the bucket
    # width on host (rows past the class are N / zero in the full program
    # too: zero counts -> consensus N).
    cls_of = {}
    rr_need = {}
    for gi in gids:
        best_j, orig_j, second_j = chosen[gi]
        need = {("best", evl[gi][best_j]), ("orig", evl[gi][orig_j])}
        if second_best is not None and 0 <= second_j < len(evl[gi]):
            need.add(("second", evl[gi][second_j]))
        rr_need[gi] = sorted(need)
        cls_of[gi] = _wclass(max(ln for _, ln in need))
    _td = _time.time()
    # 2-3 instances per gap: pad to a small fixed batch
    nbr = min(nb, 256)
    rr = {}
    for wcls in _w_classes:
        gsub = [gi for gi in gids if cls_of[gi] == wcls]
        if not gsub:
            continue
        rr_rows, rr_lens, rr_key = [], [], []
        for gi in gsub:
            for tag, ln in rr_need[gi]:
                rr_rows.append(row_of[gi])
                rr_lens.append(ln)
                rr_key.append((gi, tag, ln))
        fn_w = (lambda gi_, gl_, tier="full", width=None, _w=wcls:
                run_full(gi_, gl_, tier, _w))
        lay = full_packed_layout(_cfg_for_w("xfull", wcls))
        rr_host = _dispatch_rows(fn_w, rr_rows, rr_lens, _rtier0, nbr)
        _escalate(fn_w, rr_rows, rr_lens, rr_host,
                  lay["bailed"][0], lay["prec"][0], nbr, "rerun",
                  xtier=True)
        pad_c = cfg.max_gap_len - wcls
        for t, (gi, tag, ln) in enumerate(rr_key):
            row = rr_host[t]

            def col(name):
                s, e = lay[name]
                return row[s:e]

            cons = col("consensus").astype(np.int8)
            if pad_c:
                cons = np.concatenate(
                    [cons, np.full(pad_c, 4, np.int8)])
            rr[(gi, tag)] = dict(
                consensus=cons,
                accept=col("accept") > 0.5,
                pos=col("pos").astype(np.int32),
                saved_l=int(col("saved_l")[0]),
                saved_r=int(col("saved_r")[0]),
                region_perct=float(col("region_perct")[0]), length=ln)
    stats["t_rerun"] = stats.get("t_rerun", 0) + round(_time.time() - _td, 3)
    for gi in gids:
        best_j, orig_j, second_j = chosen[gi]
        if second_best is not None and (gi, "second") in rr:
            sb = rr[(gi, "second")]
            second_best[gi] = (sb["length"], sb["consensus"].copy())

    # ---- finalize (packed), width-classed like the re-runs ---------------
    _tf = _time.time()
    fin_parsed = {}
    for wcls in _w_classes:
        gsub = [gi for gi in gids if cls_of[gi] == wcls]
        if not gsub:
            continue
        cfg_w = _cfg_for_w("xfull", wcls)
        flay = finalize_packed_layout(cfg_w)
        fin_rows, fin_lens, fin_best, fin_sv, fin_svl, fin_svr, fin_gis = (
            [], [], [], [], [], [], [])
        for gi in gsub:
            plan = plans[gi]
            b = rr[(gi, "best")]
            fin_gis.append(gi)
            fin_rows.append(row_of[gi])
            fin_lens.append(b["length"])
            fin_best.append(b["consensus"][:wcls])
            if not partial_mode and (plan.less_read or plan.side_flag):
                # saved_reads never set (Figbird.cpp:1709 vs 6369) -> no
                # accepts
                fin_sv.append(np.zeros_like(b["accept"], np.int8))
            else:
                fin_sv.append(b["accept"].astype(np.int8))
            fin_svl.append(b["saved_l"])
            fin_svr.append(b["saved_r"])
        fin_dev = []
        # finalize runs once per GAP: full nb-sized chunks amortise
        # dispatch (at chr14's 4-5k gaps per bucket, 64-wide batches cost
        # 24 s of pure dispatch overhead), with a rounded-up ladder tail
        # so a 50-gap bucket still doesn't pad to the full batch
        c0 = 0
        for nbf in _chunk_sizes(len(fin_rows), nb):
            sl = slice(c0, c0 + nbf)
            c0 += nbf
            m = len(fin_rows[sl])
            pad = nbf - m
            gi_ = jnp.asarray(np.asarray(list(fin_rows[sl]) + [0] * pad,
                                         np.int32))
            gl_ = jnp.asarray(np.asarray(list(fin_lens[sl]) + [1] * pad,
                                         np.int32))
            best = np.stack(fin_best[sl])
            if pad:
                best = np.concatenate(
                    [best, np.full((pad,) + best.shape[1:], 4, best.dtype)])
            sv = np.stack(fin_sv[sl])
            if pad:
                sv = np.concatenate([sv, np.zeros((pad,) + sv.shape[1:],
                                                  np.int8)])
            svl = np.asarray(fin_svl[sl] + [-1] * pad, np.int32)
            svr = np.asarray(fin_svr[sl] + [-1] * pad, np.int32)
            fin_dev.append(run_fin(gi_, gl_, jnp.asarray(best),
                                   jnp.asarray(sv), jnp.asarray(svl),
                                   jnp.asarray(svr), wcls))
        fin_host = np.concatenate(
            [np.asarray(x) for x in jax.device_get(fin_dev)]
        )[: len(fin_rows)]
        gpad = cfg.max_gap_len - wcls
        for t, gi in enumerate(fin_gis):
            row = fin_host[t]

            def fcol(name):
                s, e = flay[name]
                return row[s:e]

            counts = fcol("counts").reshape(wcls, 5).copy()
            if gpad:
                counts = np.concatenate(
                    [counts, np.zeros((gpad, 5), counts.dtype)])
            fin = dict(
                counts=counts,
                accept=fcol("accept") > 0.5,
                pos=fcol("pos").astype(np.int32),
                used=int(fcol("used")[0]))
            if partial_mode:
                q = fcol("qual").reshape(wcls, 5)
                if gpad:
                    q = np.concatenate([q, np.zeros((gpad, 5), q.dtype)])
                fin["qual"] = q
            else:
                fin["left_right_check"] = fcol("left_right_check") > 0.5
                fin["umax_left"] = int(fcol("umax_left")[0])
                fin["umax_right"] = int(fcol("umax_right")[0])
                fin["left_start_zero"] = bool(fcol("left_start_zero")[0])
                fin["right_fin_glen"] = bool(fcol("right_fin_glen")[0])
            fin_parsed[gi] = (fin, fin_lens[t])
    stats["t_finalize"] = stats.get("t_finalize", 0) + round(
        _time.time() - _tf, 3)

    # ---- host guard battery ---------------------------------------------
    _tg = _time.time()
    for gi in gids:
        plan = plans[gi]
        fin, best_len = fin_parsed[gi]
        o = rr[(gi, "orig")]
        if partial_mode:
            s = _finish_partial(plan, best_len, cfg, fin,
                                o["accept"], o["pos"])
        else:
            s = _finish_unmapped(plan, best_len, cfg, fin,
                                 o["accept"], o["pos"],
                                 rr[(gi, "best")]["region_perct"])
        out_strings[gi] = s
        stats["filled"] += 1
        seqs = (plan.bundle.p_seq if partial_mode else plan.bundle.u_seq)
        facc = fin["accept"]
        pp = fin["pos"]
        placements[gi] = [(int(k), int(pp[k]), seqs[k])
                          for k in range(len(seqs)) if facc[k]]
    stats["t_guard"] = stats.get("t_guard", 0) + round(_time.time() - _tg, 3)



def _finish_unmapped(plan, best_len, cfg, fin, orig_accept, orig_pos,
                     region_perct):
    """finalize guard battery, unmapped (5415-5507 + 5619-5641)."""
    g = plan.gap
    counts = fin["counts"].copy()
    accept = fin["accept"]
    pos = fin["pos"]
    lens = np.array([len(s) for s in plan.bundle.u_seq]
                    + [0] * (accept.shape[0] - plan.bundle.n_unmapped))
    used = int(fin["used"])
    lr = fin["left_right_check"]
    umax_l, umax_r = int(fin["umax_left"]), int(fin["umax_right"])
    lsz, rfg = bool(fin["left_start_zero"]), bool(fin["right_fin_glen"])
    thresh = 4
    nflag = [False, False]
    lflag = [False, False]
    gap_len = best_len

    if ((0 < umax_l < 2 * thresh) or (0 < umax_r < 2 * thresh)) and \
            region_perct > 0.75:
        used = 0
    if (0 < umax_l < thresh) or (0 < umax_r < thresh):
        cons = _host_consensus(counts, gap_len)
        rc = len(_find_region(cons))
        if rc >= 1:
            if 0 < umax_l < thresh:
                lflag[0] = True
            if 0 < umax_r < thresh:
                lflag[1] = True
        else:
            used = 0
            umax_l = umax_r = -1
    if not lr[0] and not lr[1] and used != 0:
        used = 0
        umax_l = umax_r = -1
    if (not lr[0] and lsz) or (not lr[1] and rfg):
        cons = _host_consensus(counts, gap_len)
        if len(_find_region(cons)) >= 1:
            nflag[0] = not lr[0]
            nflag[1] = not lr[1]

    recompute = False
    if used == 0 or not (lr[0] and lr[1]):
        gap_len = g.length
        counts = np.zeros((cfg.max_gap_len, 5), np.float32)
        # recompute2 from original-length placements (5495-5506)
        if ((not lr[0] and lr[1] and umax_r >= thresh)
                or (lr[0] and not lr[1] and umax_l >= thresh)):
            recompute = True
            for k in range(plan.bundle.n_unmapped):
                if orig_accept[k]:
                    p = int(orig_pos[k])
                    s = plan.bundle.u_seq[k]
                    for j in range(len(s)):
                        if 0 <= p + j < gap_len and s[j] < 4:
                            counts[p + j, s[j]] += 1

    cons = _host_consensus(counts, gap_len)
    if lr[0] or lr[1] or used != 0:
        if nflag[0] or lflag[0]:
            cons[0] = N
        if (nflag[1] or lflag[1]) and gap_len > 0:
            cons[gap_len - 1] = N
        src_accept = orig_accept if recompute else accept
        src_pos = orig_pos if recompute else pos
        clear = _recheck_sequence(cons, src_pos[: len(lens)], lens,
                                  src_accept[: len(lens)], g.length,
                                  region_perct)
        if clear:
            return np.full(g.length, N, np.int8)
    return cons[:gap_len]


def _finish_partial(plan, best_len, cfg, fin, orig_accept, orig_pos):
    """finalize guard battery, partial (5512-5609)."""
    g = plan.gap
    counts = fin["counts"].copy()
    qual = fin["qual"]
    accept = fin["accept"]
    pos = fin["pos"]
    used = int(fin["used"])
    gap_len = best_len

    ret0, ret1 = _detect_overlap_host(plan, accept, pos, gap_len)
    dg = g.length - gap_len
    if dg > 0 and ret0 > 0:
        case = 1
    elif dg > 0 and ret0 == 0:
        case = 2
    elif dg < 0 and ret0 > 0:
        case = 3
    elif dg < 0 and ret0 == 0:
        case = 4
    else:
        case = 5

    u_flag = 1
    if used < PARTIAL_THRESHOLD or case in (2, 4):
        gap_len = g.length
        counts = np.zeros((cfg.max_gap_len, 5), np.float32)
        if used < PARTIAL_THRESHOLD or case == 4:
            u_flag = 0
        else:  # case 2: recompute1 from original-length placements (5566-5582)
            for k in range(plan.bundle.n_partial):
                if orig_accept[k]:
                    p = int(orig_pos[k])
                    s = plan.bundle.p_seq[k]
                    for j in range(len(s)):
                        if 0 <= p + j < gap_len and s[j] < 4:
                            counts[p + j, s[j]] += 1
            r0b, r1b = _detect_overlap_host(plan, orig_accept, orig_pos, gap_len)
            if r1b == -1:
                counts[:] = 0
                u_flag = 0
            ret0, ret1 = r0b, r1b

    if u_flag == 1 and ret0 == 0 and ret1 == 0:
        # ambiguous-column resolution (5585-5609)
        for j in range(gap_len):
            row = counts[j]
            if (row[:4] > 0).any():
                uf = _check_update(row, qual[j])
                if uf != -1:
                    if uf != 50:
                        counts[j, uf] += 10
                else:
                    counts[j, :4] = 0

    cons = _host_consensus(counts, gap_len)
    return cons[:gap_len]
