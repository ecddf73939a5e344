"""Batched GapFiller EM — the device core.

TPU-native reformulation of Figbird.cpp's per-gap EM (class GapFiller,
1563-6684).  The reference's hot loops are scalar triple loops
(read x candidate-position x read-char, e.g. 3128-3188, 3550-3677); here each
becomes one MXU matmul:

    score[r, p] = sum_j log F[p+j, j, read[r, j]]
                = onehot(reads) (R, L*5)  @  K^T (L*5, P)

where K[p, j, c] = log F[p+j, j, c] is a windowed view of the per-position
factor tensor.  Soft-count accumulation is the transposed product
(P, R) @ (R, L*5) followed by a diagonal fold.  Everything is batched over a
*gap-length-candidate instance* axis with ``vmap`` — the reference's
sequential gap-length scan (fillGap 6298-6482) becomes a parallel axis, and
its early-exit heuristics are replayed exactly on the host afterwards from
the full likelihood vector.

Faithful reference quirks preserved:
 * partial soft weights are ``pow(10, ln p)`` = p^ln10 (Figbird.cpp:3169+3179)
   and unmapped soft weights ``exp(0.5*log10 p)`` = p^(0.5/ln10) (3601);
 * the hard re-scoring pass fixes strand 0 for partial reads (3357);
 * counts only accumulate inside the gap zone (3183);
 * probsGap spreads the N mass over ACGT (computeProbsGap 2105);
 * acceptance is -log10(maxProb) < gapProbCutOff (3474, 3852).

Window convention: w in [0, W); gap zone = [WL, WL + gap_len); contig
coordinate of w is ``gap_start - WL + w``.  WL == bucket read length, which is
exact (reads can reach at most L-1 outside the gap; SURVEY §2a).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LN10 = float(np.log(10.0))
NEG = -1e30


@dataclass(frozen=True)
class FillConfig:
    """Static shape/mode config for one bucket (hashable for jit)."""

    W: int          # full window length  (WL + max_gap_len + L)
    Wp: int         # candidate-position count (WL + max_gap_len)
    L: int          # bucket read length
    WL: int         # gap-zone start (== L)
    max_gap_len: int
    R: int          # padded unmapped read count
    P: int          # padded partial read count
    partial_mode: bool
    unmapped_mode: bool
    clip_thresh: int = 2
    em_iters: int = 3          # partial: 3; unmapped: cap (ref num_itr=200)
    comp_stable: int = 5       # unmapped consensus-stability break
    coverage_threshold1: int = 0
    coverage_threshold2: int = 1
    gap_prob_cutoff: float = 5.0
    insert_tmin: int = 0
    insert_tmax: int = 1 << 30
    # overlap-bonus pair-candidate cap (reference enumerates all pairs; the
    # extreme reads realise the max overlap, so the cap is loss-free in
    # practice — reference_exact raises it to P)
    bonus_cap: int = 24
    # double-range soft-count accumulation (see _accumulate_logw): the
    # reference accumulates pow(10, lnP) soft weights in C double
    # (Figbird.cpp:3179, 3601), representable down to ~1e-308; f32 underflows
    # at ~1e-38, so gap-zone rows covered only by astronomically-unlikely
    # placements get probs from different weight ratios and the EM feedback
    # diverges.  reference_exact turns this on (5x accumulate cost).
    exact_soft: bool = False
    # lazy precision escalation: with exact_soft=False, every soft pass also
    # emits a ``prec`` risk flag — true iff some gap-zone row is covered by a
    # representable placement yet its deepest-computed-level total is <= the
    # cascade's level-selection threshold TAU, i.e. exactly the rows where
    # the exact cascade would pick a level >= soft_levels.  The driver
    # re-runs flagged instances with exact_soft=True, making the fast path's
    # outputs bit-identical to the reference's C-double accumulation at a
    # marginal cost (VERDICT r4 #1).
    detect_prec: bool = True
    # fast-path mini-cascade depth m: the production soft pass runs the
    # FIRST m cascade levels (stacked into ceil(m/GROUP) matmuls, so m<=3
    # costs one matmul like plain f32).  Rows selecting level < m are
    # bit-identical to the full cascade; deeper rows trip the prec flag.
    # m=1 == plain f32 accumulate (the r4 fast path); escalation rate falls
    # ~e^-140 per extra level (flag threshold e^(CUT - m*SHIFT)).
    soft_levels: int = 1


ONEHOT4 = np.eye(5, 4, dtype=np.float32)
ONEHOT4[4] = 1.0  # N spreads over ACGT (update_partial_prob 1986-1990)
ONEHOT5 = np.eye(5, dtype=np.float32)


def _csum(x: jnp.ndarray) -> jnp.ndarray:
    """Near-double-precision sum of a 1-D f32 vector (TwoSum pairwise tree).

    The reference accumulates the per-gap likelihood in C ``double``
    (Figbird.cpp:3178); a plain f32 reduction's error (~n*eps*sum|x| ~ 0.1 at
    bench read counts) is the same order as the |d|<=0.9 plateau-exit
    threshold (6258), flipping knife-edge candidate-length scan exits.  A
    pairwise tree with exact per-add error tracking (Knuth TwoSum) keeps the
    error at ~eps^2 * n levels — effectively double precision for these
    magnitudes — for log2(n) cheap vector ops.
    """
    x = x.astype(jnp.float32).reshape(-1)
    n = int(x.shape[0])
    m = 1
    while m < max(n, 1):
        m *= 2
    if m != n:
        x = jnp.concatenate([x, jnp.zeros((m - n,), x.dtype)])
    err = jnp.zeros_like(x)
    while m > 1:
        a, b = x[0::2], x[1::2]
        s = a + b
        bv = s - a
        t = (a - (s - bv)) + (b - bv)  # exact rounding error of a+b
        err = err[0::2] + err[1::2] + t
        x = s
        m //= 2
    return (x + err)[0]


def _oh_flat_j(reads: jnp.ndarray, jvalid: jnp.ndarray) -> jnp.ndarray:
    """Flat j-major one-hot (..., L*5): column j*5+c == (read[j] == c).

    Built with a column-repeat + iota compare — no (.., L, 5) intermediate,
    so nothing with a tiny minor dim ever hits HBM.
    """
    L = reads.shape[-1]
    r5 = jnp.repeat(reads, 5, axis=-1)           # [.., j*5+k] = read[j]
    v5 = jnp.repeat(jvalid, 5, axis=-1)
    cvec = jnp.tile(jnp.arange(5, dtype=reads.dtype), L)
    return ((r5 == cvec[None, :]) & v5).astype(jnp.float32)


def _oh_flat_c(reads: jnp.ndarray, jvalid: jnp.ndarray) -> jnp.ndarray:
    """Flat c-major one-hot (..., 5*L): column c*L+j == (read[j] == c).

    The count-accumulation layout: per-c blocks are contiguous, so the
    diagonal fold runs on (Wp, L) slabs."""
    L = reads.shape[-1]
    r5 = jnp.tile(reads, (1, 5))                 # [.., c*L+j] = read[j]
    v5 = jnp.tile(jvalid, (1, 5))
    cvec = jnp.repeat(jnp.arange(5, dtype=reads.dtype), L)
    return ((r5 == cvec[None, :]) & v5).astype(jnp.float32)


def _use_count_kernel(n_reads: int) -> bool:
    from ..ops.band import cascade_counts_ok

    return cascade_counts_ok(n_reads)


def _oh_count_for(reads: jnp.ndarray, jvalid: jnp.ndarray
                  ) -> tuple[jnp.ndarray, bool]:
    """COUNT one-hots in the layout the active accumulate path wants:
    (tensor, jmajor).  TPU fused fold kernel: j-major (each fold step j
    reads a contiguous 5-row block of the VMEM product).  XLA skew-fold
    fallback: c-major."""
    if _use_count_kernel(reads.shape[0]):
        return _oh_flat_j(reads, jvalid), True
    return _oh_flat_c(reads, jvalid), False


def compute_probs_gap(counts: jnp.ndarray) -> jnp.ndarray:
    """computeProbsGap (Figbird.cpp:2090-2116): counts (W,5) -> probs (W,5)."""
    total = counts.sum(axis=-1, keepdims=True)
    ncol = counts[..., 4:5]
    probs4 = jnp.where(total > 0, (counts[..., :4] + ncol / 4) / total, 0.25)
    return jnp.concatenate([probs4, jnp.zeros_like(ncol)], axis=-1)


def compute_error_probs_gap(probs: jnp.ndarray, et: jnp.ndarray) -> jnp.ndarray:
    """computeErrorProbsGap (2118-2137): B[w,j] = sum_{k<4,k!=j} A[w,k]*ET[k,j]."""
    b = probs[..., :4] @ et[:4, :]  # (W,5)
    diag = jnp.concatenate([jnp.diag(et)[:4], jnp.zeros(1, et.dtype)])
    corr = probs * diag[None, :]  # subtract k==j term for j<4 (A[:,4]==0)
    return b - corr


from ..ops import band_score
from ..ops.band import band_score_soft


def _sel_jm(L: int) -> np.ndarray:
    """(5, L*5) j-major column selector: Sel[c, j*5+c] = 1."""
    s = np.zeros((5, L * 5), np.float32)
    for j in range(L):
        for c in range(5):
            s[c, j * 5 + c] = 1.0
    return s


def _soft_K(probs, eprobs, e_pos, W):
    """log factor tensor for the soft pass, flat j-major (W, L*5).

    Column j*5+c: c<4: A[w,c]*(1-e_j) + e_j*B[w,c]; c==4 (read N):
    e_j*B[w,4] — A[:,4]==0 (computeProbsGap zeroes the N column), so the
    first formula covers both (Figbird.cpp:3160-3165).  Built entirely in
    (W, L5) layout — the obvious (W, L, 5) tensor tile-pads 5 -> 128 lanes
    and OOMs at production instance batches.
    """
    L = e_pos.shape[0]
    sel = jnp.asarray(_sel_jm(L))
    A5 = probs @ sel          # (W, L5)
    B5 = eprobs @ sel
    e5 = jnp.repeat(e_pos, 5)[None, :]
    F = A5 * (1.0 - e5) + e5 * B5
    # clamp matches the fused Pallas kernel (ops/band.py _band_soft_kernel)
    # exactly: 1e-30 — a 1e-300 clamp underflows to 0 in f32 and log() gives
    # -inf, which poisons the score matmul (0 * -inf = NaN) and diverges
    # from the TPU path (ADVICE r4 #1).  Real factors are add-one smoothed
    # products >= ~1e-15, so the clamp never binds on real data.
    return jnp.log(jnp.maximum(F, 1e-30))


def _hard_K(gap_string, e_match, e_mis, ln_et):
    """log factor tensor vs a fixed consensus, flat j-major (W, L*5):
    column j*5+c = a_j if c == g[w] else b_j + lnET[g[w], c]
    (Figbird.cpp:3398-3406 / 5057-5064).  Flat construction — see _soft_K.
    """
    L = e_match.shape[0]
    sel = jnp.asarray(_sel_jm(L))
    g = gap_string  # (W,) int8 codes 0..5 (5 = outside contig)
    gs = jnp.minimum(g, 4)
    gs5 = jnp.stack([(gs == c) for c in range(5)],
                    axis=1).astype(jnp.float32)        # (W, 5)
    lnrow5 = (gs5 @ ln_et.astype(jnp.float32)) @ sel   # (W, L5)
    ismatch5 = gs5 @ sel                               # 1 where c == g[w]
    a5 = jnp.repeat(e_match, 5)[None, :]
    b5 = jnp.repeat(e_mis, 5)[None, :]
    K = jnp.where(ismatch5 > 0, a5, b5 + lnrow5)
    # reference skips the factor entirely when fromCharCode invalid; mimic by 0
    return jnp.where((g >= 5)[:, None], 0.0, K)




def _fold_counts_T(cwT: jnp.ndarray, L: int, W: int) -> jnp.ndarray:
    """cwT (5L, Wp) TRANSPOSED c-major window counts -> counts (W, 5):
    counts[p+j, c] += cwT[c*L+j, p].  The accumulate matmuls emit this
    orientation directly (contract the read axis with the one-hots on the
    LHS), so the (5, L, Wp) split is a free major-axis reshape and the skew
    needs no relayout at all — the transpose was ~60%% of the fold cost.
    """
    Wp = cwT.shape[1]
    ct = cwT.reshape(5, L, Wp)
    RL = Wp + L + 1
    Ap = jnp.concatenate(
        [ct, jnp.zeros((5, L, L + 1), cwT.dtype)], axis=2).reshape(5, L * RL)
    skew = Ap[:, : L * (RL - 1)].reshape(5, L, RL - 1)
    return skew[:, :, :W].sum(axis=1).T               # (W, 5)


def consensus_from_counts(counts, gap_zone, check, cov_thresh):
    """computeSequence (4417-4508) restricted to the gap zone.

    Returns (codes (W,) int8 with 4=N outside support, coverage (W,) f32).
    check=1 applies the coverage_threshold1 N-out rule.
    """
    mx = counts.max(axis=-1)
    arg = jnp.argmax(counts, axis=-1).astype(jnp.int8)
    cons = jnp.where(mx > 0, arg, 4)
    if check:
        cons = jnp.where(mx <= cov_thresh, 4, cons)
    return jnp.where(gap_zone, cons, 4), mx


def partial_stack_full(pr, p_clip, p_match, p_len, p_valid, L: int):
    """Gap-length-independent half of :func:`partial_stack_probs`.

    The per-read inclusion masks factor as (t < base_r) & (t < gap_len):
    the first is gap-length-independent, the second is a whole-column cut.
    Summing the first part once PER GAP and applying the column cut per
    candidate length removes the stack build (~30%% of a scan dispatch)
    from the per-instance path, bit-exactly (masked-out elements are exact
    f32 zeros).  Returns (cntL (L,4), cntR_rev (L,4), base_max, clip_max).
    """
    from ..align.core import shift_left_batch

    P, Lr = pr.shape
    t = jnp.arange(L)[None, :]

    def _counts4(mask, ch):
        return jnp.stack(
            [jnp.sum(jnp.where(mask & ((ch == c) | (ch == 4)), 1.0, 0.0),
                     axis=0) for c in range(4)], axis=1)

    left = (p_match == 1) | (p_match == 4)
    base = p_len - p_clip - 1  # left reach (chars into the gap)
    ch_l = shift_left_batch(pr, jnp.clip(p_clip + 1, 0, Lr), jnp.int8(4))[:, :L]
    m_l = (t < base[:, None]) & left[:, None] & p_valid[:, None]
    cntL = _counts4(m_l, ch_l)

    right = (p_match == 2) | (p_match == 3)
    ch_r = shift_left_batch(pr[:, ::-1], jnp.clip(Lr - p_clip, 0, Lr),
                            jnp.int8(4))[:, :L]
    m_r = (t < p_clip[:, None]) & right[:, None] & p_valid[:, None]
    cntR_rev = _counts4(m_r, ch_r)

    base_max = jnp.max(jnp.where(left & p_valid, base, -(1 << 20)))
    clip_max = jnp.max(jnp.where(right & p_valid, p_clip, -(1 << 20)))
    return cntL, cntR_rev, base_max, clip_max


@functools.partial(jax.jit, static_argnames=("L",))
def partial_stack_full_batch(pr, p_clip, p_match, p_len, p_valid, L: int):
    """vmapped :func:`partial_stack_full` (module-level jit: re-wrapping at
    every fill call would retrace per call)."""
    return jax.vmap(lambda a, b, c, d, e: partial_stack_full(a, b, c, d, e, L)
                    )(pr, p_clip, p_match, p_len, p_valid)


def partial_stack_from_full(cntL, cntR_rev, base_max, clip_max,
                            max_gap_len: int, gap_len):
    """Apply one candidate gap length to the precomputed stack halves.

    Equivalent to :func:`partial_stack_probs` (same return contract)."""
    L = cntL.shape[0]
    G1 = min(L, max_gap_len)
    t1 = jnp.arange(G1)[:, None]

    def _padG(x):
        if G1 == max_gap_len:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((max_gap_len - G1, 4), x.dtype)], axis=0)

    cnt_l = _padG(jnp.where(t1 < gap_len, cntL[:G1], 0.0))
    cnt_r_rev = _padG(jnp.where(t1 < gap_len, cntR_rev[:G1], 0.0))
    rev = jnp.concatenate([cnt_r_rev[::-1, :],
                           jnp.zeros_like(cnt_r_rev)], axis=0)
    off = jnp.clip(max_gap_len - gap_len, 0, max_gap_len)
    cnt_r = jax.lax.dynamic_slice(rev, (off, jnp.int32(0)),
                                  (max_gap_len, 4))
    counts4 = 1.0 + cnt_l + cnt_r
    # left_max = max_r (min(base_r, gap_len) - 1) = min(max base, gl) - 1;
    # right_min = min_r (gl - min(clip_r, gl)) = gl - min(max clip, gl)
    left_max = jnp.where(base_max == -(1 << 20), -(1 << 20),
                         jnp.minimum(base_max, gap_len) - 1)
    right_min = jnp.where(clip_max == -(1 << 20), 1 << 20,
                          gap_len - jnp.minimum(clip_max, gap_len))
    return counts4, left_max, right_min


def partial_stack_probs(pr, p_clip, p_match, p_len, p_valid, max_gap_len, gap_len):
    """update_partial_prob (1913-2088): stack partial reads at clip points.

    Returns (counts4 (maxG,4) with +1 pseudo, left_max, right_min).

    Per-read clip offsets are CONTIGUOUS slices, so the (P, maxG) minor-axis
    ``take_along_axis`` (~60x slower than row ops on TPU — it alone cost 95%%
    of an EM dispatch) is replaced by the static shift-select trick; gap
    positions beyond the read length never receive counts, so only the
    first L columns are computed and the rest padded.
    """
    from ..align.core import shift_left_batch

    P, L = pr.shape
    G1 = min(L, max_gap_len)
    t = jnp.arange(G1)[None, :]  # gap position (reads reach < L chars in)

    def _counts4(mask, ch):
        # four masked reductions; read-N spreads over ACGT (ONEHOT4[4]=1)
        return jnp.stack(
            [jnp.sum(jnp.where(mask & ((ch == c) | (ch == 4)), 1.0, 0.0),
                     axis=0) for c in range(4)], axis=1)

    def _padG(x):  # (G1, 4) -> (maxG, 4)
        if G1 == max_gap_len:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((max_gap_len - G1, 4), x.dtype)], axis=0)

    left = (p_match == 1) | (p_match == 4)
    # match 1/4: read[clip+1+t] -> gap pos t, t < stop1 = min(len-clip-1, gap_len)
    stop1 = jnp.minimum(p_len - p_clip - 1, gap_len)
    ch_l = shift_left_batch(pr, jnp.clip(p_clip + 1, 0, L), jnp.int8(4))[:, :G1]
    m_l = (t < stop1[:, None]) & left[:, None] & p_valid[:, None]
    cnt_l = _padG(_counts4(m_l, ch_l))

    # match 2/3: read[clip-1-u] -> gap pos gap_len-1-u, u < chars = min(clip, gap_len)
    right = (p_match == 2) | (p_match == 3)
    chars = jnp.minimum(p_clip, gap_len)
    # reversed read shifted so column u holds read[clip-1-u]
    ch_r = shift_left_batch(pr[:, ::-1], jnp.clip(L - p_clip, 0, L),
                            jnp.int8(4))[:, :G1]
    m_r = (t < chars[:, None]) & right[:, None] & p_valid[:, None]
    cnt_r_rev = _padG(_counts4(m_r, ch_r))
    # reverse into gap coordinates (u -> gap_len-1-u): static flip + ONE
    # dynamic row slice instead of a dynamic scatter (slow + 4-minor tile
    # padding): cnt_r[g] = cnt_r_rev[gap_len-1-g]
    rev = jnp.concatenate([cnt_r_rev[::-1, :],
                           jnp.zeros_like(cnt_r_rev)], axis=0)
    off = jnp.clip(max_gap_len - gap_len, 0, max_gap_len)
    cnt_r = jax.lax.dynamic_slice(rev, (off, jnp.int32(0)),
                                  (max_gap_len, 4))

    counts4 = 1.0 + cnt_l + cnt_r
    stop1_v = jnp.where(left & p_valid, stop1, 0)
    left_max = jnp.max(jnp.where(left & p_valid, stop1_v - 1, -(1 << 20)))
    right_min = jnp.min(
        jnp.where(right & p_valid, gap_len - chars, 1 << 20)
    )
    return counts4, left_max, right_min


# ===========================================================================
# placement passes
# ===========================================================================

def _legal_partial(cfg: FillConfig, inst, model):
    """Candidate legality + insert mask for partial reads (3124-3134, 3195-3203).

    Returns legal (P, Wp) bool.  Window-relative start p maps to contig pos
    cpos = gap_start - WL + p.
    """
    p = jnp.arange(cfg.Wp)[None, :]
    cpos = inst["gap_start"] - cfg.WL + p  # (1,Wp)
    plen = inst["p_len"][:, None]
    left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
    gs = inst["gap_start"]
    ge = gs + inst["gap_len"]
    rng_left = (cpos >= gs - plen + 1) & (cpos < gs)
    rng_right = (cpos >= ge - plen + 1) & (cpos < ge)
    rng = jnp.where(left, rng_left, rng_right)

    refp = inst["p_refpos"][:, None]
    refp_r = refp + inst["gap_len"] - inst["orig_gap"]  # right side += gapoffset
    t_ins = jnp.where(left, cpos - refp + plen, refp_r - cpos + plen)
    ins_ok = (refp == -1) | ((t_ins >= cfg.insert_tmin) & (t_ins <= cfg.insert_tmax))
    return rng & ins_ok & inst["p_valid"][:, None]


def _legal_unmapped(cfg: FillConfig, inst, model):
    """Candidate legality + insert size for unmapped reads (3550-3557, 3620-3627).

    Returns (legal (R,Wp), t_ins (R,Wp) clipped for prior lookup).
    """
    p = jnp.arange(cfg.Wp)[None, :]
    cpos = inst["gap_start"] - cfg.WL + p
    rlen = inst["u_len"][:, None]
    gs = inst["gap_start"]
    ge = gs + inst["gap_len"]
    rng = (cpos >= gs - rlen + 1) & (cpos < ge)
    pos1 = inst["u_pos"][:, None]
    left = pos1 < gs
    pos1_r = pos1 + inst["gap_len"] - inst["orig_gap"]
    t_ins = jnp.where(left, cpos - pos1 + rlen, pos1_r - cpos + rlen)
    ins_ok = (t_ins >= cfg.insert_tmin) & (t_ins <= cfg.insert_tmax)
    tc = jnp.clip(t_ins, 0, model["ln_ins"].shape[0] - 1)
    return rng & ins_ok & inst["u_valid"][:, None], tc


def _score(oh_flat, K, Wp):
    """(N, L*5) x banded-K -> (N, Wp) on the MXU (ops.band: Pallas on TPU)."""
    return band_score(oh_flat, K, Wp)


# ---------------------------------------------------------------------------
# banded partial placement: every legal partial position lives within L of a
# gap edge (rng_left  in [gs-plen+1, gs), rng_right in [ge-plen+1, ge) with
# plen <= L — Figbird.cpp:3124-3134/3195-3203), so the Wp-wide position axis
# collapses EXACTLY to two L-wide bands: a static left band at the gap start
# and a dynamic right band at the candidate gap end.  Scoring, accumulation
# and the hard pass all run 2x128 positions instead of Wp (~2.4x less math
# at the 512-gap bucket), with identical per-position sums and the same
# scan order (band-1 positions strictly precede band-2's, preserving argmax
# tie-breaks).
# ---------------------------------------------------------------------------

def _band_w(cfg: FillConfig) -> int:
    """Band width: the legal span at each gap edge is L-1 wide, rounded up
    to the 128-lane tile (151-200 bp reads get a 256-wide band — the config
    layer admits max_read_length up to 200)."""
    return -(-cfg.L // 128) * 128


def _band_starts(cfg: FillConfig, gap_len):
    """(p0_left static 0, p0_right traced) window starts of the two bands.

    Band ownership: band 1 owns positions p < WL, band 2 owns p >= WL —
    complete and disjoint over all legal positions (see header note)."""
    bw = _band_w(cfg)
    assert cfg.W >= bw + cfg.L, (
        f"banded partial path needs W >= band_w + L ({cfg.W} < {bw + cfg.L});"
        " production GAP_BUCKETS (floor 128) guarantee this — tiny custom"
        " configs must pad max_gap_len accordingly")
    p0r = cfg.WL + jnp.maximum(gap_len - cfg.L + 1, 0)
    p0r = jnp.minimum(p0r, cfg.W - (bw + cfg.L))  # keep the slab in-range
    return jnp.int32(0), p0r.astype(jnp.int32)


def _legal_partial_band(cfg: FillConfig, inst, p0, own_left: bool):
    """Legality over band positions [p0, p0+band_w) plus band ownership."""
    p = p0 + jnp.arange(_band_w(cfg))[None, :]
    cpos = inst["gap_start"] - cfg.WL + p
    plen = inst["p_len"][:, None]
    left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
    gs = inst["gap_start"]
    ge = gs + inst["gap_len"]
    rng_left = (cpos >= gs - plen + 1) & (cpos < gs)
    rng_right = (cpos >= ge - plen + 1) & (cpos < ge)
    rng = jnp.where(left, rng_left, rng_right)
    refp = inst["p_refpos"][:, None]
    refp_r = refp + inst["gap_len"] - inst["orig_gap"]
    t_ins = jnp.where(left, cpos - refp + plen, refp_r - cpos + plen)
    ins_ok = (refp == -1) | ((t_ins >= cfg.insert_tmin)
                             & (t_ins <= cfg.insert_tmax))
    own = (p < cfg.WL) if own_left else (p >= cfg.WL)
    return rng & ins_ok & inst["p_valid"][:, None] & own


def _accumulate_band(weights, oh_count, L: int, jmajor: bool = False):
    """(P, band_w) weights -> (band_w+L, 5) band-local counts."""
    bw = weights.shape[1]
    if jmajor:
        from ..ops.band import fold_counts

        return fold_counts(weights, oh_count, L, bw + L)
    cwT = jax.lax.dot_general(
        oh_count, weights, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return _fold_counts_T(cwT, L, bw + L)


def _assemble_bands(fold1, fold2, p0r, cfg: FillConfig):
    """Scatter-add the two band folds into a (W, 5) counts array."""
    out = jnp.zeros((cfg.W, 5), jnp.float32)
    out = jax.lax.dynamic_update_slice(out, fold1, (0, 0))
    cur = jax.lax.dynamic_slice(out, (p0r, jnp.int32(0)),
                                (_band_w(cfg) + cfg.L, 5))
    return jax.lax.dynamic_update_slice(out, cur + fold2, (p0r, jnp.int32(0)))


def _soft_counts_banded(logw1, legal1, logw2, legal2, p0r, oh_c, cfg,
                        jmajor: bool = False):
    """Banded soft-count accumulation with the same depth modes as
    :func:`_accumulate_logw` (the cascade level is selected per assembled
    ROW, after both bands' contributions combine).  Returns
    (counts (W,5), deepest-level row totals (W,))."""
    m = _soft_m(cfg)
    if m == 1:
        w1 = jnp.where(legal1, jnp.exp(jnp.maximum(logw1, -700.0)), 0.0)
        w2 = jnp.where(legal2, jnp.exp(jnp.maximum(logw2, -700.0)), 0.0)
        counts = _assemble_bands(
            _accumulate_band(w1, oh_c, cfg.L, jmajor),
            _accumulate_band(w2, oh_c, cfg.L, jmajor), p0r, cfg)
        return counts, counts.sum(axis=-1)
    bw = _band_w(cfg)
    ck1 = _accumulate_levels(logw1, legal1, oh_c, cfg.L, bw + cfg.L, m,
                             jmajor)
    ck2 = _accumulate_levels(logw2, legal2, oh_c, cfg.L, bw + cfg.L, m,
                             jmajor)
    # select-then-assemble: the level choice needs ASSEMBLED row totals,
    # which are cheap (m scalar-vector assembles); the expensive full
    # (W, 5) assemble then runs ONCE on band-locally selected counts
    # (bit-identical: each level's contribution to a row is selected as a
    # whole, and assemble is a plain add of the two bands)
    t1 = ck1.sum(axis=-1)                                  # (m, bw+L)
    t2 = ck2.sum(axis=-1)
    z = jnp.zeros((cfg.W,), jnp.float32)
    tot = jax.vmap(lambda a, b: jax.lax.dynamic_update_slice(z, a, (0,))
                   + jax.lax.dynamic_update_slice(z, b, (p0r,)))(t1, t2)
    ok = tot > _CASCADE_TAU                                # (m, W)
    kstar = jnp.where(jnp.any(ok, axis=0),
                      jnp.argmax(ok, axis=0), m - 1)       # (W,)
    k1 = jax.lax.dynamic_slice(kstar, (jnp.int32(0),), (bw + cfg.L,))
    k2 = jax.lax.dynamic_slice(kstar, (p0r,), (bw + cfg.L,))

    def _pick(ck, kv):
        sel = ck[-1]
        for k in reversed(range(m - 1)):
            sel = jnp.where((kv == k)[:, None], ck[k], sel)
        return sel

    counts = _assemble_bands(_pick(ck1, k1), _pick(ck2, k2), p0r, cfg)
    deep = jax.lax.dynamic_update_slice(z, t1[-1], (0,)) \
        + jax.lax.dynamic_update_slice(z, t2[-1], (p0r,))
    return counts, deep


def _score_soft_band(oh_score, probs, eprobs, e_pos, p0, cfg):
    """Fused soft score over one band: slice the (W,5) probability rows the
    band's K tile needs and run the compact kernel."""
    bw = _band_w(cfg)
    pr_sl = jax.lax.dynamic_slice(probs, (p0, jnp.int32(0)),
                                  (bw + cfg.L, 5))
    ep_sl = jax.lax.dynamic_slice(eprobs, (p0, jnp.int32(0)),
                                  (bw + cfg.L, 5))
    return band_score_soft(oh_score, pr_sl, ep_sl, e_pos, bw)


def _score_hard_band(oh_score, gap_string, model, p0, cfg):
    bw = _band_w(cfg)
    gs_sl = jax.lax.dynamic_slice(gap_string, (p0,), (bw + cfg.L,))
    Kh = _hard_K(gs_sl, model["a_fwd"], model["b_fwd"], model["ln_et"])
    return _score(oh_score, Kh, bw)


def _combine_bands_max(s1, s2, p0r):
    """Per-read (max, argmax-position) over both bands, full-scan order
    (band-1 owned positions strictly precede band-2's)."""
    m1 = jnp.max(s1, axis=1)
    m2 = jnp.max(s2, axis=1)
    a1 = jnp.argmax(s1, axis=1).astype(jnp.int32)
    a2 = jnp.argmax(s2, axis=1).astype(jnp.int32) + p0r
    use1 = m1 >= m2
    return jnp.where(use1, m1, m2), jnp.where(use1, a1, a2)


def _accumulate(weights, oh_count, cfg, jmajor: bool = False):
    """Soft/hard count accumulation: contract the read axis with the
    one-hots on the LHS so cw comes out TRANSPOSED ((N,5L) x (N,Wp) ->
    (5L,Wp)) and the diagonal fold needs no relayout (_fold_counts_T).
    ``jmajor``: TPU path — the fused fold kernel (ops.band.fold_counts)
    with j-major one-hots; the (5L, Wp) product never touches HBM."""
    if jmajor:
        from ..ops.band import fold_counts

        return fold_counts(weights, oh_count, cfg.L, cfg.W)
    cwT = jax.lax.dot_general(
        oh_count, weights, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return _fold_counts_T(cwT, cfg.L, cfg.W)


# Cascade constants.  Invariant: a row NOT selected at level k (total_k <=
# TAU = e^(CUT-SHIFT)) has every contribution below e^(CUT-SHIFT), so level
# k+1's overflow zeroing (logw + (k+1)*SHIFT > CUT  <=>  logw > CUT-SHIFT at
# level k's scale) never drops a contribution of a level-(k+1)-selected row.
# CUT=78 keeps level sums below f32 max (e^78 * 3000 reads ~ 2e37); 6 levels
# of 140 nats span ~927 nats, past the 745-nat SUBNORMAL double underflow
# point (pow(10, tempProb) in the reference returns denormals to 4.9e-324).
_CASCADE_SHIFT = 140.0
_CASCADE_CUT = 78.0
_CASCADE_TAU = float(np.exp(_CASCADE_CUT - _CASCADE_SHIFT))  # e^-62
_CASCADE_LEVELS = 6


# levels stacked per accumulate matmul: the cascade's cost is per-op
# dispatch/copy-chain, not FLOPs (fold relayouts dominate), so stacking
# GROUP levels into one dot_general + a vmapped fold pays the overhead
# ceil(6/GROUP) times instead of 6.  Each stacked column block is computed
# by the same per-column reduction as a solo matmul — bit-identical.
_CASCADE_GROUP = 3


def _level_weight(logw, legal, k):
    lk = logw + k * _CASCADE_SHIFT
    return jnp.where(legal & (lk <= _CASCADE_CUT),
                     jnp.exp(jnp.clip(lk, -745.0, _CASCADE_CUT)), 0.0)


def _accumulate_levels(logw, legal, oh_count, L: int, W: int,
                       m: int = _CASCADE_LEVELS, jmajor: bool = False):
    """First ``m`` cascade levels' folded counts as (m, W, 5), stacked."""
    if jmajor:
        from ..ops.band import cascade_counts

        lw = jnp.where(legal, logw, -1e30)
        return cascade_counts(lw, oh_count, L, W, m,
                              _CASCADE_SHIFT, _CASCADE_CUT)
    N, Pw = logw.shape
    outs = []
    for g0 in range(0, m, _CASCADE_GROUP):
        ks = list(range(g0, min(g0 + _CASCADE_GROUP, m)))
        wk = jnp.concatenate([_level_weight(logw, legal, k) for k in ks],
                             axis=1)                       # (N, len*Pw)
        cwT = jax.lax.dot_general(
            oh_count, wk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (5L, len*Pw)
        # fold each level's CONTIGUOUS column slice separately: a vmap with
        # in_axes=1 over the (5L, len, Pw) view forced strided relayouts
        # that cost ~2x the folds themselves (62 vs 28 ms/iter at the bench
        # u shape, v5e) — identical per-column arithmetic either way
        outs += [_fold_counts_T(
            jax.lax.slice_in_dim(cwT, i * Pw, (i + 1) * Pw, axis=1), L, W)
            for i in range(len(ks))]
    return jnp.stack(outs, axis=0)                         # (K, W, 5)


def _select_levels(counts_k):
    """Per output row: the SHALLOWEST level whose total exceeds TAU, else
    the deepest computed (identical selection to the sequential loop; a
    prefix of the full cascade selects identically wherever the full
    cascade's choice is < m — deeper rows are escalation territory)."""
    totals = counts_k.sum(axis=-1)                         # (m, W)
    chosen = counts_k[-1]
    for k in reversed(range(counts_k.shape[0] - 1)):
        chosen = jnp.where((totals[k] > _CASCADE_TAU)[:, None],
                           counts_k[k], chosen)
    return chosen


def _soft_m(cfg: FillConfig) -> int:
    return _CASCADE_LEVELS if cfg.exact_soft else max(1, cfg.soft_levels)


def _accumulate_logw(logw, legal, oh_count, cfg: FillConfig,
                     jmajor: bool = False):
    """Soft-count accumulation from natural-log weights with double range.

    Runs the first m = soft_levels cascade levels (m=1: plain f32, the r4
    fast path; exact_soft: all 6).  Level k accumulates exp(logw + k*SHIFT)
    with overflowing contributions zeroed, and each output row takes the
    SHALLOWEST level whose row total exceeds TAU (see invariant above).
    Downstream consumers (computeProbsGap normalisation, consensus argmax,
    re-anchoring frequencies) are per-row scale-invariant, so per-row mixed
    scaling reproduces the reference's C-double ratios (pow(10, lnP)
    accumulation, Figbird.cpp:3179) down to 1e-308.

    Returns (counts (W,5), deepest-level row totals (W,)) — the totals feed
    the precision-risk flag (rows still <= TAU at the deepest computed
    level need the full cascade).
    """
    m = _soft_m(cfg)
    if m == 1:
        w = jnp.where(legal, jnp.exp(jnp.maximum(logw, -700.0)), 0.0)
        counts = _accumulate(w, oh_count, cfg, jmajor)
        return counts, counts.sum(axis=-1)
    counts_k = _accumulate_levels(logw, legal, oh_count, cfg.L,
                                  cfg.W, m, jmajor)
    return _select_levels(counts_k), counts_k[-1].sum(axis=-1)


# ---------------------------------------------------------------------------
# precision-risk detection (cfg.detect_prec): a fast-path soft pass is
# bit-identical to the exact cascade unless some gap-zone row satisfies BOTH
#  (a) its f32 level-0 total is <= TAU (the cascade's level-selection
#      threshold) — i.e. the cascade would pick a deeper level there — and
#  (b) it is covered by a placement whose log-weight is REPRESENTABLE at some
#      cascade level: logw >= -(5*SHIFT + 103) = -803 nats.  Contributions
#      below that underflow f32 exp() at EVERY level (deepest level scales by
#      +5*SHIFT and exp() flushes below ~-103), so rows covered only by such
#      placements are exact zeros in both paths — no flag.
# Coverage uses the per-position maximum read length among mask-passing
# placements: position p contributes to rows [p, p + len).  Conservative only
# in the (len, logw) pairing; a spurious flag costs one exact re-run which
# reproduces the fast result bit-exactly anyway.
# ---------------------------------------------------------------------------

# weights below this natural-log value vanish at every cascade level
_MIN_LOGW_REP = -(5.0 * 140.0 + 103.0)  # == -(5*_CASCADE_SHIFT + 103)

def _coverage_full(cfg: FillConfig, legal, lens):
    """(W,) bool: window rows covered by any legal placement (full-Wp legality
    as in the unmapped pass).  Loop-invariant — computed once per instance."""
    ml = jnp.max(jnp.where(legal, lens[:, None], 0), axis=0)        # (Wp,)
    reach = jnp.arange(cfg.Wp) + ml                                  # excl. end
    creach = jax.lax.cummax(reach)
    ext = jnp.concatenate(
        [creach, jnp.full((cfg.W - cfg.Wp,), 1, creach.dtype) * creach[-1]])
    return ext > jnp.arange(cfg.W)


def _coverage_band(cfg: FillConfig, leg, lens, p0):
    """(W,) bool coverage for one L-wide band at window start ``p0``."""
    bw = _band_w(cfg)
    ml = jnp.max(jnp.where(leg, lens[:, None], 0), axis=0)           # (bw,)
    creach = jax.lax.cummax(jnp.arange(bw) + ml)                     # local
    loc = jnp.concatenate(
        [creach, jnp.full((cfg.L,), 1, creach.dtype) * creach[-1]]
    ) > jnp.arange(bw + cfg.L)
    return jax.lax.dynamic_update_slice(
        jnp.zeros((cfg.W,), bool), loc, (p0,))


def _prec_risk(cfg: FillConfig, deep_total, cov, gap_zone):
    """deep_total: row totals at the deepest computed level (from the soft
    accumulate) — rows still <= TAU there would select an uncomputed level
    in the full cascade."""
    if cfg.exact_soft or not cfg.detect_prec:
        return jnp.bool_(False)
    return jnp.any(gap_zone & cov & (deep_total <= _CASCADE_TAU))


def _detect_overlap_partial(cfg, inst, accept, pos_gap, bonus_cap=None):
    """detect_overlap_gapestimate (2513-2779), vectorised.

    Returns (bonus_value, saved_left, saved_right) where bonus follows the
    reference decision: +300 perfect spanning read; +30*max_overlap verified
    left x right read overlap; -100 false overlap.

    Faithful details: a pair only contributes (as good OR false) when BOTH
    reads' flank fragments pass find_partial_match vs the gap flanks
    (< 20% mismatch over min(|pos|, side_limit) chars, >= 4 chars,
    2690-2700); gap-spanning match-2/3 reads join right_cross with shifted
    common substrings (sm_flag, 2627-2633 / 2704-2722); the common strings
    must come out equal-length (std::substr clamping semantics).  With
    ``bonus_cap >= P`` (reference_exact) pairs enumerate in read order, so
    the first-maximum saved pair matches the reference's scan order; the
    capped production path keeps extreme reads per side.
    """
    if bonus_cap is None:
        bonus_cap = min(cfg.bonus_cap, cfg.P)
    pr, p_len, p_match, p_valid = (
        inst["pr"], inst["p_len"], inst["p_match"], inst["p_valid"])
    gl = inst["gap_len"]
    sl = inst["side_limit"]
    P, L = pr.shape
    acc = accept & p_valid

    reach = jnp.minimum(pos_gap + p_len, gl) - 1
    leftish = (p_match == 1) | (p_match == 4) | (pos_gap < 0)
    l_max = jnp.max(jnp.where(acc & leftish, reach, -(1 << 20)))
    start = jnp.maximum(pos_gap, 0)
    r_min = jnp.min(jnp.where(acc & ~leftish, start, 1 << 20))
    l_max = jnp.where(l_max == -(1 << 20), -1, l_max)
    r_min = jnp.where(r_min == 1 << 20, gl, r_min)

    from ..align.core import _extract_span, shift_left_batch

    rows_n = (cfg.W + 127) // 128 + 2
    tmpl2d = jnp.full((rows_n * 128,), jnp.int8(5)).at[: cfg.W].set(
        inst["tmpl"]).reshape(rows_n, 128)
    u = jnp.arange(L)[None, :]

    def _flank_frac(f, rch, tch, thresh):
        """Pass mask for fragment compare over f chars (f >= min_len)."""
        inwin = u < f[:, None]
        mis = jnp.sum(inwin & (rch != tch), axis=1)
        return mis <= thresh * f

    # left-flank fragment per read (get_read_frag p<0): read chars at gap
    # coords [-f, 0), f = min(-p, side_limit), vs the last f flank chars
    f_l = jnp.minimum(jnp.maximum(-pos_gap, 0), sl)
    rch_l = shift_left_batch(pr, jnp.clip(-f_l - pos_gap, 0, L), jnp.int8(-1))
    tch_l = _extract_span(tmpl2d, jnp.clip(cfg.WL - f_l, 0, cfg.W - 1), L)
    ok_l4 = (f_l >= 4) & _flank_frac(f_l, rch_l, tch_l, 0.2 - 1e-9)
    ok_l8 = (f_l >= 8) & _flank_frac(f_l, rch_l, tch_l, 0.08)
    # right-flank fragment (get_read_frag p>0 / sm): read chars from read
    # coord gl - p, f = min(side_limit, len - (gl - p)), vs flank prefix
    startr = gl - pos_gap
    f_r = jnp.clip(jnp.minimum(sl, p_len - startr), 0, L)
    rch_r = shift_left_batch(pr, jnp.clip(startr, 0, L), jnp.int8(-1))
    tch_r = _extract_span(
        tmpl2d, jnp.broadcast_to(jnp.clip(cfg.WL + gl, 0, cfg.W - 1), (P,)), L)
    startr_ok = (startr >= 0) & (startr <= p_len)
    ok_r4 = (f_r >= 4) & startr_ok & _flank_frac(f_r, rch_r, tch_r, 0.2 - 1e-9)
    ok_r8 = (f_r >= 8) & startr_ok & _flank_frac(f_r, rch_r, tch_r, 0.08)

    # ---- perfect spanning read (2604-2624) -------------------------------
    spans = acc & (pos_gap < 0) & (pos_gap + p_len > gl)
    perfect = jnp.any(spans & ok_l8 & ok_r8)

    # ---- left x right overlap verification (2647-2756) -------------------
    lc = acc & (pos_gap < 0) & (reach >= r_min) & (pos_gap + p_len <= gl)
    rc_n = acc & (pos_gap > 0) & (pos_gap <= l_max)
    rc_sm = acc & (pos_gap < 0) & (pos_gap + p_len > gl) \
        & ((p_match == 2) | (p_match == 3))
    rc = rc_n | rc_sm
    if bonus_cap >= P:
        # read-order enumeration: ties in max_overlap break exactly like the
        # reference's nested scan
        li = jnp.arange(P)
        ri = jnp.arange(P)
        lval, rval = lc, rc
    else:
        lkey = jnp.where(lc, reach, -(1 << 20))
        rkey = jnp.where(rc, -jnp.where(rc_sm, pos_gap + (1 << 10), start),
                         -(1 << 20))
        li = jnp.argsort(-lkey)[:bonus_cap]
        ri = jnp.argsort(-rkey)[:bonus_cap]
        lval = lc[li]
        rval = rc[ri]
    cap_l, cap_r = li.shape[0], ri.shape[0]
    p1 = pos_gap[li][:, None]
    l1 = p_len[li][:, None]
    p2 = pos_gap[ri][None, :]
    l2 = p_len[ri][None, :]
    sm2 = rc_sm[ri][None, :]
    diff_gap = jnp.maximum(p1 + l1 - gl, 0)  # 0: left_cross has p1+l1 <= gl
    ov = (p1 + l1 - 1) - p2 + 1 - diff_gap
    pair_ok = lval[:, None] & rval[None, :] & (li[:, None] != ri[None, :]) \
        & (ov >= 5)

    # common substrings: non-sm  read1[l1-ov-dg : +ov] vs read2[0 : ov];
    # sm (x=p2<0)  read1[l1-ov+|x| : +(ov-|x|)] vs read2[|x| : +(ov-|x|)]
    xabs = jnp.where(sm2, -p2, 0)
    cmp_len = ov - xabs
    a1s = l1 - ov + xabs - diff_gap
    a2s = xabs
    len_ok = (cmp_len > 0) & (a1s >= 0) & (a2s + cmp_len <= l2)
    flank_ok = ok_l4[li][:, None] & ok_r4[ri][None, :]

    t = jnp.arange(L)[None, None, :]
    r1rep = jnp.repeat(pr[li], cap_r, axis=0)                # (cl*cr, L)
    c1 = shift_left_batch(r1rep, jnp.clip(a1s, 0, L).reshape(-1),
                          jnp.int8(-1)).reshape(cap_l, cap_r, L)
    r2rep = jnp.tile(pr[ri], (cap_l, 1))                     # (cl*cr, L)
    c2 = shift_left_batch(r2rep, jnp.clip(jnp.broadcast_to(
        a2s, (cap_l, cap_r)), 0, L).reshape(-1),
        jnp.int8(-2)).reshape(cap_l, cap_r, L)
    inwin = t < cmp_len[:, :, None]
    mism = jnp.sum(inwin & (c1 != c2), axis=2)
    cand = pair_ok & flank_ok & len_ok
    good = cand & (mism <= 0.1 * jnp.maximum(cmp_len, 1))
    bad = cand & (mism > 0.1 * jnp.maximum(cmp_len, 1))
    max_ov = jnp.max(jnp.where(good, cmp_len, 0))
    any_false = jnp.any(bad)

    bonus = jnp.where(
        perfect | ((inst["perfect_gap"] == 1) & (inst["orig_gap"] <= 20)
                   & (gl == inst["perfect_gaplen"])),
        300.0,
        jnp.where(
            (r_min <= l_max)
            & (((~any_false) & (max_ov >= 5)) | (any_false & (max_ov >= 10))),
            30.0 * max_ov,
            jnp.where((r_min <= l_max) & (any_false | (max_ov < 5)), -100.0, 0.0),
        ),
    )
    # saved pair: FIRST strict maximum in scan order (if(len1 > max_overlap))
    gi, gj = jnp.unravel_index(jnp.argmax(jnp.where(good, cmp_len, -1)),
                               good.shape)
    has = jnp.any(good)
    saved_l = jnp.where(has, li[gi], -1)
    saved_r = jnp.where(has, ri[gj], -1)
    return bonus, saved_l, saved_r


def _find_overlap_unmapped(cfg, inst, accept, pos_gap, lens):
    """findOverlapUnmapped (2945-3019): chain discontinuity penalties.

    Returns (value, new_accept, discont_flag).
    """
    R = accept.shape[0]
    key = jnp.where(accept, pos_gap, -200)
    order = jnp.argsort(key)
    sp = key[order]
    sl = lens[order]
    sidx = order
    real = sp != -200
    nxt = jnp.roll(sp, -1)
    diff = sp + sl - nxt
    pairable = real & (jnp.arange(R) < R - 1)
    discont = pairable & (diff >= 0) & (diff < 4)  # match_count_discont
    gap_pen = pairable & (diff < 0)
    value = jnp.sum(jnp.where(discont, -250.0, 0.0)) + jnp.sum(
        jnp.where(gap_pen, -200.0, 0.0))
    # unmark both reads of gap-separated pairs
    unmark = jnp.zeros(R, bool)
    unmark = unmark.at[sidx].max(gap_pen)
    unmark = unmark.at[jnp.roll(sidx, -1)].max(gap_pen)
    new_accept = accept & ~unmark
    # edge-crossing advantages (+50): computed on the pre-unmark set
    gl = inst["gap_len"]
    lr1 = accept & (pos_gap < 0) & (-pos_gap >= 3) & (pos_gap + lens > 0)
    lr2 = accept & (pos_gap < gl) & (pos_gap + lens - gl >= 3)
    value = value + 50.0 * (jnp.sum(lr1) + jnp.sum(lr2))
    return value, new_accept, jnp.any(discont)


def _update_reanchor(cfg: FillConfig, inst, counts, gc, accept, has_place,
                     pl_major, left_max):
    """The "update" re-anchoring step (Figbird.cpp:4030-4376), large gaps.

    Unplaced-but-placeable reads are re-anchored by *exact* suffix/prefix
    match (> 25% of read length) onto the consensus edges flanking the
    unfilled N-region; matching reads vote (weight = match length) into the
    region, and rows with any votes REPLACE countsGap with frequencies for
    the next EM iteration.  When no read anchors on the left, the
    partial-read majority string votes instead (4310-4321).  The reference's
    right-side fallback (4322-4331) is dead code — ``num_match_count1`` is
    initialised to 1 (4039) so its ``==0`` guard never fires — and is
    intentionally not replicated.

    Returns the (possibly) updated counts (W, 5); N column untouched
    (4340-4352 writes k<4 only).
    """
    L, mgl, R = cfg.L, cfg.max_gap_len, inst["ur"].shape[0]
    MS = max(int(L * 0.67), 2)
    thresh = jnp.int32(int(L * 0.25))
    min_gap = L // 2 + 1
    gl = inst["gap_len"]
    gs = inst["gap_start"]
    t = jnp.arange(mgl)
    in_gap = t < gl
    isn = (gc == 4) & in_gap

    # long-N-run endpoints (index_pair[0/1], 4058-4093): runs < min_gap_len
    # are ignored
    not_n_idx = jnp.where((~isn) & in_gap, t, -1)
    run_start = jax.lax.cummax(not_n_idx, axis=0) + 1
    nxt = jnp.where((~isn) & in_gap, t, 1 << 20)
    next_non = jax.lax.cummin(nxt[::-1], axis=0)[::-1]
    run_end = jnp.where(next_non < 1 << 20, next_non - 1, gl - 1)
    qual = isn & (run_end - run_start + 1 >= min_gap)
    any_q = jnp.any(qual)
    s0 = jnp.min(jnp.where(qual, run_start, 1 << 20))
    e1 = jnp.max(jnp.where(qual, run_end, -(1 << 20)))
    index0 = jnp.maximum(s0 - 1, 0)
    index1 = jnp.minimum(e1 + 1, gl - 1)

    # left text segment: up to MS chars ending at index0, N-truncated (4110)
    jj = jnp.arange(MS)
    index_s = jnp.maximum(index0 - MS + 1, 0)
    TLpos = index_s + jj
    TL = gc[jnp.clip(TLpos, 0, mgl - 1)]
    badl = (TL == 4) | (TLpos >= gl)
    VL = jnp.where(jnp.any(badl), jnp.argmax(badl), MS)
    # right segment: MS chars from index1, N kept verbatim (4123-4129)
    TR_len = jnp.minimum(MS, gl - index1)
    TRpos = index1 + jj
    TR = gc[jnp.clip(TRpos, 0, mgl - 1)]
    TRrev = TR[jnp.clip(TR_len - 1 - jj, 0, MS - 1)]

    ur, rl = inst["ur"], inst["u_len"]
    elig = (~accept) & has_place & inst["u_valid"]
    # per-read insert gating at both anchor points (4177-4197)
    tmin, tmax = cfg.insert_tmin, cfg.insert_tmax
    upos = inst["u_pos"]

    def ins_ok(idx):
        placed = gs + idx
        ins = jnp.where(upos < gs, placed + rl - upos, upos - placed + rl)
        return (ins >= tmin + 100) & (ins <= tmax - 100)

    ok0, ok1 = ins_ok(index0), ins_ok(index1)

    kk = jnp.arange(MS)
    rchar = ur[:, :MS]  # k < MS matching window

    def first_match(seg, seg_len, read_k):
        """Smallest offset j with seg[j:seg_len] == read[:seg_len-j] exactly
        and match length > thresh; returns (found, match_len)."""
        m_len = seg_len - jj[:, None]                       # (MS,1) per j
        seg_at = seg[jnp.clip(jj[:, None] + kk[None, :], 0, MS - 1)]  # (MS,MS)
        eqs = (seg_at[None] == read_k[:, None, :]) & (
            kk[None, None, :] < rl[:, None, None])
        need = kk[None, None, :] < m_len[None, :, :].reshape(1, MS, 1)
        okk = jnp.all(eqs | ~need, axis=2)                  # (R, MS)
        ok = okk & (m_len[None, :, 0] > thresh) & (jj[None, :] < seg_len)
        has = jnp.any(ok, axis=1)
        jstar = jnp.argmax(ok, axis=1)
        return has, seg_len - jstar

    has_l, match_l = first_match(TL, VL, rchar)
    # right side matches reversed read against reversed segment (4250-4262);
    # per-row reversal realigned with the static shift trick (a minor-axis
    # take_along_axis is ~60x slower on TPU)
    from ..align.core import shift_left_batch

    revread = shift_left_batch(ur[:, ::-1],
                               jnp.clip(L - rl, 0, L), jnp.int8(4))[:, :MS]
    has_r, match_r = first_match(TRrev, TR_len, revread)
    has_l = has_l & elig & ok0 & any_q
    has_r = has_r & elig & ok1 & any_q

    ri = jnp.arange(L)[None, :]
    # left votes: read char ri lands at index0 - match + 1 + ri (4224-4238)
    pos_l = index0 - match_l[:, None] + 1 + ri
    val_l = has_l[:, None] & (pos_l > index0) & (pos_l < gl) & (ri < rl[:, None])
    w_l = jnp.where(val_l, match_l[:, None], 0).astype(jnp.float32)
    # right votes: reversed char ri lands at index1 + match - 1 - ri (4283-4299)
    pos_r = index1 + match_r[:, None] - 1 - ri
    val_r = has_r[:, None] & (pos_r < index1) & (pos_r >= 0) & (ri < rl[:, None])
    w_r = jnp.where(val_r, match_r[:, None], 0).astype(jnp.float32)
    rev_all = shift_left_batch(ur[:, ::-1], jnp.clip(L - rl, 0, L),
                               jnp.int8(4))
    # per-base scatter columns (an (R, L, 4) one-hot update would tile-pad
    # its 4-minor dim 32x on TPU); read-N spreads over ACGT (ONEHOT4[4]=1)
    idx_l = jnp.clip(pos_l, 0, mgl - 1).reshape(-1)
    idx_r = jnp.clip(pos_r, 0, mgl - 1).reshape(-1)
    cols = []
    for c in range(4):
        wl_c = jnp.where((ur == c) | (ur == 4), w_l, 0.0).reshape(-1)
        wr_c = jnp.where((rev_all == c) | (rev_all == 4), w_r, 0.0).reshape(-1)
        col = jnp.zeros((mgl,), jnp.float32).at[idx_l].add(wl_c)
        cols.append(col.at[idx_r].add(wr_c))
    cp = jnp.stack(cols, axis=1)

    # left partial-majority fallback (4310-4321): reference's post-loop flag1
    # is the LAST eligible read's insert flag (loop-variable reuse quirk)
    last_elig = jnp.max(jnp.where(elig, jnp.arange(R), -1))
    flag1_last = jnp.where(last_elig >= 0, ok0[jnp.clip(last_elig, 0, R - 1)],
                           True) & any_q
    len_pl = jnp.maximum(left_max - 4 + 1 - 1, 0)  # chars at i <= left_max-5
    fb = flag1_last & (jnp.sum(has_l) == 0) & (index0 < len_pl)
    fb_pos = fb & (t > index0) & (t < len_pl)
    plm = jnp.minimum(pl_major, 4)
    fb4 = jnp.stack([((plm == c) | (plm == 4)).astype(jnp.float32)
                     for c in range(4)], axis=1)
    cp = cp + jnp.where(fb_pos[:, None], fb4, 0.0)

    # replace countsGap rows that got votes with frequencies (4334-4352)
    tot = cp.sum(axis=1)
    w = jnp.arange(cfg.W)
    gidx = w - cfg.WL
    cp_w = cp[jnp.clip(gidx, 0, mgl - 1)]
    tot_w = tot[jnp.clip(gidx, 0, mgl - 1)]
    repl = (tot_w > 0) & (gidx >= 0) & (gidx < gl) & any_q
    new4 = jnp.where(repl[:, None],
                     cp_w / jnp.maximum(tot_w, 1e-9)[:, None],
                     counts[:, :4])
    return jnp.concatenate([new4, counts[:, 4:]], axis=1)


# ===========================================================================
# per-instance EM (vmapped over the instance axis by fill_batch)
# ===========================================================================

def _stack_for(inst, cfg: FillConfig):
    """Partial-stack init: from per-gap precomputed halves when present
    (gathered path; ~30%% of a scan dispatch saved), else inline."""
    if "stackL" in inst:
        return partial_stack_from_full(
            inst["stackL"], inst["stackR"], inst["stack_base_max"],
            inst["stack_clip_max"], cfg.max_gap_len, inst["gap_len"])
    return partial_stack_probs(
        inst["pr"], inst["p_clip"], inst["p_match"], inst["p_len"],
        inst["p_valid"], cfg.max_gap_len, inst["gap_len"])


def _counts_flank(inst, cfg):
    """initialize (2298-2383): flank one-hots outside the gap zone."""
    tmpl = inst["tmpl"]
    base = jnp.where((tmpl >= 0) & (tmpl <= 4), jnp.minimum(tmpl, 4), 4)
    c = jnp.stack([(base == k).astype(jnp.float32) for k in range(5)], axis=1)
    c = jnp.where((tmpl >= 5)[:, None], 0.0, c)  # outside contig: no counts
    return c


def _gap_zone(inst, cfg):
    w = jnp.arange(cfg.W)
    return (w >= cfg.WL) & (w < cfg.WL + inst["gap_len"])


def _place_partial(cfg, inst, model, probs, eprobs, track_orig):
    P, L = inst["pr"].shape
    j = jnp.arange(L)[None, :]
    plen = inst["p_len"][:, None]
    left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
    jv_count = j < plen
    jv_score = jv_count & jnp.where(left, j >= cfg.clip_thresh,
                                    j < plen - cfg.clip_thresh)
    oh_score = _oh_flat_j(inst["pr"], jv_score)
    oh_count, oh_jm = _oh_count_for(inst["pr"], jv_count)
    gap_zone = _gap_zone(inst, cfg)
    p0l, p0r = _band_starts(cfg, inst["gap_len"])
    leg1 = _legal_partial_band(cfg, inst, p0l, True)
    leg2 = _legal_partial_band(cfg, inst, p0r, False)

    ln1 = jnp.where(leg1, _score_soft_band(
        oh_score, probs, eprobs, model["e_fwd"], p0l, cfg), NEG)
    ln2 = jnp.where(leg2, _score_soft_band(
        oh_score, probs, eprobs, model["e_fwd"], p0r, cfg), NEG)
    soft, deep_total = _soft_counts_banded(LN10 * ln1, leg1, LN10 * ln2,
                                           leg2, p0r, oh_count, cfg, oh_jm)
    counts = jnp.where(gap_zone[:, None], soft, _counts_flank(inst, cfg))
    if cfg.detect_prec and not cfg.exact_soft:
        eff1 = leg1 & (LN10 * ln1 >= _MIN_LOGW_REP)
        eff2 = leg2 & (LN10 * ln2 >= _MIN_LOGW_REP)
        cov = _coverage_band(cfg, eff1, inst["p_len"], p0l) \
            | _coverage_band(cfg, eff2, inst["p_len"], p0r)
        prec = _prec_risk(cfg, deep_total, cov, gap_zone)
    else:
        prec = jnp.bool_(False)

    mx, _ = _combine_bands_max(ln1, ln2, p0r)
    has = mx > NEG / 2
    ml_soft = _csum(jnp.where(has & inst["p_valid"], mx, 0.0))

    cons0, _ = consensus_from_counts(counts, gap_zone, 0, 0)
    gap_string = jnp.where(gap_zone, cons0, inst["tmpl"])
    sh1 = jnp.where(leg1, _score_hard_band(oh_score, gap_string, model,
                                           p0l, cfg), NEG)
    sh2 = jnp.where(leg2, _score_hard_band(oh_score, gap_string, model,
                                           p0r, cfg), NEG)
    mh, arg_h = _combine_bands_max(sh1, sh2, p0r)
    pos_h = arg_h - cfg.WL
    accept = (mh > NEG / 2) & (-mh / LN10 < cfg.gap_prob_cutoff) & inst["p_valid"]
    valid = jnp.sum(accept)

    bonus, saved_l, saved_r = _detect_overlap_partial(cfg, inst, accept, pos_h)
    likelihood = ml_soft + bonus
    return dict(counts=counts, likelihood=likelihood, accept=accept,
                pos=pos_h, valid=valid, saved_l=saved_l, saved_r=saved_r,
                prec=prec)


def em_partial_instance(cfg: FillConfig, inst, model):
    """3-iteration partial EM (fillGap 6323-6344 partial branch)."""
    gap_zone = _gap_zone(inst, cfg)
    counts0 = _counts_flank(inst, cfg)
    ncol = jnp.where(gap_zone, 1.0, 0.0)
    counts0 = counts0.at[:, 4].add(ncol)
    probs = compute_probs_gap(counts0)
    # partial-stack initialisation (update_partial_prob via computeProbsGap(1))
    st4, left_max, right_min = _stack_for(inst, cfg)
    tot = st4.sum(axis=1, keepdims=True)
    stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)  # (maxG,5)
    stp_w = jnp.zeros((cfg.W, 5)).at[cfg.WL : cfg.WL + cfg.max_gap_len].set(stp)
    t_in_gap = gap_zone
    probs = jnp.where(t_in_gap[:, None], stp_w, probs)
    eprobs = compute_error_probs_gap(probs, model["et"])

    out = None
    prec = jnp.bool_(False)
    for _ in range(3):
        out = _place_partial(cfg, inst, model, probs, eprobs, False)
        prec = prec | out["prec"]
        probs = compute_probs_gap(out["counts"])
        eprobs = compute_error_probs_gap(probs, model["et"])

    cons, _ = consensus_from_counts(out["counts"], gap_zone, 0, 0)
    gap_cons = jax.lax.dynamic_slice(cons, (cfg.WL,), (cfg.max_gap_len,))
    return dict(
        likelihood=out["likelihood"], consensus=gap_cons, valid=out["valid"],
        accept=out["accept"], pos=out["pos"], saved_l=out["saved_l"],
        saved_r=out["saved_r"], counts=out["counts"],
        left_max=left_max, right_min=right_min, prec=prec,
    )


def _unmapped_prep(cfg, inst, model):
    """Loop-invariant tensors of the unmapped EM body, hoisted OUT of the
    while loop: the read one-hots, legality, and especially the insert
    prior — an (R, Wp) element gather from ln_ins that XLA does NOT hoist
    out of while bodies and that dominated every EM iteration (minor-axis
    gathers are ~60x slow on TPU)."""
    R, L = inst["ur"].shape
    j = jnp.arange(L)[None, :]
    jv = j < inst["u_len"][:, None]
    legal, t_ins = _legal_unmapped(cfg, inst, model)
    oh = _oh_flat_j(inst["ur"], jv)
    # kernel path: score and count masks are IDENTICAL in unmapped mode, so
    # the j-major score one-hot doubles as the count one-hot — one (R, 5L)
    # f32 materialisation instead of two
    oh_jm = _use_count_kernel(R)
    return dict(
        oh=oh,
        oh_cnt=oh if oh_jm else _oh_flat_c(inst["ur"], jv),
        oh_jm=oh_jm,
        legal=legal,
        prior=model["ln_ins"][t_ins],
        rev=(inst["u_rev"] == 1)[:, None],
        flank=_counts_flank(inst, cfg),
    )


def _place_unmapped(cfg, inst, model, probs, eprobs, finalize_flag: bool,
                    prep=None):
    R, L = inst["ur"].shape
    if prep is None:
        prep = _unmapped_prep(cfg, inst, model)
    oh = prep["oh"]
    oh_cnt = prep["oh_cnt"]
    legal = prep["legal"]
    prior = prep["prior"]
    rev = prep["rev"]
    gap_zone = _gap_zone(inst, cfg)

    # soft pass: two strand groups for the cycle-indexed error rate
    ln_f = band_score_soft(oh, probs, eprobs, model["e_fwd"], cfg.Wp)
    ln_r = band_score_soft(oh, probs, eprobs, model["e_rev"], cfg.Wp)
    lnP = jnp.where(rev, ln_r, ln_f) + prior
    lnP = jnp.where(legal, lnP, NEG)
    logw_u = 0.5 * lnP / LN10
    soft, deep_total = _accumulate_logw(logw_u, legal, oh_cnt, cfg,
                                        prep["oh_jm"])
    counts = jnp.where(gap_zone[:, None], soft, prep["flank"])
    if cfg.detect_prec and not cfg.exact_soft:
        eff = legal & (logw_u >= _MIN_LOGW_REP)
        prec = _prec_risk(cfg, deep_total,
                          _coverage_full(cfg, eff, inst["u_len"]), gap_zone)
    else:
        prec = jnp.bool_(False)

    mx10 = jnp.max(lnP, axis=1) / LN10

    # hard pass vs current consensus
    cons0, _ = consensus_from_counts(counts, gap_zone, 0, 0)
    gap_string = jnp.where(gap_zone, cons0, inst["tmpl"])
    Kh_f = _hard_K(gap_string, model["a_fwd"], model["b_fwd"], model["ln_et"])
    Kh_r = _hard_K(gap_string, model["a_rev"], model["b_rev"], model["ln_et"])
    sh = jnp.where(rev, _score(oh, Kh_r, cfg.Wp), _score(oh, Kh_f, cfg.Wp))
    sh = jnp.where(legal, sh, NEG)
    mh10 = jnp.max(sh, axis=1) / LN10
    pos_h = jnp.argmax(sh, axis=1).astype(jnp.int32) - cfg.WL
    accept = (mh10 > NEG / 2) & (-mh10 < cfg.gap_prob_cutoff) & inst["u_valid"]
    likelihood = _csum(jnp.where(inst["u_valid"],
                                 jnp.where(accept, mh10, -50.0), 0.0))
    valid = jnp.sum(accept)

    # hard counts at max positions only (3868-3879)
    w_hard = (accept[:, None] & (jnp.arange(cfg.Wp)[None, :] ==
                                 (pos_h + cfg.WL)[:, None])).astype(jnp.float32)
    new_counts = _accumulate(w_hard, oh_cnt, cfg, prep["oh_jm"])
    new_counts = jnp.where(gap_zone[:, None], new_counts, 0.0)

    cons2, cov = consensus_from_counts(new_counts, gap_zone, 1,
                                       cfg.coverage_threshold1)
    gap_cov = jax.lax.dynamic_slice(cov, (cfg.WL,), (cfg.max_gap_len,))

    region_perct = jnp.float32(0.0)
    discont = jnp.bool_(False)
    if finalize_flag:
        # low-coverage region detection (3935-3977)
        t = jnp.arange(cfg.max_gap_len)
        in_gap = t < inst["gap_len"]
        low = (gap_cov < cfg.coverage_threshold2) & in_gap
        # run_start[t] = (last ~low index before t) + 1
        not_low_idx = jnp.where((~low) & in_gap, t, -1)
        run_start = jax.lax.cummax(not_low_idx, axis=0) + 1
        # run_end[t] = (first ~low index at/after t) - 1
        nxt = jnp.where((~low) & in_gap, t, 1 << 20)
        next_not_low = jax.lax.cummin(nxt[::-1], axis=0)[::-1]
        run_end = jnp.where(next_not_low < 1 << 20, next_not_low - 1,
                            inst["gap_len"] - 1)
        run_len = run_end - run_start + 1
        # reference closes a region only when (end - start) >= 10, i.e.
        # run length >= 11 (Figbird.cpp:3950, 3962)
        qualif = low & (run_len >= 11)
        first_q = jnp.min(jnp.where(qualif, t, 1 << 20))
        last_q = jnp.max(jnp.where(qualif, t, -(1 << 20)))
        any_q = jnp.any(qualif)
        region_perct = jnp.where(
            any_q, (last_q - first_q).astype(jnp.float32) /
            jnp.maximum(inst["gap_len"], 1), 0.0)
        # discard interior-only reads (3993-4013)
        interior = accept & (pos_h >= first_q) & (pos_h + inst["u_len"] - 1 < last_q)
        interior = interior & any_q
        likelihood = likelihood - 50.0 * jnp.sum(interior)
        accept = accept & ~interior
        valid = valid - jnp.sum(interior)
        ov_val, accept, discont = _find_overlap_unmapped(
            cfg, inst, accept, pos_h, inst["u_len"])
        likelihood = likelihood + ov_val

    return dict(counts=counts, new_counts=new_counts, likelihood=likelihood,
                accept=accept, pos=pos_h, valid=valid, cons2=cons2,
                region_perct=region_perct, discont=discont, mx10=mx10,
                prec=prec)


def _unroll_stage0() -> bool:
    """Opt-in unroll of the short-cap stage-0 EM loop.  A microbenchmark
    showed ~35% per-dispatch gains, but in the real pipeline the vmapped
    while_loop already exits early for fully-converged batches (its cond is
    any-lane), so warm walls were IDENTICAL (44.4 vs 42.3 s u-pass, r5) and
    the 8x-unrolled programs compile much slower — default off."""
    import os as _os

    return _os.environ.get("FIGBIRD_UNROLL_STAGE0", "0") not in (
        "0", "false", "")


def em_unmapped_instance(cfg: FillConfig, inst, model, finalize_flag: bool,
                         large_break: bool | None = None):
    """Unmapped EM: iterate until consensus stable 5x or iteration cap.

    fillGap 6323-6344 unmapped branch; for small gaps (large_gap_flag==0) the
    loop runs with finalize extras off and one finalize placeReads at the end
    (6348-6352).  ``large_break`` enables the large-gap region early break
    (6338) — on for the large-gap scan, OFF for checkGapReads probes, which
    run with finalize extras but no such break (run(), Figbird.cpp:5913-5956).
    """
    if large_break is None:
        large_break = finalize_flag
    gap_zone = _gap_zone(inst, cfg)
    counts0 = _counts_flank(inst, cfg)
    counts0 = counts0.at[:, 4].add(jnp.where(gap_zone, 1.0, 0.0))
    probs0 = compute_probs_gap(counts0)
    # partial-stack init runs in unmapped mode too (computeProbsGap(1) at init)
    st4, left_max, _right_min = _stack_for(inst, cfg)
    pl_major = jnp.argmax(st4, axis=1).astype(jnp.int8)  # partial_left chars
    tot = st4.sum(axis=1, keepdims=True)
    stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)
    stp_w = jnp.zeros((cfg.W, 5)).at[cfg.WL : cfg.WL + cfg.max_gap_len].set(stp)
    probs0 = jnp.where(gap_zone[:, None], stp_w, probs0)
    eprobs0 = compute_error_probs_gap(probs0, model["et"])
    # loop-invariant read tensors + insert prior, hoisted out of the body
    # (closed over — NOT part of the carry, so XLA treats them as constants)
    prep = _unmapped_prep(cfg, inst, model)

    prev_cons = jnp.full((cfg.max_gap_len,), -1, jnp.int8)
    R = inst["ur"].shape[0]
    init = dict(
        it=jnp.int32(0), comp=jnp.int32(0), done=jnp.bool_(False),
        probs=probs0, eprobs=eprobs0,
        counts=counts0, likelihood=jnp.float32(0.0),
        accept=jnp.zeros(R, bool), pos=jnp.zeros(R, jnp.int32),
        valid=jnp.int32(0), prev=prev_cons,
        region_perct=jnp.float32(0.0), discont=jnp.bool_(False),
        prec=jnp.bool_(False),
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < cfg.em_iters)

    def body(s):
        out = _place_unmapped(cfg, inst, model, s["probs"], s["eprobs"],
                              finalize_flag, prep=prep)
        gc = jax.lax.dynamic_slice(out["cons2"], (cfg.WL,), (cfg.max_gap_len,))
        same = jnp.all(gc == s["prev"])
        comp = jnp.where(same, s["comp"] + 1, 0)
        counts = out["counts"]
        if finalize_flag:
            # "update" re-anchoring of unplaced reads onto consensus edges
            # (Figbird.cpp:4029: unmapped && comp_count>=1 && region_perct!=0
            #  && not the last EM iteration; updateflag == large_gap_flag)
            upd = _update_reanchor(cfg, inst, counts, gc, out["accept"],
                                   out["mx10"] > NEG / 2, pl_major, left_max)
            cond = ((comp >= 1) & (out["region_perct"] != 0.0)
                    & (s["it"] != cfg.em_iters - 1))
            counts = jnp.where(cond, upd, counts)
        probs = compute_probs_gap(counts)
        eprobs = compute_error_probs_gap(probs, model["et"])
        done = comp >= cfg.comp_stable
        if large_break:
            # large-gap early break (6338)
            done = done | (out["region_perct"] * inst["gap_len"].astype(jnp.float32)
                           < 2.0 * cfg.L)
        return dict(it=s["it"] + 1, comp=comp, done=done, probs=probs,
                    eprobs=eprobs, counts=out["counts"],
                    likelihood=out["likelihood"], accept=out["accept"],
                    pos=out["pos"], valid=out["valid"], prev=gc,
                    region_perct=out["region_perct"], discont=out["discont"],
                    prec=s["prec"] | out["prec"])

    if cfg.em_iters <= 8 and _unroll_stage0():
        # short-cap (stage-0) programs: unroll — XLA pipelines/fuses across
        # iterations where a while_loop forces a barrier per trip (measured
        # ~35% cheaper on v5e at the bench's u bucket).  Converged lanes'
        # state is frozen by selection, identical to the while_loop's exit.
        s = init
        for _ in range(cfg.em_iters):
            live = cond(s)
            s2 = body(s)
            s = jax.tree_util.tree_map(
                lambda a, b: jnp.where(live, b, a), s, s2)
    else:
        s = jax.lax.while_loop(cond, body, init)

    if not finalize_flag:
        # one finalize-mode placeReads after convergence (6348-6352)
        out = _place_unmapped(cfg, inst, model, s["probs"], s["eprobs"], True,
                              prep=prep)
        s = dict(s, likelihood=out["likelihood"], accept=out["accept"],
                 pos=out["pos"], valid=out["valid"], counts=out["counts"],
                 region_perct=out["region_perct"], discont=out["discont"],
                 prec=s["prec"] | out["prec"])

    cons, _ = consensus_from_counts(s["counts"], gap_zone, 0, 0)
    gap_cons = jax.lax.dynamic_slice(cons, (cfg.WL,), (cfg.max_gap_len,))
    # edge flags for small-gap scan heuristics (3894-3911)
    val = s["pos"] + inst["u_len"] - inst["gap_len"]
    acc = s["accept"]
    ucoverf = jnp.any(acc & (s["pos"] < 0) & (val > 0) & (-s["pos"] > 3) & (val > 3))
    umaxleftf = jnp.any(acc & (s["pos"] < 0) & (s["pos"] + inst["u_len"] > 0)
                        & (-s["pos"] > 3))
    umaxrightf = jnp.any(acc & (s["pos"] > 0) & (s["pos"] < inst["gap_len"])
                         & (val > 0) & (val > 3))
    return dict(
        likelihood=s["likelihood"], consensus=gap_cons, valid=s["valid"],
        accept=s["accept"], pos=s["pos"], counts=s["counts"],
        region_perct=s["region_perct"], discont=s["discont"],
        ucoverf=ucoverf, umaxleftf=umaxleftf, umaxrightf=umaxrightf,
        iters=s["it"], prec=s["prec"],
        # hit the iteration cap without converging: the converge-or-escalate
        # scan staging re-runs these instances at the full cap (from-scratch
        # recompute => bit-identical trajectories for converged lanes)
        bailed=(~s["done"]) & (s["it"] >= cfg.em_iters),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "finalize_flag",
                                               "large_break"))
def fill_batch(cfg: FillConfig, insts, model, finalize_flag: bool = True,
               large_break: bool | None = None):
    """vmapped EM over the instance axis.

    ``insts``: dict of arrays with leading instance axis; ``model``: shared
    model arrays (e_fwd/e_rev/a_fwd/a_rev/b_fwd/b_rev (L,), et/ln_et (5,5),
    ln_ins (M,)).
    """
    if cfg.partial_mode:
        fn = lambda inst: em_partial_instance(cfg, inst, model)
    else:
        fn = lambda inst: em_unmapped_instance(cfg, inst, model,
                                               finalize_flag, large_break)
    return jax.vmap(fn)(insts)


# ===========================================================================
# gathered entry points: per-GAP arrays live on device once; each dispatch
# passes only (gap_idx, gap_len) int vectors.  Replaces the reference's
# re-read of per-gap SAM files per candidate length (fillGap 6298-6482 calls
# run() which re-parses; here the read tensors are resident) and kills the
# per-instance host padding cost of the round-1 design.
# ===========================================================================

def build_tmpl(left_win, right_win, gap_len, cfg: FillConfig):
    """Assemble the window template for one candidate gap length.

    left_win (WL,): contig chars left of the gap (5 beyond contig start).
    right_win (maxG+L,): contig chars from gap end (5 beyond contig end).
    tmpl[w] = left for w<WL; 4 in the gap zone; right[w-WL-glen] after.
    """
    w = jnp.arange(cfg.W)
    ridx = jnp.clip(w - cfg.WL - gap_len, 0, right_win.shape[0] - 1)
    right = right_win[ridx]
    out = jnp.where(w < cfg.WL + gap_len, jnp.int8(4), right)
    left = jnp.concatenate(
        [left_win, jnp.full((cfg.W - cfg.WL,), 5, jnp.int8)])
    return jnp.where(w < cfg.WL, left, out)


def _gather_inst(cfg: FillConfig, gap_arrays, gap_idx, gap_len):
    inst = {k: v[gap_idx] for k, v in gap_arrays.items()
            if k not in ("left_win", "right_win")}
    inst["gap_len"] = gap_len
    inst["tmpl"] = jax.vmap(lambda l, r, g: build_tmpl(l, r, g, cfg))(
        gap_arrays["left_win"][gap_idx], gap_arrays["right_win"][gap_idx],
        gap_len)
    return inst


@functools.partial(jax.jit, static_argnames=("cfg", "finalize_flag",
                                               "large_break"))
def fill_batch_gathered(cfg: FillConfig, gap_arrays, gap_idx, gap_len,
                        model, finalize_flag: bool = True,
                        large_break: bool | None = None):
    insts = _gather_inst(cfg, gap_arrays, gap_idx, gap_len)
    if cfg.partial_mode:
        fn = lambda inst: em_partial_instance(cfg, inst, model)
    else:
        fn = lambda inst: em_unmapped_instance(cfg, inst, model,
                                               finalize_flag, large_break)
    return jax.vmap(fn)(insts)


@functools.partial(jax.jit, static_argnames=("cfg",))
def finalize_batch_gathered(cfg: FillConfig, gap_arrays, gap_idx, gap_len,
                            model, best_strings, saved,
                            saved_l=None, saved_r=None):
    insts = _gather_inst(cfg, gap_arrays, gap_idx, gap_len)
    if cfg.partial_mode:
        fn = lambda inst, bs, sl, sr: finalize_partial_instance(
            cfg, inst, model, bs, sl, sr)
        return jax.vmap(fn)(insts, best_strings, saved_l, saved_r)
    fn = lambda inst, bs, sv: finalize_unmapped_instance(cfg, inst, model, bs, sv)
    return jax.vmap(fn)(insts, best_strings, saved)


# ===========================================================================
# finalize passes (Figbird.cpp finalize 4929-5399): deterministic re-placement
# against the chosen bestString, no insert prior, acceptance gated by the
# saved-read flags from the winning scan instance.
# ===========================================================================

def finalize_unmapped_instance(cfg: FillConfig, inst, model, best_string, saved):
    R, L = inst["ur"].shape
    gap_zone = _gap_zone(inst, cfg)
    bw = jnp.full((cfg.W,), 4, jnp.int8).at[cfg.WL : cfg.WL + cfg.max_gap_len].set(
        best_string)
    gap_string = jnp.where(gap_zone, bw, inst["tmpl"])
    j = jnp.arange(L)[None, :]
    jv = j < inst["u_len"][:, None]
    oh = _oh_flat_j(inst["ur"], jv)
    oh_jm = _use_count_kernel(inst["ur"].shape[0])
    oh_cnt = oh if oh_jm else _oh_flat_c(inst["ur"], jv)
    legal, _ = _legal_unmapped(cfg, inst, model)
    Kh_f = _hard_K(gap_string, model["a_fwd"], model["b_fwd"], model["ln_et"])
    Kh_r = _hard_K(gap_string, model["a_rev"], model["b_rev"], model["ln_et"])
    rev = (inst["u_rev"] == 1)[:, None]
    sh = jnp.where(rev, _score(oh, Kh_r, cfg.Wp), _score(oh, Kh_f, cfg.Wp))
    sh = jnp.where(legal, sh, NEG)
    mh10 = jnp.max(sh, axis=1) / LN10
    pos = jnp.argmax(sh, axis=1).astype(jnp.int32) - cfg.WL
    accept = ((mh10 > NEG / 2) & (-mh10 < cfg.gap_prob_cutoff)
              & (saved == 1) & inst["u_valid"])
    w_hard = (accept[:, None] & (jnp.arange(cfg.Wp)[None, :] ==
                                 (pos + cfg.WL)[:, None])).astype(jnp.float32)
    counts = _accumulate(w_hard, oh_cnt, cfg, oh_jm)
    counts = jnp.where(gap_zone[:, None], counts, 0.0)

    gl = inst["gap_len"]
    rl = inst["u_len"]
    end = pos + rl
    left_start_zero = jnp.any(accept & (pos == 0))
    right_fin_glen = jnp.any(accept & (end == gl))
    lrc0 = accept & (pos < 0) & (end > 0)
    lrc1 = accept & (pos < gl) & (end - gl > 0)
    umax_l = jnp.max(jnp.where(lrc0, -pos, 0))
    umax_r = jnp.max(jnp.where(lrc1, end - gl, 0))
    total = jnp.sum(inst["u_valid"])
    used = jnp.sum(accept)
    return dict(counts=counts, accept=accept, pos=pos,
                left_right_check=jnp.stack([jnp.any(lrc0), jnp.any(lrc1)]),
                umax_left=umax_l, umax_right=umax_r,
                left_start_zero=left_start_zero, right_fin_glen=right_fin_glen,
                total=total, used=used)


def finalize_partial_instance(cfg: FillConfig, inst, model, best_string,
                              saved_l, saved_r):
    P, L = inst["pr"].shape
    gap_zone = _gap_zone(inst, cfg)
    bw = jnp.full((cfg.W,), 4, jnp.int8).at[cfg.WL : cfg.WL + cfg.max_gap_len].set(
        best_string)
    gap_string = jnp.where(gap_zone, bw, inst["tmpl"])
    j = jnp.arange(L)[None, :]
    plen = inst["p_len"][:, None]
    left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
    jv_count = j < plen
    jv_score = jv_count & jnp.where(left, j >= cfg.clip_thresh,
                                    j < plen - cfg.clip_thresh)
    oh_score = _oh_flat_j(inst["pr"], jv_score)
    oh_count, oh_jm = _oh_count_for(inst["pr"], jv_count)
    p0l, p0r = _band_starts(cfg, inst["gap_len"])
    leg1 = _legal_partial_band(cfg, inst, p0l, True)
    leg2 = _legal_partial_band(cfg, inst, p0r, False)
    sh1 = jnp.where(leg1, _score_hard_band(oh_score, gap_string, model,
                                           p0l, cfg), NEG)
    sh2 = jnp.where(leg2, _score_hard_band(oh_score, gap_string, model,
                                           p0r, cfg), NEG)
    mh, arg_h = _combine_bands_max(sh1, sh2, p0r)
    mh10 = mh / LN10
    pos = arg_h - cfg.WL
    r = jnp.arange(P)
    accept = (((mh10 > NEG / 2) & (-mh10 < cfg.gap_prob_cutoff))
              | (r == saved_l) | (r == saved_r)) & inst["p_valid"]
    band = jnp.arange(_band_w(cfg))[None, :]
    wh1 = (accept[:, None] & (arg_h < cfg.WL)[:, None]
           & (band == arg_h[:, None])).astype(jnp.float32)
    wh2 = (accept[:, None] & (arg_h >= cfg.WL)[:, None]
           & (p0r + band == arg_h[:, None])).astype(jnp.float32)
    counts = _assemble_bands(_accumulate_band(wh1, oh_count, cfg.L, oh_jm),
                             _accumulate_band(wh2, oh_count, cfg.L, oh_jm),
                             p0r, cfg)
    counts = jnp.where(gap_zone[:, None], counts, 0.0)
    # quality-weighted counts for check_update (5389); the j-major layout
    # repeats each cycle's quality over its 5 base columns
    ohq = oh_count * (jnp.repeat(inst["p_qerr"], 5, axis=1) if oh_jm
                      else jnp.tile(inst["p_qerr"], (1, 5)))
    qual = _assemble_bands(_accumulate_band(wh1, ohq, cfg.L, oh_jm),
                           _accumulate_band(wh2, ohq, cfg.L, oh_jm), p0r, cfg)
    qual = jnp.where(gap_zone[:, None], qual, 0.0)

    gl = inst["gap_len"]
    rl = inst["p_len"]
    leftcount = jnp.sum(accept & (pos < 0))
    rightcount = jnp.sum(accept & (pos >= 0))
    spanning = jnp.any(accept & (pos < 0) & (pos + rl >= gl)
                       & (-pos >= 3) & (pos + rl - gl >= 3))
    total = jnp.sum(inst["p_valid"])
    used = jnp.sum(accept)
    return dict(counts=counts, qual=qual, accept=accept, pos=pos,
                leftcount=leftcount, rightcount=rightcount, spanning=spanning,
                total=total, used=used)


@functools.partial(jax.jit, static_argnames=("cfg",))
def finalize_batch(cfg: FillConfig, insts, model, best_strings, saved,
                   saved_l=None, saved_r=None):
    if cfg.partial_mode:
        fn = lambda inst, bs, sl, sr: finalize_partial_instance(
            cfg, inst, model, bs, sl, sr)
        return jax.vmap(fn)(insts, best_strings, saved_l, saved_r)
    fn = lambda inst, bs, sv: finalize_unmapped_instance(cfg, inst, model, bs, sv)
    return jax.vmap(fn)(insts, best_strings, saved)


# ===========================================================================
# packed entry points for tunnel-attached TPUs: every D2H transfer pays a
# ~0.3 s fixed cost over the tunnel, so each phase must fetch ONE array.
# The scan returns per-instance replay scalars packed (IB, 8) f32 and is
# accumulated into a preallocated device buffer; the winner re-run and the
# finalize pass return a single packed f32 matrix each.
# ===========================================================================

SCAN_COLS = 9  # lik, valid, discont, ucoverf, umaxleftf, umaxrightf,
               # region_perct, bailed (unmapped EM hit its cap unconverged),
               # prec (f32 soft-count underflow risk -> exact_soft re-run)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "finalize_flag", "large_break"))
def fill_batch_scan(cfg: FillConfig, gap_arrays, gap_idx, gap_len, model,
                    finalize_flag: bool = True,
                    large_break: bool | None = None):
    """Scan instances -> packed (IB, SCAN_COLS) f32 replay scalars."""
    out = fill_batch_gathered(cfg, gap_arrays, gap_idx, gap_len, model,
                              finalize_flag=finalize_flag,
                              large_break=large_break)
    z = jnp.zeros_like(out["likelihood"], dtype=jnp.float32)
    f = lambda kk: out[kk].astype(jnp.float32) if kk in out else z
    cols = [out["likelihood"].astype(jnp.float32), f("valid"), f("discont"),
            f("ucoverf"), f("umaxleftf"), f("umaxrightf"),
            f("region_perct"), f("bailed"), f("prec")]
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, donate_argnums=(0,))
def scan_acc_update(buf, x, i0):
    """Accumulate one packed scan batch into the wave buffer (in place)."""
    return jax.lax.dynamic_update_slice(buf, x, (i0, jnp.int32(0)))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "finalize_flag", "large_break"))
def fill_batch_full_packed(cfg: FillConfig, gap_arrays, gap_idx, gap_len,
                           model, finalize_flag: bool = True,
                           large_break: bool | None = None):
    """Winner/original-length re-run -> one packed f32 matrix per instance:

    [consensus (maxG), accept (NR), pos (NR), saved_l, saved_r,
     region_perct] with NR = P (partial) or R (unmapped).
    """
    out = fill_batch_gathered(cfg, gap_arrays, gap_idx, gap_len, model,
                              finalize_flag=finalize_flag,
                              large_break=large_break)
    ib = out["consensus"].shape[0]
    z = jnp.zeros((ib,), jnp.float32)
    g = lambda kk: (out[kk].astype(jnp.float32) if kk in out else z)
    parts = [out["consensus"].astype(jnp.float32),
             out["accept"].astype(jnp.float32),
             out["pos"].astype(jnp.float32),
             g("saved_l")[:, None] if "saved_l" in out else z[:, None],
             g("saved_r")[:, None] if "saved_r" in out else z[:, None],
             g("region_perct")[:, None],
             g("bailed")[:, None] if "bailed" in out else z[:, None],
             g("prec")[:, None] if "prec" in out else z[:, None]]
    return jnp.concatenate(parts, axis=1)


def full_packed_layout(cfg: FillConfig) -> dict:
    """Column offsets of fill_batch_full_packed's output."""
    nr = cfg.P if cfg.partial_mode else cfg.R
    o = {}
    at = 0
    for name, width in (("consensus", cfg.max_gap_len), ("accept", nr),
                        ("pos", nr), ("saved_l", 1), ("saved_r", 1),
                        ("region_perct", 1), ("bailed", 1), ("prec", 1)):
        o[name] = (at, at + width)
        at += width
    o["_total"] = at
    return o


@functools.partial(jax.jit, static_argnames=("cfg",))
def finalize_batch_packed(cfg: FillConfig, gap_arrays, gap_idx, gap_len,
                          model, best_strings, saved, saved_l, saved_r):
    """Finalize pass -> one packed f32 matrix per instance:

    [counts gap-zone (maxG*5), qual gap-zone (maxG*5, partial only, else 0s
     omitted), accept (NR), pos (NR), scalars...]
    """
    if cfg.partial_mode:
        out = finalize_batch_gathered(cfg, gap_arrays, gap_idx, gap_len,
                                      model, best_strings, saved, saved_l,
                                      saved_r)
    else:
        out = finalize_batch_gathered(cfg, gap_arrays, gap_idx, gap_len,
                                      model, best_strings, saved)
    ib = gap_idx.shape[0]
    zone = slice(cfg.WL, cfg.WL + cfg.max_gap_len)
    parts = [out["counts"][:, zone, :].reshape(ib, -1)]
    if cfg.partial_mode:
        parts.append(out["qual"][:, zone, :].reshape(ib, -1))
    parts += [out["accept"].astype(jnp.float32),
              out["pos"].astype(jnp.float32)]
    f = lambda kk: out[kk].astype(jnp.float32)[:, None]
    if cfg.partial_mode:
        parts += [f("used")]
    else:
        parts += [out["left_right_check"].astype(jnp.float32),
                  f("umax_left"), f("umax_right"), f("left_start_zero"),
                  f("right_fin_glen"), f("used")]
    return jnp.concatenate(parts, axis=1)


def finalize_packed_layout(cfg: FillConfig) -> dict:
    nr = cfg.P if cfg.partial_mode else cfg.R
    o = {}
    at = 0
    fields = [("counts", cfg.max_gap_len * 5)]
    if cfg.partial_mode:
        fields.append(("qual", cfg.max_gap_len * 5))
    fields += [("accept", nr), ("pos", nr)]
    if cfg.partial_mode:
        fields += [("used", 1)]
    else:
        fields += [("left_right_check", 2), ("umax_left", 1),
                   ("umax_right", 1), ("left_start_zero", 1),
                   ("right_fin_glen", 1), ("used", 1)]
    for name, width in fields:
        o[name] = (at, at + width)
        at += width
    o["_total"] = at
    return o
