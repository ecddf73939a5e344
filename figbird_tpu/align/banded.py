"""Banded affine-gap Smith-Waterman escalation tier (indel-aware).

The gapless Kadane scorer (core.py) cannot represent insertions/deletions, so
reads carrying indels arrive clipped or unaligned.  This tier re-scores such
reads with a banded local affine-gap DP around their best seed diagonal —
the bowtie2-equivalent alignment mode the reference feeds on
(processErrorTypes learns inPos/inLengths/delPos/delLengths from CIGAR I/D
ops, Figbird.cpp:291-487; Preprocess spots ``xMyIzM`` gap-spanning reads,
Preprocess.cpp:885-925).

Split of labour (TPU-first):
  * device: batched banded DP *scores* over the escalation set — a
    ``lax.scan`` over read positions with a (B, K) band carry, K = 2*band+1.
    Within-row deletion chains use the exact lazy-E formulation (valid for
    ``gap_open <= gap_extend``): E[k] = max_{k'<k} H_noE[k'] + open +
    ext*(k-1-k'), one ``cummax`` per row.
  * host: full traceback DP only for the *winners* (banded score beats the
    gapless score), emitting CIGAR-equivalent ops for the error model and
    MIM detection.  Winners are rare (indel rate ~1e-3), so host time is
    negligible.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import GAP_CODE
from .core import _extract_span

NEG = -(2 ** 30)


@dataclass(frozen=True)
class BandedParams:
    band: int = 8           # max indel drift either way
    match: int = 2          # bowtie2 --local --ma
    mismatch: int = -6      # --mp max
    gap_open: int = -5      # --rdg/--rfg default "5,3"
    gap_extend: int = -3
    # glocal mode for the unmapped pass (bowtie2 default end-to-end): the
    # WHOLE read must align (no free end clips; genome-side start still
    # free) — no zero floor in the DP and the score is read from the final
    # read row only
    end_to_end: bool = False


@functools.partial(jax.jit, static_argnames=("params",))
def banded_scores_device(flat2d, starts, reads, lengths,
                         params: BandedParams):
    """Banded local affine-gap DP scores for a batch.

    starts (B,): padded-flat genome position each read's gapless candidate
    would start at; the band allows +-band drift around that diagonal.

    Returns dict(score (B,) int32, end_i (B,), end_k (B,)) — the best-scoring
    cell; traceback happens on host for winners only.
    """
    B, L = reads.shape
    bd = params.band
    K = 2 * bd + 1
    win = _extract_span(flat2d, jnp.maximum(starts - bd, 0), L + 2 * bd)

    op, ex = params.gap_open, params.gap_extend
    mt, ms = params.match, params.mismatch
    kk = jnp.arange(K)

    # window char for cell (i, k) is win[:, i + k]
    def step(carry, i):
        H_prev, F_prev, best, bi, bk = carry
        wch = jax.lax.dynamic_slice_in_dim(win, i, K, axis=1)
        rch = jax.lax.dynamic_index_in_dim(reads, i, axis=1)  # (B,1)
        valid_r = (i < lengths)[:, None]
        # genome N scores as a plain mismatch (same as the gapless scorer and
        # the host traceback) — NOT as a forbidden cell; GAP_CODE == N here
        sub = jnp.where((wch == rch) & (wch != GAP_CODE), mt, ms)

        # diagonal: (i-1, k) -> (i, k) consumes read i + genome char
        diag = H_prev + sub
        # insertion in read (gap in genome): (i-1, k+1) -> (i, k)
        H_up = jnp.concatenate([H_prev[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        F_up = jnp.concatenate([F_prev[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        F = jnp.maximum(H_up + op, F_up + ex)
        F = jnp.where(valid_r, F, NEG)
        H_noE = jnp.maximum(diag, F)
        if not params.end_to_end:
            H_noE = jnp.maximum(H_noE, 0)  # local: restart anywhere
        # deletion chain along k (lazy-E, exact for op <= ex):
        # E[k] = max_{k'<k} H_noE[k'] + op + ex*(k-1-k')
        g = H_noE - ex * kk[None, :]
        m = jax.lax.cummax(g, axis=1)
        m_shift = jnp.concatenate([jnp.full((B, 1), NEG), m[:, :-1]], axis=1)
        E = m_shift + op + ex * (kk[None, :] - 1)  # = op + ex*(k-1-k')
        H = jnp.maximum(H_noE, E)
        if not params.end_to_end:
            H = jnp.maximum(H, 0)
        H = jnp.where((i < lengths)[:, None], H, H_prev)

        row_best = jnp.max(H, axis=1)
        row_k = jnp.argmax(H, axis=1).astype(jnp.int32)
        if params.end_to_end:  # score read only where the full read ends
            upd = (i == lengths - 1) & (row_best > best)
        else:
            upd = row_best > best
        best = jnp.where(upd, row_best, best)
        bi = jnp.where(upd, i, bi)
        bk = jnp.where(upd, row_k, bk)
        return (H, F, best, bi, bk), None

    H0 = jnp.zeros((B, K), jnp.int32)
    F0 = jnp.full((B, K), NEG, jnp.int32)
    best0 = jnp.full(B, NEG if params.end_to_end else 0, jnp.int32)
    z = jnp.zeros(B, jnp.int32)
    (Hf, Ff, best, bi, bk), _ = jax.lax.scan(
        step, (H0, F0, best0, z, z), jnp.arange(L))
    return dict(score=best, end_i=bi, end_k=bk)


def host_traceback_batch(reads: np.ndarray, windows: np.ndarray,
                         rlens: np.ndarray, params: BandedParams):
    """Vectorised banded DP + traceback for a winner batch.

    reads (W, L) aligned-orientation; windows (W, L+2*band); rlens (W,).
    Forward pass is numpy-vectorised across the batch (one python iteration
    per read row, not per cell); traceback per read is O(path length) using
    stored pointers, with deletion runs recovered in ONE jump via the lazy-E
    argmax (k -> k'), so a thousand winners cost ~0.1 s, not seconds.

    Returns a list of per-read dicts shaped like :func:`host_traceback`.
    """
    Wn, L = reads.shape
    bd = params.band
    K = 2 * bd + 1
    op_, ex = params.gap_open, params.gap_extend
    mt, ms = params.match, params.mismatch
    kk = np.arange(K)

    H = np.zeros((Wn, K), np.int64)
    F = np.full((Wn, K), NEG, np.int64)
    ptr = np.zeros((L + 1, Wn, K), np.int8)   # 0 stop 1 diag 2 F 3 E
    eksrc = np.zeros((L + 1, Wn, K), np.int8)  # E jump target k'
    fopen = np.zeros((L + 1, Wn, K), bool)     # F opened (vs extended)
    best = np.full(Wn, NEG if params.end_to_end else 0, np.int64)
    bi = np.zeros(Wn, np.int64)
    bk = np.zeros(Wn, np.int64)
    live_max = int(rlens.max()) if Wn else 0
    for i in range(live_max):
        rch = reads[:, i : i + 1]
        wrow = windows[:, i : i + K]
        sub = np.where((wrow == rch) & (wrow != GAP_CODE), mt, ms)
        diag = H + sub
        H_up = np.concatenate([H[:, 1:], np.full((Wn, 1), NEG)], axis=1)
        F_up = np.concatenate([F[:, 1:], np.full((Wn, 1), NEG)], axis=1)
        f_open = H_up + op_ >= F_up + ex
        Fn = np.where(f_open, H_up + op_, F_up + ex)
        fopen[i + 1] = f_open
        H_noE = np.maximum(diag, Fn)
        if not params.end_to_end:
            H_noE = np.maximum(H_noE, 0)
        # lazy-E with argmax tracking
        g = H_noE - ex * kk[None, :]
        m = np.maximum.accumulate(g, axis=1)
        marg = np.where(g == m, kk[None, :], 0)
        marg = np.maximum.accumulate(marg, axis=1)  # argmax of running max
        m_shift = np.concatenate([np.full((Wn, 1), NEG), m[:, :-1]], axis=1)
        ks_shift = np.concatenate([np.zeros((Wn, 1), np.int64),
                                   marg[:, :-1]], axis=1)
        E = m_shift + op_ + ex * (kk[None, :] - 1)
        Hn = np.maximum(H_noE, E)
        if not params.end_to_end:
            Hn = np.maximum(Hn, 0)
        # ptr encodes the H_noE source (0 stop, 1 diag, 2 F) in bits 0-1 and
        # "E wins over H_noE" (a deletion run ending here) in bit 2
        p = np.zeros((Wn, K), np.int8)
        p[diag == H_noE] = 1
        p[Fn == H_noE] = 2
        if not params.end_to_end:  # local: 0 marks an alignment start
            p[H_noE == 0] = 0
        p |= (E > H_noE).astype(np.int8) << 2
        ptr[i + 1] = p
        eksrc[i + 1] = ks_shift.astype(np.int8)
        live = i < rlens
        H = np.where(live[:, None], Hn, H)
        F = np.where(live[:, None], Fn, F)
        row_best = H.max(axis=1)
        if params.end_to_end:
            upd = (i == rlens - 1) & (row_best > best)
        else:
            upd = live & (row_best > best)
        best = np.where(upd, row_best, best)
        bi = np.where(upd, i + 1, bi)
        bk = np.where(upd, H.argmax(axis=1), bk)

    out = []
    for w in range(Wn):
        rlen = int(rlens[w])
        if best[w] <= (NEG // 2 if params.end_to_end else 0):
            out.append(None)
            continue
        i, k = int(bi[w]), int(bk[w])
        ops_rev = []
        mism = np.zeros(L, bool)
        n_mis = 0
        state = "H"
        while i > 0:
            if state == "H":
                p = int(ptr[i, w, k])
                if p & 4:  # deletion run ending here: one E jump k -> k'
                    kp = int(eksrc[i, w, k])
                    ops_rev.append(("D", k - kp))
                    k = kp
                    p = int(ptr[i, w, k])
                d = p & 3
                if d == 0:
                    break
                if d == 1:
                    wch = windows[w, i - 1 + k]
                    if wch != reads[w, i - 1]:
                        mism[i - 1] = True
                        n_mis += 1
                    ops_rev.append(("M", 1))
                    i -= 1
                else:
                    state = "F"
            else:  # F: insertion step (i-1, k+1) -> (i, k)
                ops_rev.append(("I", 1))
                opened = fopen[i, w, k]
                i -= 1
                k += 1
                if opened:
                    state = "H"
        ops_rev.reverse()
        ops = []
        for c, n in ops_rev:
            if ops and ops[-1][0] == c:
                ops[-1][1] += n
            else:
                ops.append([c, n])
        read_start = i
        read_end = read_start + sum(n for c, n in ops if c in "MI")
        g_off = -bd + k
        ins_events, del_events = [], []
        cyc = read_start
        for c, n in ops:
            if c == "M":
                cyc += n
            elif c == "I":
                ins_events.append((cyc, n))
                cyc += n
            else:
                del_events.append((cyc, n))
        out.append(dict(score=int(best[w]), ops=[(c, n) for c, n in ops],
                        read_start=int(read_start), read_end=int(read_end),
                        g_off=int(g_off), n_mis=int(n_mis), mism=mism[:rlen],
                        ins_events=ins_events, del_events=del_events))
    return out


def host_traceback(read: np.ndarray, window: np.ndarray, rlen: int,
                   params: BandedParams):
    """Full banded DP with pointers for ONE read; returns alignment detail.

    window: (rlen + 2*band,) genome chars, window[0] at diagonal offset
    -band from the read's nominal start.

    Returns dict(score, ops [(op, len)] with op in "MIDS" (M covers both
    match and mismatch), read_start, read_end (exclusive), g_off — genome
    offset of the first aligned char relative to the nominal start
    (i.e. -band + k at the alignment's top-left), n_mis, mism (bool (rlen,)),
    ins_events [(cycle, len)], del_events [(cycle, len)]) or None when no
    positive-score cell exists.
    """
    bd = params.band
    K = 2 * bd + 1
    op_, ex = params.gap_open, params.gap_extend
    mt, ms = params.match, params.mismatch
    L = rlen
    H = np.zeros((L + 1, K), np.int64)
    ptr = np.zeros((L + 1, K), np.int8)  # 0 stop, 1 diag, 2 up(F/ins), 3 left(E/del)
    F = np.full((L + 1, K), NEG, np.int64)
    Fsrc = np.zeros((L + 1, K), np.int8)  # 1: opened from H, 0: extended
    E = np.full((L + 1, K), NEG, np.int64)
    Esrc = np.zeros((L + 1, K), np.int8)
    best, bcell = 0, None
    for i in range(1, L + 1):
        rch = read[i - 1]
        wrow = window[i - 1 : i - 1 + K]
        sub = np.where((wrow == rch) & (wrow != GAP_CODE) & (rch != GAP_CODE),
                       mt, ms)
        diag = H[i - 1] + sub
        H_up = np.concatenate([H[i - 1][1:], [NEG]])
        F_up = np.concatenate([F[i - 1][1:], [NEG]])
        F[i] = np.maximum(H_up + op_, F_up + ex)
        Fsrc[i] = (H_up + op_ >= F_up + ex).astype(np.int8)
        # E along k (exact sequential; K is tiny)
        for k in range(K):
            cands = [0, diag[k], F[i][k]]
            hk = max(cands)
            if k > 0:
                e_open = hk_prev + op_  # H[i,k-1] computed this sweep
                e_ext = E[i][k - 1] + ex
                E[i][k] = max(e_open, e_ext)
                Esrc[i][k] = 1 if e_open >= e_ext else 0
                hk = max(hk, E[i][k])
            H[i][k] = hk
            if hk == 0:
                ptr[i][k] = 0
            elif k > 0 and hk == E[i][k]:
                ptr[i][k] = 3
            elif hk == F[i][k]:
                ptr[i][k] = 2
            else:
                ptr[i][k] = 1
            hk_prev = hk
            if hk > best:
                best, bcell = hk, (i, k)
    if bcell is None:
        return None
    # traceback
    i, k = bcell
    ops_rev = []
    mism = np.zeros(L, bool)
    n_mis = 0
    state = "H"
    while i > 0:
        if state == "H":
            d = ptr[i][k]
            if d == 0:
                break
            if d == 1:
                wch = window[i - 1 + k]
                if wch != read[i - 1]:
                    mism[i - 1] = True
                    n_mis += 1
                ops_rev.append("M")
                i -= 1
            elif d == 2:
                state = "F"
            else:
                state = "E"
        elif state == "F":  # insertion in read: consume read char, k+1
            ops_rev.append("I")
            opened = Fsrc[i][k]
            i -= 1
            k += 1
            if opened:
                state = "H"
        else:  # E: deletion (consume genome char), k-1
            ops_rev.append("D")
            opened = Esrc[i][k]
            k -= 1
            if opened:
                state = "H"
    read_start = i  # chars 0..i-1 soft-clipped
    ops_rev.reverse()
    # run-length encode
    ops = []
    for c in ops_rev:
        if ops and ops[-1][0] == c:
            ops[-1][1] += 1
        else:
            ops.append([c, 1])
    read_end = read_start + sum(n for c, n in ops if c in "MI")
    g_off = -params.band + k + 0  # window offset of top-left vs nominal start
    # indel events at read cycles (processErrorTypes: index = read coordinate
    # where the event begins, forward-strand convention; caller flips for rev)
    ins_events, del_events = [], []
    cyc = read_start
    for c, n in ops:
        if c == "M":
            cyc += n
        elif c == "I":
            ins_events.append((cyc, n))
            cyc += n
        elif c == "D":
            del_events.append((cyc, n))
    return dict(score=int(best), ops=[(c, n) for c, n in ops],
                read_start=int(read_start), read_end=int(read_end),
                g_off=int(g_off), n_mis=int(n_mis), mism=mism,
                ins_events=ins_events, del_events=del_events)
