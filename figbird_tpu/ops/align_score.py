"""Fused candidate-scoring kernel for the seed-and-extend aligner.

Replaces the XLA chain in ``align.core._score_candidates`` (window extract →
compare → cumsum → cummin → argmax/argmin, each a separate HBM round trip)
with one Pallas pass: per candidate, the 256-byte genome segment pair is
aligned to its in-row offset with static shifted mul-add selects *in VMEM*,
then the best local interval (score, start, end, mismatches) is found with
log-step prefix sums/mins along the lane axis — every op a full-width vector
op, no sequential loop and no layout transposes.  HBM traffic drops from ~10
full (B, C, L) intermediates to segments-in + 5 scalars-out per candidate.

Data layout: candidates are rows (TR per grid step), read positions are
lanes.  All arithmetic is int32 and mask-free (Mosaic cannot relayout i1
select masks in chained scans or do int8 vector math), so equality tests are
clipped squared differences and selects are mul-adds.

Semantics: bowtie2 --local gapless scoring (free end clips, match/mismatch
from AlignParams) — identical numerics to ``_score_candidates``
(tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TR = 512         # candidate rows per grid step (VMEM-bounded)
BIG = 2**30


def _shl(x, k, fill):
    """x[:, j-k] with `fill` for j<k (static lane slices only)."""
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _kernel(seg_ref, read_ref, off_ref, out_ref, *, L: int,
            match: int, mismatch: int, gap_code: int):
    seg = seg_ref[...]        # (TR, 256) int8
    read = read_ref[...]      # (TR, Lp) int8; lanes >= L are gap_code pad
    off = off_ref[...]        # (TR, 1) int32

    Lp = read.shape[1]
    S1 = Lp + 8
    hi = off >> 3             # (TR, 1)
    lo = off & 7
    seg32 = seg.astype(jnp.int32)
    st1 = jnp.zeros((seg.shape[0], S1), jnp.int32)
    for s in range(16):
        sel = (hi == s).astype(jnp.int32)
        st1 = st1 * (1 - sel) + seg32[:, 8 * s : 8 * s + S1] * sel
    w32 = jnp.zeros((seg.shape[0], Lp), jnp.int32)
    for r in range(8):
        sel = (lo == r).astype(jnp.int32)
        w32 = w32 * (1 - sel) + st1[:, r : r + Lp] * sel

    r32 = read.astype(jnp.int32)
    d = w32 - r32
    m = jnp.clip(1 - d * d, 0, 1)            # 1 iff win == read
    gr = r32 - gap_code
    rv = jnp.clip(gr * gr, 0, 1)             # 1 iff read != gap
    gw = w32 - gap_code
    ng = jnp.clip(gw * gw, 0, 1)             # 1 iff win != gap
    m = m * ng * rv
    sc = rv * (mismatch + m * (match - mismatch))   # (TR, Lp)
    mis = rv * (1 - m)

    # inclusive prefix sums via log-step lane shifts
    p = sc
    cm = mis
    k = 1
    while k < Lp:
        p = p + _shl(p, k, 0)
        cm = cm + _shl(cm, k, 0)
        k *= 2

    # pre[j] = p[j-1] (prefix before char j), pre[0] = 0; cmpre likewise
    pre = _shl(p, 1, 0)
    cmpre = _shl(cm, 1, 0)

    # inclusive cummin of pre (pure min scan — Mosaic rejects carried-arg
    # select chains, so argmin is recovered by masked reductions below)
    rm = pre
    k = 1
    while k < Lp:
        rm = jnp.minimum(rm, _shl(rm, k, BIG))
        k *= 2

    def _eq1(a, b):
        dd = a - b
        return jnp.clip(1 + dd, 0, 1) * jnp.clip(1 - dd, 0, 1)  # 1 iff a==b

    idx = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    bev = p - rm                    # best interval ending at char j
    mask = jnp.clip(L - idx, 0, 1)  # 1 for j < L
    bevm = bev * mask - (1 - mask) * BIG
    best = jnp.max(bevm, axis=1, keepdims=True)     # (TR, 1)
    # first j attaining the max
    hit = _eq1(bevm, best)
    end = jnp.min(idx * hit + (1 - hit) * BIG, axis=1, keepdims=True)
    at_end = _eq1(idx, end)
    # start = first prefix index <= end attaining min(pre[0..end]) = rm[end]
    rm_end = jnp.sum(rm * at_end, axis=1, keepdims=True)
    le_end = jnp.clip(end - idx + 1, 0, 1)
    hit_s = _eq1(pre, rm_end) * le_end
    start = jnp.min(idx * hit_s + (1 - hit_s) * BIG, axis=1, keepdims=True)
    at_start = _eq1(idx, start)
    # mismatches inside [start, end]: cm0[end+1] - cm0[start]
    cm_end = jnp.sum(cm * at_end, axis=1, keepdims=True)
    cm_start = jnp.sum(cmpre * at_start, axis=1, keepdims=True)
    nmis = cm_end - cm_start
    e2e = p[:, L - 1 : L]

    out_ref[...] = jnp.concatenate(
        [best, e2e, start, end, nmis,
         jnp.zeros((best.shape[0], 3), jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("L", "match", "mismatch",
                                             "gap_code", "interpret"))
def _score_pallas(seg, read, off, L: int, match: int, mismatch: int,
                  gap_code: int, interpret: bool):
    """seg (N,256) int8, read (N,Lp) int8, off (N,1) int32 -> (N,8) int32
    rows [local, e2e, start, end, n_mis, 0, 0, 0]; N a multiple of TR."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = seg.shape[0]
    Lp = read.shape[1]
    G = N // TR
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, match=match, mismatch=mismatch,
                          gap_code=gap_code),
        grid=(G,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((TR, 256), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Lp), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, 8), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.int32),
    )(seg, read, off)
    return out


def score_candidates_scan(flat2d, reads, cand, match: int, mismatch: int,
                          gap_code: int, interpret: bool = False):
    """Pallas path: per-candidate Kadane scalars (no per-position outputs).

    flat2d (rows,128) int8 padded genome; reads (B,L) int8; cand (B,C) int32
    window starts.  Returns dict(local, e2e, start, end, n_mis) each (B, C).
    """
    B, L = reads.shape
    C = cand.shape[1]
    N = B * C
    G = -(-N // TR)
    pad = G * TR - N

    row = cand.reshape(N) >> 7
    seg = jnp.concatenate([flat2d[row], flat2d[row + 1]], axis=-1)  # (N,256)
    off = (cand.reshape(N) & 127).astype(jnp.int32)[:, None]
    read_r = jnp.broadcast_to(reads[:, None, :], (B, C, L)).reshape(N, L)
    if pad:
        seg = jnp.concatenate([seg, jnp.zeros((pad, 256), seg.dtype)])
        off = jnp.concatenate([off, jnp.zeros((pad, 1), off.dtype)])
        read_r = jnp.concatenate(
            [read_r, jnp.full((pad, L), gap_code, read_r.dtype)])

    Lp = -(-L // 8) * 8
    if Lp > L:
        read_r = jnp.concatenate(
            [read_r, jnp.full((read_r.shape[0], Lp - L), gap_code,
                              read_r.dtype)], axis=1)

    out = _score_pallas(seg, read_r, off, L, match, mismatch, gap_code,
                        interpret)[:N]
    out = out.reshape(B, C, 8)
    return dict(local=out[..., 0], e2e=out[..., 1], start=out[..., 2],
                end=out[..., 3], n_mis=out[..., 4])
