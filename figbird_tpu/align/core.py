"""Device seed-and-extend alignment.

TPU-native replacement for the ``bowtie2`` calls (RunFigbird.sh:280,333,446,464).
The whole batch aligns in one jitted program:

1. **Seed**: S k-mers per read (evenly spaced over the read), looked up in the
   sorted k-mer table with a vectorised binary search (``searchsorted``), up to
   H hits each, for both the forward read and its reverse complement.
2. **Extend**: every candidate placement gathers its genome window and scores
   a gapless local alignment via a max-scoring-subarray scan (Kadane with
   prefix sums + ``cummin``) — this reproduces bowtie2 ``--local`` soft-clip
   semantics (free end clips, match +2 / mismatch -6 by default) without a DP
   matrix.  Indel-containing reads score lower and are simply not part of the
   model-learning set; clipped gap-edge reads (the ones Figbird feeds on) are
   exactly maximal-subarray alignments.
3. **Select**: best candidate per strand, best strand, second-best score at a
   distinct position for uniqueness (the IH:i:1 filter, Figbird.cpp:904).

Outputs per read: window start (padded-flat coords), strand, local/e2e score,
clip offsets, mismatch count and per-position mismatch mask (MD-equivalent,
feeding the error model), acceptance and uniqueness flags.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import COMPLEMENT, GAP_CODE
from .index import KmerIndex

NEG = jnp.int32(-(2**30))


@dataclass(frozen=True)
class AlignParams:
    n_seeds: int = 4
    hits_per_seed: int = 8
    repeat_limit: int = 128  # ignore k-mers occurring more often than this
    match: int = 2           # bowtie2 --local --ma default
    mismatch: int = -6       # bowtie2 --mp max default
    min_score_const: float = 20.0   # bowtie2 --score-min G,20,8 (local default)
    min_score_log: float = 8.0


def _revcomp_batch(reads: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-read reverse complement honouring individual lengths (pad stays N)."""
    B, L = reads.shape
    comp = jnp.asarray(COMPLEMENT)[reads]
    j = jnp.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    valid = src >= 0
    src_c = jnp.clip(src, 0, L - 1)
    return jnp.where(valid, jnp.take_along_axis(comp, src_c, axis=1), GAP_CODE).astype(jnp.int8)


def _seed_codes(reads, lengths, k: int, n_seeds: int):
    """K-mer codes at n_seeds per-read evenly spaced offsets.

    Returns codes (B,S) int64 (bases clipped to 0..3), valid (B,S) bool
    (window inside the read and N-free), offs (B,S) int32.
    """
    B, L = reads.shape
    frac = jnp.linspace(0.0, 1.0, n_seeds)
    span = jnp.maximum(lengths - k, 0).astype(jnp.float32)
    offs = jnp.floor(span[:, None] * frac[None, :]).astype(jnp.int32)  # (B,S)
    idx = offs[:, :, None] + jnp.arange(k)[None, None, :]  # (B,S,k)
    idx_c = jnp.clip(idx, 0, L - 1)
    window = jnp.take_along_axis(
        reads, idx_c.reshape(B, n_seeds * k), axis=1
    ).reshape(B, n_seeds, k)
    # k <= 15 so codes fit int32 (4**15 < 2**31)
    codes = jnp.zeros((B, n_seeds), jnp.int32)
    valid = lengths[:, None] >= k
    for j in range(k):
        w = window[:, :, j].astype(jnp.int32)
        codes = codes * 4 + jnp.minimum(w, 3)
        valid = valid & (w < 4)
    return codes, valid, offs


def _score_candidates(flat, reads, cand, cand_valid, match: int, mismatch: int):
    """Gapless local score for every (read, candidate window) pair.

    reads (B,L), cand (B,C) window starts.  Returns dict with local score,
    clip interval [start,end] (inclusive char indices), mismatches.
    """
    B, L = reads.shape
    windows = flat[cand[:, :, None] + jnp.arange(L)[None, None, :]]  # (B,C,L)
    rv = (reads != GAP_CODE)[:, :, None].transpose(0, 2, 1)  # (B,1,L)
    rv = (reads != GAP_CODE)[:, None, :]
    m = (windows == reads[:, None, :]) & rv & (windows != GAP_CODE)
    s = jnp.where(rv, jnp.where(m, match, mismatch), 0).astype(jnp.int32)
    p = jnp.cumsum(s, axis=-1)  # (B,C,L) inclusive prefix
    pre = jnp.concatenate([jnp.zeros((B, s.shape[1], 1), jnp.int32), p], axis=-1)
    runmin = jax.lax.cummin(pre, axis=2)
    bev = p - runmin[:, :, :-1]  # best interval ending at char j
    local = jnp.max(bev, axis=-1)
    end = jnp.argmax(bev, axis=-1).astype(jnp.int32)  # last aligned char
    mask_le = jnp.arange(L + 1)[None, None, :] <= end[:, :, None]
    start = jnp.argmin(jnp.where(mask_le, pre, 2**30), axis=-1).astype(jnp.int32)
    mism = rv & ~m
    cm0 = jnp.concatenate(
        [jnp.zeros((B, s.shape[1], 1), jnp.int32), jnp.cumsum(mism, axis=-1)], axis=-1
    )
    n_mis = jnp.take_along_axis(cm0, (end + 1)[:, :, None], -1)[..., 0] - \
        jnp.take_along_axis(cm0, start[:, :, None], -1)[..., 0]
    e2e = p[:, :, -1]
    local = jnp.where(cand_valid, local, NEG)
    return dict(local=local, e2e=e2e, start=start, end=end, n_mis=n_mis, mism=mism)


def _align_one_strand(flat, sorted_codes, sorted_pos, reads, lengths, k: int,
                      p: AlignParams):
    B, L = reads.shape
    M = sorted_codes.shape[0]
    flatlen = flat.shape[0]

    codes, valid, offs = _seed_codes(reads, lengths, k, p.n_seeds)
    lo = jnp.searchsorted(sorted_codes, codes, side="left")
    hi = jnp.searchsorted(sorted_codes, codes, side="right")
    cnt = hi - lo
    H = p.hits_per_seed
    h = jnp.arange(H)[None, None, :]
    hmask = (h < cnt[:, :, None]) & valid[:, :, None] & (cnt[:, :, None] <= p.repeat_limit)
    hit_idx = jnp.clip(lo[:, :, None] + h, 0, M - 1)
    hit_pos = sorted_pos[hit_idx]  # (B,S,H)
    cand = hit_pos - offs[:, :, None].astype(hit_pos.dtype)
    cand = jnp.clip(cand, 0, flatlen - L - 1)
    C = p.n_seeds * H
    cand = cand.reshape(B, C)
    hmask = hmask.reshape(B, C)

    sc = _score_candidates(flat, reads, cand, hmask, p.match, p.mismatch)
    bi = jnp.argmax(sc["local"], axis=-1)

    def take(x):
        return jnp.take_along_axis(x, bi[:, None], axis=1)[:, 0]

    best = dict(
        score=take(sc["local"]),
        e2e=take(sc["e2e"]),
        start=take(sc["start"]),
        end=take(sc["end"]),
        n_mis=take(sc["n_mis"]),
        pos=take(cand),
    )
    best["mism"] = jnp.take_along_axis(
        sc["mism"], bi[:, None, None], axis=1
    )[:, 0, :]
    # second best at a distinct genome position
    others = jnp.where(cand != best["pos"][:, None], sc["local"], NEG)
    best["second"] = jnp.max(others, axis=-1)
    return best


@functools.partial(jax.jit, static_argnames=("k", "params"))
def align_batch_device(flat, sorted_codes, sorted_pos, reads, lengths, k: int,
                       params: AlignParams):
    """Align a batch against both strands; returns per-read best alignment."""
    fwd = _align_one_strand(flat, sorted_codes, sorted_pos, reads, lengths, k, params)
    rc_reads = _revcomp_batch(reads, lengths)
    rev = _align_one_strand(flat, sorted_codes, sorted_pos, rc_reads, lengths, k, params)

    use_rev = rev["score"] > fwd["score"]

    def pick(key):
        return jnp.where(use_rev, rev[key], fwd[key])

    out = {key: pick(key) for key in ("score", "e2e", "start", "end", "n_mis", "pos")}
    out["mism"] = jnp.where(use_rev[:, None], rev["mism"], fwd["mism"])
    out["strand"] = use_rev.astype(jnp.int8)
    # runner-up score across both strands (for uniqueness)
    out["second"] = jnp.maximum(
        jnp.where(use_rev, rev["second"], fwd["second"]),
        jnp.where(use_rev, fwd["score"], rev["score"]),
    )
    min_score = (params.min_score_const +
                 params.min_score_log * jnp.log(jnp.maximum(lengths, 2).astype(jnp.float32)))
    out["aligned"] = out["score"].astype(jnp.float32) >= min_score
    out["unique"] = out["aligned"] & (out["score"] > out["second"])
    out["alen"] = out["end"] - out["start"] + 1
    out["clip_start"] = out["start"]
    out["clip_end"] = jnp.maximum(lengths - 1 - out["end"], 0)
    return out


class Aligner:
    """Host-facing aligner: holds device copies of the index and batches reads."""

    def __init__(self, index: KmerIndex, params: AlignParams = AlignParams(),
                 batch_size: int = 8192):
        self.index = index
        self.params = params
        self.batch_size = batch_size
        if index.k > 15:
            raise ValueError("device aligner requires k <= 15 (int32 k-mer codes)")
        if len(index.flat) >= 2**31:
            raise ValueError(
                "flat genome exceeds int32 positions; shard contigs across hosts"
            )
        self._flat = jnp.asarray(index.flat)
        self._codes = jnp.asarray(index.sorted_codes.astype(np.int32))
        self._pos = jnp.asarray(index.sorted_pos.astype(np.int32))

    def align(self, seq: np.ndarray, lengths: np.ndarray) -> dict[str, np.ndarray]:
        """Align all reads; returns numpy dict (padded batching internally)."""
        n, L = seq.shape
        bs = self.batch_size
        outs: list[dict] = []
        for i in range(0, n, bs):
            chunk = seq[i : i + bs]
            lens = lengths[i : i + bs]
            if len(chunk) < bs:
                padn = bs - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.full((padn, L), GAP_CODE, dtype=np.int8)]
                )
                lens = np.concatenate([lens, np.zeros(padn, dtype=lens.dtype)])
            res = align_batch_device(
                self._flat, self._codes, self._pos,
                jnp.asarray(chunk), jnp.asarray(lens.astype(np.int32)),
                self.index.k, self.params,
            )
            outs.append({kk: np.asarray(vv) for kk, vv in res.items()})
        if not outs:
            return {}
        cat = {kk: np.concatenate([o[kk] for o in outs])[:n] for kk in outs[0]}
        return cat
