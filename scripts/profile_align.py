"""Micro-profile of align_batch_device sub-phases on the real chip."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import functools

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.align import build_index
from figbird_tpu.align.core import (
    AlignParams, _seed_codes, _score_candidates, align_batch_device, as_rows)

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

sim = simulate(SimConfig(genome_len=4_600_000, n_contigs=4, n_gaps=50,
                         gap_len_range=(10, 120), read_len=100,
                         insert_mean=200, insert_sd=20, coverage=1.0,
                         error_rate=0.005, seed=1))
idx = build_index(sim.draft, k=15)
flat = jnp.asarray(idx.flat)
flat2d = jnp.asarray(as_rows(idx.flat))
flatlen = jnp.int32(len(idx.flat))
idx.build_buckets()
prefix_shift = 2 * (idx.k - idx.prefix_bases)
tables = dict(
    starts2d=jnp.asarray(as_rows(idx.bucket_starts)),
    codes2d=jnp.asarray(as_rows(idx.sorted_codes.astype(np.int32))),
    pos2d=jnp.asarray(as_rows(idx.sorted_pos.astype(np.int32))),
)
codes_t = jnp.asarray(idx.sorted_codes.astype(np.int32))
pos_t = jnp.asarray(idx.sorted_pos.astype(np.int32))
print(f"# prefix_bases={idx.prefix_bases} shift={prefix_shift}")
B = 8192
r = sim.reads1
reads = jnp.asarray(r.seq[:B])
lengths = jnp.asarray(r.length[:B].astype(np.int32))
p = AlignParams()
k = 15


def timeit(name, fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"# {name}: {dt*1000:.1f} ms")
    return out


from figbird_tpu.align.core import _seed_hits

def seeds_old(reads, lengths):
    codes, valid, offs = _seed_codes(reads, lengths, k, p.n_seeds)
    lo = jnp.searchsorted(codes_t, codes, side="left")
    hi = jnp.searchsorted(codes_t, codes, side="right")
    return codes, valid, offs, lo, hi

codes, valid, offs, lo, hi = timeit("seed+searchsorted (old)", seeds_old, reads, lengths)

def seeds_new(reads, lengths):
    codes, valid, offs = _seed_codes(reads, lengths, k, p.n_seeds)
    hp, hm, ov = _seed_hits(tables, codes, valid, p.hits_per_seed,
                            p.repeat_limit, prefix_shift)
    return hp, hm, ov

timeit("seed+buckets (new)", seeds_new, reads, lengths)

def cands(lo, hi, valid, offs):
    cnt = hi - lo
    H = p.hits_per_seed
    h = jnp.arange(H)[None, None, :]
    hmask = (h < cnt[:, :, None]) & valid[:, :, None] & (cnt[:, :, None] <= p.repeat_limit)
    hit_idx = jnp.clip(lo[:, :, None] + h, 0, codes_t.shape[0] - 1)
    hit_pos = pos_t[hit_idx]
    cand = hit_pos - offs[:, :, None].astype(hit_pos.dtype)
    cand = jnp.clip(cand, 0, flat.shape[0] - reads.shape[1] - 1)
    C = p.n_seeds * H
    return cand.reshape(B, C), hmask.reshape(B, C)

cand, hmask = timeit("hit gather", cands, lo, hi, valid, offs)

def win_only(cand):
    from figbird_tpu.align.core import _extract_windows
    return _extract_windows(flat2d, cand, reads.shape[1])

w = timeit("window extract (B,C,L)", win_only, cand)

def score(cand, hmask):
    return _score_candidates(flat2d, reads, cand, hmask, p.match, p.mismatch)

sc = timeit("score_candidates total", score, cand, hmask)

import time as _t
fj = jax.jit(lambda rr, ll: align_batch_device(
    flat2d, flatlen, tables, rr, ll, k, p, prefix_shift))
jax.block_until_ready(fj(reads, lengths))
t0 = _t.time()
for _ in range(5):
    out = fj(reads, lengths)
jax.block_until_ready(out)
dt = (_t.time() - t0) / 5
print(f"# full align_batch_device: {dt*1000:.1f} ms = {B/dt:.0f} reads/s/chip")


def score_new(cand, hmask):
    from figbird_tpu.ops.align_score import score_candidates_scan
    sc = score_candidates_scan(flat2d, reads, cand, p.match, p.mismatch, 5)
    return jnp.where(hmask, sc["local"], -(2**30))

timeit("score_candidates pallas-scan", score_new, cand, hmask)
