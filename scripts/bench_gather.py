"""Compare window-extraction strategies for the aligner on the real chip."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

NFLAT = 4_600_000
B, C, L = 8192, 32, 100
rng = np.random.default_rng(0)
flat = jnp.asarray(rng.integers(0, 4, NFLAT, dtype=np.int8))
cand = jnp.asarray(rng.integers(0, NFLAT - 300, (B, C), dtype=np.int32))
reads = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int8))

NROW = (NFLAT + 127) // 128 + 2
flat2d = jnp.asarray(np.resize(np.asarray(flat), NROW * 128).reshape(NROW, 128))


def timeit(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"# {name}: {(time.time()-t0)/n*1000:.1f} ms")
    return out


def v1_elem_gather(cand):
    return flat[cand[:, :, None] + jnp.arange(L)[None, None, :]]

def v2_rowgather(cand):
    row = cand >> 7
    rows = flat2d[row]            # (B,C,128)
    rows2 = flat2d[row + 1]       # (B,C,128)
    return jnp.concatenate([rows, rows2], axis=-1)  # (B,C,256)

def _extract(seg, off):
    # stage 1: shift by multiples of 8 -> (B,C,L+7)
    st1 = jnp.zeros(seg.shape[:2] + (L + 8,), seg.dtype)
    hi = off >> 3
    for s in range(16):
        st1 = jnp.where((hi == s)[:, :, None], seg[:, :, 8*s : 8*s + L + 8], st1)
    lo = off & 7
    win = jnp.zeros(seg.shape[:2] + (L,), seg.dtype)
    for r in range(8):
        win = jnp.where((lo == r)[:, :, None], st1[:, :, r : r + L], win)
    return win

def v2_full(cand):
    seg = v2_rowgather(cand)
    return _extract(seg, cand & 127)

def v3_take(cand):
    seg = v2_rowgather(cand)
    idx = (cand & 127)[:, :, None] + jnp.arange(L)[None, None, :]
    return jnp.take_along_axis(seg, idx, axis=-1)

w1 = timeit("v1 element gather", v1_elem_gather, cand)
seg = timeit("v2 row gather only", v2_rowgather, cand)
w2 = timeit("v2 rowgather+shift extract", v2_full, cand)
w3 = timeit("v3 rowgather+take_along_axis", v3_take, cand)

np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
np.testing.assert_array_equal(np.asarray(w1), np.asarray(w3))
print("# all equal ✓")
