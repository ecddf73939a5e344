"""Cascade-accumulate internals at the u bucket shape: where do the
~87 ms/iter (494-instance dispatch) go — matmuls, folds, or selection?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import figbird_tpu.fill.em as EM

print("# device:", jax.devices()[0], flush=True)
IB, N, L, W, Pw = 494, 128, 101, 714, 613
LC = 5 * L
rng = np.random.default_rng(0)
logw = jnp.asarray(rng.uniform(-900, 0, (IB, N, Pw)).astype(np.float32))
legal = jnp.asarray(rng.random((IB, N, Pw)) < 0.8)
oh = jnp.asarray((rng.random((IB, N, LC)) < 0.2).astype(np.float32))
ITERS = 8


def timed(name, fn, n=3):
    out = np.asarray(fn())
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn())
    dt = (time.time() - t0) / n * 1000
    print(f"# {name}: {dt:.1f} ms ({dt/ITERS:.1f}/iter)", flush=True)
    return dt


def loop(body):
    @jax.jit
    def run(logw, legal, oh):
        def one(lw, lg, o):
            acc = jnp.float32(0)
            x = lw
            for _ in range(ITERS):
                acc = acc + body(x, lg, o)
                x = x + 1e-6 * acc  # serialise iterations
            return acc
        return jax.vmap(one)(logw, legal, oh)
    return lambda: run(logw, legal, oh)


# full production accumulate (m=6)
cfgd = EM.FillConfig(W=W, Wp=Pw, L=L, WL=L, max_gap_len=W - 2 * L, R=N, P=8,
                     partial_mode=False, unmapped_mode=True, em_iters=8,
                     gap_prob_cutoff=5.0, insert_tmin=100, insert_tmax=300,
                     exact_soft=True)
timed("full _accumulate_logw m=6", loop(
    lambda x, lg, o: EM._accumulate_logw(x, lg, o, cfgd)[0].sum()))

# grouped matmuls only (no fold): 2 groups of 3 stacked levels
def mm_only(x, lg, o):
    s = jnp.float32(0)
    for g0 in (0, 3):
        wk = jnp.concatenate([EM._level_weight(x, lg, k)
                              for k in range(g0, g0 + 3)], axis=1)
        cwT = jax.lax.dot_general(o, wk, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        s = s + cwT.sum()
    return s
timed("grouped matmuls only", loop(mm_only))

# matmuls + folds (no selection)
def mm_fold(x, lg, o):
    s = jnp.float32(0)
    for g0 in (0, 3):
        wk = jnp.concatenate([EM._level_weight(x, lg, k)
                              for k in range(g0, g0 + 3)], axis=1)
        cwT = jax.lax.dot_general(o, wk, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        cw3 = cwT.reshape(LC, 3, Pw)
        folded = jax.vmap(lambda c: EM._fold_counts_T(c, L, W),
                          in_axes=1)(cw3)
        s = s + folded.sum()
    return s
timed("matmuls + folds", loop(mm_fold))

# level-weight materialisation only (6 levels)
def lw_only(x, lg, o):
    s = jnp.float32(0)
    for k in range(6):
        s = s + EM._level_weight(x, lg, k).sum()
    return s
timed("level weights only", loop(lw_only))

# m=1 baseline
def m1(x, lg, o):
    w = jnp.where(lg, jnp.exp(jnp.maximum(x, -700.0)), 0.0)
    return EM._accumulate(w, o, cfgd).sum()
timed("m=1 accumulate", loop(m1))
