"""Microbenchmark one fill_batch_gathered dispatch at bench shapes."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from figbird_tpu.fill.em import (FillConfig, fill_batch_gathered, _soft_K,
                                 _hard_K, _oh_flat_j, _accumulate)
from figbird_tpu.ops.band import band_score, band_score_reference

print("# device:", jax.devices()[0], flush=True)
G, P, L, gb = 50, 128, 101, 512
IB = 768
cfg = FillConfig(W=L+gb+L, Wp=L+gb, L=L, WL=L, max_gap_len=gb, R=1, P=P,
                 partial_mode=True, unmapped_mode=False, em_iters=3,
                 gap_prob_cutoff=5.0, insert_tmin=100, insert_tmax=300)
rng = np.random.default_rng(0)
gap_arrays = dict(
    orig_gap=jnp.asarray(np.full(G, 60, np.int32)),
    side_limit=jnp.asarray(np.full(G, 30, np.int32)),
    gap_start=jnp.asarray(np.full(G, 5000, np.int32)),
    perfect_gap=jnp.zeros(G, jnp.int32), perfect_gaplen=jnp.zeros(G, jnp.int32),
    left_win=jnp.asarray(rng.integers(0, 4, (G, cfg.WL)).astype(np.int8)),
    right_win=jnp.asarray(rng.integers(0, 4, (G, cfg.max_gap_len + L)).astype(np.int8)),
    ur=jnp.full((G, 1, L), 4, jnp.int8), u_len=jnp.zeros((G,1), jnp.int32),
    u_pos=jnp.zeros((G,1), jnp.int32), u_rev=jnp.zeros((G,1), jnp.int8),
    u_valid=jnp.zeros((G,1), bool),
    pr=jnp.asarray(rng.integers(0, 4, (G, P, L)).astype(np.int8)),
    p_len=jnp.asarray(np.full((G,P), L, np.int32)),
    p_clip=jnp.asarray(np.full((G,P), 50, np.int32)),
    p_match=jnp.asarray(np.ones((G,P), np.int32)),
    p_pos=jnp.asarray(np.full((G,P), 4950, np.int32)),
    p_refpos=jnp.asarray(np.full((G,P), -1, np.int32)),
    p_valid=jnp.asarray(np.ones((G,P), bool)),
    p_qerr=jnp.asarray(np.full((G,P,L), 1e-3, np.float32)),
)
marr = dict(
    e_fwd=jnp.full(L, 0.003, jnp.float32), e_rev=jnp.full(L, 0.003, jnp.float32),
    a_fwd=jnp.full(L, -0.004, jnp.float32), a_rev=jnp.full(L, -0.004, jnp.float32),
    b_fwd=jnp.full(L, -5.8, jnp.float32), b_rev=jnp.full(L, -5.8, jnp.float32),
    et=jnp.asarray(np.full((5,5), 0.25, np.float32)),
    ln_et=jnp.asarray(np.full((5,5), -1.4, np.float32)),
    ln_ins=jnp.full(20000, -8.0, jnp.float32),
)
gi = jnp.asarray((np.arange(IB) % G).astype(np.int32))
gl = jnp.asarray((40 + np.arange(IB) % 200).astype(np.int32))

def timeit(name, f, n=3):
    out = f(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    print(f"# {name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

timeit("fill_batch_gathered ib=768", lambda: fill_batch_gathered(cfg, gap_arrays, gi, gl, marr)["likelihood"])

# isolate band_score: one (IB) vmapped score call
probs = jnp.asarray(rng.random((IB, cfg.W, 5)).astype(np.float32))
K = jax.vmap(lambda p: _soft_K(p, p, marr["e_fwd"], cfg.W))(probs)
oh = jnp.asarray((rng.random((IB, P, L*5)) < 0.2).astype(np.float32))
f1 = jax.jit(lambda o, k: jax.vmap(lambda a, b: band_score(a, b, cfg.Wp))(o, k))
timeit("band_score pallas vmapped", lambda: f1(oh, K))
os.environ["FIGBIRD_PALLAS"] = "0"
f2 = jax.jit(lambda o, k: jax.vmap(lambda a, b: band_score_reference(a, b, cfg.Wp))(o, k))
timeit("band_score XLA-skew vmapped", lambda: f2(oh, K))
f3 = jax.jit(lambda p: jax.vmap(lambda x: _soft_K(x, x, marr["e_fwd"], cfg.W))(p))
timeit("soft_K build vmapped", lambda: f3(probs))
w = jnp.asarray(rng.random((IB, P, cfg.Wp)).astype(np.float32))
ohc = oh
f4 = jax.jit(lambda a, b: jax.vmap(lambda x, y: _accumulate(x, y, cfg))(a, b))
timeit("accumulate+fold vmapped", lambda: f4(w, ohc))

# --- production-sequence reproduction ---------------------------------------
from figbird_tpu.fill.em import fill_batch_scan, scan_acc_update, SCAN_COLS

def wave_with_acc(n_batches=24):
    buf = jnp.zeros((n_batches * IB, SCAN_COLS), jnp.float32)
    i0 = 0
    for _ in range(n_batches):
        buf = scan_acc_update(buf, fill_batch_scan(cfg, gap_arrays, gi, gl, marr, finalize_flag=False), jnp.int32(i0))
        i0 += IB
    return np.asarray(buf)

def wave_no_acc(n_batches=24):
    outs = [fill_batch_scan(cfg, gap_arrays, gi, gl, marr, finalize_flag=False) for _ in range(n_batches)]
    return jax.device_get(outs)

t0 = time.time(); wave_with_acc(2); print(f"# warm wave: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); wave_with_acc(24); print(f"# wave 24 batches WITH acc: {time.time()-t0:.2f}s", flush=True)
t0 = time.time(); wave_no_acc(24); print(f"# wave 24 batches NO acc (24-array fetch): {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
outs = [fill_batch_scan(cfg, gap_arrays, gi, gl, marr, finalize_flag=False) for _ in range(24)]
jax.block_until_ready(outs)
print(f"# 24 dispatches block-only: {time.time()-t0:.2f}s", flush=True)

# --- bisect inside the partial EM instance ---------------------------------
import functools
from figbird_tpu.fill import em as EM

def make_variant(name, **kw):
    """Compile a partial-EM variant with parts disabled."""
    iters = kw.get("iters", 3)
    do_hard = kw.get("hard", True)
    do_bonus = kw.get("bonus", True)
    do_stack = kw.get("stack", True)
    def inst_fn(inst, model):
        cfg2 = cfg
        gap_zone = EM._gap_zone(inst, cfg2)
        counts0 = EM._counts_flank(inst, cfg2)
        counts0 = counts0.at[:, 4].add(jnp.where(gap_zone, 1.0, 0.0))
        probs = EM.compute_probs_gap(counts0)
        if do_stack:
            st4, lm, rm = EM.partial_stack_probs(
                inst["pr"], inst["p_clip"], inst["p_match"], inst["p_len"],
                inst["p_valid"], cfg2.max_gap_len, inst["gap_len"])
            tot = st4.sum(axis=1, keepdims=True)
            stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)
            stp_w = jnp.zeros((cfg2.W, 5)).at[cfg2.WL:cfg2.WL+cfg2.max_gap_len].set(stp)
            probs = jnp.where(gap_zone[:, None], stp_w, probs)
        eprobs = EM.compute_error_probs_gap(probs, model["et"])
        lik = jnp.float32(0.0)
        for _ in range(iters):
            P, L = inst["pr"].shape
            j = jnp.arange(L)[None, :]
            plen = inst["p_len"][:, None]
            left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
            jv_count = j < plen
            jv_score = jv_count & jnp.where(left, j >= cfg2.clip_thresh, j < plen - cfg2.clip_thresh)
            oh_score = EM._oh_flat_j(inst["pr"], jv_score)
            oh_count = EM._oh_flat_c(inst["pr"], jv_count)
            legal = EM._legal_partial(cfg2, inst, model)
            K = EM._soft_K(probs, eprobs, model["e_fwd"], cfg2.W)
            lnP = jnp.where(legal, EM._score(oh_score, K, cfg2.Wp), EM.NEG)
            w_soft = jnp.where(legal, jnp.exp(jnp.maximum(EM.LN10*lnP, -700.)), 0.)
            soft = EM._accumulate(w_soft, oh_count, cfg2)
            counts = jnp.where(gap_zone[:, None], soft, EM._counts_flank(inst, cfg2))
            mx = jnp.max(lnP, axis=1)
            lik = jnp.sum(jnp.where((mx > EM.NEG/2) & inst["p_valid"], mx, 0.))
            if do_hard:
                cons0, _ = EM.consensus_from_counts(counts, gap_zone, 0, 0)
                gs = jnp.where(gap_zone, cons0, inst["tmpl"])
                Kh = EM._hard_K(gs, model["a_fwd"], model["b_fwd"], model["ln_et"])
                sh = jnp.where(legal, EM._score(oh_score, Kh, cfg2.Wp), EM.NEG)
                mh = jnp.max(sh, axis=1)
                pos_h = jnp.argmax(sh, axis=1).astype(jnp.int32) - cfg2.WL
                accept = (mh > EM.NEG/2) & inst["p_valid"]
                if do_bonus:
                    b, sl_, sr_ = EM._detect_overlap_partial(cfg2, inst, accept, pos_h)
                    lik = lik + b
            probs = EM.compute_probs_gap(counts)
            eprobs = EM.compute_error_probs_gap(probs, model["et"])
        return lik

    @functools.partial(jax.jit)
    def run(gi_, gl_):
        insts = EM._gather_inst(cfg, gap_arrays, gi_, gl_)
        return jax.vmap(lambda i: inst_fn(i, marr))(insts)
    # warm
    jax.block_until_ready(run(gi, gl))
    t0 = time.time()
    for _ in range(4):
        out = run(gi, gl)
    jax.block_until_ready(out)
    print(f"# variant {name}: {(time.time()-t0)/4*1000:.1f} ms/dispatch(768)", flush=True)

make_variant("full3", iters=3)
make_variant("no_bonus", iters=3, bonus=False)
make_variant("no_hard", iters=3, hard=False)
make_variant("one_iter", iters=1)
make_variant("one_iter_no_stack", iters=1, stack=False, hard=False, bonus=False)
