"""Reliable fill-EM piece timings: every variant timed with a real fetch
(np.asarray), since block_until_ready under-reports on the tunnel backend.

Variants build the REAL production instance path (gathered arrays incl the
precomputed stack halves) and knock out one piece at a time.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import figbird_tpu.fill.em as EM
from figbird_tpu.fill.em import FillConfig
from figbird_tpu.fill import driver as drv
from figbird_tpu.genome import Genome, GapInfo
from figbird_tpu.triage.assign import GapBundle

print("# device:", jax.devices()[0], flush=True)
G, P, L, gb, IB = 50, 128, 101, 512, 768
rng = np.random.default_rng(0)
contig = rng.integers(0, 4, size=200_000).astype(np.int8)
genome = Genome(["c"], [contig])
plans = []
for gi in range(G):
    s = 2000 + gi * 3000
    gap = GapInfo(0, s, 60)
    b = GapBundle(gap)
    for k in range(10):
        st = s - 40 + 3 * k
        b.p_seq.append(contig[st : st + L].copy())
        b.p_clip.append(40 - 3 * k)
        b.p_match.append(1 if k % 2 == 0 else 2)
        b.p_pos.append(st + 1)
        b.p_refpos.append(-1)
        b.p_qual.append(np.full(L, 1e-3, np.float32))
    plans.append(drv.GapPlan(gap, b, contig[s - 30 : s],
                             contig[s + 60 : s + 90], 30))
cfg = FillConfig(W=L + gb + L, Wp=L + gb, L=L, WL=L, max_gap_len=gb, R=1,
                 P=P, partial_mode=True, unmapped_mode=False,
                 gap_prob_cutoff=5.0, insert_tmin=100, insert_tmax=300)
ga = drv._build_gap_arrays(genome, plans, cfg)

from figbird_tpu.model.error_model import ModelStats, finalize_model
st = ModelStats(L)
ins = rng.normal(200, 20, size=20000).astype(int)
np.add.at(st.insert_counts, np.clip(ins, 1, st.max_insert_size - 1), 1)
st.error_pos += 5
st.read_lengths[L - 1] = 20000
st.error_types += 100
st.base_counts += 500000
model = finalize_model(st, np.array([200_000]))
marr = drv._model_arrays(model, L)
gi_ = jnp.asarray((np.arange(IB) % G).astype(np.int32))
gl_ = jnp.asarray((40 + np.arange(IB) % 100).astype(np.int32))


def timed(name, fn, n=3):
    out = np.asarray(fn())  # warm + compile
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn())
    dt = (time.time() - t0) / n * 1000
    print(f"# {name}: {dt:.1f} ms/dispatch({IB})", flush=True)
    return dt


def make(kind):
    def inst_fn(inst):
        gap_zone = EM._gap_zone(inst, cfg)
        counts0 = EM._counts_flank(inst, cfg)
        counts0 = counts0.at[:, 4].add(jnp.where(gap_zone, 1.0, 0.0))
        probs = EM.compute_probs_gap(counts0)
        st4, left_max, right_min = EM._stack_for(inst, cfg)
        tot = st4.sum(axis=1, keepdims=True)
        stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)
        stp_w = jnp.zeros((cfg.W, 5)).at[cfg.WL:cfg.WL + cfg.max_gap_len].set(stp)
        probs = jnp.where(gap_zone[:, None], stp_w, probs)
        eprobs = EM.compute_error_probs_gap(probs, marr["et"])
        if kind == "stack_only":
            return st4.sum()
        P_, L_ = inst["pr"].shape
        j = jnp.arange(L_)[None, :]
        plen = inst["p_len"][:, None]
        left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
        jv_count = j < plen
        jv_score = jv_count & jnp.where(left, j >= cfg.clip_thresh,
                                        j < plen - cfg.clip_thresh)
        oh_score = EM._oh_flat_j(inst["pr"], jv_score)
        oh_count = EM._oh_flat_c(inst["pr"], jv_count)
        legal = EM._legal_partial(cfg, inst, marr)
        acc = jnp.float32(0.0)
        for it in range(3):
            from figbird_tpu.ops.band import band_score_soft
            lnP = band_score_soft(oh_score, probs, eprobs, marr["e_fwd"],
                                  cfg.Wp)
            lnP = jnp.where(legal, lnP, EM.NEG)
            if kind == "score_only":
                acc = acc + jnp.sum(lnP)
                continue
            soft, _dt = EM._accumulate_logw(EM.LN10 * lnP, legal, oh_count,
                                            cfg)
            counts = jnp.where(gap_zone[:, None], soft,
                               EM._counts_flank(inst, cfg))
            probs = EM.compute_probs_gap(counts)
            eprobs = EM.compute_error_probs_gap(probs, marr["et"])
            acc = acc + jnp.max(lnP)
        if kind == "score_only":
            return acc
        if kind == "soft3":
            return acc + counts.sum()
        # full: hard + bonus on final counts
        cons0, _ = EM.consensus_from_counts(counts, gap_zone, 0, 0)
        gs = jnp.where(gap_zone, cons0, inst["tmpl"])
        Kh = EM._hard_K(gs, marr["a_fwd"], marr["b_fwd"], marr["ln_et"])
        sh = jnp.where(legal, EM._score(oh_score, Kh, cfg.Wp), EM.NEG)
        mh = jnp.max(sh, axis=1)
        pos_h = jnp.argmax(sh, axis=1).astype(jnp.int32) - cfg.WL
        accept = (mh > EM.NEG / 2) & inst["p_valid"]
        bval, sl_, sr_ = EM._detect_overlap_partial(cfg, inst, accept, pos_h)
        return acc + bval + jnp.sum(mh)

    @jax.jit
    def run(gi2, gl2):
        insts = EM._gather_inst(cfg, ga, gi2, gl2)
        return jax.vmap(inst_fn)(insts)
    return lambda: run(gi_, gl_)


from dataclasses import replace as _rc

for name, c in (
        ("scan m=1 nodetect (r4 fast)",
         _rc(cfg, soft_levels=1, detect_prec=False)),
        ("scan m=1 +detect", _rc(cfg, soft_levels=1, detect_prec=True)),
        ("scan m=3 +detect", _rc(cfg, soft_levels=3, detect_prec=True)),
        ("scan m=6 exact", _rc(cfg, exact_soft=True, detect_prec=False)),
):
    timed("REAL fill_batch_scan " + name,
          lambda c=c: EM.fill_batch_scan(c, ga, gi_, gl_, marr,
                                         finalize_flag=False))
timed("stack_only (gather+init)", make("stack_only"))
timed("score_only (3x fused soft score)", make("score_only"))
timed("soft3 (score+accumulate x3)", make("soft3"))
timed("full (soft3+hard+bonus)", make("full"))
