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
    out = np.asarray(fn())
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn())
    print(f"# {name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)


def make(kind):
    def inst_fn(inst):
        gap_zone = EM._gap_zone(inst, cfg)
        counts0 = EM._counts_flank(inst, cfg)
        counts0 = counts0.at[:, 4].add(jnp.where(gap_zone, 1.0, 0.0))
        probs = EM.compute_probs_gap(counts0)
        st4, lm, rm = EM._stack_for(inst, cfg)
        tot = st4.sum(axis=1, keepdims=True)
        stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)
        stp_w = jnp.zeros((cfg.W, 5)).at[cfg.WL:cfg.WL + cfg.max_gap_len].set(stp)
        probs = jnp.where(gap_zone[:, None], stp_w, probs)
        eprobs = EM.compute_error_probs_gap(probs, marr["et"])
        P_, L_ = inst["pr"].shape
        j = jnp.arange(L_)[None, :]
        plen = inst["p_len"][:, None]
        left = ((inst["p_match"] == 1) | (inst["p_match"] == 4))[:, None]
        jv_count = j < plen
        jv_score = jv_count & jnp.where(left, j >= cfg.clip_thresh,
                                        j < plen - cfg.clip_thresh)
        oh_score = EM._oh_flat_j(inst["pr"], jv_score)
        oh_count = EM._oh_flat_c(inst["pr"], jv_count)
        p0l, p0r = EM._band_starts(cfg, inst["gap_len"])
        leg1 = EM._legal_partial_band(cfg, inst, p0l, True)
        leg2 = EM._legal_partial_band(cfg, inst, p0r, False)
        acc = jnp.float32(0.0)
        for it in range(3):
            ln1 = jnp.where(leg1, EM._score_soft_band(
                oh_score, probs, eprobs, marr["e_fwd"], p0l, cfg), EM.NEG)
            ln2 = jnp.where(leg2, EM._score_soft_band(
                oh_score, probs, eprobs, marr["e_fwd"], p0r, cfg), EM.NEG)
            mx, _ = EM._combine_bands_max(ln1, ln2, p0r)
            if kind == "bscore":
                acc = acc + jnp.sum(mx)
                continue
            soft = EM._soft_counts_banded(EM.LN10 * ln1, leg1,
                                          EM.LN10 * ln2, leg2, p0r,
                                          oh_count, cfg)
            counts = jnp.where(gap_zone[:, None], soft,
                               EM._counts_flank(inst, cfg))
            probs = EM.compute_probs_gap(counts)
            eprobs = EM.compute_error_probs_gap(probs, marr["et"])
            acc = acc + jnp.max(mx)
        if kind == "bscore":
            return acc
        return acc + counts.sum()

    @jax.jit
    def run(gi2, gl2):
        insts = EM._gather_inst(cfg, ga, gi2, gl2)
        return jax.vmap(inst_fn)(insts)
    return lambda: run(gi_, gl_)


timed("banded scores only x3", make("bscore"))
timed("banded score+accumulate x3", make("bsoft"))
