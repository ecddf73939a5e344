"""Unmapped-EM piece timings at the bench's u bucket shape.

The r5 bench put the u-pass at 35 s warm (scan_get 15 s + esc 12 s for
~2.5k instances) — ~6 ms/instance against a ~0.5 ms FLOP bound.  This
script knocks out pieces of _place_unmapped to attribute the waste.
"""
import os, sys, time
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
from dataclasses import replace as _rc

print("# device:", jax.devices()[0], flush=True)
G, P, R, L, gb = 50, 128, 128, 101, 512
IB = int(os.environ.get("IB", "494"))
EM_ITERS = int(os.environ.get("EM_ITERS", "8"))
rng = np.random.default_rng(0)
contig = rng.integers(0, 4, size=200_000).astype(np.int8)
genome = Genome(["c"], [contig])
plans = []
for gi in range(G):
    s = 2000 + gi * 3000
    gap = GapInfo(0, s, 60)
    b = GapBundle(gap)
    for k in range(R):
        st = s - 150 + 2 * k
        b.u_seq.append(contig[st : st + L].copy())
        b.u_pos.append(st + 1)
        b.u_rev.append(k % 2)
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
cfg0 = FillConfig(W=L + gb + L, Wp=L + gb, L=L, WL=L, max_gap_len=gb, R=R,
                  P=P, partial_mode=False, unmapped_mode=True,
                  em_iters=EM_ITERS, gap_prob_cutoff=5.0,
                  insert_tmin=100, insert_tmax=300, exact_soft=True)
ga = drv._build_gap_arrays(genome, plans, cfg0)

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
    print(f"# {name}: {dt:.1f} ms/dispatch({IB}) -> {dt/IB*1000:.0f} us/inst",
          flush=True)
    return dt


def make(kind, cfg):
    def inst_fn(inst):
        gap_zone = EM._gap_zone(inst, cfg)
        counts0 = EM._counts_flank(inst, cfg)
        counts0 = counts0.at[:, 4].add(jnp.where(gap_zone, 1.0, 0.0))
        probs = EM.compute_probs_gap(counts0)
        st4, left_max, _rm = EM._stack_for(inst, cfg)
        tot = st4.sum(axis=1, keepdims=True)
        stp = jnp.concatenate([st4 / tot, jnp.zeros_like(tot)], axis=1)
        stp_w = jnp.zeros((cfg.W, 5)).at[cfg.WL:cfg.WL + cfg.max_gap_len].set(stp)
        probs = jnp.where(gap_zone[:, None], stp_w, probs)
        eprobs = EM.compute_error_probs_gap(probs, marr["et"])
        prep = EM._unmapped_prep(cfg, inst, marr)
        if kind == "prep_only":
            return prep["oh"].sum() + prep["prior"].sum()
        acc = jnp.float32(0.0)
        from figbird_tpu.ops.band import band_score_soft
        for it in range(EM_ITERS):
            if kind in ("score_only", "score_acc", "score_acc_hard"):
                ln_f = band_score_soft(prep["oh"], probs, eprobs,
                                       marr["e_fwd"], cfg.Wp)
                ln_r = band_score_soft(prep["oh"], probs, eprobs,
                                       marr["e_rev"], cfg.Wp)
                lnP = jnp.where(prep["rev"], ln_r, ln_f) + prep["prior"]
                lnP = jnp.where(prep["legal"], lnP, EM.NEG)
                if kind == "score_only":
                    acc = acc + jnp.sum(lnP)
                    # keep the loop state-dependent so iterations serialise
                    probs = probs + 0.0 * acc
                    continue
                logw_u = 0.5 * lnP / EM.LN10
                soft, _dt = EM._accumulate_logw(logw_u, prep["legal"],
                                                prep["oh_cnt"], cfg)
                counts = jnp.where(gap_zone[:, None], soft, prep["flank"])
                if kind == "score_acc":
                    probs = EM.compute_probs_gap(counts)
                    eprobs = EM.compute_error_probs_gap(probs, marr["et"])
                    acc = acc + jnp.max(lnP)
                    continue
                # + hard pass
                cons0, _ = EM.consensus_from_counts(counts, gap_zone, 0, 0)
                gs = jnp.where(gap_zone, cons0, inst["tmpl"])
                Kh_f = EM._hard_K(gs, marr["a_fwd"], marr["b_fwd"],
                                  marr["ln_et"])
                Kh_r = EM._hard_K(gs, marr["a_rev"], marr["b_rev"],
                                  marr["ln_et"])
                sh = jnp.where(prep["rev"],
                               EM._score(prep["oh"], Kh_r, cfg.Wp),
                               EM._score(prep["oh"], Kh_f, cfg.Wp))
                sh = jnp.where(prep["legal"], sh, EM.NEG)
                probs = EM.compute_probs_gap(counts)
                eprobs = EM.compute_error_probs_gap(probs, marr["et"])
                acc = acc + jnp.max(sh)
                continue
            # full placement (production body)
            out = EM._place_unmapped(cfg, inst, marr, probs, eprobs, False,
                                     prep=prep)
            probs = EM.compute_probs_gap(out["counts"])
            eprobs = EM.compute_error_probs_gap(probs, marr["et"])
            acc = acc + out["likelihood"]
        return acc

    @jax.jit
    def run(gi2, gl2):
        insts = EM._gather_inst(cfg, ga, gi2, gl2)
        return jax.vmap(inst_fn)(insts)
    return lambda: run(gi_, gl_)


# production whole-program baselines
for name, kw in (("PROD scan stage0 (while,exact)", {}),
                 ("PROD scan m=1 f32", {"exact_soft": False,
                                        "detect_prec": False,
                                        "soft_levels": 1})):
    c = _rc(cfg0, **kw)
    timed("fill_batch_scan " + name,
          lambda c=c: EM.fill_batch_scan(c, ga, gi_, gl_, marr,
                                         finalize_flag=False))

for kind in ("prep_only", "score_only", "score_acc", "score_acc_hard",
             "unrolled_full"):
    timed(f"piece {kind} x{EM_ITERS} exact", make(kind, cfg0))
c1 = _rc(cfg0, exact_soft=False, detect_prec=False, soft_levels=1)
for kind in ("score_acc", "score_acc_hard"):
    timed(f"piece {kind} x{EM_ITERS} m=1", make(kind, c1))
