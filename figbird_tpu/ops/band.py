"""Banded scoring kernels — the EM hot op as a Pallas TPU kernel.

The GapFiller E-step scores every read against every candidate start
position (Figbird.cpp placeReads scalar triple loops 3128-3188, 3550-3677):

    score[r, p] = sum_j K[p + j, j, read[r, j]]
                = onehot(reads) (R, L*5) . Kw (Wp, L*5)^T,
      where Kw[p, j, :] = K[p + j, j, :]  (a banded/windowed view of K).

Two implementations with identical numerics:

* ``band_score_reference`` — pure XLA: materialise Kw via a pad/reshape skew
  (no gather) and one MXU matmul.  Kw round-trips through HBM per call.
* ``band_score`` Pallas kernel — fuses the windowing into the matmul: per
  position tile, a (TP+L, L5) slab of K is staged HBM->VMEM once, the banded
  tile Kw is assembled with L *static* strided copies in VMEM, and all read
  tiles contract against it on the MXU.  Kw never touches HBM.

The kernel batches over the leading instance axis via ``jax.vmap`` (Pallas
lifts vmap to an outer grid dimension), matching ``fill_batch``'s structure.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

TP = 128  # position-tile
TR = 256  # read-tile


def use_pallas() -> bool:
    env = os.environ.get("FIGBIRD_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def band_score_reference(oh_flat: jnp.ndarray, K: jnp.ndarray, Wp: int
                         ) -> jnp.ndarray:
    """XLA path: skew-materialise Kw then one dot.

    oh (R, L*5) and K (W, L*5), both flat j-major (column j*5+c) — the CPU
    fallback may reshape freely (no TPU tile padding here)."""
    W = K.shape[0]
    C = 5
    L = K.shape[1] // C
    K = K.reshape(W, L, C)
    Kt = K.transpose(1, 0, 2).reshape(L * W, C)
    pad = jnp.zeros((L, C), K.dtype)
    skew = jnp.concatenate([Kt, pad], axis=0)[: L * (W + 1)].reshape(L, W + 1, C)
    Kw = skew[:, :Wp, :].transpose(1, 0, 2).reshape(Wp, L * C)
    return jax.lax.dot_general(
        oh_flat, Kw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _band_kernel(k_ref, oh_ref, out_ref, kw, *, L: int, C: int):
    """Grid (p_tiles, r_tiles); k_ref is the K slab for this p-tile in VMEM."""
    from jax.experimental import pallas as pl

    r = pl.program_id(1)

    @pl.when(r == 0)
    def _build():
        # banded tile: kw[t, j*C:(j+1)*C] = K[p0 + t + j, j*C:(j+1)*C]
        # — all-static strided copies within VMEM (k_ref is this p-tile's slab).
        for j in range(L):
            kw[:, j * C : (j + 1) * C] = k_ref[0, j : j + TP,
                                               j * C : (j + 1) * C]

    out_ref[:, :] = jax.lax.dot_general(
        oh_ref[:, :], kw[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("Wp",))
def _band_score_pallas(oh_flat: jnp.ndarray, K: jnp.ndarray, Wp: int
                       ) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, LC = oh_flat.shape
    W = K.shape[0]
    C = 5
    L = LC // C
    assert K.shape[1] == LC
    n_p = -(-Wp // TP)
    n_r = -(-R // TR)
    Wpad = n_p * TP + L
    Rpad = n_r * TR
    Kf = K.astype(jnp.float32)
    if Wpad > W:
        Kf = jnp.concatenate([Kf, jnp.zeros((Wpad - W, LC), jnp.float32)],
                             axis=0)
    # overlapping per-tile slabs (static slices; small duplication in HBM
    # buys a trivially blockable layout)
    slabs = jnp.stack([Kf[i * TP : i * TP + TP + L] for i in range(n_p)])
    oh = oh_flat.astype(jnp.float32)
    if Rpad > R:
        oh = jnp.concatenate([oh, jnp.zeros((Rpad - R, LC), jnp.float32)],
                             axis=0)

    out = pl.pallas_call(
        functools.partial(_band_kernel, L=L, C=C),
        grid=(n_p, n_r),
        interpret=(jax.default_backend() != "tpu"),
        in_specs=[
            pl.BlockSpec((1, TP + L, LC), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, LC), lambda p, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TP), lambda p, r: (r, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad, n_p * TP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TP, LC), jnp.float32),      # banded tile
        ],
    )(slabs, oh)
    return out[:R, :Wp]


def band_score(oh_flat: jnp.ndarray, K: jnp.ndarray, Wp: int) -> jnp.ndarray:
    if use_pallas():
        return _band_score_pallas(oh_flat, K, Wp)
    return band_score_reference(oh_flat, K, Wp)


# ---------------------------------------------------------------------------
# fused soft-pass kernel: builds the banded K tile IN VMEM from the (W, 5)
# probability tensors instead of materialising K (W, L*5) in HBM.  The soft
# EM pass's K build (probs/eprobs expansion + log) was the dominant HBM
# traffic of a fill dispatch (~6 MB/instance/iteration vs ~1.3 MB fused).
# ---------------------------------------------------------------------------


def _band_soft_kernel(e_ref, a_ref, b_ref, oh_ref, out_ref, kw, *, L, C):
    from jax.experimental import pallas as pl

    p = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _build():
        p0 = p * TP
        # F[t, j*C+c] = A[p0+t+j, c]*(1-e_j) + e_j*B[p0+t+j, c]
        for j in range(L):
            a = a_ref[0, pl.dslice(p0 + j, TP), :]
            b = b_ref[0, pl.dslice(p0 + j, TP), :]
            e = e_ref[j]
            kw[:, j * C : (j + 1) * C] = a * (1.0 - e) + e * b
        # one full-lane log over the assembled tile
        kw[:, :] = jnp.log(jnp.maximum(kw[:, :], 1e-30))

    out_ref[:, :] = jax.lax.dot_general(
        oh_ref[:, :], kw[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("Wp",))
def _band_score_soft_pallas(oh_flat, probs, eprobs, e_pos, Wp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, LC = oh_flat.shape
    W, C = probs.shape
    L = LC // C
    n_p = -(-Wp // TP)
    n_r = -(-R // TR)
    Wpad = n_p * TP + L
    Rpad = n_r * TR
    A = probs.astype(jnp.float32)
    B = eprobs.astype(jnp.float32)
    if Wpad > W:
        z = jnp.zeros((Wpad - W, C), jnp.float32)
        A = jnp.concatenate([A, z], axis=0)
        B = jnp.concatenate([B, z], axis=0)
    oh = oh_flat.astype(jnp.float32)
    if Rpad > R:
        oh = jnp.concatenate([oh, jnp.zeros((Rpad - R, LC), jnp.float32)],
                             axis=0)

    out = pl.pallas_call(
        functools.partial(_band_soft_kernel, L=L, C=C),
        grid=(n_p, n_r),
        interpret=(jax.default_backend() != "tpu"),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # e (L,)
            pl.BlockSpec((1, Wpad, C), lambda p, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # A full
            pl.BlockSpec((1, Wpad, C), lambda p, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # B full
            pl.BlockSpec((TR, LC), lambda p, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TP), lambda p, r: (r, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad, n_p * TP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TP, LC), jnp.float32),
        ],
    )(e_pos.astype(jnp.float32), A[None], B[None], oh)
    return out[:R, :Wp]


def band_score_soft(oh_flat, probs, eprobs, e_pos, Wp: int):
    """Soft-pass score: sum_j log(A[p+j, c_rj](1-e_j) + e_j B[p+j, c_rj]).

    TPU: fused Pallas kernel (K never touches HBM).  Fallback: the XLA
    _soft_K + skew-matmul path with identical numerics (same op order and
    the same 1e-30 factor clamp before the log)."""
    if use_pallas():
        return _band_score_soft_pallas(oh_flat, probs, eprobs, e_pos, Wp)
    from ..fill.em import _soft_K

    K = _soft_K(probs, eprobs, e_pos, probs.shape[0])
    return band_score_reference(oh_flat, K, Wp)


# ---------------------------------------------------------------------------
# fused cascade-accumulate kernel: level weights + count matmul + diagonal
# fold in one pass.  The XLA path materialises a (5L, Pw) matmul output in
# HBM per level group and folds it with a pad/reshape skew — ~600 MB of
# intermediates per dispatch at the bench's u shape, 60 ms/EM-iteration of
# pure HBM traffic.  Here the (5L, Pw) product lives only in VMEM and the
# fold is L static row-block adds, so HBM sees just the (N, Pw) weights
# read and the (m, 5, W) counts write.
#
# Layout note: the one-hots must be J-MAJOR (column j*5+c, i.e. _oh_flat_j)
# so each fold step j reads a CONTIGUOUS 5-row block of the product.
# ---------------------------------------------------------------------------


def _cascade_kernel(lw_ref, oh_ref, out_ref, cw, acc, *, L, C, m,
                    shift, cut, Pw):
    """Grid (m,): one cascade level per step.  lw_ref: legal-masked natural
    log-weights (N, Pwp) with illegal entries at -1e30 (exp underflows to
    exactly 0.0 in f32, matching _level_weight's explicit zero).  oh_ref:
    j-major COUNT one-hots (N, L*C).  out_ref: (1, C, Wpad) this level's
    folded counts."""
    from jax.experimental import pallas as pl

    k = pl.program_id(0)
    lk = lw_ref[:, :] + k.astype(jnp.float32) * shift
    w = jnp.where(lk <= cut, jnp.exp(jnp.clip(lk, -745.0, cut)), 0.0)
    # (L*C, N) x (N, Pwp) -> (L*C, Pwp) on the MXU, VMEM-resident
    cw[:, :] = jax.lax.dot_general(
        oh_ref[:, :], w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[:, :] = jnp.zeros_like(acc)
    for j in range(L):
        acc[:, j : j + Pw] = acc[:, j : j + Pw] + cw[j * C : (j + 1) * C, :]
    out_ref[0, :, :] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("L", "W", "m", "shift", "cut"))
def _cascade_counts_pallas(logw_masked, oh_flat_j, L: int, W: int, m: int,
                           shift: float, cut: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, Pw = logw_masked.shape
    LC = oh_flat_j.shape[1]
    C = LC // L
    Pwp = -(-Pw // 128) * 128
    # fold writes reach column Pwp + L - 1; pad W up to cover
    Wpad = -(-max(W, Pwp + L) // 128) * 128
    lw = logw_masked.astype(jnp.float32)
    if Pwp > Pw:
        lw = jnp.concatenate(
            [lw, jnp.full((N, Pwp - Pw), -1e30, jnp.float32)], axis=1)
    out = pl.pallas_call(
        functools.partial(_cascade_kernel, L=L, C=C, m=m,
                          shift=float(shift), cut=float(cut), Pw=Pwp),
        grid=(m,),
        interpret=(jax.default_backend() != "tpu"),
        in_specs=[
            pl.BlockSpec((N, Pwp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, LC), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Wpad), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, C, Wpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((LC, Pwp), jnp.float32),   # matmul product
            pltpu.VMEM((C, Wpad), jnp.float32),   # fold accumulator
        ],
    )(lw, oh_flat_j.astype(jnp.float32))
    return out[:, :, :W].transpose(0, 2, 1)      # (m, W, C)


# VMEM budget gate: weights + one-hots + product must fit (~16 MB/core)
_CASCADE_KERNEL_MAX_N = 512


def cascade_counts_ok(N: int) -> bool:
    return use_pallas() and N <= _CASCADE_KERNEL_MAX_N


def cascade_counts(logw_masked, oh_flat_j, L: int, W: int, m: int,
                   shift: float, cut: float):
    """First ``m`` cascade levels' folded counts, (m, W, 5).

    TPU: fused kernel above.  The caller must gate on cascade_counts_ok and
    fall back to the XLA grouped-matmul + skew-fold path otherwise."""
    return _cascade_counts_pallas(logw_masked, oh_flat_j, L, W, m,
                                  shift, cut)


def _fold_kernel(w_ref, oh_ref, out_ref, cw, acc, *, L, C):
    """Raw-weights variant of _cascade_kernel: one matmul + fold."""
    cw[:, :] = jax.lax.dot_general(
        oh_ref[:, :], w_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[:, :] = jnp.zeros_like(acc)
    for j in range(L):
        acc[:, j : j + cw.shape[1]] = (acc[:, j : j + cw.shape[1]]
                                       + cw[j * C : (j + 1) * C, :])
    out_ref[:, :] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("L", "W"))
def _fold_counts_pallas(weights, oh_flat_j, L: int, W: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, Pw = weights.shape
    LC = oh_flat_j.shape[1]
    C = LC // L
    Pwp = -(-Pw // 128) * 128
    Wpad = -(-max(W, Pwp + L) // 128) * 128
    w = weights.astype(jnp.float32)
    if Pwp > Pw:
        w = jnp.concatenate([w, jnp.zeros((N, Pwp - Pw), jnp.float32)],
                            axis=1)
    out = pl.pallas_call(
        functools.partial(_fold_kernel, L=L, C=C),
        grid=(1,),
        interpret=(jax.default_backend() != "tpu"),
        in_specs=[
            pl.BlockSpec((N, Pwp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, LC), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, Wpad), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Wpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((LC, Pwp), jnp.float32),
            pltpu.VMEM((C, Wpad), jnp.float32),
        ],
    )(w, oh_flat_j.astype(jnp.float32))
    return out[:, :W].T                                   # (W, C)


def fold_counts(weights, oh_flat_j, L: int, W: int):
    """counts[w, c] = sum_r sum_j weights[r, w-j] * oh_j[r, j*C+c] — the
    accumulate matmul + diagonal fold, fused in VMEM (TPU)."""
    return _fold_counts_pallas(weights, oh_flat_j, L, W)
