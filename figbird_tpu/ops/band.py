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
