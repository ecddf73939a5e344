"""Pallas band-score kernel vs the XLA reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from figbird_tpu.ops.band import (
    band_score_reference, _band_score_pallas)


def _ref_numpy(oh, K, Wp):
    # K arrives flat j-major (W, L*5)
    R, LC = oh.shape
    W = K.shape[0]
    C = 5
    L = LC // C
    out = np.zeros((R, Wp), np.float32)
    Kf = np.asarray(K).reshape(W, L, C)
    ohn = np.asarray(oh).reshape(R, L, C)
    for p in range(Wp):
        for j in range(L):
            out[:, p] += ohn[:, j, :] @ Kf[p + j, j, :]
    return out


@pytest.mark.parametrize("R,W,L", [(8, 40, 12), (5, 70, 31)])
def test_reference_matches_numpy(R, W, L):
    rng = np.random.default_rng(0)
    Wp = W - L
    K = jnp.asarray(rng.normal(size=(W, L * 5)).astype(np.float32))
    oh = jnp.asarray((rng.random((R, L * 5)) < 0.2).astype(np.float32))
    got = np.asarray(band_score_reference(oh, K, Wp))
    want = _ref_numpy(oh, K, Wp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("R,W,L", [(8, 160, 12), (300, 400, 33)])
def test_pallas_matches_reference(R, W, L):
    rng = np.random.default_rng(1)
    Wp = W - L
    K = jnp.asarray(rng.normal(size=(W, L * 5)).astype(np.float32))
    oh = jnp.asarray((rng.random((R, L * 5)) < 0.2).astype(np.float32))
    want = np.asarray(band_score_reference(oh, K, Wp))
    got = np.asarray(_band_score_pallas(oh, K, Wp))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_pallas_vmapped():
    rng = np.random.default_rng(2)
    B, R, W, L = 3, 16, 200, 25
    Wp = W - L
    K = jnp.asarray(rng.normal(size=(B, W, L * 5)).astype(np.float32))
    oh = jnp.asarray((rng.random((B, R, L * 5)) < 0.2).astype(np.float32))
    want = np.stack([np.asarray(band_score_reference(oh[b], K[b], Wp))
                     for b in range(B)])
    got = np.asarray(jax.vmap(lambda o, k: _band_score_pallas(o, k, Wp))(oh, K))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_soft_kernel_clamp_matches_fallback():
    """The fused soft kernel and the _soft_K fallback clamp the factor at
    the SAME 1e-30 before the log — including zero-probability columns
    (ADVICE r4 #1: a 1e-300 fallback clamp underflowed to -inf in f32)."""
    from figbird_tpu.fill.em import _soft_K
    from figbird_tpu.ops.band import _band_score_soft_pallas

    rng = np.random.default_rng(3)
    W, L = 200, 20
    Wp = W - L
    R = 16
    probs = rng.random((W, 5)).astype(np.float32)
    probs[:, 4] = 0.0
    # zero-probability column: all mass on A at some rows, e_pos 0 there
    probs[50:60] = 0.0
    probs[50:60, 0] = 1.0
    e_pos = np.full(L, 1e-3, np.float32)
    e_pos[:4] = 0.0  # F = A exactly for these cycles -> exact zeros possible
    eprobs = rng.random((W, 5)).astype(np.float32) * 1e-2
    oh = (rng.random((R, L * 5)) < 0.2).astype(np.float32)
    K = _soft_K(jnp.asarray(probs), jnp.asarray(eprobs),
                jnp.asarray(e_pos), W)
    want = np.asarray(band_score_reference(jnp.asarray(oh), K, Wp))
    assert np.all(np.isfinite(want)), "fallback must not produce -inf/NaN"
    got = np.asarray(_band_score_soft_pallas(
        jnp.asarray(oh), jnp.asarray(probs), jnp.asarray(eprobs),
        jnp.asarray(e_pos), Wp))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_cascade_kernel_matches_xla_path():
    """The fused cascade/fold kernels (interpret mode off-TPU) agree with
    the XLA grouped-matmul + skew-fold path — including exact zeros from
    the -1e30 legal mask (exp underflow) and overflow-zeroed levels."""
    from figbird_tpu.fill.em import (_CASCADE_CUT, _CASCADE_SHIFT,
                                     _accumulate_levels, _oh_flat_c,
                                     _oh_flat_j)
    from figbird_tpu.ops.band import cascade_counts, fold_counts

    rng = np.random.default_rng(5)
    N, L, Pw = 24, 19, 90
    W = Pw + L
    logw = rng.uniform(-900.0, 0.0, (N, Pw)).astype(np.float32)
    legal = rng.random((N, Pw)) < 0.7
    codes = rng.integers(0, 5, (N, L)).astype(np.int8)
    jv = jnp.asarray(rng.random((N, L)) < 0.9)
    oh_j = _oh_flat_j(jnp.asarray(codes), jv)
    oh_c = _oh_flat_c(jnp.asarray(codes), jv)

    want = np.asarray(_accumulate_levels(
        jnp.asarray(logw), jnp.asarray(legal), oh_c, L, W, 6))
    got = np.asarray(cascade_counts(
        jnp.where(jnp.asarray(legal), jnp.asarray(logw), -1e30), oh_j,
        L, W, 6, _CASCADE_SHIFT, _CASCADE_CUT))
    assert want.shape == got.shape == (6, W, 5)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=0)
    # exact zeros must match exactly (no spurious mass either way)
    np.testing.assert_array_equal(got == 0.0, want == 0.0)

    w = rng.random((N, Pw)).astype(np.float32)
    cwT = jax.lax.dot_general(oh_c, jnp.asarray(w),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    from figbird_tpu.fill.em import _fold_counts_T

    want2 = np.asarray(_fold_counts_T(cwT, L, W))
    got2 = np.asarray(fold_counts(jnp.asarray(w), oh_j, L, W))
    np.testing.assert_allclose(got2, want2, rtol=2e-6, atol=0)
