"""Fused masked-MHA kernel: oracle parity, flax equivalence, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.ops import pallas_masked_attention as M


def _band_mask(L, width=11):
    i = np.arange(L)
    ok = np.abs(i[None, :] - i[:, None]) <= width // 2
    return jnp.asarray(np.where(ok, 0.0, -np.inf), jnp.float32)


def _qkv(B=8, L=32, D=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, D)), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("heads", [4, 8])
def test_kernel_matches_oracle(heads):
    q, k, v = _qkv()
    mask = _band_mask(32)
    out = M.masked_mha_fused(q, k, v, mask, heads)
    ref = M.masked_mha_ref(q, k, v, mask, heads=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_oracle_matches_flax_attention():
    """The ref mirror (and therefore the kernel) reproduces
    nn.dot_product_attention over channel-contiguous heads — the exact
    op the EPIT fallback path uses."""
    heads = 8
    q, k, v = _qkv(B=4, L=24, D=128, seed=1)
    mask = _band_mask(24)
    ref = M.masked_mha_ref(q, k, v, mask, heads=heads)
    B, L, D = q.shape
    hd = D // heads
    split = lambda a: a.reshape(B, L, heads, hd)
    flax_out = nn.dot_product_attention(
        split(q), split(k), split(v), bias=mask[None, None, :, :]
    ).reshape(B, L, D)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gradients_match_reference_math():
    q, k, v = _qkv(B=2, L=16, D=128, seed=2)
    mask = _band_mask(16, width=7)

    def loss_fused(q, k, v):
        return jnp.sum(M.masked_mha_fused(q, k, v, mask, 8) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(M.masked_mha_ref(q, k, v, mask, heads=8) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_io():
    q, k, v = _qkv(dtype=jnp.bfloat16, seed=3)
    mask = _band_mask(32)
    out = M.masked_mha_fused(q, k, v, mask, 8)
    assert out.dtype == jnp.bfloat16
    ref = M.masked_mha_ref(q, k, v, mask, heads=8)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_supported_gate():
    assert M.supported(160, 128, 8)
    assert not M.supported(160, 96, 8)   # lane-misaligned D
    assert not M.supported(37, 128, 8)   # unaligned L
    assert not M.supported(1024, 128, 8)  # stacked K too large


@pytest.mark.slow
def test_epit_forward_unchanged_by_kernel_path():
    """EPIT's transformer output is identical whether the fused kernel
    or the flax fallback runs (same init, same input)."""
    from lfsr_tpu.config import Config
    from lfsr_tpu.models import registry
    from lfsr_tpu.models import epit as epit_mod

    cfg = Config(model_name="EPIT", scale_factor=4, compute_dtype="float32",
                 model_kwargs={"n_blocks": 1})
    model = registry.get_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(5).random((1, 40, 40, 1)), jnp.float32
    )
    params = model.init(jax.random.key(0), x)
    y_kernel = jax.jit(model.apply)(params, x)

    orig = masked_attn_supported = epit_mod.masked_attn.supported
    try:
        epit_mod.masked_attn.supported = lambda *a: False
        y_flax = jax.jit(model.apply)(params, x)
    finally:
        epit_mod.masked_attn.supported = orig
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_flax), rtol=1e-5, atol=1e-5
    )
