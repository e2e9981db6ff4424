"""ops/local_attention.py — banded MHA vs dense masked attention.

The local-window form must match ``nn.dot_product_attention`` with the
``_band_mask`` additive bias exactly (same softmax support — masked
entries contribute 0), including odd/even windows and border rows.
"""

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
import pytest

from lfsr_tpu.models.epit import _band_mask
from lfsr_tpu.ops.local_attention import local_window_mha


def _dense(q, k, v, heads, h, w, k_r, k_c):
    B, L, D = q.shape
    hd = D // heads
    split = lambda a: a.reshape(B, L, heads, hd)
    bias = jnp.asarray(_band_mask(h, w, k_r, k_c))[None, None]
    o = nn.dot_product_attention(split(q), split(k), split(v), bias=bias)
    return np.asarray(o.reshape(B, L, D))


@pytest.mark.parametrize(
    "h,w,k_r,k_c,heads",
    [(8, 8, 5, 5, 8), (6, 10, 3, 5, 4), (7, 7, 4, 4, 2), (5, 5, 11, 3, 4)],
)
def test_local_window_mha_matches_dense_banded(h, w, k_r, k_c, heads):
    rng = np.random.default_rng(0)
    B, D = 3, 8 * heads
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, h * w, D)), jnp.float32)
        for _ in range(3)
    )
    got = np.asarray(
        local_window_mha(q, k, v, heads=heads, h=h, w=w, k_r=k_r, k_c=k_c)
    )
    want = _dense(q, k, v, heads, h, w, k_r, k_c)
    assert np.abs(got - want).max() < 2e-6
