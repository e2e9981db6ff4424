#!/usr/bin/env python
"""Hardware smoke over the cross-scan kernel shape envelope (ADVICE r2).

Interpret-mode tests don't exercise Mosaic tiling/layout constraints;
this probe compiles the gather/scatter kernels for real on the attached
TPU across the _gather_supported envelope and checks them against the
XLA reference path. Run: python scripts/probes/probe_layout_envelope.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from lfsr_tpu.ops import pallas_layout as pll

RNG = np.random.default_rng(7)
CASES = [
    (8, 32, jnp.float32), (16, 64, jnp.float32), (24, 64, jnp.bfloat16),
    (48, 128, jnp.bfloat16), (160, 64, jnp.bfloat16), (160, 64, jnp.float32),
]


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    for S, C, dtype in CASES:
        B = 2
        x = jnp.asarray(RNG.normal(size=(B, S, S, C)), dtype)
        gamma = jnp.asarray(RNG.normal(size=(C,)) * 0.2 + 1.0, dtype)
        beta = jnp.asarray(RNG.normal(size=(C,)) * 0.1, dtype)
        assert pll._gather_supported(x), (S, C, dtype)
        # reversed groups go through the MXU anti-diagonal matmul, which
        # runs at default (bf16-pass) precision — so even f32 inputs carry
        # ~1e-2 relative rounding on the reversed half of the channels
        tol = 5e-2 if dtype == jnp.bfloat16 else 2e-2
        got = np.asarray(pll.cross_scan_gather(x, gamma, beta), np.float32)
        want = np.asarray(pll.cross_scan_gather_ref(x, gamma, beta), np.float32)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

        seq = jnp.asarray(RNG.normal(size=(B, S * S, C)), dtype)
        w = jnp.asarray(RNG.normal(size=(C, C)) * 0.3, dtype)
        scale = jnp.asarray([0.15], jnp.float32)
        got = np.asarray(pll.cross_scan_scatter(seq, x, w, scale), np.float32)
        want = np.asarray(pll.cross_scan_scatter_ref(seq, x, w, scale), np.float32)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
        print(f"S={S} C={C} {np.dtype(dtype).name}: OK")
    print("envelope PASS")


if __name__ == "__main__":
    main()
