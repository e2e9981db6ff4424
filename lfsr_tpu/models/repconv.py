"""Structural re-parameterization (RepVGG-style) blocks + pure fusion.

Training topology: dilated kxk conv + 1x1 conv + identity, each with its
own BatchNorm (MyEfficientLFNet.py RepConvBlock, :330-468). Deploy
topology: a single biased kxk conv. ``reparameterize`` is a pure function
(params, batch_stats) -> deploy params implementing the reference's
BN-fusion math (:429-468) on flax NHWC kernels [kh, kw, cin, cout].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from lfsr_tpu.models.common import conv


class RepConv(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    deploy: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, d = self.kernel, self.dilation
        pad = (k // 2) * d
        if self.deploy:
            return conv(
                self.features, k, dilation=d, padding=pad, use_bias=True,
                dtype=self.dtype, name="rep",
            )(x)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        y = bn("bn3")(
            conv(self.features, k, dilation=d, padding=pad, use_bias=False,
                 dtype=self.dtype, name="conv3")(x)
        )
        y = y + bn("bn1")(
            conv(self.features, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        )
        if x.shape[-1] == self.features:
            y = y + bn("bnid")(x)
        return y


# ---------------------------------------------------------------------------
# Pure weight-space fusion (switch_to_deploy as a params transform)
# ---------------------------------------------------------------------------


def _fuse_conv_bn(kernel, bn_p, bn_s):
    t = bn_p["scale"] / np.sqrt(np.asarray(bn_s["var"]) + 1e-5)
    fused_k = np.asarray(kernel) * t[None, None, None, :]
    fused_b = np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * t
    return fused_k, fused_b


def _is_repconv(params_sub: dict) -> bool:
    return isinstance(params_sub, dict) and "conv3" in params_sub and "bn3" in params_sub


def reparameterize(params: dict, batch_stats: dict):
    """Fuse every RepConv subtree into a single {'rep': {kernel, bias}}.

    Returns ``(deploy_params, deploy_batch_stats)`` usable with the
    ``deploy=True`` topology — RepConv BN statistics are folded into the
    fused kernels and dropped, while any other BatchNorm (e.g. the
    SAModulator's) keeps its stats. Mirrors MyEfficientLFNet.py:388-468:
    kernel = k3*t3 + pad(k1*t1) + id*tid, bias = sum of fused biases.
    """

    def walk(p, s):
        if _is_repconv(p):
            k3 = np.asarray(p["conv3"]["kernel"])
            kh = k3.shape[0]
            ck = kh // 2
            fk, fb = _fuse_conv_bn(k3, p["bn3"], s["bn3"])

            k1, b1 = _fuse_conv_bn(p["conv1"]["kernel"], p["bn1"], s["bn1"])
            pad1 = np.zeros_like(fk)
            pad1[ck, ck] = k1[0, 0]
            fk = fk + pad1
            fb = fb + b1

            if "bnid" in p:
                cin, cout = fk.shape[2], fk.shape[3]
                t = np.asarray(p["bnid"]["scale"]) / np.sqrt(
                    np.asarray(s["bnid"]["var"]) + 1e-5
                )
                kid = np.zeros_like(fk)
                for i in range(cout):
                    kid[ck, ck, i % cin, i] = t[i]
                fk = fk + kid
                fb = fb + np.asarray(p["bnid"]["bias"]) - np.asarray(s["bnid"]["mean"]) * t

            return {"rep": {"kernel": jnp.asarray(fk), "bias": jnp.asarray(fb)}}
        if isinstance(p, dict):
            return {
                key: walk(val, s.get(key, {}) if isinstance(s, dict) else {})
                for key, val in p.items()
            }
        return p

    def walk_stats(p, s):
        """Keep only batch_stats whose owning module is NOT a fused RepConv."""
        if _is_repconv(p):
            return None
        if isinstance(s, dict):
            out = {}
            for key, sval in s.items():
                pval = p.get(key, {}) if isinstance(p, dict) else {}
                kept = walk_stats(pval, sval)
                if kept is None or (isinstance(kept, dict) and not kept):
                    continue
                out[key] = kept
            return out
        return s

    return walk(params, batch_stats), walk_stats(params, batch_stats)
