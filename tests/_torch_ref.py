"""Helpers for weight-transfer forward-parity tests against the reference
torch models (read-only import from /root/reference).

The reference models are plain torch nn.Modules taking an ``args``
namespace (model/SR/*.py ``get_model(args)``); a fake ``option`` module is
pre-registered so any transitive ``from option import args`` import does
not re-parse pytest's argv (option.py:36).
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"


def ref_args(**kw):
    ns = types.SimpleNamespace(
        task="SR",
        angRes_in=5,
        angRes_out=5,
        scale_factor=4,
        patch_for_train=32,
        device="cpu",
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def load_ref_model(name: str, args=None):
    """Import model/SR/<name>.py from the reference and build get_model."""
    import torch

    # several reference forwards call .cuda() on intermediates
    # (resLF.py:43-45, 154-174); make that a no-op on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "option" not in sys.modules:
        opt = types.ModuleType("option")
        opt.args = ref_args()
        sys.modules["option"] = opt
    if "skimage" not in sys.modules:
        # several reference model files import skimage.morphology at module
        # level but never use it in forward; stub it (not installed here)
        sk = types.ModuleType("skimage")
        for sub in ("morphology", "metrics"):
            m = types.ModuleType(f"skimage.{sub}")
            setattr(sk, sub, m)
            sys.modules[f"skimage.{sub}"] = m
        sys.modules["skimage"] = sk
    import importlib

    mod = importlib.import_module(f"model.SR.{name}")
    model = mod.get_model(args or ref_args())
    model.eval()
    return model


def install_mamba_shim():
    """Register a functional ``mamba_ssm`` stand-in so the mamba-gated
    reference line (MyEfficientLFNetV6_2..V6_6/V7/V8) can run forward on
    CPU for weight-transfer parity tests.

    The shim is parameter-exact (in_proj/conv1d/x_proj/dt_proj/A_log/D/
    out_proj, dt_rank=ceil(d_model/16)) and implements the CUDA kernel's
    documented math (mamba_ssm selective_scan_ref): causal depthwise
    conv1d + SiLU, softplus(dt_proj(dt)), ZOH scan
    h_t = exp(delta A) h_{t-1} + delta B_t x_t, y_t = C_t . h_t + D x_t,
    gated by SiLU(z). Matches lfsr_tpu.ops.selective_scan semantics.
    """
    import math
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "mamba_ssm" in sys.modules:
        return

    class Mamba(nn.Module):
        def __init__(self, d_model, d_state=16, d_conv=4, expand=2, **kw):
            super().__init__()
            self.d_state = d_state
            self.d_inner = int(expand * d_model)
            self.dt_rank = math.ceil(d_model / 16)
            di = self.d_inner
            self.in_proj = nn.Linear(d_model, di * 2, bias=False)
            self.conv1d = nn.Conv1d(di, di, d_conv, groups=di, bias=True,
                                    padding=d_conv - 1)
            self.x_proj = nn.Linear(di, self.dt_rank + d_state * 2, bias=False)
            self.dt_proj = nn.Linear(self.dt_rank, di, bias=True)
            self.A_log = nn.Parameter(torch.log(
                torch.arange(1, d_state + 1, dtype=torch.float32)
                .repeat(di, 1)
            ))
            self.D = nn.Parameter(torch.ones(di))
            self.out_proj = nn.Linear(di, d_model, bias=False)

        def forward(self, x):
            b, L, _ = x.shape
            xs, z = self.in_proj(x).chunk(2, dim=-1)
            xc = self.conv1d(xs.transpose(1, 2))[..., :L].transpose(1, 2)
            xc = F.silu(xc)
            dbc = self.x_proj(xc)
            dt, Bm, Cm = torch.split(
                dbc, [self.dt_rank, self.d_state, self.d_state], dim=-1)
            delta = F.softplus(self.dt_proj(dt))  # [b, L, Di]
            A = -torch.exp(self.A_log)  # [Di, N]
            dA = torch.exp(delta.unsqueeze(-1) * A)  # [b, L, Di, N]
            dBx = delta.unsqueeze(-1) * Bm.unsqueeze(2) * xc.unsqueeze(-1)
            h = x.new_zeros(b, self.d_inner, self.d_state)
            ys = []
            for t in range(L):
                h = dA[:, t] * h + dBx[:, t]
                ys.append(torch.einsum("bdn,bn->bd", h, Cm[:, t]))
            y = torch.stack(ys, dim=1) + self.D * xc
            return self.out_proj(y * F.silu(z))

    shim = types.ModuleType("mamba_ssm")
    shim.Mamba = Mamba
    sys.modules["mamba_ssm"] = shim


def map_mamba(sd, pre) -> dict:
    """torch mamba_ssm.Mamba state-dict subtree -> lfsr_tpu.models.ssm.Mamba."""
    return {
        "in_proj_kernel": t_linear(sd[pre + "in_proj.weight"]),
        "conv1d_kernel": a(sd[pre + "conv1d.weight"]).transpose(2, 1, 0),
        "conv1d_bias": a(sd[pre + "conv1d.bias"]),
        "x_proj_kernel": t_linear(sd[pre + "x_proj.weight"]),
        "dt_proj_kernel": t_linear(sd[pre + "dt_proj.weight"]),
        "dt_proj_bias": a(sd[pre + "dt_proj.bias"]),
        "A_log": a(sd[pre + "A_log"]),
        "D": a(sd[pre + "D"]),
        "out_proj_kernel": t_linear(sd[pre + "out_proj.weight"]),
    }


def t_conv(w) -> np.ndarray:
    """torch Conv2d weight [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.asarray(w.detach()).transpose(2, 3, 1, 0)


def t_conv3d(w) -> np.ndarray:
    """torch Conv3d weight [O, I, kd, kh, kw] -> flax [kd, kh, kw, I, O]."""
    return np.asarray(w.detach()).transpose(2, 3, 4, 1, 0)


def t_linear(w) -> np.ndarray:
    """torch Linear weight [O, I] -> flax Dense kernel [I, O]."""
    return np.asarray(w.detach()).transpose(1, 0)


def a(x) -> np.ndarray:
    return np.asarray(x.detach())


def fill(init_params, mapping):
    """Overwrite an initialized flax 'params' tree with mapped torch arrays,
    asserting every path exists and every shape matches (so naming or
    layout drift fails loudly)."""
    import jax

    flat_init = dict(
        jax.tree_util.tree_flatten_with_path(init_params)[0]
    )
    flat_map = jax.tree_util.tree_flatten_with_path(mapping)[0]
    assert len(flat_map) == len(flat_init), (
        f"param count mismatch: mapped {len(flat_map)} vs init {len(flat_init)}\n"
        f"init paths: {sorted(str(k) for k in flat_init)[:50]}"
    )
    out = dict(init_params)

    def set_path(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p.key]
        leaf_key = path[-1].key
        assert node[leaf_key].shape == val.shape, (
            f"{[p.key for p in path]}: init {node[leaf_key].shape} vs torch {val.shape}"
        )
        node[leaf_key] = np.asarray(val, np.float32)

    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, init_params))
    for path, val in flat_map:
        assert path in flat_init, f"no such init param: {[p.key for p in path]}"
        set_path(out, path, val)
    return out


def max_abs_diff(x, y) -> float:
    return float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
