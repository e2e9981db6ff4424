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
