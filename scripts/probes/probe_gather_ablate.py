"""Ablate the cross_scan_gather kernel to find its hotspot on TPU."""
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops.pallas_layout import _flipmat, _rev_s

B, S, C = 8, 160, 64


def kern(xr, xrr, xc, xcr, gam, bet, o, *, S, wt, C, rev=True, ln=True, cols=True):
    g = C // 4
    T = wt * S
    F = _flipmat(S)
    parts = [xr[0].astype(jnp.float32).reshape(T, C)[:, :g]]
    if rev:
        parts.append(jnp.concatenate(
            [_rev_s(F, xrr[0, wt - 1 - r, :, g:2*g].astype(jnp.float32)) for r in range(wt)], axis=0))
    else:
        parts.append(xrr[0].astype(jnp.float32).reshape(T, C)[:, g:2*g])
    if cols:
        parts.append(jnp.concatenate(
            [xc[0, :, cc, 2*g:3*g].astype(jnp.float32) for cc in range(wt)], axis=0))
    else:
        parts.append(xc[0, :, :wt].astype(jnp.float32).reshape(T, C)[:, 2*g:3*g])
    if rev and cols:
        parts.append(jnp.concatenate(
            [_rev_s(F, xcr[0, :, wt - 1 - cc, 3*g:].astype(jnp.float32)) for cc in range(wt)], axis=0))
    else:
        parts.append(xcr[0].astype(jnp.float32).reshape(T, C)[:, 3*g:])
    seq = jnp.concatenate(parts, axis=1)
    if ln:
        mean = jnp.mean(seq, axis=1, keepdims=True)
        var = jnp.maximum(jnp.mean(seq*seq, axis=1, keepdims=True) - mean*mean, 0.0)
        seq = (seq - mean) * jax.lax.rsqrt(var + 1e-6)
        seq = seq * gam[0].astype(jnp.float32)[None] + bet[0].astype(jnp.float32)[None]
    o[0] = seq.astype(o.dtype)


def build(wt, **kw):
    nt = S // wt
    T = wt * S
    rows = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM)
    rows_r = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, nt-1-t, 0, 0), memory_space=pltpu.VMEM)
    colsS = pl.BlockSpec((1, S, wt, C), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM)
    cols_r = pl.BlockSpec((1, S, wt, C), lambda i, t: (i, 0, nt-1-t, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)

    def f(x, gam, bet):
        return pl.pallas_call(
            functools.partial(kern, S=S, wt=wt, C=C, **kw),
            grid=(B, nt),
            in_specs=[rows, rows_r, colsS, cols_r, wspec, wspec],
            out_specs=pl.BlockSpec((1, T, C), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S*S, C), x.dtype),
        )(x, x, x, x, gam, bet)
    return f


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, S, S, C), jnp.bfloat16)
gam = jnp.ones((1, C), jnp.float32)
bet = jnp.zeros((1, C), jnp.float32)

for name, wt, kw in [
    ("full wt16", 16, {}),
    ("full wt8", 8, {}),
    ("full wt32", 32, {}),
    ("no-rev wt16", 16, {"rev": False}),
    ("no-LN wt16", 16, {"ln": False}),
    ("no-cols no-rev wt16", 16, {"rev": False, "cols": False}),
]:
    f = build(wt, **kw)
    timed_loop(lambda x_, f=f: f(x_, gam, bet).reshape(B, S, S, C), x,
               reps=30, name=name)
