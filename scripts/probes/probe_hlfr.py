"""Probe: HLFR head cost and out-conv (C_out=1 at 640^2) alternatives."""
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from scripts.probes._harness import timed_loop
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.lfmambax import HLFR

B, H, W, C = 8, 160, 160, 64
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), dt)

mod = HLFR(C, 4, dt)
params = mod.init(key, x)
# measured: full HLFR 12.8ms

xh = jax.random.normal(key, (B, H * 4, W * 4, C), dt)
oc = conv(1, 3, padding=1, dtype=dt)
poc = oc.init(key, xh)
# measured: outconv @640 8.1ms

k = poc["params"]["kernel"]  # [3,3,64,1]
bias = poc["params"]["bias"]
kdw = jnp.transpose(k, (0, 1, 3, 2)).astype(dt)  # [3,3,1,64]
def dw_then_sum(x):
    y = jax.lax.conv_general_dilated(
        x, kdw, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=64)
    return jnp.sum(y, axis=-1, keepdims=True) + bias
timed_loop(dw_then_sum, xh, reps=20, name="outconv as dw+sum @640")

# folded pre-shuffle conv: z[B,320,320,256] -> conv3x3(256->4) -> shuffle2
zl = jax.random.normal(key, (B, H * 2, W * 2, C * 4), dt)
kf = np.zeros((3, 3, 256, 4), np.float32)
kn = np.asarray(k, np.float32)
for py in range(2):
    for px in range(2):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                u, v = py + dy, px + dx
                Y, iy = u // 2, u % 2
                X, ix = v // 2, v % 2
                for c in range(64):
                    kf[Y + 1, X + 1, c * 4 + iy * 2 + ix, py * 2 + px] += kn[dy + 1, dx + 1, c, 0]
kf = jnp.asarray(kf, dt)
def folded(z):
    y = jax.lax.conv_general_dilated(
        z, kf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    return pixel_shuffle(y, 2)
timed_loop(folded, zl, reps=20, name="outconv folded @320 (256->4)+shuffle")

ref = jax.jit(lambda z: oc.apply(poc, pixel_shuffle(z, 2)))(zl)
got = jax.jit(folded)(zl)
print("fold max err:", float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))))

cq = conv(C * 4, 1, use_bias=False, dtype=dt)
pcq = cq.init(key, x)
def up_chain(x):
    return nn.leaky_relu(pixel_shuffle(cq.apply(pcq, x), 2), 0.1)
timed_loop(up_chain, x, reps=20, name="1x1 64->256 @160 + shuffle")
x2 = jax.random.normal(key, (B, 320, 320, C), dt)
timed_loop(up_chain, x2, reps=20, name="1x1 64->256 @320 + shuffle")

# depthwise at 320/640
dwc = conv(C, 3, padding=1, groups=C, use_bias=False, dtype=dt)
pdw = dwc.init(key, x2)
timed_loop(lambda x: dwc.apply(pdw, x), x2, reps=20, name="dw3x3 @320")
