import jax, jax.numpy as jnp, numpy as np
from scripts.probes._harness import timed_loop
from lfsr_tpu.models.lfmambax import WindowAttention

B, H, W, C = 8, 160, 160, 64
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), dt)
mod = WindowAttention(C, dtype=dt)
params = mod.init(key, x)
timed_loop(lambda x: mod.apply(params, x), x, name="fused WindowAttention")
# correctness vs f32 oracle on TPU
from lfsr_tpu.ops.pallas_attention import window_mha_ref
xs = jax.random.normal(key, (2, 16, 16, 64), jnp.float32)
mod32 = WindowAttention(C, dtype=jnp.float32)
p32 = mod32.init(key, xs)
y = mod32.apply(p32, xs)
pp = p32["params"]
ws, heads = 8, 4
coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
flat = coords.reshape(2, -1)
rel = (flat[:, :, None] - flat[:, None, :] + ws - 1).transpose(1, 2, 0)
idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
bias = pp["rel_pos_table"][jnp.asarray(idx.reshape(-1))].reshape(ws*ws, ws*ws, heads)
bb = bias.transpose(0, 2, 1).reshape(ws*ws, heads*ws*ws)
yr = window_mha_ref(xs, pp["Dense_0"]["kernel"], pp["Dense_1"]["kernel"],
                    pp["LayerNorm_0"]["scale"], pp["LayerNorm_0"]["bias"],
                    bb, pp["attn_scale"].reshape(()))
print("tpu kernel vs ref max err:", float(jnp.max(jnp.abs(y - yr))))
