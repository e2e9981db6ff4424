"""Component probe: WindowAttention breakdown on the real chip."""
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from scripts.probes._harness import timed_loop
from lfsr_tpu.models.lfmambax import WindowAttention

B, H, W, C, WS, HEADS = 8, 160, 160, 64, 8, 4
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), dt)

mod = WindowAttention(C, dtype=dt)
params = mod.init(key, x)
timed_loop(lambda x: mod.apply(params, x), x, name="full WindowAttention")

def part(x):
    b, h, w, c = x.shape
    win = x.reshape(b, h // WS, WS, w // WS, WS, c)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, WS * WS, c)
    out = win.reshape(b, h // WS, w // WS, WS, WS, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
timed_loop(part, x, name="partition+unpartition")

win = jax.random.normal(key, (B * (H // WS) * (W // WS), WS * WS, C), dt)
dq = nn.Dense(3 * C, use_bias=False, dtype=dt)
pq = dq.init(key, win)
do = nn.Dense(C, use_bias=False, dtype=dt)
po = do.init(key, win)
timed_loop(lambda w: do.apply(po, dq.apply(pq, w)[..., :C]), win, name="qkv+out dense")

bias = jnp.zeros((1, HEADS, WS * WS, WS * WS), dt)
def core(w):
    q = w.reshape(-1, WS * WS, HEADS, C // HEADS)
    out = nn.dot_product_attention(q, q, q, bias=bias)
    return out.reshape(-1, WS * WS, C)
timed_loop(core, win, name="attn core (bias)")

ln = nn.LayerNorm(dtype=dt)
pl_ = ln.init(key, win)
timed_loop(lambda w: ln.apply(pl_, w), win, name="layernorm")
