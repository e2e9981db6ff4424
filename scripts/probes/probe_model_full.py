"""Full-model + HLFR timing after the fused-attention and fold changes."""
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.models.lfmambax import HLFR

B, H, W, C = 8, 160, 160, 64
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)

x64 = jax.random.normal(key, (B, H, W, C), dt)
hl = HLFR(C, 4, dt)
ph = hl.init(key, x64)
timed_loop(lambda x: hl.apply(ph, x), x64, reps=10, name="HLFR (folded)")

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
xin = jax.random.normal(key, (B, H, W, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32))
timed_loop(lambda x: model.apply(params, x), xin, reps=10, name="LFMambaX full mb=8")
