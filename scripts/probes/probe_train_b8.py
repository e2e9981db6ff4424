"""One batch-8 train grad step at the full SAI-160 point (HBM check)."""
import numpy as np, jax, jax.numpy as jnp
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))
lr = jax.random.normal(jax.random.PRNGKey(0), (8, 160, 160, 1), jnp.float32)
hr = jax.random.normal(jax.random.PRNGKey(1), (8, 640, 640, 1), jnp.float32)

def loss_fn(p):
    out = model.apply(p, lr)
    return jnp.mean(jnp.abs(out - hr))

l, g = jax.jit(jax.value_and_grad(loss_fn))(params)
gl = jax.tree.leaves(g)
print("loss:", float(l), "finite:", all(bool(jnp.isfinite(x).all()) for x in gl))
