"""In-context A/B of MultiScaleLocal's depthwise form at mb=2."""
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry, lfmambax

for flag in (False, True):
    lfmambax._DW_SHIFT = flag
    cfg = Config(model_name="LFMambaX", scale_factor=4)
    model = registry.get_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 160, 160, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))
    timed_loop(lambda x_: model.apply(params, x_), x, reps=20,
               name=f"LFMambaX mb=2 dw_shift={flag}")
