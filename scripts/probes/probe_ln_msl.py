"""A/B the fused LayerNorm+MultiScaleLocal block front (ops/
pallas_block.ln_msl) in the full flagship at the production eval
minibatch. Disable side: monkeypatch the support gate so the model takes
the plain-XLA fallback on the same hardware."""
import os

import jax
import jax.numpy as jnp

from scripts.probes._harness import timed_loop
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.ops import pallas_block as plb

B = int(os.environ.get("PROBE_MB", "2"))
H = W = 160
key = jax.random.PRNGKey(0)
xin = jax.random.normal(key, (B, H, W, 1), jnp.float32)

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32)
)

real_supported = plb._supported
for mode in ("xla", "fused"):
    plb._supported = (lambda x: False) if mode == "xla" else real_supported
    timed_loop(
        lambda x, m=model, p=params: m.apply(p, x), xin, reps=20,
        name=f"LFMambaX mb={B} front={mode}",
    )
plb._supported = real_supported
