"""Full-model A/B at the production eval minibatch (mb=2): scan_impl
variants. The B=8 verdicts (gated epilogue NEUTRAL, whole-Mamba fusion
SLOWER) were measured in a throughput-bound regime; mb=2 is latency-
bound, where removing [B, L, Di] HBM round-trips may pay differently."""
import os
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

B = int(os.environ.get("PROBE_MB", "2"))
H = W = 160
key = jax.random.PRNGKey(0)
xin = jax.random.normal(key, (B, H, W, 1), jnp.float32)

for impl in ("pallas", "gated", "fused"):
    cfg = Config(
        model_name="LFMambaX", scale_factor=4,
        model_kwargs={"scan_impl": impl},
    )
    model = registry.get_model(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32)
    )
    timed_loop(
        lambda x, m=model, p=params: m.apply(p, x), xin, reps=20,
        name=f"LFMambaX mb={B} scan_impl={impl}",
    )
