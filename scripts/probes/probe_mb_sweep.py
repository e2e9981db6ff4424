"""Sweep minibatch_for_test for the tiled-eval throughput."""
import time
import numpy as np
import jax, jax.numpy as jnp
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import sr_scene

ang, scale, h0 = 5, 4, 128
cfg = Config(model_name="LFMambaX", scale_factor=scale)
model = registry.get_model(cfg)
rng = np.random.default_rng(0)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))
lrs = [jnp.asarray(rng.random((ang * h0, ang * h0)), jnp.float32) for _ in range(4)]

for mb in (1, 2, 4):
    kw = dict(ang=ang, scale=scale, patch=cfg.patch_size_for_test,
              stride=cfg.stride_for_test, minibatch=mb, h0=h0, w0=h0)
    f = jax.jit(lambda p, s: jnp.sum(sr_scene(model.apply, p, s, **kw)))
    np.asarray(f(params, lrs[0]))
    t0 = time.perf_counter()
    outs = [f(params, lrs[i]) for i in range(4)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / 4
    print(f"mb={mb}: {1.0/dt:.4f} scenes/s ({dt*1e3:.1f} ms/scene)")
