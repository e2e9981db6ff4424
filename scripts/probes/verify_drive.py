import time
print("start", time.strftime("%H:%M:%S"), flush=True)
import numpy as np, jax, jax.numpy as jnp
print("jax imported", flush=True)
from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import sr_scene
from lfsr_tpu.ops.resize import imresize
from lfsr_tpu.ops.tiling import lf_divide

A, h0, w0, s = 5, 64, 64, 4
yy, xx = np.meshgrid(np.linspace(0, 4, h0*s), np.linspace(0, 4, w0*s), indexing="ij")
views = np.stack([
    np.stack([0.5 + 0.4*np.sin(yy + 0.1*u)*np.cos(xx + 0.1*v) for v in range(A)])
    for u in range(A)])
hr_sai = np.moveaxis(views, 2, 1).reshape(A*h0*s, A*w0*s)
lr_views = np.stack([[imresize(views[u, v], 1/s) for v in range(A)] for u in range(A)])
lr_sai = np.moveaxis(lr_views, 2, 1).reshape(A*h0, A*w0)
print("data ready", time.strftime("%H:%M:%S"), flush=True)

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))
print("init done", time.strftime("%H:%M:%S"), flush=True)
sr = sr_scene(model.apply, params, jnp.asarray(lr_sai, jnp.float32),
              ang=A, scale=4, patch=32, stride=16, minibatch=8, h0=h0, w0=w0)
sr = np.asarray(sr)
print("sr views:", sr.shape, "finite:", bool(np.isfinite(sr).all()), flush=True)

def loss_fn(p, lr_b, hr_b):
    out = model.apply(p, lr_b)
    return jnp.mean(jnp.abs(out - hr_b))
lr_b = jnp.asarray(lf_divide(jnp.asarray(lr_sai, jnp.float32), A, 32, 32)[:1][..., None])
hr_b = jnp.asarray(lf_divide(jnp.asarray(hr_sai, jnp.float32), A, 128, 128)[:1][..., None])
l, g = jax.jit(jax.value_and_grad(loss_fn))(params, lr_b, hr_b)
gl = jax.tree.leaves(g)
print("loss:", float(l), "grad leaves:", len(gl),
      "all finite:", all(bool(jnp.isfinite(x).all()) for x in gl), flush=True)
