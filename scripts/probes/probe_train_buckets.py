"""Component A/B of the batch-8 train step: where do the 1.55 s go?
Each variant timed with the queue+fetch pattern (distinct keys queued,
one scalar fetch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.models import losses as L
from lfsr_tpu.train.trainer import Trainer

B = 8
cfg = Config(model_name="LFMambaX", scale_factor=4, batch_size=B,
             epochs=50, use_masked_pretrain=False)
model = registry.get_model(cfg)
loss_fn = registry.get_loss(cfg)
rng = np.random.default_rng(0)
lrs = [jnp.asarray(rng.random((B, 160, 160, 1)).astype(np.float32)) for _ in range(4)]
hr = jnp.asarray(rng.random((B, 640, 640, 1)).astype(np.float32))
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))


def bench(tag, fn, n=4):
    o = fn(lrs[0]); jax.block_until_ready(o)
    np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [fn(lrs[i % len(lrs)]) for i in range(n)]
    np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0]
    print(f"{tag:42s}: {(time.perf_counter()-t0)/n*1e3:7.1f} ms", flush=True)


fwd_l1 = jax.jit(lambda x: jnp.mean(jnp.abs(
    model.apply(params, x, train=True, rngs={"dropout": jax.random.key(9)}) - hr)))
bench("fwd only (train=True) + L1", fwd_l1)

g_l1 = jax.jit(jax.grad(lambda p, x: jnp.mean(jnp.abs(
    model.apply(p, x, train=True, rngs={"dropout": jax.random.key(9)}) - hr))))
bench("grad, L1 loss", lambda x: g_l1(params, x))

g_full = jax.jit(jax.grad(lambda p, x: loss_fn(
    model.apply(p, x, train=True, rngs={"dropout": jax.random.key(9)}), hr)))
bench("grad, composite_v8 loss", lambda x: g_full(params, x))

# no remat variant
cfg_nr = cfg.replace(model_kwargs={"remat": False})
model_nr = registry.get_model(cfg_nr)
g_nr = jax.jit(jax.grad(lambda p, x: loss_fn(
    model_nr.apply(p, x, train=True, rngs={"dropout": jax.random.key(9)}), hr)))
try:
    bench("grad, composite loss, remat=False", lambda x: g_nr(params, x))
except Exception as e:
    print("remat=False FAILED:", str(e)[:160], flush=True)

# the full production step (augment + optimizer + metrics)
tr = Trainer(cfg, steps_per_epoch=100)
state = tr.init_state(jax.random.key(0), np.zeros((1, 160, 160, 1), np.float32))
fn = tr.step_fn(0)

def full(x):
    global state  # fn donates its state arg; thread the fresh one
    state, m = fn(state, x[..., 0], hr[..., 0], jax.random.key(3), jnp.float32(0.0))
    return m["loss"]

bench("full production step", full)
