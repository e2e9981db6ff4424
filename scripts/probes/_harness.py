"""Probe harness: time a component by chaining `reps` dependent
applications inside ONE jitted call, reducing to a scalar — removes the
axon tunnel's per-dispatch overhead from the measurement."""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(fn, x, reps=30, iters=3, name=""):
    def body(c, _):
        y = fn(c)
        if y.shape == c.shape:
            return y.astype(c.dtype), None
        # keep sequential dependency via a scalar feedback
        return (c + (0.0 * jnp.sum(y)).astype(c.dtype)), None

    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(loop(x))  # compile + run once
    t0 = time.perf_counter()
    outs = [loop(x) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / (iters * reps)
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt
