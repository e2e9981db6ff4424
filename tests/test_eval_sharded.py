"""Multi-chip tiled evaluation: sr_scene_sharded on the virtual 8-device
CPU mesh must match the single-device sr_scene exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import sr_scene, sr_scene_sharded, evaluate_scene

ANG, SCALE = 5, 4
RNG = np.random.default_rng(21)


def _model_and_params():
    cfg = Config(
        model_name="DistgSSR",
        scale_factor=SCALE,
        compute_dtype="float32",
        model_kwargs={"channels": 8, "n_groups": 1, "n_blocks": 1},
    )
    model = registry.get_model(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, ANG * 16, ANG * 16, 1), jnp.float32)
    )
    return cfg, model, params


def test_sharded_matches_single_device():
    cfg, model, params = _model_and_params()
    h0 = 40
    lr = jnp.asarray(RNG.random((ANG * h0, ANG * h0)), jnp.float32)
    kw = dict(ang=ANG, scale=SCALE, patch=16, stride=8, minibatch=2, h0=h0, w0=h0)

    single = np.asarray(sr_scene(model.apply, params, lr, **kw))
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    sharded = np.asarray(sr_scene_sharded(model.apply, params, lr, mesh, **kw))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)


def test_evaluate_scene_accepts_mesh():
    cfg, model, params = _model_and_params()

    class Scene:
        name = "s"
        lr_y = np.asarray(RNG.random((ANG * 32, ANG * 32)), np.float32)
        hr_y = np.asarray(
            RNG.random((ANG * 32 * SCALE, ANG * 32 * SCALE)), np.float32
        )

    cfg = cfg.replace(patch_size_for_test=16, stride_for_test=8, minibatch_for_test=2)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    p1, s1, _ = evaluate_scene(model.apply, params, Scene(), cfg)
    p2, s2, _ = evaluate_scene(model.apply, params, Scene(), cfg, mesh=mesh)
    assert abs(p1 - p2) < 1e-4 and abs(s1 - s2) < 1e-4
