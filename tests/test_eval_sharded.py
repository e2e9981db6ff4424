"""Multi-chip tiled evaluation: sr_scene_sharded on the virtual 8-device
CPU mesh must match the single-device sr_scene exactly."""

import pytest
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


@pytest.mark.slow
def test_sharded_matches_single_device():
    cfg, model, params = _model_and_params()
    h0 = 40
    lr = jnp.asarray(RNG.random((ANG * h0, ANG * h0)), jnp.float32)
    kw = dict(ang=ANG, scale=SCALE, patch=16, stride=8, minibatch=2, h0=h0, w0=h0)

    single = np.asarray(sr_scene(model.apply, params, lr, **kw))
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    sharded = np.asarray(sr_scene_sharded(model.apply, params, lr, mesh, **kw))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_whole_scene_batch_sharded_matches_per_scene():
    """sr_scenes_whole_sharded (scene batch data-parallel over the mesh)
    must equal per-scene whole-scene sr_scene; evaluate_sets in
    whole-scene mode must score identically with and without a mesh."""
    from lfsr_tpu.train.evaluate import evaluate_sets, sr_scenes_whole_sharded

    cfg, model, params = _model_and_params()
    h0 = 24
    sais = jnp.asarray(RNG.random((3, ANG * h0, ANG * h0)), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    batched = np.asarray(
        sr_scenes_whole_sharded(
            model.apply, params, sais, mesh, ang=ANG, ang_out=ANG
        )
    )
    for i in range(3):
        single = np.asarray(
            sr_scene(
                model.apply, params, sais[i], ang=ANG, scale=SCALE,
                patch=h0, stride=h0, minibatch=1, h0=h0, w0=h0, whole=True,
            )
        )
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)

    class Scene:
        def __init__(self, i):
            self.name = f"s{i}"
            self.dataset = "synth"
            self.lr_y = np.asarray(sais[i])
            self.hr_y = np.asarray(
                RNG.random((ANG * h0 * SCALE, ANG * h0 * SCALE)), np.float32
            )

    scenes = {"set": [Scene(i) for i in range(3)]}
    cfg_w = cfg.replace(whole_scene_for_test=True)
    r_single = evaluate_sets(model.apply, params, scenes, cfg_w, log=lambda *_: None)
    r_mesh = evaluate_sets(
        model.apply, params, scenes, cfg_w, log=lambda *_: None, mesh=mesh
    )
    assert abs(r_single["set"]["psnr"] - r_mesh["set"]["psnr"]) < 1e-4
    assert abs(r_single["set"]["ssim"] - r_mesh["set"]["ssim"]) < 1e-4


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
