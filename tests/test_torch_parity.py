"""Weight-transfer forward-parity vs the reference torch models.

For each covered model we build the reference torch module on CPU, copy
its state_dict into the flax params (explicit per-layer mapping), and
assert outputs match on random inputs. This is numerics parity, not just
structure parity — any padding convention, layout, or init mismatch in
the flax re-implementation fails here.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

from tests._torch_ref import (
    a,
    fill,
    load_ref_model,
    max_abs_diff,
    ref_args,
    t_conv,
    t_conv3d,
    t_linear,
)

pytestmark = pytest.mark.slow

ANG = 5


def _rand_sai(h0=8, scale=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((1, ANG * h0, ANG * h0, 1)).astype(np.float32)
    return x


def _run_pair(name_flax, torch_model, mapper, x, scale=4, model_kwargs=None, atol=2e-5):
    import torch

    cfg = Config(
        model_name=name_flax,
        scale_factor=scale,
        compute_dtype="float32",
        model_kwargs=model_kwargs or {},
    )
    model = registry.get_model(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    sd = torch_model.state_dict()
    mapped = mapper(sd)
    if "params" not in mapped:
        mapped = {"params": mapped}
    assert set(variables) == set(mapped), (list(variables), list(mapped))
    filled = {k: fill(variables[k], mapped[k]) for k in variables}

    y_flax = np.asarray(jax.jit(model.apply)(filled, jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y_torch = torch_model(xt, [ANG, ANG]).numpy().transpose(0, 2, 3, 1)
    diff = max_abs_diff(y_flax, y_torch)
    assert diff < atol, f"{name_flax}: max |flax - torch| = {diff}"
    return diff


# --------------------------------------------------------------------------
# DistgSSR (DistgSSR.py:14-131)
# --------------------------------------------------------------------------

def _map_distg(sd):
    P = {"Conv_0": {"kernel": t_conv(sd["init_conv.weight"])}}
    for g in range(4):
        G = {}
        for b in range(4):
            pre = f"disentg.Group.{g}.Block.{b}."
            G[f"_DisentgBlock_{b}"] = {
                "Conv_0": {"kernel": t_conv(sd[pre + "SpaConv.0.weight"])},
                "Conv_1": {"kernel": t_conv(sd[pre + "SpaConv.2.weight"])},
                "Conv_2": {"kernel": t_conv(sd[pre + "AngConv.0.weight"])},
                "Conv_3": {"kernel": t_conv(sd[pre + "AngConv.2.weight"])},
                "_EPIBranch_0": {
                    "Conv_0": {"kernel": t_conv(sd[pre + "EPIConv.0.weight"])},
                    "Conv_1": {"kernel": t_conv(sd[pre + "EPIConv.2.weight"])},
                },
                "Conv_4": {"kernel": t_conv(sd[pre + "fuse.0.weight"])},
                "Conv_5": {"kernel": t_conv(sd[pre + "fuse.2.weight"])},
            }
        G["Conv_0"] = {"kernel": t_conv(sd[f"disentg.Group.{g}.conv.weight"])}
        P[f"_Group_{g}"] = G
    P["Conv_1"] = {"kernel": t_conv(sd["disentg.conv.weight"])}
    P["Conv_2"] = {
        "kernel": t_conv(sd["upsample.0.weight"]),
        "bias": a(sd["upsample.0.bias"]),
    }
    P["Conv_3"] = {"kernel": t_conv(sd["upsample.2.weight"])}
    return P


def test_distg_ssr_forward_parity():
    tm = load_ref_model("DistgSSR", ref_args(scale_factor=4))
    _run_pair("DistgSSR", tm, _map_distg, _rand_sai())


# --------------------------------------------------------------------------
# CNN baselines: VDSR (VDSR.py:18-60), EDSR (EDSR.py:17-70),
# RCAN (RCAN.py:14-110)
# --------------------------------------------------------------------------

def _map_vdsr(sd):
    P = {"Conv_0": {"kernel": t_conv(sd["input.weight"])}}
    for i in range(18):
        P[f"Conv_{i + 1}"] = {
            "kernel": t_conv(sd[f"residual_layer.{i}.conv.weight"])
        }
    P["Conv_19"] = {"kernel": t_conv(sd["output.weight"])}
    return P


def test_vdsr_forward_parity():
    tm = load_ref_model("VDSR", ref_args(scale_factor=4))
    _run_pair("VDSR", tm, _map_vdsr, _rand_sai(seed=6), atol=1e-4)


def _cb(sd, pre):
    return {"kernel": t_conv(sd[pre + ".weight"]), "bias": a(sd[pre + ".bias"])}


def _map_edsr(sd):
    P = {"Conv_0": _cb(sd, "init_feature")}
    for i in range(32):
        P[f"_EDSRBlock_{i}"] = {
            "Conv_0": _cb(sd, f"body.body.{i}.body.0"),
            "Conv_1": _cb(sd, f"body.body.{i}.body.2"),
        }
    P["Conv_1"] = _cb(sd, "body.body.32")
    P["Conv_2"] = _cb(sd, "upscale.0")
    P["Conv_3"] = _cb(sd, "upscale.2")
    P["Conv_4"] = _cb(sd, "upscale.4")
    return P


def test_edsr_forward_parity():
    tm = load_ref_model("EDSR", ref_args(scale_factor=4))
    _run_pair("EDSR", tm, _map_edsr, _rand_sai(h0=6, seed=7), atol=2e-4)


def _map_rcan(sd):
    P = {"Conv_0": _cb(sd, "init_feature")}
    for g in range(10):
        G = {}
        for b in range(20):
            pre = f"RG{g + 1}.body.{b}."
            G[f"_RCAB_{b}"] = {
                "Conv_0": _cb(sd, pre + "body.0"),
                "Conv_1": _cb(sd, pre + "body.2"),
                "ChannelAttention_0": {
                    "Conv_0": _cb(sd, pre + "body.3.conv_du.0"),
                    "Conv_1": _cb(sd, pre + "body.3.conv_du.2"),
                },
            }
        G["Conv_0"] = _cb(sd, f"RG{g + 1}.body.20")
        P[f"_RCANGroup_{g}"] = G
    P["Conv_1"] = _cb(sd, "last_feature")
    P["Conv_2"] = _cb(sd, "upscale.0")
    P["Conv_3"] = _cb(sd, "upscale.2")
    return P


def test_rcan_forward_parity():
    tm = load_ref_model("RCAN", ref_args(scale_factor=4))
    _run_pair("RCAN", tm, _map_rcan, _rand_sai(h0=6, seed=8), atol=2e-4)


# --------------------------------------------------------------------------
# LF_InterNet (LF_InterNet.py:15-141)
# --------------------------------------------------------------------------

def _map_internet(sd):
    P = {
        "Conv_0": {"kernel": t_conv(sd["AngFE.0.weight"])},
        "Conv_1": {"kernel": t_conv(sd["SpaFE.0.weight"])},
    }
    k = 0
    for g in range(4):
        for b in range(4):
            pre = f"CascadeInterBlock.body.{g}.chained_layers.{b}."
            P[f"_InterChain_{k}"] = {
                "Conv_0": {"kernel": t_conv(sd[pre + "Spa2Ang.weight"])},
                "_Ang2Spa_0": {
                    "Conv_0": {"kernel": t_conv(sd[pre + "Ang2Spa.0.weight"])}
                },
                "Conv_1": {"kernel": t_conv(sd[pre + "AngConvSq.weight"])},
                "Conv_2": {"kernel": t_conv(sd[pre + "SpaConvSq.weight"])},
            }
            k += 1
    P["Conv_2"] = {"kernel": t_conv(sd["BottleNeck.AngBottle.weight"])}
    P["_Ang2Spa_0"] = {
        "Conv_0": {"kernel": t_conv(sd["BottleNeck.Ang2Spa.0.weight"])}
    }
    P["Conv_3"] = {"kernel": t_conv(sd["BottleNeck.SpaBottle.weight"])}
    P["Conv_4"] = {"kernel": t_conv(sd["ReconBlock.PreConv.weight"])}
    P["Conv_5"] = {"kernel": t_conv(sd["ReconBlock.FinalConv.weight"])}
    return P


def test_lf_internet_forward_parity():
    tm = load_ref_model("LF_InterNet", ref_args(scale_factor=4))
    _run_pair("LF_InterNet", tm, _map_internet, _rand_sai(seed=1))


# --------------------------------------------------------------------------
# EPIT (EPIT.py:16-169)
# --------------------------------------------------------------------------

def _conv3d_as_2d(w):
    """Reference (1,3,3) Conv3d weight [O,I,1,3,3] -> flax 2-D [3,3,I,O]."""
    return t_conv(w.squeeze(2))


def _map_epit(sd):
    def ln(pre):
        return {"scale": a(sd[pre + "weight"]), "bias": a(sd[pre + "bias"])}

    def viewconv3(pre):
        return {
            f"Conv_{i}": {"kernel": _conv3d_as_2d(sd[f"{pre}{2 * i}.weight"])}
            for i in range(3)
        }

    P = {
        "Conv_0": {"kernel": _conv3d_as_2d(sd["conv_init0.0.weight"])},
        "_ViewConv3_0": viewconv3("conv_init."),
    }
    for i in range(5):
        pre = f"altblock.{i}.epi_trans."
        inw = a(sd[pre + "attention.in_proj_weight"])  # [3d, d]
        d = inw.shape[1]
        P[f"_AltFilter_{i}"] = {
            "_EPITransformer_0": {
                "Dense_0": {"kernel": t_linear(sd[pre + "linear_in.weight"])},
                "LayerNorm_0": ln(pre + "norm."),
                "Dense_1": {"kernel": inw[:d].T},
                "Dense_2": {"kernel": inw[d : 2 * d].T},
                "Dense_3": {"kernel": inw[2 * d :].T},
                "Dense_4": {"kernel": t_linear(sd[pre + "attention.out_proj.weight"])},
                "LayerNorm_1": ln(pre + "feed_forward.0."),
                "Dense_5": {"kernel": t_linear(sd[pre + "feed_forward.1.weight"])},
                "Dense_6": {"kernel": t_linear(sd[pre + "feed_forward.4.weight"])},
                "Dense_7": {"kernel": t_linear(sd[pre + "linear_out.weight"])},
            },
            "_ViewConv3_0": viewconv3(f"altblock.{i}.conv."),
        }
    P["Conv_1"] = {"kernel": t_conv(sd["upsampling.0.weight"])}
    P["Conv_2"] = {"kernel": t_conv(sd["upsampling.3.weight"])}
    return P


def test_epit_forward_parity():
    tm = load_ref_model("EPIT", ref_args(scale_factor=4))
    _run_pair("EPIT", tm, _map_epit, _rand_sai(seed=2), atol=1e-4)


# --------------------------------------------------------------------------
# LFT (LFT.py:19-260)
# --------------------------------------------------------------------------

def _map_mha(sd, pre):
    """torch {norm, MultiheadAttention, feed_forward} -> our _MHA tree."""

    def ln(p):
        return {"scale": a(sd[p + "weight"]), "bias": a(sd[p + "bias"])}

    inw = a(sd[pre + "attention.in_proj_weight"])
    d = inw.shape[1]
    return {
        "LayerNorm_0": ln(pre + "norm."),
        "Dense_0": {"kernel": inw[:d].T},
        "Dense_1": {"kernel": inw[d : 2 * d].T},
        "Dense_2": {"kernel": inw[2 * d :].T},
        "Dense_3": {"kernel": t_linear(sd[pre + "attention.out_proj.weight"])},
        "LayerNorm_1": ln(pre + "feed_forward.0."),
        "Dense_4": {"kernel": t_linear(sd[pre + "feed_forward.1.weight"])},
        "Dense_5": {"kernel": t_linear(sd[pre + "feed_forward.4.weight"])},
    }


def _map_lft(sd):
    P = {
        "Conv_0": {"kernel": _conv3d_as_2d(sd["conv_init0.0.weight"])},
        "_ViewConv3Act_0": {
            f"Conv_{i}": {"kernel": _conv3d_as_2d(sd[f"conv_init.{2 * i}.weight"])}
            for i in range(3)
        },
    }
    for i in range(4):
        P[f"_AngTrans_{i}"] = {"_MHA_0": _map_mha(sd, f"altblock.{i}.ang_trans.")}
        pre = f"altblock.{i}.spa_trans."
        # torch F.unfold token layout is channel-major (c*9 + k); our
        # _unfold3 is kernel-major (k*C + c) -> permute the MLP kernel.
        mlp = a(sd[pre + "MLP.weight"])  # [spa_dim, C*9]
        spa_dim = mlp.shape[0]
        c = mlp.shape[1] // 9
        mlp_kcm = mlp.reshape(spa_dim, c, 9).transpose(2, 1, 0).reshape(9 * c, spa_dim)
        P[f"_SpaTrans_{i}"] = {
            "embed": {"kernel": mlp_kcm},
            "_MHA_0": _map_mha(sd, pre),
            "Dense_0": {
                "kernel": t_linear(sd[pre + "linear.0.weight"].squeeze(-1).squeeze(-1).squeeze(-1))
            },
        }
    P["Conv_1"] = {"kernel": t_conv(sd["upsampling.0.weight"])}
    P["Conv_2"] = {"kernel": t_conv(sd["upsampling.3.weight"])}
    return P


def test_lft_forward_parity():
    tm = load_ref_model("LFT", ref_args(scale_factor=4))
    _run_pair("LFT", tm, _map_lft, _rand_sai(seed=3), atol=1e-4)


# --------------------------------------------------------------------------
# EfficientLFNetV5 with the FastConvSSM fallback (MyEfficientLFNetV5.py;
# mamba_ssm is absent in this environment so the reference itself takes
# the FastConvSSM path, :71-99)
# --------------------------------------------------------------------------

def _map_v5(sd):
    def ln(p):
        return {"scale": a(sd[p + "weight"]), "bias": a(sd[p + "bias"])}

    def cw(p):
        return {"kernel": t_conv(sd[p + ".weight"])}

    core = {
        "shallow": {
            "kernel": t_conv(sd["shallow_conv.weight"]),
            "bias": a(sd["shallow_conv.bias"]),
        },
        "enh_dw": cw("shallow_enhance.dw"),
        "enh_pw": cw("shallow_enhance.pw"),
    }
    for i in range(6):
        pre = f"lf_vssm_blocks.{i}."
        g = pre + "global_branch."
        # dir_fuse input order: reference is [raster, vertical, raster_rev,
        # vertical_rev] (V5:427-441); ours is [raster, raster_rev,
        # vertical, vertical_rev] -> permute input-channel blocks.
        df = t_conv(sd[g + "dir_fuse.weight"])  # [1,1,4C,C]
        c = df.shape[-1]
        blocks = df.reshape(1, 1, 4, c, c)
        df_ours = blocks[:, :, [0, 2, 1, 3]].reshape(1, 1, 4 * c, c)
        core[f"block_{i}"] = {
            "_MultiScale1357_0": {
                "Conv_0": cw(pre + "local_branch.dw1"),
                "Conv_1": cw(pre + "local_branch.dw3"),
                "Conv_2": cw(pre + "local_branch.dw5"),
                "Conv_3": cw(pre + "local_branch.dw7"),
                "Conv_4": cw(pre + "local_branch.pw"),
            },
            "CrossScan4_0": {
                "LayerNorm_0": ln(g + "norm."),
                "ssm": {
                    "Dense_0": {
                        "kernel": t_linear(sd[g + "mamba.proj_in.weight"]),
                        "bias": a(sd[g + "mamba.proj_in.bias"]),
                    },
                    "conv_kernel": a(sd[g + "mamba.conv.weight"]).transpose(2, 1, 0),
                    "conv_bias": a(sd[g + "mamba.conv.bias"]),
                    "Dense_1": {
                        "kernel": t_linear(sd[g + "mamba.proj_out.weight"]),
                        "bias": a(sd[g + "mamba.proj_out.bias"]),
                    },
                },
                "Conv_0": {"kernel": df_ours},
                "scale": a(sd[g + "scale"]),
            },
            "Conv_0": cw(pre + "fuse"),
            "LayerNorm_0": ln(pre + "fuse_norm."),
            "ECA_0": {
                "Conv_0": {
                    "kernel": t_conv(sd[pre + "attention.fc1.weight"]),
                    "bias": a(sd[pre + "attention.fc1.bias"]),
                },
                "Conv_1": {
                    "kernel": t_conv(sd[pre + "attention.fc2.weight"]),
                    "bias": a(sd[pre + "attention.fc2.bias"]),
                },
            },
            "res_scale": a(sd[pre + "res_scale"]),
        }
    core.update(
        {
            "Conv_0": cw("fuse_early"),
            "Conv_1": cw("fuse_late"),
            "Conv_2": cw("fuse_final"),
            "LayerNorm_0": ln("fuse_norm."),
            "Conv_3": cw("refine_conv"),
            "Conv_4": cw("upsampler.up.0"),
            "Conv_5": cw("upsampler.up.3"),
            "out": {
                "kernel": t_conv(sd["output_conv.weight"]),
                "bias": a(sd["output_conv.bias"]),
            },
            "out_scale": a(sd["output_scale"]),
        }
    )
    return {"core": core}


# --------------------------------------------------------------------------
# EfficientLFNetV4_5 with its FastConvSSM path (MyEfficientLFNetV4_5.py;
# the torch file itself falls back to FastConvSSM here since mamba_ssm is
# absent, :208-244). Exercises BatchNorm (params + batch_stats transfer).
# --------------------------------------------------------------------------

def _map_v4_5(sd):
    def cw(p):
        return {"kernel": t_conv(sd[p + ".weight"])}

    def bn(p):
        return (
            {"scale": a(sd[p + ".weight"]), "bias": a(sd[p + ".bias"])},
            {"mean": a(sd[p + ".running_mean"]), "var": a(sd[p + ".running_var"])},
        )

    P, S = {}, {}
    P["shallow"] = cw("shallow.0")
    P["Conv_0"] = cw("shallow.2.dw")
    P["BatchNorm_0"], S["BatchNorm_0"] = bn("shallow.2.bn")
    P["Conv_1"] = cw("shallow.2.pw")
    for i in range(8):
        pre = f"blocks.{i}."
        ms_p, ms_s = bn(pre + "ms_spatial.bn")
        ssm_p, ssm_s = bn(pre + "ssm.norm")
        P[f"block_{i}"] = {
            "MultiScaleSpatial_0": {
                "Conv_0": cw(pre + "ms_spatial.conv1"),
                "Conv_1": cw(pre + "ms_spatial.conv3"),
                "Conv_2": cw(pre + "ms_spatial.conv5"),
                "Conv_3": cw(pre + "ms_spatial.conv7"),
                "Conv_4": cw(pre + "ms_spatial.pw"),
                "BatchNorm_0": ms_p,
            },
            "V45FastConvSSM_0": {
                "BatchNorm_0": ssm_p,
                "Conv_0": cw(pre + "ssm.gate_conv"),
                "Conv_1": cw(pre + "ssm.conv1"),
                "Conv_2": cw(pre + "ssm.conv2"),
                "Conv_3": cw(pre + "ssm.conv4"),
                "Conv_4": cw(pre + "ssm.conv8"),
                "Conv_5": cw(pre + "ssm.fuse"),
                "Conv_6": cw(pre + "ssm.proj"),
                "scale": a(sd[pre + "ssm.scale"]),
            },
            "Conv_0": cw(pre + "fuse"),
            "ECA_0": {
                "Conv_0": {
                    "kernel": t_conv(sd[pre + "ca.fc1.weight"]),
                    "bias": a(sd[pre + "ca.fc1.bias"]),
                },
                "Conv_1": {
                    "kernel": t_conv(sd[pre + "ca.fc2.weight"]),
                    "bias": a(sd[pre + "ca.fc2.bias"]),
                },
            },
        }
        S[f"block_{i}"] = {
            "MultiScaleSpatial_0": {"BatchNorm_0": ms_s},
            "V45FastConvSSM_0": {"BatchNorm_0": ssm_s},
        }
    P["Conv_2"] = cw("fuse_early")
    P["Conv_3"] = cw("fuse_late")
    P["Conv_4"] = cw("fuse_final")
    P["Conv_5"] = cw("refine")
    P["Conv_6"] = cw("upsampler.up.0")
    P["Conv_7"] = cw("upsampler.up.3")
    P["out"] = {"kernel": t_conv(sd["output.weight"]), "bias": a(sd["output.bias"])}
    return {"params": P, "batch_stats": S}


def test_v4_5_fastconvssm_forward_parity():
    tm = load_ref_model("MyEfficientLFNetV4_5", ref_args(scale_factor=4, use_macpi=False))
    _run_pair(
        "EfficientLFNetV4_5",
        tm,
        _map_v4_5,
        _rand_sai(seed=5),
        model_kwargs={"ssm_impl": "conv"},
        atol=1e-4,
    )


def test_v5_fastconvssm_forward_parity():
    tm = load_ref_model("MyEfficientLFNetV5", ref_args(scale_factor=4))
    _run_pair(
        "EfficientLFNetV5",
        tm,
        _map_v5,
        _rand_sai(seed=4),
        model_kwargs={"ssm_impl": "conv", "use_tta": False},
        atol=1e-4,
    )


# --------------------------------------------------------------------------
# resLF (resLF.py:18-212) — per-view star-shaped sub-nets
# --------------------------------------------------------------------------

def _map_reslf_basic(sd, pre):
    P = {
        "head": {"kernel": t_conv(sd[pre + "head.weight"])},
        "central_head": {"kernel": t_conv(sd[pre + "central_head.weight"])},
        "Conv_0": {"kernel": t_conv(sd[pre + "body_degrade.weight"])},
        "Conv_1": {"kernel": t_conv(sd[pre + "tail.0.weight"])},
        "Conv_2": {"kernel": t_conv(sd[pre + "tail.2.weight"])},
    }
    for i in range(4):
        P[f"_ResBlock_{i}"] = {
            "Conv_0": {
                "kernel": t_conv(sd[pre + f"midbody.{i}.body.0.weight"]),
                "bias": a(sd[pre + f"midbody.{i}.body.0.bias"]),
            },
            "Conv_1": {
                "kernel": t_conv(sd[pre + f"midbody.{i}.body.2.weight"]),
                "bias": a(sd[pre + f"midbody.{i}.body.2.bias"]),
            },
        }
        P[f"_ResBlock_{i + 4}"] = {
            "Conv_0": {
                "kernel": t_conv(sd[pre + f"body.{i}.body.0.weight"]),
                "bias": a(sd[pre + f"body.{i}.body.0.bias"]),
            },
            "Conv_1": {
                "kernel": t_conv(sd[pre + f"body.{i}.body.2.weight"]),
                "bias": a(sd[pre + f"body.{i}.body.2.bias"]),
            },
        }
    return P


def _map_reslf(sd):
    return {
        net: _map_reslf_basic(sd, net + ".")
        for net in ("net_side", "net_corner", "net_3x3", "net_5x5", "net_7x7", "net_9x9")
    }


def test_reslf_forward_parity():
    tm = load_ref_model("resLF", ref_args(scale_factor=4))
    _run_pair("resLF", tm, _map_reslf, _rand_sai(seed=6), atol=5e-5)


# --------------------------------------------------------------------------
# LFSSR (LFSSR.py:19-216) — spatial-angular separable cascaded x2 stages
# --------------------------------------------------------------------------

def _map_lfssr(sd):
    def cw(k):
        return {"kernel": t_conv(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def stage(n):
        S = {
            f"_AltFilter_{i}": {
                "Conv_0": cw(f"net.altblock{n}.{i}.spaconv"),
                "Conv_1": cw(f"net.altblock{n}.{i}.angconv"),
            }
            for i in range(10)
        }
        S["Conv_0"] = cw(f"net.fup{n}.0")
        S["Conv_1"] = cw(f"net.res{n}")
        S["Conv_2"] = cw(f"net.iup{n}.0")
        return S

    return {
        "Conv_0": cw("net.conv0"),
        "_Stage2x_0": stage(1),
        "_Stage2x_1": stage(2),
    }


def test_lfssr_forward_parity():
    tm = load_ref_model("LFSSR", ref_args(scale_factor=4))
    _run_pair("LFSSR", tm, _map_lfssr, _rand_sai(seed=7), atol=5e-5)


# --------------------------------------------------------------------------
# LF-ATO (LFSSR_ATO.py:16-126) — all-to-one per-reference-view fusion
# --------------------------------------------------------------------------

def _map_lf_ato(sd):
    def cw(k):
        return {"kernel": t_conv(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def stack(pre, n):
        return {
            f"_ResBlock_{i}": {
                "Conv_0": cw(f"{pre}.{i}.conv1"),
                "Conv_1": cw(f"{pre}.{i}.conv2"),
            }
            for i in range(n)
        }

    fusion = {
        "Conv_0": cw("pair_conv0"),
        "_ResStack_0": stack("pair_resblock", 2),
        "Conv_1": cw("pair_conv1"),
        "Conv_2": cw("fusion_view_conv0"),
        "_ResStack_1": stack("fusion_view_resblock", 2),
        "Conv_3": cw("fusion_view_conv1"),
        "Conv_4": cw("fusion_fea_conv0"),
        "_ResStack_2": stack("fusion_fea_resblock", 3),
        "Conv_5": cw("upsampler.0"),
        "Conv_6": cw("upsampler.3"),
        "Conv_7": cw("HRconv"),
        "Conv_8": cw("conv_last"),
    }
    return {
        "Conv_0": cw("fea_conv0"),
        "_ResStack_0": stack("fea_resblock", 5),
        "_PerRefFusion_0": fusion,
    }


def test_lf_ato_forward_parity():
    tm = load_ref_model("LFSSR_ATO", ref_args(scale_factor=4))
    _run_pair("LF_ATO", tm, _map_lf_ato, _rand_sai(seed=8), atol=5e-5)


# --------------------------------------------------------------------------
# MEG-Net (MEG_Net.py:21-185) — 4-direction 3D conv branches + SA blocks
# --------------------------------------------------------------------------

def _map_meg_net(sd):
    def c3(k):
        return {"kernel": t_conv3d(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def prelu(k):
        return {"alpha": a(sd[k + ".weight"])}

    def branch(name):
        B = {"first": c3(f"{name}_first.0")}
        for i in range(4):
            B[f"res_{i}"] = c3(f"{name}.{i}.body.1")
            B[f"_PReLU_{i}"] = prelu(f"{name}.{i}.body.0")
        return B

    def convt(k):
        # torch ConvTranspose3d [in, out, 1, kh, kw] -> flax transpose_kernel
        # layout [kh, kw, out, in]
        w = a(sd[k + ".weight"])[:, :, 0]
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": a(sd[k + ".bias"])}

    P = {
        "horizontal": branch("horizontal"),
        "vertical": branch("vertical"),
        "s45": branch("s45"),
        "s135": branch("s135"),
        "up": convt("upsample.0"),
        "Conv_0": {
            "kernel": t_conv3d(sd["upsample.1.weight"])[0],
            "bias": a(sd["upsample.1.bias"]),
        },
        "up_main": convt("upsample_main.0"),
    }
    for i in range(4):
        P[f"sa_{i}"] = {
            "Conv_0": c3(f"s_body_list.{i}.body.0"),
            "_PReLU_0": prelu(f"s_body_list.{i}.body.1"),
            "Conv_1": c3(f"a_body_list.{i}.body.0"),
            "_PReLU_1": prelu(f"a_body_list.{i}.body.1"),
        }
    return P


def test_meg_net_forward_parity():
    tm = load_ref_model("MEG_Net", ref_args(scale_factor=4))
    _run_pair("MEG_Net", tm, _map_meg_net, _rand_sai(seed=9), atol=5e-5)


# --------------------------------------------------------------------------
# LF-IINet (LF_IINet.py:16-334) — intra/inter interaction + MCB + FBM
# --------------------------------------------------------------------------

def _map_lf_iinet(sd):
    def cw(k, bias=True):
        d = {"kernel": t_conv(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    def c3(k, bias=False):
        d = {"kernel": t_conv3d(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    def res_aspp(pre):
        return {
            "Conv_0": cw(pre + ".conv_1.0", bias=False),
            "Conv_1": cw(pre + ".conv_2.0", bias=False),
            "Conv_2": cw(pre + ".conv_3.0", bias=False),
            "Conv_3": cw(pre + ".conv_t"),
        }

    def rb(pre):
        return {"Conv_0": cw(pre + ".conv01"), "Conv_1": cw(pre + ".conv02")}

    def fea_extract(pre):
        return {
            "Conv_0": cw(pre + ".FEconv", bias=False),
            "_ResASPP_0": res_aspp(pre + ".FERB_1"),
            "_RB_0": rb(pre + ".FERB_2"),
            "_ResASPP_1": res_aspp(pre + ".FERB_3"),
            "_RB_1": rb(pre + ".FERB_4"),
        }

    P = {
        "_FeaExtract_0": fea_extract("IntraFeaExtract"),
        "_FeaExtract_1": fea_extract("InterFeaExtract"),
    }
    for i in range(4):
        fum = {
            "Conv_0": cw(f"Interact_{i+1}.conv_fusing"),
            "Conv_1": cw(f"Interact_{i+1}.conv_sharing"),
        }
        if i < 3:
            fum["Conv_2"] = cw(f"Interact_{i+1}.conv_f1")
            fum["Conv_3"] = cw(f"Interact_{i+1}.conv_f2")
        P[f"_FUM_{i}"] = fum
        P[f"_MCB_{i}"] = {
            "Conv_0": c3(f"MCB_{i+1}.conv1"),
            "Conv_1": c3(f"MCB_{i+1}.ASPP.conv_1.0"),
            "Conv_2": c3(f"MCB_{i+1}.ASPP.conv_2.0"),
            "Conv_3": c3(f"MCB_{i+1}.ASPP.conv_3.0"),
            "Conv_4": c3(f"MCB_{i+1}.ASPP.conv_t", bias=True),
            "Conv_5": c3(f"MCB_{i+1}.conv2"),
        }
    fbm = {}
    for i in range(4):
        fbm[f"_RB_{i}"] = rb(f"FBM.FERB_{i+1}")
        fbm[f"Conv_{2*i}"] = cw(f"FBM.att{i+1}.att_c.0")
        fbm[f"Conv_{2*i+1}"] = cw(f"FBM.att{i+1}.att_c.2")
    P["_FBM_0"] = fbm
    P["Conv_0"] = cw("UpSample.upsp.0", bias=False)
    P["Conv_1"] = cw("UpSample.upsp.2", bias=False)
    return P


def test_lf_iinet_forward_parity():
    tm = load_ref_model("LF_IINet", ref_args(scale_factor=4))
    _run_pair("LF_IINet", tm, _map_lf_iinet, _rand_sai(seed=10), atol=5e-5)


# --------------------------------------------------------------------------
# LFSSR-SAV (LFSSR_SAV.py:21-420) — parallel SAS/SAC blocks, x2 cascades
# --------------------------------------------------------------------------

def _map_lfssr_sav(sd):
    def cw(k):
        return {"kernel": t_conv(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def ct(k):
        w = a(sd[k + ".weight"])  # [in, out, kh, kw]
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": a(sd[k + ".bias"])}

    def stage(n):
        S = {
            f"_SAVParallel_{i}": {
                "_SAS_0": {
                    "spa": cw(f"net.altblock{n}.{i}.SAS_conv.spaconv"),
                    "ang": cw(f"net.altblock{n}.{i}.SAS_conv.angconv"),
                },
                "_SAC_0": {
                    "ver": cw(f"net.altblock{n}.{i}.SAC_conv.verconv"),
                    "hor": cw(f"net.altblock{n}.{i}.SAC_conv.horconv"),
                },
            }
            for i in range(10)
        }
        S["fup"] = ct(f"net.fup{n}.0")
        S["res"] = cw(f"net.res{n}")
        S["iup"] = ct(f"net.iup{n}")
        return S

    return {
        "conv0": cw("net.conv0"),
        "stage1": stage(1),
        "stage2": stage(2),
    }


def test_lfssr_sav_forward_parity():
    tm = load_ref_model("LFSSR_SAV", ref_args(scale_factor=4))
    _run_pair("LFSSR_SAV", tm, _map_lfssr_sav, _rand_sai(seed=11), atol=5e-5)


# --------------------------------------------------------------------------
# HLFSR (HLFSR.py:7-344) — five-branch subspace extraction + covariance
# attention + dilated residual groups
# --------------------------------------------------------------------------

def _map_hlfsr(sd):
    def cw(k, bias=True):
        d = {"kernel": t_conv(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    P = {}
    for g in range(5):
        pre = f"HFEM_{g+1}."
        H = {
            "head_epi": cw(pre + "head_epi.0", bias=False),
            "Conv_0": cw(pre + "epi2spa.0", bias=False),
            "Conv_1": cw(pre + "head_spa_intra.0", bias=False),
            "Conv_2": cw(pre + "head_spa_inter.0", bias=False),
            "Conv_3": cw(pre + "head_ang_intra.0", bias=False),
            "Conv_4": cw(pre + "ang2spa_intra.0", bias=False),
            "Conv_5": cw(pre + "head_ang_inter.0", bias=False),
            "Conv_6": cw(pre + "ang2spa_inter.0", bias=False),
            "_AttentionFusion_0": {
                "alpha": a(sd[pre + "attention_fusion.alpha"]),
                "gamma": a(sd[pre + "attention_fusion.gamma"]),
                "beta": a(sd[pre + "attention_fusion.beta"]),
            },
            "Conv_7": cw(pre + "SRG.0", bias=False),
            "Conv_8": cw(pre + "SRG.1.conv"),
        }
        for i in range(15):
            bpre = pre + f"SRG.1.fea_resblock.{i}."
            H[f"_CAResBlock_{i}"] = {
                "Conv_0": cw(bpre + "conv1"),
                "Conv_1": cw(bpre + "conv2"),
                "Conv_2": cw(bpre + "CALayer.conv_du.0"),
                "Conv_3": cw(bpre + "CALayer.conv_du.2"),
            }
        P[f"hfem_{g}"] = H
    P["Conv_0"] = cw("UpSample.0.0")
    P["Conv_1"] = cw("UpSample.0.2")
    P["Conv_2"] = cw("UpSample.1", bias=False)
    return P


def test_hlfsr_forward_parity():
    tm = load_ref_model("HLFSR", ref_args(scale_factor=4))
    _run_pair("HLFSR", tm, _map_hlfsr, _rand_sai(h0=10, seed=12), atol=1e-4)


# --------------------------------------------------------------------------
# DPT (DPT.py:7-739) — content/gradient branches with SALSA patch attention
# --------------------------------------------------------------------------

def _map_dpt(sd):
    def cw(k, bias=True):
        d = {"kernel": t_conv(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    def res_aspp(pre):
        return {
            "Conv_0": cw(pre + ".conv_1.0", bias=False),
            "Conv_1": cw(pre + ".conv_2.0", bias=False),
            "Conv_2": cw(pre + ".conv_3.0", bias=False),
            "Conv_3": cw(pre + ".conv_t", bias=False),
        }

    def rb(pre):
        return {
            "Conv_0": cw(pre + ".conv01", bias=False),
            "Conv_1": cw(pre + ".conv02", bias=False),
        }

    def salsa(pre):
        return {"attention": {
            "conv33": cw(pre + ".attention.conv33"),
            "g": cw(pre + ".attention.g"),
            "theta": cw(pre + ".attention.theta"),
            "phi": cw(pre + ".attention.phi"),
            "W": cw(pre + ".attention.W"),
        }}

    def branch(pre):
        return {
            "_FeaExtractD_0": {
                "Conv_0": cw(pre + ".FeaExtract.FEconv", bias=False),
                "_ResASPPD_0": res_aspp(pre + ".FeaExtract.FERB_1"),
                "_RBD_0": rb(pre + ".FeaExtract.FERB_2"),
                "_ResASPPD_1": res_aspp(pre + ".FeaExtract.FERB_3"),
                "_RBD_1": rb(pre + ".FeaExtract.FERB_4"),
            },
            "_ADAM_0": {
                "conv_1": cw(pre + ".ADAM_1.conv_1"),
                "_ResASPPD_0": res_aspp(pre + ".ADAM_1.ASPP"),
                "conv_f1": cw(pre + ".ADAM_1.conv_f1"),
                "conv_f3": cw(pre + ".ADAM_1.conv_f3"),
            },
            "round1": {"row": salsa(pre + ".trans_row1"), "col": salsa(pre + ".trans_col1")},
            "round2": {"row": salsa(pre + ".trans_row2"), "col": salsa(pre + ".trans_col2")},
        }

    P = {
        "srbranch": branch("srbranch"),
        "gbranch": branch("gbranch"),
        "fuse": {"row": salsa("fuse.trans_f_row"), "col": salsa("fuse.trans_f_col")},
        "Conv_0": cw("UpSample.upsp.0", bias=False),
        "Conv_1": cw("UpSample.upsp.2", bias=False),
    }
    for i in range(5):
        P[f"imdb_{i}"] = {
            "Conv_0": cw(f"Reconstruct.body.{i}.conv_0", bias=False),
            "Conv_1": cw(f"Reconstruct.body.{i}.conv_1", bias=False),
            "Conv_2": cw(f"Reconstruct.body.{i}.conv_2", bias=False),
            "Conv_3": cw(f"Reconstruct.body.{i}.conv_3", bias=False),
            "Conv_4": cw(f"Reconstruct.body.{i}.conv_t", bias=False),
        }
    return P


def test_dpt_forward_parity():
    tm = load_ref_model("DPT", ref_args(scale_factor=4))
    _run_pair(
        "DPT",
        tm,
        _map_dpt,
        _rand_sai(seed=13),
        model_kwargs={"compat_grad_pad2": True, "compat_fold_pad": True},
        # 3e-4 (not 1e-4): ops.resize.interpolate applies its resample plan
        # as one dense [out, in] matmul — the same linear map as torch's
        # per-tap loop but a different f32 summation order; DPT's deep
        # trunk amplifies that to ~1.5e-4 end to end (‌≪ any PSNR impact)
        atol=3e-4,
    )


# --------------------------------------------------------------------------
# LF-DET (LF_DET.py:17-330) — spatial-angular separable transformer
# --------------------------------------------------------------------------

def _map_lf_det(sd):
    def cw(k, bias=True):
        d = {"kernel": t_conv(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    def ln(k):
        return {"scale": a(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def dense(k):
        return {"kernel": t_linear(sd[k + ".weight"]), "bias": a(sd[k + ".bias"])}

    def block(pre, sr):
        att = {"Dense_0": dense(pre + ".attn.q")}
        if sr:
            att["Conv_0"] = cw(pre + ".attn.sr")
            att["LayerNorm_0"] = ln(pre + ".attn.norm")
        att["Dense_1"] = dense(pre + ".attn.kv")
        att["Dense_2"] = dense(pre + ".attn.proj")
        return {
            "_Attention_0": att,
            "LayerNorm_0": ln(pre + ".norm1"),
            "LayerNorm_1": ln(pre + ".norm2"),
            "_Mlp_0": {
                "Dense_0": dense(pre + ".mlp.fc1"),
                "Conv_0": cw(pre + ".mlp.dwconv.dwconv"),
                "Dense_1": dense(pre + ".mlp.fc2"),
            },
        }

    P = {
        "Conv_0": cw("conv_init0.0", bias=False),
        "Conv_1": cw("conv_init_spa.0", bias=False),
        "Conv_2": cw("conv_init_spa.2", bias=False),
        "Conv_3": cw("conv_init_spa.4", bias=False),
    }
    for i in range(4):
        mb = {
            "_Block_0": block(f"blocks.{i}.spa_Transformer_Blocks.0", sr=True),
            "_Block_1": block(f"blocks.{i}.spa_Transformer_Blocks.1", sr=True),
            "Conv_0": cw(f"blocks.{i}.cal"),
        }
        for m in range(3):
            mb[f"_AngularWindows_{m}"] = {
                "_Block_0": block(f"blocks.{i}.ang_Transformer_Blocks.{m}", sr=False)
            }
        P[f"_MixBlock_{i}"] = mb
    # MLA: loop order is reversed(hier) = level 4 first
    ci = 4
    for lvl in (4, 3, 2, 1):
        P[f"Conv_{ci}"] = cw(f"mla.conv_{lvl}_fuse", bias=False)
        P[f"Conv_{ci+1}"] = cw(f"mla.conv_{lvl}_fine.0", bias=False)
        P[f"Conv_{ci+2}"] = cw(f"mla.conv_{lvl}_fine.2", bias=False)
        ci += 3
    P["Conv_16"] = cw("upsampling.0", bias=False)
    P["Conv_17"] = cw("upsampling.3", bias=False)
    return P


def test_lf_det_forward_parity():
    tm = load_ref_model("LF_DET", ref_args(scale_factor=4))
    tm.patch_size = 8  # reference hard-codes 32; test views are 8x8
    _run_pair("LF_DET", tm, _map_lf_det, _rand_sai(seed=14), atol=1e-4)


# --------------------------------------------------------------------------
# LF-DFnet (DFnet.py:23-272) — deformable-conv alignment. The reference
# file is dead code (exports Net, not get_model, and needs an external
# CUDA DCN package); a pure-torch DCNv1 shim (zero-padding bilinear
# sampling, no bias) stands in for dcn.modules.deform_conv.DeformConv so
# the rest of the network can be weight-transfer-verified.
# --------------------------------------------------------------------------

def _make_dcn_shim():
    import torch
    import torch.nn as tnn

    class DeformConv(tnn.Module):
        def __init__(self, in_ch, out_ch, kernel, stride=1, padding=1,
                     dilation=1, groups=1, deformable_groups=1):
            super().__init__()
            assert kernel == 3 and stride == 1 and padding == 1
            self.weight = tnn.Parameter(torch.randn(out_ch, in_ch, 3, 3) * 0.05)

        def forward(self, x, offset):
            B, C, H, W = x.shape
            gy, gx = torch.meshgrid(
                torch.arange(H, dtype=torch.float32),
                torch.arange(W, dtype=torch.float32), indexing="ij")
            out = 0.0
            flat = x.reshape(B, C, H * W)
            k = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy = gy[None] + dy + offset[:, 2 * k]
                    xx = gx[None] + dx + offset[:, 2 * k + 1]
                    y0 = torch.floor(yy)
                    x0 = torch.floor(xx)
                    wy = (yy - y0).unsqueeze(1)
                    wx = (xx - x0).unsqueeze(1)

                    def gather(yi, xi):
                        valid = ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1))
                        yc = yi.clamp(0, H - 1).long()
                        xc = xi.clamp(0, W - 1).long()
                        idx = (yc * W + xc).reshape(B, 1, H * W).expand(B, C, H * W)
                        vals = torch.gather(flat, 2, idx).reshape(B, C, H, W)
                        return vals * valid.unsqueeze(1)

                    s = (gather(y0, x0) * (1 - wy) * (1 - wx)
                         + gather(y0, x0 + 1) * (1 - wy) * wx
                         + gather(y0 + 1, x0) * wy * (1 - wx)
                         + gather(y0 + 1, x0 + 1) * wy * wx)
                    out = out + torch.einsum(
                        "bchw,fc->bfhw", s, self.weight[:, :, dy + 1, dx + 1])
                    k += 1
            return out

    return DeformConv


def _load_dfnet():
    import sys as _sys
    import types as _types
    import importlib
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    if "torchvision" not in _sys.modules:
        # DFnet.py imports ToPILImage at module level but never uses it
        tv = _types.ModuleType("torchvision")
        tr = _types.ModuleType("torchvision.transforms")
        tr.ToPILImage = object
        tv.transforms = tr
        _sys.modules["torchvision"] = tv
        _sys.modules["torchvision.transforms"] = tr
    if "dcn.modules.deform_conv" not in _sys.modules:
        dcn = _types.ModuleType("dcn")
        mods = _types.ModuleType("dcn.modules")
        dc = _types.ModuleType("dcn.modules.deform_conv")
        dc.DeformConv = _make_dcn_shim()
        dcn.modules = mods
        mods.deform_conv = dc
        _sys.modules["dcn"] = dcn
        _sys.modules["dcn.modules"] = mods
        _sys.modules["dcn.modules.deform_conv"] = dc
    if REF_SYS not in _sys.path:
        _sys.path.insert(0, REF_SYS)
    mod = importlib.import_module("model.SR.DFnet")
    net = mod.Net(5, 4)
    # conv_off is zero-initialized (DFnet.py:119-121), which would leave the
    # deformable sampling untested; randomize it so offsets are exercised
    for adam in (net.ADAM_1, net.ADAM_2, net.ADAM_3):
        torch.nn.init.normal_(adam.conv_off.weight, std=0.3)
        torch.nn.init.normal_(adam.conv_off.bias, std=0.3)
    net.eval()
    return net


REF_SYS = "/root/reference"


def _map_lf_dfnet(sd):
    def cw(k, bias=True):
        d = {"kernel": t_conv(sd[k + ".weight"])}
        if bias:
            d["bias"] = a(sd[k + ".bias"])
        return d

    def res_aspp(pre):
        return {
            "Conv_0": cw(pre + ".conv_1.0", bias=False),
            "Conv_1": cw(pre + ".conv_2.0", bias=False),
            "Conv_2": cw(pre + ".conv_3.0", bias=False),
            "Conv_3": cw(pre + ".conv_t", bias=False),
        }

    def rb(pre):
        return {
            "Conv_0": cw(pre + ".conv01", bias=False),
            "Conv_1": cw(pre + ".conv02", bias=False),
        }

    P = {
        "FeaExtract": {
            "Conv_0": cw("FeaExtract.FEconv", bias=False),
            "_ResASPPD_0": res_aspp("FeaExtract.FERB_1"),
            "_RBD_0": rb("FeaExtract.FERB_2"),
            "_ResASPPD_1": res_aspp("FeaExtract.FERB_3"),
            "_RBD_1": rb("FeaExtract.FERB_4"),
        },
        "up1": cw("UpSample.upsp.0", bias=False),
        "up2": cw("UpSample.upsp.2", bias=False),
    }
    for i in (1, 2, 3):
        # torch DCN weight [out, in, 3, 3] -> flax [9 taps, in, out]
        w = a(sd[f"ADAM_{i}.dcn.weight"])
        kern = w.transpose(2, 3, 1, 0).reshape(9, w.shape[1], w.shape[0])
        P[f"ADAM_{i}"] = {
            "conv_1": cw(f"ADAM_{i}.conv_1"),
            "_ResASPPD_0": res_aspp(f"ADAM_{i}.ASPP"),
            "conv_off": cw(f"ADAM_{i}.conv_off"),
            "conv_f1": cw(f"ADAM_{i}.conv_f1"),
            "conv_f3": cw(f"ADAM_{i}.conv_f3"),
            "dcn": {"kernel": kern},
        }
    for i in range(4):
        P[f"imdb_{i}"] = {
            "Conv_0": cw(f"Reconstruct.body.{i}.conv_0", bias=False),
            "Conv_1": cw(f"Reconstruct.body.{i}.conv_1", bias=False),
            "Conv_2": cw(f"Reconstruct.body.{i}.conv_2", bias=False),
            "Conv_3": cw(f"Reconstruct.body.{i}.conv_3", bias=False),
            "Conv_4": cw(f"Reconstruct.body.{i}.conv_t", bias=False),
        }
    return P


def test_lf_dfnet_forward_parity():
    import torch

    tm = _load_dfnet()
    x = _rand_sai(seed=15)

    cfg = Config(model_name="LF_DFnet", scale_factor=4, compute_dtype="float32")
    model = registry.get_model(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    mapped = {"params": _map_lf_dfnet(tm.state_dict())}
    filled = {k: fill(variables[k], mapped[k]) for k in variables}

    y_flax = np.asarray(jax.jit(model.apply)(filled, jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y_torch = tm(xt).numpy().transpose(0, 2, 3, 1)
    diff = max_abs_diff(y_flax, y_torch)
    assert diff < 1e-4, f"LF_DFnet: max |flax - torch| = {diff}"


# --------------------------------------------------------------------------
# EfficientLFNetV6 / V6.1 — the true V6-line architectures
# (MyEfficientLFNetV6.py / V6_1.py with their FastConvSSM fallback)
# --------------------------------------------------------------------------

def _map_v6(sd, pre_norm=False):
    def ln(p):
        return {"scale": a(sd[p + "weight"]), "bias": a(sd[p + "bias"])}

    def cw(p):
        return {"kernel": t_conv(sd[p + ".weight"])}

    core = {
        "shallow_conv": {
            "kernel": t_conv(sd["shallow_conv.weight"]),
            "bias": a(sd["shallow_conv.bias"]),
        },
        "shallow_enhance": {
            "dw": cw("shallow_enhance.dw"),
            "pw": cw("shallow_enhance.pw"),
        },
    }
    for i in range(8):
        pre = f"lf_vssm_blocks.{i}."
        g = pre + "global_branch."
        blk = {
            "local": {
                "conv1": cw(pre + "local_branch.conv1"),
                "conv3": cw(pre + "local_branch.conv3"),
                "conv5": cw(pre + "local_branch.conv5"),
                "conv7": cw(pre + "local_branch.conv7"),
                "pw": cw(pre + "local_branch.pw"),
            },
            "global": {
                "norm": ln(g + "norm."),
                "ssm": {
                    "Dense_0": {
                        "kernel": t_linear(sd[g + "mamba.proj_in.weight"]),
                        "bias": a(sd[g + "mamba.proj_in.bias"]),
                    },
                    "conv_kernel": a(sd[g + "mamba.conv.weight"]).transpose(2, 1, 0),
                    "conv_bias": a(sd[g + "mamba.conv.bias"]),
                    "Dense_1": {
                        "kernel": t_linear(sd[g + "mamba.proj_out.weight"]),
                        "bias": a(sd[g + "mamba.proj_out.bias"]),
                    },
                },
                "dir_fuse": cw(g + "dir_fuse"),
                "scale": a(sd[g + "scale"]),
            },
            "fuse": cw(pre + "fuse"),
            "attention": {
                "Conv_0": {
                    "kernel": t_conv(sd[pre + "attention.fc1.weight"]),
                    "bias": a(sd[pre + "attention.fc1.bias"]),
                },
                "Conv_1": {
                    "kernel": t_conv(sd[pre + "attention.fc2.weight"]),
                    "bias": a(sd[pre + "attention.fc2.bias"]),
                },
            },
            "res_scale": a(sd[pre + "res_scale"]),
        }
        if pre_norm:
            blk["pre_norm"] = ln(pre + "pre_norm.")
        else:
            blk["fuse_norm"] = ln(pre + "fuse_norm.")
        core[f"block_{i}"] = blk
    core.update(
        {
            "epi_branch": {
                "epi_h_dw": cw("epi_branch.epi_h.0"),
                "epi_h_pw": cw("epi_branch.epi_h.2"),
                "epi_v_dw": cw("epi_branch.epi_v.0"),
                "epi_v_pw": cw("epi_branch.epi_v.2"),
                "fuse": cw("epi_branch.fuse"),
                "scale": a(sd["epi_branch.scale"]),
            },
            "cross_fuse": cw("cross_fuse"),
            "spectral_attn": {
                "freq_weight": a(sd["spectral_attn.freq_weight"]).reshape(-1),
                "spatial_mix": cw("spectral_attn.spatial_mix"),
                "scale": a(sd["spectral_attn.scale"]),
            },
            "fuse_early": cw("fuse_early"),
            "fuse_late": cw("fuse_late"),
            "fuse_final": cw("fuse_final"),
            "refine_conv": cw("refine_conv"),
            "up_0": cw("upsampler.up.0"),
            "up_1": cw("upsampler.up.3"),
            "output_conv": {
                "kernel": t_conv(sd["output_conv.weight"]),
                "bias": a(sd["output_conv.bias"]),
            },
            "output_scale": a(sd["output_scale"]),
        }
    )
    if not pre_norm:
        core["fuse_norm"] = ln("fuse_norm.")
    return {"core": core}


@pytest.mark.slow
def test_v6_fastconvssm_forward_parity():
    tm = load_ref_model("MyEfficientLFNetV6", ref_args(scale_factor=4))
    _run_pair(
        "EfficientLFNetV6", tm, _map_v6, _rand_sai(seed=6),
        model_kwargs={"ssm_impl": "conv"}, atol=1e-4,
    )


@pytest.mark.slow
def test_v6_1_fastconvssm_forward_parity():
    tm = load_ref_model("MyEfficientLFNetV6_1", ref_args(scale_factor=4))
    _run_pair(
        "EfficientLFNetV6_1", tm,
        lambda sd: _map_v6(sd, pre_norm=True), _rand_sai(seed=7),
        model_kwargs={"ssm_impl": "conv"}, atol=1e-4,
    )


def _map_v63(sd):
    """MyEfficientLFNetV6_3 state dict -> EfficientLFNetV63 params
    (reference instantiated under the functional mamba shim)."""
    from tests._torch_ref import map_mamba

    def k(name):
        return {"kernel": t_conv(sd[name + ".weight"])}

    def kb(name):
        return {"kernel": t_conv(sd[name + ".weight"]), "bias": a(sd[name + ".bias"])}

    def ln(name):
        return {"scale": a(sd[name + ".weight"]), "bias": a(sd[name + ".bias"])}

    def eca(pre):
        return {"Conv_0": kb(pre + "fc1"), "Conv_1": kb(pre + "fc2")}

    out = {}
    for i in range(8):
        p = f"lf_vssm_blocks.{i}."
        out[f"block_{i}"] = {
            "LayerNorm_0": ln(p + "pre_norm"),
            "MultiScaleConv5Block_0": {
                "Conv_0": k(p + "local_branch.conv1"),
                "Conv_1": k(p + "local_branch.conv3"),
                # the two dw5 branches run as one depthwise conv over 2c
                "Conv_2": {"kernel": np.concatenate(
                    [t_conv(sd[p + "local_branch.conv5_1.weight"]),
                     t_conv(sd[p + "local_branch.conv5_2.weight"])], axis=-1)},
                "Conv_3": k(p + "local_branch.pw"),
            },
            "BidirectionalSS2D_0": {
                "LayerNorm_0": ln(p + "global_branch.norm"),
                "mamba": map_mamba(sd, p + "global_branch.mamba."),
                "Conv_0": k(p + "global_branch.dir_fuse"),
                "scale": a(sd[p + "global_branch.scale"]),
            },
            "Conv_0": k(p + "fuse"),
            "ECA_0": eca(p + "attention."),
            "res_scale": a(sd[p + "res_scale"]),
        }
    for branch in ("epi_shallow", "epi_deep"):
        out[branch] = {
            "Conv_0": k(f"{branch}.epi_h_conv.2"),
            "Conv_1": k(f"{branch}.epi_h_conv.0"),
            "Conv_2": k(f"{branch}.epi_v_conv.2"),
            "Conv_3": k(f"{branch}.epi_v_conv.0"),
            "Conv_4": k(f"{branch}.fuse"),
            "Conv_5": k(f"{branch}.depth_mod.0"),
            "Conv_6": k(f"{branch}.depth_mod.2"),
            "scale": a(sd[f"{branch}.scale"]),
        }
    out.update({
        "Conv_0": kb("shallow_conv"),
        "Conv_1": k("shallow_enhance.pw"),
        "Conv_2": k("shallow_enhance.dw"),
        "Conv_3": kb("casai_fusion.content_gate.1"),
        "Conv_4": k("casai_fusion.cross_proj"),
        "Conv_5": k("casai_fusion.local_refine"),
        "casai_scale": a(sd["casai_fusion.scale"]),
        "Conv_6": kb("degradation_mod.deg_estimator.1"),
        "Conv_7": kb("degradation_mod.deg_estimator.3"),
        "deg_scale": a(sd["degradation_mod.scale"]),
        "Conv_8": kb("semantic_attn.semantic_proj.0"),
        "Conv_9": kb("semantic_attn.semantic_proj.2"),
        "Conv_10": k("semantic_attn.local_refine"),
        "sem_scale": a(sd["semantic_attn.scale"]),
        "SpectralAttentionV64_0": {
            "freq_kernel": a(sd["spectral_attn.freq_conv.weight"]).transpose(2, 1, 0),
            "freq_bias": a(sd["spectral_attn.freq_conv.bias"]),
            "Conv_0": k("spectral_attn.spatial_mix"),
            "scale": a(sd["spectral_attn.scale"]),
        },
        "Conv_11": k("fuse_early"),
        "Conv_12": k("fuse_late"),
        "Conv_13": k("fuse_final"),
        "LayerNorm_0": ln("fuse_norm"),
        "Conv_14": k("refine_conv.1"),
        "Conv_15": k("refine_conv.0"),
        "ECA_0": eca("pre_upsample_attn."),
        "Conv_16": k("upsampler.up.0"),
        "Conv_17": k("upsampler.up.2"),
        "Conv_18": k("upsampler.up.5"),
        "Conv_19": k("upsampler.up.7"),
        "Conv_20": kb("output_conv"),
        "out_scale": a(sd["output_scale"]),
    })
    return out


@pytest.mark.slow
def test_v6_3_forward_parity():
    """True V6.3 vs the reference under the FUNCTIONAL mamba shim — the
    first forward-parity claim on the mamba-gated line (V6.0/V6.1 were
    FastConvSSM-fallback parity)."""
    from tests._torch_ref import install_mamba_shim

    install_mamba_shim()
    tm = load_ref_model("MyEfficientLFNetV6_3", ref_args(scale_factor=4))
    tm.masked_pretrain_enabled = False
    _run_pair(
        "EfficientLFNetV6_3", tm, _map_v63, _rand_sai(h0=4, seed=63), atol=2e-4,
    )


def _map_v64(sd, n_blocks=8, refine_layers=1):
    """MyEfficientLFNetV6_4 / V6_5 state dict -> EfficientLFNetV64 params
    (reference under the functional mamba shim; V6_5 is the same module
    set at 72ch x 10 blocks with a 3-layer refine)."""
    from tests._torch_ref import map_mamba

    def k(name):
        return {"kernel": t_conv(sd[name + ".weight"])}

    def kb(name):
        return {"kernel": t_conv(sd[name + ".weight"]), "bias": a(sd[name + ".bias"])}

    def ln(name):
        return {"scale": a(sd[name + ".weight"]), "bias": a(sd[name + ".bias"])}

    def eca(pre):
        return {"Conv_0": kb(pre + "fc1"), "Conv_1": kb(pre + "fc2")}

    out = {}
    for i in range(n_blocks):
        p = f"lf_vssm_blocks.{i}."
        out[f"block_{i}"] = {
            "LayerNorm_0": ln(p + "pre_norm"),
            "MultiScaleLocal_0": {
                "Conv_0": k(p + "local_branch.conv1"),
                # three dw3 branches run as one depthwise conv over 3c
                "Conv_1": {"kernel": np.concatenate(
                    [t_conv(sd[p + f"local_branch.conv3_{j}.weight"])
                     for j in (1, 2, 3)], axis=-1)},
                "Conv_2": k(p + "local_branch.pw"),
            },
            "BidirectionalSS2D_0": {
                "LayerNorm_0": ln(p + "global_branch.norm"),
                "mamba": map_mamba(sd, p + "global_branch.mamba."),
                "Conv_0": k(p + "global_branch.dir_fuse"),
                "scale": a(sd[p + "global_branch.scale"]),
            },
            "Conv_0": k(p + "fuse"),
            "ECA_0": eca(p + "attention."),
            "res_scale": a(sd[p + "res_scale"]),
        }
    out["EPIBranchV64_0"] = {
        "Conv_0": k("epi_branch.epi_h.0"),
        "Conv_1": k("epi_branch.epi_h.2"),
        "Conv_2": k("epi_branch.epi_v.0"),
        "Conv_3": k("epi_branch.epi_v.2"),
        "Conv_4": k("epi_branch.fuse"),
        "Conv_5": k("epi_branch.depth_mod.1"),
        "Conv_6": k("epi_branch.depth_mod.3"),
        "scale": a(sd["epi_branch.scale"]),
    }
    out.update({
        "Conv_0": kb("shallow_conv"),
        "Conv_1": k("shallow_enhance.pw"),
        "Conv_2": k("shallow_enhance.dw"),
        "Conv_3": kb("casai_fusion.content_gate.1"),
        "Conv_4": k("casai_fusion.cross_proj"),
        "Conv_5": k("casai_fusion.local_refine"),
        "casai_scale": a(sd["casai_fusion.scale"]),
        "Conv_6": kb("degradation_mod.deg_estimator.1"),
        "Conv_7": kb("degradation_mod.deg_estimator.3"),
        "deg_scale": a(sd["degradation_mod.scale"]),
        "Conv_8": kb("semantic_attn.semantic_proj.0"),
        "Conv_9": kb("semantic_attn.semantic_proj.2"),
        "Conv_10": k("semantic_attn.local_refine"),
        "sem_scale": a(sd["semantic_attn.scale"]),
        "SpectralAttentionV64_0": {
            "freq_kernel": a(sd["spectral_attn.freq_conv.weight"]).transpose(2, 1, 0),
            "freq_bias": a(sd["spectral_attn.freq_conv.bias"]),
            "Conv_0": k("spectral_attn.spatial_mix"),
            "scale": a(sd["spectral_attn.scale"]),
        },
        "Conv_11": k("block_fusion"),
        "LayerNorm_0": ln("fuse_norm"),
        "ECA_0": eca("pre_upsample_attn."),
        "out_scale": a(sd["output_scale"]),
    })
    # refine: flax names pw-before-dw per layer (construction order);
    # torch Sequential indices skip the LeakyReLUs (dw at 0,3,6; pw at 1,4,7)
    n = 11
    for layer in range(refine_layers):
        out[f"Conv_{n + 1}"] = k(f"refine_conv.{3 * layer + 1}")
        out[f"Conv_{n + 2}"] = k(f"refine_conv.{3 * layer}")
        n += 2
    # upsampler stages: dw at up.0/up.5, pw at up.2/up.7
    out[f"Conv_{n + 1}"] = k("upsampler.up.0")
    out[f"Conv_{n + 2}"] = k("upsampler.up.2")
    out[f"Conv_{n + 3}"] = k("upsampler.up.5")
    out[f"Conv_{n + 4}"] = k("upsampler.up.7")
    out[f"Conv_{n + 5}"] = kb("output_conv")
    return out


@pytest.mark.slow
def test_v6_4_forward_parity():
    from tests._torch_ref import install_mamba_shim

    install_mamba_shim()
    tm = load_ref_model("MyEfficientLFNetV6_4", ref_args(scale_factor=4))
    tm.masked_pretrain_enabled = False
    _run_pair(
        "EfficientLFNetV64", tm, _map_v64, _rand_sai(h0=4, seed=64), atol=2e-4,
    )


@pytest.mark.slow
def test_v6_5_forward_parity():
    from tests._torch_ref import install_mamba_shim

    install_mamba_shim()
    tm = load_ref_model("MyEfficientLFNetV6_5", ref_args(scale_factor=4))
    tm.masked_pretrain_enabled = False
    _run_pair(
        "EfficientLFNetV6_5", tm,
        lambda sd: _map_v64(sd, n_blocks=10, refine_layers=3),
        _rand_sai(h0=4, seed=65), atol=2e-4,
    )
