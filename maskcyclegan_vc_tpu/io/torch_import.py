"""Import reference PyTorch checkpoints into our flax param trees.

The reference saves per-model ``.pth.tar`` dicts with a ``model_state``
state_dict (``/root/reference/saver/model_saver.py:66-79``). This module
maps those tensors onto our NHWC/flax parameter layout:

  * Conv2d weight (O, I, kH, kW) -> HWIO (kH, kW, I, O)
  * Conv1d weight (O, I, k)      -> (k, I, O)
  * InstanceNorm weight/bias     -> scale/bias
  * the dead ``downSample4`` block (model.py:316-320) -> the
    checkpoint-compat dead params on our Discriminator.

Torch is only needed when actually reading ``.pth.tar`` files; the
mapping functions themselves accept any dict of numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv2d(sd, name):
    w = _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
    b = _np(sd[f"{name}.bias"])
    return {"kernel": w, "bias": b}


def _conv1d(sd, name):
    w = _np(sd[f"{name}.weight"]).transpose(2, 1, 0)  # OIK -> KIO
    b = _np(sd[f"{name}.bias"])
    return {"kernel": w, "bias": b}


def _norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def generator_params_from_torch(sd: Mapping, num_residual_blocks: int = 6) -> Dict:
    """Map a reference Generator state_dict to our flax params tree."""
    p: Dict = {
        "conv1": {"conv": _conv2d(sd, "conv1")},
        "conv1_gates": {"conv": _conv2d(sd, "conv1_gates")},
        "conv2dto1dLayer": {"conv": _conv1d(sd, "conv2dto1dLayer")},
        "conv2dto1dLayer_tfan": _norm(sd, "conv2dto1dLayer_tfan"),
        "conv1dto2dLayer": {"conv": _conv1d(sd, "conv1dto2dLayer")},
        "conv1dto2dLayer_tfan": _norm(sd, "conv1dto2dLayer_tfan"),
        "upSample1_conv": {"conv": _conv2d(sd, "upSample1.0")},
        "upSample1_norm": _norm(sd, "upSample1.2"),
        "upSample2_conv": {"conv": _conv2d(sd, "upSample2.0")},
        "upSample2_norm": _norm(sd, "upSample2.2"),
        "lastConvLayer": {"conv": _conv2d(sd, "lastConvLayer")},
    }
    for ds in ("downSample1", "downSample2"):
        p[ds] = {
            "convLayer": {"conv": _conv2d(sd, f"{ds}.convLayer.0")},
            "convLayer_norm": _norm(sd, f"{ds}.convLayer.1"),
            "convLayer_gates": {"conv": _conv2d(sd, f"{ds}.convLayer_gates.0")},
            "convLayer_gates_norm": _norm(sd, f"{ds}.convLayer_gates.1"),
        }
    for i in range(1, num_residual_blocks + 1):
        rl = f"residualLayer{i}"
        p[rl] = {
            "conv1d_layer": {"conv": _conv1d(sd, f"{rl}.conv1d_layer.0")},
            "conv1d_layer_norm": _norm(sd, f"{rl}.conv1d_layer.1"),
            "conv_layer_gates": {"conv": _conv1d(sd, f"{rl}.conv_layer_gates.0")},
            "conv_layer_gates_norm": _norm(sd, f"{rl}.conv_layer_gates.1"),
            "conv1d_out_layer": {"conv": _conv1d(sd, f"{rl}.conv1d_out_layer.0")},
            "conv1d_out_layer_norm": _norm(sd, f"{rl}.conv1d_out_layer.1"),
        }
    return {"params": p}


def discriminator_params_from_torch(sd: Mapping, include_dead: bool = True) -> Dict:
    """Map a reference Discriminator state_dict to our flax params tree."""
    p: Dict = {
        "convLayer1": {"conv": _conv2d(sd, "convLayer1.0")},
        "outputConvLayer": {"conv": _conv2d(sd, "outputConvLayer.0")},
    }
    for ds in ("downSample1", "downSample2", "downSample3"):
        p[ds] = {
            "convLayer": {"conv": _conv2d(sd, f"{ds}.0")},
            "norm": _norm(sd, f"{ds}.1"),
        }
    if include_dead:
        dead_conv = _conv2d(sd, "downSample4.0")
        dead_norm = _norm(sd, "downSample4.1")
        p["downSample4_conv_kernel"] = dead_conv["kernel"]
        p["downSample4_conv_bias"] = dead_conv["bias"]
        p["downSample4_norm_scale"] = dead_norm["scale"]
        p["downSample4_norm_bias"] = dead_norm["bias"]
    return {"params": p}


def generator_params_to_torch(params: Mapping, num_residual_blocks: int = 6) -> Dict:
    """Inverse mapping: flax Generator params -> reference state_dict (numpy)."""
    p = params["params"]
    sd: Dict = {}

    def put2d(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def put1d(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["kernel"]).transpose(2, 1, 0)
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def putn(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["scale"])
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    put2d("conv1", p["conv1"]["conv"])
    put2d("conv1_gates", p["conv1_gates"]["conv"])
    for ds in ("downSample1", "downSample2"):
        put2d(f"{ds}.convLayer.0", p[ds]["convLayer"]["conv"])
        putn(f"{ds}.convLayer.1", p[ds]["convLayer_norm"])
        put2d(f"{ds}.convLayer_gates.0", p[ds]["convLayer_gates"]["conv"])
        putn(f"{ds}.convLayer_gates.1", p[ds]["convLayer_gates_norm"])
    put1d("conv2dto1dLayer", p["conv2dto1dLayer"]["conv"])
    putn("conv2dto1dLayer_tfan", p["conv2dto1dLayer_tfan"])
    for i in range(1, num_residual_blocks + 1):
        rl = f"residualLayer{i}"
        put1d(f"{rl}.conv1d_layer.0", p[rl]["conv1d_layer"]["conv"])
        putn(f"{rl}.conv1d_layer.1", p[rl]["conv1d_layer_norm"])
        put1d(f"{rl}.conv_layer_gates.0", p[rl]["conv_layer_gates"]["conv"])
        putn(f"{rl}.conv_layer_gates.1", p[rl]["conv_layer_gates_norm"])
        put1d(f"{rl}.conv1d_out_layer.0", p[rl]["conv1d_out_layer"]["conv"])
        putn(f"{rl}.conv1d_out_layer.1", p[rl]["conv1d_out_layer_norm"])
    put1d("conv1dto2dLayer", p["conv1dto2dLayer"]["conv"])
    putn("conv1dto2dLayer_tfan", p["conv1dto2dLayer_tfan"])
    put2d("upSample1.0", p["upSample1_conv"]["conv"])
    putn("upSample1.2", p["upSample1_norm"])
    put2d("upSample2.0", p["upSample2_conv"]["conv"])
    putn("upSample2.2", p["upSample2_norm"])
    put2d("lastConvLayer", p["lastConvLayer"]["conv"])
    return sd


def load_pth_tar(path: str):
    """Read a reference ``.pth.tar`` checkpoint; returns (state_dict, epoch).

    Checkpoint layout per /root/reference/saver/model_saver.py:66-72:
    {'ckpt_info': {'epoch': N}, 'model_state': state_dict, 'optimizer': ...}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["model_state"], ckpt.get("ckpt_info", {}).get("epoch")
