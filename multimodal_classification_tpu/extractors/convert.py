"""Weight conversion: torchvision/VG torch state dicts → Flax extractor params.

Replaces the reference's per-extractor fuzzy loaders (torch.hub downloads +
key remapping, e.g. fasterrcnn_vg.py:103-170 ``RCNN_top.0.``→``RCNN_top.``)
with explicit mappings. Conventions: torch conv [out,in,kh,kw] → flax
[kh,kw,in,out]; BatchNorm running stats → FrozenBatchNorm mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from multimodal_classification_tpu.extractors.backbones.resnet import STAGE_BLOCKS


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def _conv(sd, key):
    if key + ".weight" not in sd:
        return None
    return {"kernel": np.transpose(_np(sd[key + ".weight"]), (2, 3, 1, 0))}


def _bn(sd, key):
    if key + ".weight" not in sd:
        return None
    return {
        "scale": _np(sd[key + ".weight"]),
        "bias": _np(sd[key + ".bias"]),
        "mean": _np(sd[key + ".running_mean"]),
        "var": _np(sd[key + ".running_var"]),
    }


def _put(out: Dict[str, Any], name: str, value):
    if value is not None:
        out[name] = value


def _bottleneck(sd, prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in (1, 2, 3):
        _put(out, f"conv{i}", _conv(sd, f"{prefix}.conv{i}"))
        _put(out, f"bn{i}", _bn(sd, f"{prefix}.bn{i}"))
    _put(out, "downsample_conv", _conv(sd, f"{prefix}.downsample.0"))
    _put(out, "downsample_bn", _bn(sd, f"{prefix}.downsample.1"))
    return out


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any],
    arch: str = "resnet152",
    stages: int = 4,
    prefix: str = "",
) -> Dict[str, Any]:
    """torchvision resnet state dict → ResNetTrunk params (stages 1..N).
    ``prefix`` strips a leading namespace (e.g. "backbone.body.")."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    blocks = STAGE_BLOCKS[arch]
    p: Dict[str, Any] = {}
    _put(p, "conv1", _conv(sd, "conv1"))
    _put(p, "bn1", _bn(sd, "bn1"))
    for stage in range(1, stages + 1):
        layer = {}
        for b in range(blocks[stage - 1]):
            blk = _bottleneck(sd, f"layer{stage}.{b}")
            if blk:
                layer[f"block_{b}"] = blk
        if layer:
            p[f"layer{stage}"] = layer
    return p


def convert_torchvision_resnet_top(
    state_dict: Mapping[str, Any], arch: str = "resnet152", prefix: str = ""
) -> Dict[str, Any]:
    """layer4 only → ResNetTop params (the ROI extractors' 'top' half,
    reference resnet152_roi.py:64-74)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    blocks = STAGE_BLOCKS[arch]
    layer = {}
    for b in range(blocks[3]):
        blk = _bottleneck(sd, f"layer4.{b}")
        if blk:
            layer[f"block_{b}"] = blk
    return {"layer4": layer} if layer else {}


def convert_vg_rcnn(
    state_dict: Mapping[str, Any], arch: str = "resnet101"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """VG bottom-up-attention checkpoint (RCNN_base / RCNN_top structure,
    reference fasterrcnn_vg.py:103-170) → (trunk_params, top_params).

    RCNN_base is Sequential(conv1, bn1, relu, maxpool, layer1, layer2, layer3)
    = indices (0,1,4,5,6); RCNN_top is Sequential(layer4) = index 0 (after the
    reference's ``RCNN_top.0.`` → ``RCNN_top.`` remap).
    """
    sd = dict(state_dict)
    remapped: Dict[str, Any] = {}
    for k, v in sd.items():
        k = k.replace("RCNN_top.0.", "RCNN_top.")
        remapped[k] = v
    base_map = {
        "RCNN_base.0": "conv1", "RCNN_base.1": "bn1",
        "RCNN_base.4": "layer1", "RCNN_base.5": "layer2", "RCNN_base.6": "layer3",
    }
    flat: Dict[str, Any] = {}
    for k, v in remapped.items():
        for old, new in base_map.items():
            if k.startswith(old + "."):
                flat[new + k[len(old):]] = v
        if k.startswith("RCNN_top."):
            # after the remap, keys are RCNN_top.<block>.<rest> (RCNN_top is
            # Sequential(layer4) in the VG checkpoint)
            flat["layer4." + k[len("RCNN_top."):]] = v
    trunk = convert_torchvision_resnet(flat, arch, stages=3)
    top = convert_torchvision_resnet_top(flat, arch)
    return trunk, top


def merge_into(init_params: Dict[str, Any], loaded: Mapping[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Overlay loaded onto init (shape-checked); returns (merged, n_loaded)."""
    from multimodal_classification_tpu.models.convert import merge_params

    merged, n, _total = merge_params(init_params, loaded)
    return merged, n
