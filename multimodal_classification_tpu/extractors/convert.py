"""Weight conversion: torchvision/VG torch state dicts → Flax extractor params.

Replaces the reference's per-extractor fuzzy loaders (torch.hub downloads +
key remapping, e.g. fasterrcnn_vg.py:103-170 ``RCNN_top.0.``→``RCNN_top.``)
with explicit mappings. Conventions: torch conv [out,in,kh,kw] → flax
[kh,kw,in,out]; BatchNorm running stats → FrozenBatchNorm mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

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


def _interp_pos_embed(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """Bilinearly resample a [1, 1+N, W] ViT position table to a new grid
    (DINOv2's interpolate_pos_encoding, done once at conversion time)."""
    n_old = pos.shape[1] - 1
    if n_old + 1 == target_tokens:
        return pos
    g_old = int(round(n_old ** 0.5))
    g_new = int(round((target_tokens - 1) ** 0.5))
    cls, grid = pos[:, :1], pos[:, 1:]
    w = grid.shape[-1]
    img = grid.reshape(1, g_old, g_old, w).transpose(0, 3, 1, 2)
    import jax.numpy as jnp

    from multimodal_classification_tpu.ops.pooling import bilinear_resize

    img = np.asarray(bilinear_resize(jnp.asarray(img), (g_new, g_new), align_corners=False))
    grid = img.transpose(0, 2, 3, 1).reshape(1, g_new * g_new, w)
    return np.concatenate([cls, grid], axis=1)


def convert_dinov2_vit(
    state_dict: Mapping[str, Any], depth: int, target_tokens: Optional[int] = None
) -> Dict[str, Any]:
    """facebookresearch/dinov2 torch-hub state dict → our ViT params
    (reference loads it via torch.hub, dinov2.py:184-220). Layout:
    patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1, attn.qkv,
    attn.proj, ls1.gamma, norm2, mlp.fc1, mlp.fc2, ls2.gamma}, norm."""
    sd = dict(state_dict)
    p: Dict[str, Any] = {}
    if "patch_embed.proj.weight" in sd:
        p["patch_embed"] = {
            "kernel": np.transpose(_np(sd["patch_embed.proj.weight"]), (2, 3, 1, 0)),
            "bias": _np(sd["patch_embed.proj.bias"]),
        }
    if "cls_token" in sd:
        p["cls_token"] = _np(sd["cls_token"]).reshape(1, 1, -1)
    if "pos_embed" in sd:
        pos = _np(sd["pos_embed"])
        if target_tokens is not None:
            pos = _interp_pos_embed(pos, target_tokens)
        p["pos_embed"] = pos
    for i in range(depth):
        b = f"blocks.{i}"
        if f"{b}.attn.qkv.weight" not in sd:
            continue
        blk: Dict[str, Any] = {
            "qkv": {"kernel": _np(sd[f"{b}.attn.qkv.weight"]).T,
                    "bias": _np(sd[f"{b}.attn.qkv.bias"])},
            "proj": {"kernel": _np(sd[f"{b}.attn.proj.weight"]).T,
                     "bias": _np(sd[f"{b}.attn.proj.bias"])},
            "norm1": {"scale": _np(sd[f"{b}.norm1.weight"]),
                      "bias": _np(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{b}.norm2.weight"]),
                      "bias": _np(sd[f"{b}.norm2.bias"])},
            "fc1": {"kernel": _np(sd[f"{b}.mlp.fc1.weight"]).T,
                    "bias": _np(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": _np(sd[f"{b}.mlp.fc2.weight"]).T,
                    "bias": _np(sd[f"{b}.mlp.fc2.bias"])},
        }
        if f"{b}.ls1.gamma" in sd:
            blk["ls1"] = _np(sd[f"{b}.ls1.gamma"])
            blk["ls2"] = _np(sd[f"{b}.ls2.gamma"])
        p[f"block_{i}"] = blk
    if "norm.weight" in sd:
        p["norm"] = {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])}
    return p


def convert_clip_vision_tower(
    state_dict: Mapping[str, Any], depth: int = 12,
    prefix: str = "vision_model.",
) -> Dict[str, Any]:
    """HF CLIPModel vision tower → our ViT params (reference clip.py uses
    transformers CLIPModel). HF layout: embeddings.{patch_embedding,
    class_embedding, position_embedding}, pre_layrnorm, encoder.layers.N.
    {layer_norm1, self_attn.{q,k,v,out}_proj, layer_norm2, mlp.fc1/fc2},
    post_layernorm. The split q/k/v projections are concatenated to our
    fused qkv."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    p: Dict[str, Any] = {}
    if "embeddings.patch_embedding.weight" in sd:
        w = _np(sd["embeddings.patch_embedding.weight"])
        patch = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        # HF CLIP patch conv has no bias; our Conv does — zero it
        patch["bias"] = np.zeros(w.shape[0], np.float32)
        p["patch_embed"] = patch
    if "embeddings.class_embedding" in sd:
        p["cls_token"] = _np(sd["embeddings.class_embedding"]).reshape(1, 1, -1)
    if "embeddings.position_embedding.weight" in sd:
        p["pos_embed"] = _np(sd["embeddings.position_embedding.weight"])[None]
    if "pre_layrnorm.weight" in sd:  # (sic — HF's historical typo)
        p["ln_pre"] = {"scale": _np(sd["pre_layrnorm.weight"]),
                       "bias": _np(sd["pre_layrnorm.bias"])}
    for i in range(depth):
        b = f"encoder.layers.{i}"
        if f"{b}.self_attn.q_proj.weight" not in sd:
            continue
        qw = _np(sd[f"{b}.self_attn.q_proj.weight"]).T
        kw = _np(sd[f"{b}.self_attn.k_proj.weight"]).T
        vw = _np(sd[f"{b}.self_attn.v_proj.weight"]).T
        qb = _np(sd[f"{b}.self_attn.q_proj.bias"])
        kb = _np(sd[f"{b}.self_attn.k_proj.bias"])
        vb = _np(sd[f"{b}.self_attn.v_proj.bias"])
        p[f"block_{i}"] = {
            "qkv": {"kernel": np.concatenate([qw, kw, vw], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "proj": {"kernel": _np(sd[f"{b}.self_attn.out_proj.weight"]).T,
                     "bias": _np(sd[f"{b}.self_attn.out_proj.bias"])},
            "norm1": {"scale": _np(sd[f"{b}.layer_norm1.weight"]),
                      "bias": _np(sd[f"{b}.layer_norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{b}.layer_norm2.weight"]),
                      "bias": _np(sd[f"{b}.layer_norm2.bias"])},
            "fc1": {"kernel": _np(sd[f"{b}.mlp.fc1.weight"]).T,
                    "bias": _np(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": _np(sd[f"{b}.mlp.fc2.weight"]).T,
                    "bias": _np(sd[f"{b}.mlp.fc2.bias"])},
        }
    if "post_layernorm.weight" in sd:
        p["norm"] = {"scale": _np(sd["post_layernorm.weight"]),
                     "bias": _np(sd["post_layernorm.bias"])}
    return p


def merge_into(init_params: Dict[str, Any], loaded: Mapping[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Overlay loaded onto init (shape-checked); returns (merged, n_loaded)."""
    from multimodal_classification_tpu.models.convert import merge_params

    merged, n, _total = merge_params(init_params, loaded)
    return merged, n
