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


def _linear(sd, key):
    if key + ".weight" not in sd:
        return None
    out = {"kernel": _np(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _conv_b(sd, key):
    """Conv with bias (torch [out,in,kh,kw] → flax [kh,kw,in,out])."""
    c = _conv(sd, key)
    if c is not None and key + ".bias" in sd:
        c["bias"] = _np(sd[key + ".bias"])
    return c


def convert_vg_heads(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """VG bottom-up-attention checkpoint → the trained heads the trunk/top
    converter drops: the 1601-way classifier (``RCNN_cls_score``, reference
    fasterrcnn_vg.py:372-397 scores proposals with it) and the trained RPN
    (``RCNN_rpn.RPN_Conv``/``RPN_cls_score``/``RPN_bbox_pred``, reference
    fasterrcnn_vg_rpn.py:34-105 + load_vg_checkpoint :242-288).

    Returns {"cls": VGClassifierHead params, "rpn": VGRPN params}; either key
    absent if the checkpoint lacks it.
    """
    sd = dict(state_dict)
    out: Dict[str, Any] = {}
    cls = _linear(sd, "RCNN_cls_score")
    if cls is not None:
        out["cls"] = {"cls_score": cls}
    rpn: Dict[str, Any] = {}
    for name in ("RPN_Conv", "RPN_cls_score", "RPN_bbox_pred"):
        # checkpoints carry either the bare key or the RCNN_rpn. prefix
        c = _conv_b(sd, f"RCNN_rpn.{name}") or _conv_b(sd, name)
        _put(rpn, name, c)
    if rpn:
        out["rpn"] = rpn
    return out


def convert_torchvision_frcnn_v2(
    state_dict: Mapping[str, Any], arch: str = "resnet50"
) -> Dict[str, Any]:
    """torchvision ``fasterrcnn_resnet50_fpn_v2`` COCO checkpoint →
    FasterRCNNFPNExtractor params (reference fasterrcnn.py:36-38 downloads
    exactly this; fasterrcnn_resnet152.py:237-280 grafts its RPN/ROI-head
    weights onto an R152 backbone by shape-matched copy).

    Returns {"core": {body?, fpn, rpn_head}, "box_head": ..., "box_predictor":
    ...}. ``body`` is included only when ``arch == "resnet50"`` (for other
    archs the body keys can't shape-match — the reference's graft skips them
    the same way).
    """
    sd = {k: v for k, v in state_dict.items()}
    core: Dict[str, Any] = {}
    if arch == "resnet50":
        body = convert_torchvision_resnet(sd, "resnet50", stages=4,
                                          prefix="backbone.body.")
        if body:
            core["body"] = body

    # FPN v2: inner/layer blocks are Conv2dNormActivation (conv .0 + BN .1)
    fpn: Dict[str, Any] = {}
    for i, cn in enumerate(("c2", "c3", "c4", "c5")):
        for tv_name, our_name in (("inner_blocks", "inner"), ("layer_blocks", "layer")):
            blk: Dict[str, Any] = {}
            _put(blk, "conv", _conv(sd, f"backbone.fpn.{tv_name}.{i}.0"))
            _put(blk, "bn", _bn(sd, f"backbone.fpn.{tv_name}.{i}.1"))
            if blk:
                fpn[f"{our_name}_{cn}"] = blk
    if fpn:
        core["fpn"] = fpn

    # RPN head v2: conv = Sequential of 2 Conv2dNormActivation(norm=None)
    # → plain conv-with-bias at rpn.head.conv.{j}.0
    rpn: Dict[str, Any] = {}
    for j in (0, 1):
        _put(rpn, f"conv{j}", _conv_b(sd, f"rpn.head.conv.{j}.0"))
    _put(rpn, "cls_logits", _conv_b(sd, "rpn.head.cls_logits"))
    _put(rpn, "bbox_pred", _conv_b(sd, "rpn.head.bbox_pred"))
    if rpn:
        core["rpn_head"] = rpn

    out: Dict[str, Any] = {"core": core}

    # box head (FastRCNNConvFCHead): 4 conv blocks + Flatten(4) + Linear(5).
    # The Linear consumes torch's (C, H, W) flatten; our head flattens NHWC →
    # permute the weight columns once here.
    bh: Dict[str, Any] = {}
    for j in range(4):
        blk = {}
        _put(blk, "conv", _conv(sd, f"roi_heads.box_head.{j}.0"))
        _put(blk, "bn", _bn(sd, f"roi_heads.box_head.{j}.1"))
        if blk:
            bh[f"conv{j}"] = blk
    if "roi_heads.box_head.5.weight" in sd:
        w = _np(sd["roi_heads.box_head.5.weight"])  # [1024, 256*7*7] (C,H,W)
        w = w.reshape(w.shape[0], 256, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        bh["fc"] = {"kernel": w.T, "bias": _np(sd["roi_heads.box_head.5.bias"])}
    if bh:
        out["box_head"] = bh

    bp: Dict[str, Any] = {}
    _put(bp, "cls_score", _linear(sd, "roi_heads.box_predictor.cls_score"))
    _put(bp, "bbox_pred", _linear(sd, "roi_heads.box_predictor.bbox_pred"))
    if bp:
        out["box_predictor"] = bp
    return out


def _d2_conv_bn(sd, key) -> Tuple[Optional[dict], Optional[dict]]:
    """detectron2 conv-with-attached-norm (``<key>.weight`` +
    ``<key>.norm.{weight,bias,running_mean,running_var}``)."""
    c = _conv(sd, key)
    b = None
    if key + ".norm.weight" in sd:
        b = {
            "scale": _np(sd[key + ".norm.weight"]),
            "bias": _np(sd[key + ".norm.bias"]),
            "mean": _np(sd[key + ".norm.running_mean"]),
            "var": _np(sd[key + ".norm.running_var"]),
        }
    return c, b


def convert_detectron2_rcnn(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """detectron2 GeneralizedRCNN checkpoint (the X-152++ grid-features model,
    reference grid_feats_x152.py:29-96) → GridFeatsX152Extractor params.

    detectron2 layout: ``backbone.stem.conv1`` + ``backbone.res{2,3,4}.{b}.
    {conv1,conv2,conv3,shortcut}`` (norms attached to each conv as ``.norm``),
    ``roi_heads.res5.{b}.*`` for the C5 top, ``proposal_generator.rpn_head.
    {conv,objectness_logits,anchor_deltas}``. Returns {"base", "top", "rpn"}.
    """
    sd = dict(state_dict)
    # d2 checkpoints may carry a "model" wrapper and numpy values already
    base: Dict[str, Any] = {}
    c, b = _d2_conv_bn(sd, "backbone.stem.conv1")
    _put(base, "conv1", c)
    _put(base, "bn1", b)
    for stage, res in ((1, "res2"), (2, "res3"), (3, "res4")):
        layer: Dict[str, Any] = {}
        bidx = 0
        while f"backbone.{res}.{bidx}.conv1.weight" in sd:
            blk: Dict[str, Any] = {}
            for i in (1, 2, 3):
                c, b = _d2_conv_bn(sd, f"backbone.{res}.{bidx}.conv{i}")
                _put(blk, f"conv{i}", c)
                _put(blk, f"bn{i}", b)
            c, b = _d2_conv_bn(sd, f"backbone.{res}.{bidx}.shortcut")
            _put(blk, "downsample_conv", c)
            _put(blk, "downsample_bn", b)
            layer[f"block_{bidx}"] = blk
            bidx += 1
        if layer:
            base[f"layer{stage}"] = layer
    out: Dict[str, Any] = {}
    if base:
        out["base"] = base

    top_layer: Dict[str, Any] = {}
    bidx = 0
    while f"roi_heads.res5.{bidx}.conv1.weight" in sd:
        blk = {}
        for i in (1, 2, 3):
            c, b = _d2_conv_bn(sd, f"roi_heads.res5.{bidx}.conv{i}")
            _put(blk, f"conv{i}", c)
            _put(blk, f"bn{i}", b)
        c, b = _d2_conv_bn(sd, f"roi_heads.res5.{bidx}.shortcut")
        _put(blk, "downsample_conv", c)
        _put(blk, "downsample_bn", b)
        top_layer[f"block_{bidx}"] = blk
        bidx += 1
    if top_layer:
        out["top"] = {"layer4": top_layer}

    rpn: Dict[str, Any] = {}
    _put(rpn, "conv", _conv_b(sd, "proposal_generator.rpn_head.conv"))
    _put(rpn, "cls_logits", _conv_b(sd, "proposal_generator.rpn_head.objectness_logits"))
    _put(rpn, "bbox_pred", _conv_b(sd, "proposal_generator.rpn_head.anchor_deltas"))
    if rpn:
        out["rpn"] = rpn
    return out


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
