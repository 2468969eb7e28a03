"""Extractor tests: registry coverage, batched shapes/contracts, static
proposal parity with the reference algorithm, converter structure, and the
extractor-backed feature store."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_classification_tpu.registry import (
    get_feature_extractor,
    list_available_extractors,
)


SMALL = dict(dtype="float32")


def _check_contract(extractor, batch=2):
    params = extractor.init_params(jax.random.key(0))
    h, w = extractor.image_size
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, h, w, 3)), jnp.float32)
    feats, spatial = extractor.extract_batch(params, imgs)
    assert feats.shape == (batch, extractor.num_regions, extractor.feature_dim)
    assert spatial.shape == (batch, extractor.num_regions, 5)
    f, s = np.asarray(feats), np.asarray(spatial)
    assert np.all(np.isfinite(f)) and np.all(np.isfinite(s))
    assert s.min() >= -1e-6 and s.max() <= 1.0 + 1e-6
    return f, s


class TestRegistry:
    def test_all_reference_extractors_registered(self):
        names = set(list_available_extractors())
        for required in [
            "resnet", "resnet152_roi", "resnet_vg", "dinov2", "dinov2_multilayer",
            "clip", "fasterrcnn", "fasterrcnn_resnet152", "fasterrcnn_vg",
            "fasterrcnn_vg_rpn", "grid_x152", "grid_x152_standard",
        ]:
            assert required in names, required


class TestGridExtractors:
    def test_resnet_grid_contract(self):
        ex = get_feature_extractor("resnet", arch="resnet50", image_size=64, **SMALL)
        f, s = _check_contract(ex)
        # grid spatial areas sum to 1
        np.testing.assert_allclose(s[0, :, 4].sum(), 1.0, atol=1e-5)

    def test_resnet_vg_uses_resnet101(self):
        ex = get_feature_extractor("resnet_vg", image_size=64, **SMALL)
        assert ex.arch == "resnet101"


class TestROIExtractor:
    def test_static_proposals_match_reference_algorithm(self):
        """Our static proposal selection must replicate the reference's
        multi-scale sweep + NMS-diverse selection (resnet152_roi.py:208-293)."""
        import torch

        from multimodal_classification_tpu.extractors.resnet_roi import (
            multi_scale_proposals,
            select_proposals,
        )
        from tests.test_ops import _nms_naive

        boxes = multi_scale_proposals(600, 600)
        assert len(boxes) > 36
        # replicate the torch reference scoring/selection in numpy
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) / (600 * 600)
        scores = 1.0 - np.abs(areas - 0.15)
        keep = _nms_naive(boxes, scores, 0.5)
        want = boxes[keep[:36]] if len(keep) >= 36 else None
        got = select_proposals(600, 600, 36)
        assert got.shape == (36, 4)
        if want is not None and len(want) == 36:
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_roi_extractor_contract(self):
        ex = get_feature_extractor(
            "resnet152_roi", num_regions=4, image_size=64, pool_size=7, **SMALL
        )
        _check_contract(ex, batch=1)


class TestViTExtractors:
    def test_dinov2_interpolate(self):
        ex = get_feature_extractor(
            "dinov2", model_size="small", num_regions=4, image_size=56, **SMALL
        )
        _check_contract(ex)

    def test_dinov2_attention_selection(self):
        ex = get_feature_extractor(
            "dinov2", model_size="small", num_regions=4, image_size=56,
            selection="attention", **SMALL
        )
        f, s = _check_contract(ex)
        # attention-selected patches: spatial boxes are per-patch (distinct)
        assert len(np.unique(s[0], axis=0)) > 1

    @pytest.mark.parametrize("fusion", ["concat", "weighted_sum", "attention"])
    def test_dinov2_multilayer_fusions(self, fusion):
        ex = get_feature_extractor(
            "dinov2_multilayer", model_size="small", num_regions=4, image_size=56,
            fusion=fusion, layers=(1, 2), **SMALL
        )
        _check_contract(ex, batch=1)

    def test_clip_extractor(self):
        ex = get_feature_extractor("clip", num_regions=4, image_size=64, **SMALL)
        _check_contract(ex)


class TestFRCNNExtractors:
    def test_fasterrcnn_fpn_contract(self):
        ex = get_feature_extractor(
            "fasterrcnn", arch="resnet50", num_regions=4, image_size=128,
            rpn_post_nms_top_n=32, det_pre_nms=32, **SMALL
        )
        _check_contract(ex, batch=1)

    def test_vg_contract(self):
        ex = get_feature_extractor(
            "fasterrcnn_vg", num_regions=4, image_size=96, num_candidates=40, **SMALL
        )
        _check_contract(ex, batch=1)

    def test_vg_rpn_contract(self):
        ex = get_feature_extractor(
            "fasterrcnn_vg_rpn", num_regions=4, image_size=96,
            pre_nms_top_n=64, post_nms_top_n=16, **SMALL
        )
        _check_contract(ex, batch=1)

    def test_vg_rpn_non_divisible_image_size(self):
        """Regression: anchors must match the actual conv-rounded feature-map
        size, not image_size//16 (e.g. 76 → C4 5×5, but 76//16 = 4)."""
        ex = get_feature_extractor(
            "fasterrcnn_vg_rpn", num_regions=4, image_size=76,
            pre_nms_top_n=32, post_nms_top_n=8, **SMALL
        )
        _check_contract(ex, batch=1)

    def test_x152_contract(self):
        ex = get_feature_extractor(
            "grid_x152", num_regions=8, image_size=96, **SMALL
        )
        _check_contract(ex, batch=1)


def _fabricate_tv_resnet(arch="resnet50", prefix=""):
    """Fabricated torchvision resnet state dict with the exact key layout."""
    import torch

    from multimodal_classification_tpu.extractors.backbones.resnet import STAGE_BLOCKS

    blocks = STAGE_BLOCKS[arch]
    sd = {}
    sd[f"{prefix}conv1.weight"] = torch.randn(64, 3, 7, 7)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{prefix}bn1.{stat}"] = torch.randn(64)
    widths = (64, 128, 256, 512)
    in_ch = 64
    for stage in range(1, 5):
        w = widths[stage - 1]
        for b in range(blocks[stage - 1]):
            pre = f"{prefix}layer{stage}.{b}"
            c_in = in_ch if b == 0 else w * 4
            sd[f"{pre}.conv1.weight"] = torch.randn(w, c_in, 1, 1)
            sd[f"{pre}.conv2.weight"] = torch.randn(w, w, 3, 3)
            sd[f"{pre}.conv3.weight"] = torch.randn(w * 4, w, 1, 1)
            for i, ch in ((1, w), (2, w), (3, w * 4)):
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.bn{i}.{stat}"] = torch.randn(ch)
            if b == 0:
                sd[f"{pre}.downsample.0.weight"] = torch.randn(w * 4, c_in, 1, 1)
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.downsample.1.{stat}"] = torch.randn(w * 4)
        in_ch = w * 4
    return sd


def _fabricate_frcnn_v2_sd():
    """Fabricated fasterrcnn_resnet50_fpn_v2 COCO state dict — exact
    torchvision v2 key layout (backbone.body/backbone.fpn.{inner,layer}_
    blocks.N.{0,1}/rpn.head.conv.{0,1}.0/roi_heads.box_head.{0-3,5}/
    roi_heads.box_predictor)."""
    import torch

    sd = _fabricate_tv_resnet("resnet50", prefix="backbone.body.")
    chans = (256, 512, 1024, 2048)
    for i in range(4):
        sd[f"backbone.fpn.inner_blocks.{i}.0.weight"] = torch.randn(256, chans[i], 1, 1)
        sd[f"backbone.fpn.layer_blocks.{i}.0.weight"] = torch.randn(256, 256, 3, 3)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"backbone.fpn.inner_blocks.{i}.1.{stat}"] = torch.randn(256)
            sd[f"backbone.fpn.layer_blocks.{i}.1.{stat}"] = torch.randn(256)
    for j in (0, 1):
        sd[f"rpn.head.conv.{j}.0.weight"] = torch.randn(256, 256, 3, 3)
        sd[f"rpn.head.conv.{j}.0.bias"] = torch.randn(256)
    sd["rpn.head.cls_logits.weight"] = torch.randn(3, 256, 1, 1)
    sd["rpn.head.cls_logits.bias"] = torch.randn(3)
    sd["rpn.head.bbox_pred.weight"] = torch.randn(12, 256, 1, 1)
    sd["rpn.head.bbox_pred.bias"] = torch.randn(12)
    for j in range(4):
        sd[f"roi_heads.box_head.{j}.0.weight"] = torch.randn(256, 256, 3, 3)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"roi_heads.box_head.{j}.1.{stat}"] = torch.randn(256)
    sd["roi_heads.box_head.5.weight"] = torch.randn(1024, 256 * 7 * 7)
    sd["roi_heads.box_head.5.bias"] = torch.randn(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = torch.randn(91, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = torch.randn(91)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = torch.randn(364, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = torch.randn(364)
    return sd


class TestConverters:
    def test_torchvision_resnet_conversion_structure(self):
        """Converter consumes a real torchvision-naming state dict (fabricated
        shapes) and produces params accepted by the flax trunk."""
        from multimodal_classification_tpu.extractors.backbones.resnet import (
            STAGE_BLOCKS,
            ResNetTrunk,
        )
        from multimodal_classification_tpu.extractors.convert import (
            convert_torchvision_resnet,
            merge_into,
        )

        blocks = STAGE_BLOCKS["resnet50"]
        sd = _fabricate_tv_resnet("resnet50")
        loaded = convert_torchvision_resnet(sd, "resnet50", stages=4)
        trunk = ResNetTrunk(blocks=blocks, stages=4, dtype=jnp.float32)
        init = trunk.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
        merged, n = merge_into(init, loaded)
        total = len(jax.tree.leaves(init))
        assert n == total, f"{n} != {total}"

    def test_vg_rcnn_remap(self):
        import torch

        from multimodal_classification_tpu.extractors.convert import convert_vg_rcnn

        sd = {
            "RCNN_base.0.weight": torch.randn(64, 3, 7, 7),
            # RCNN_top is Sequential(layer4): RCNN_top.0.<block>.<...>
            "RCNN_top.0.0.conv1.weight": torch.randn(512, 1024, 1, 1),
        }
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"RCNN_base.1.{stat}"] = torch.randn(64)
        trunk, top = convert_vg_rcnn(sd)
        assert "conv1" in trunk and "bn1" in trunk
        assert "layer4" in top
        assert top["layer4"]["block_0"]["conv1"]["kernel"].shape == (1, 1, 1024, 512)

    def test_frcnn_v2_full_load(self, tmp_path):
        """Every leaf of the FPN extractor's detector (core + box_head +
        box_predictor) loads from a fabricated checkpoint with the exact
        torchvision fasterrcnn_resnet50_fpn_v2 layout (the COCO checkpoint
        the reference downloads, fasterrcnn.py:36-38), and the output
        changes."""
        import torch

        from multimodal_classification_tpu.extractors.frcnn import (
            FasterRCNNFPNExtractor,
        )

        sd = _fabricate_frcnn_v2_sd()
        # small weights so the detector produces finite activations
        sd = {k: v * 0.02 if v.dim() > 1 else v * 0.0 for k, v in sd.items()}
        ckpt = tmp_path / "frcnn_v2.pth"
        torch.save(sd, ckpt)

        kw = dict(arch="resnet50", num_regions=4, image_size=128,
                  rpn_post_nms_top_n=32, det_pre_nms=32, dtype="float32")
        ex = FasterRCNNFPNExtractor(checkpoint=str(ckpt), **kw)
        p = ex.init_params(jax.random.key(0))
        # full coverage of the detector params (feat_proj is the reference's
        # own untrained projection — excluded by design)
        init = FasterRCNNFPNExtractor(**kw).init_params(jax.random.key(0))
        from multimodal_classification_tpu.extractors.convert import (
            convert_torchvision_frcnn_v2,
        )
        loaded = convert_torchvision_frcnn_v2(
            {k: v.numpy() for k, v in sd.items()}, arch="resnet50"
        )
        for part in ("core", "box_head", "box_predictor"):
            n_leaves = len(jax.tree.leaves(init[part]))
            n_conv = len(jax.tree.leaves(loaded[part]))
            assert n_conv == n_leaves, f"{part}: {n_conv} != {n_leaves}"
        # spot-check orientation: body conv1 + box head fc permutation
        np.testing.assert_allclose(
            np.asarray(p["core"]["body"]["conv1"]["kernel"]),
            sd["backbone.body.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        )
        w = sd["roi_heads.box_head.5.weight"].numpy()
        want = w.reshape(1024, 256, 7, 7).transpose(0, 2, 3, 1).reshape(1024, -1).T
        np.testing.assert_allclose(np.asarray(p["box_head"]["fc"]["kernel"]), want)

        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)), jnp.float32
        )
        f0, _ = FasterRCNNFPNExtractor(**kw).extract_batch(init, imgs)
        f1, _ = ex.extract_batch(p, imgs)
        assert not np.allclose(np.asarray(f0), np.asarray(f1))

    def test_frcnn_r152_graft_skips_body(self):
        """arch=resnet152 + the R50 checkpoint grafts FPN/RPN/ROI-head only
        (the reference's shape-matched copy, fasterrcnn_resnet152.py:237-280)."""
        from multimodal_classification_tpu.extractors.convert import (
            convert_torchvision_frcnn_v2,
        )

        sd = {k: v.numpy() for k, v in _fabricate_frcnn_v2_sd().items()}
        loaded = convert_torchvision_frcnn_v2(sd, arch="resnet152")
        assert "body" not in loaded["core"]
        assert "fpn" in loaded["core"] and "rpn_head" in loaded["core"]
        assert "box_head" in loaded and "box_predictor" in loaded

    def test_detectron2_conversion(self):
        """detectron2 X-152++-style checkpoint (stem/res2-4/roi_heads.res5/
        proposal_generator.rpn_head keys with attached .norm) converts into
        the X152 extractor param tree (reference grid_feats_x152.py:29-96)."""
        import torch

        from multimodal_classification_tpu.extractors.convert import (
            convert_detectron2_rcnn,
        )

        def conv_norm(sd, key, out_ch, in_ch, k):
            sd[f"{key}.weight"] = torch.randn(out_ch, in_ch, k, k)
            sd[f"{key}.norm.weight"] = torch.randn(out_ch)
            sd[f"{key}.norm.bias"] = torch.randn(out_ch)
            sd[f"{key}.norm.running_mean"] = torch.randn(out_ch)
            sd[f"{key}.norm.running_var"] = torch.rand(out_ch) + 0.5

        sd = {}
        conv_norm(sd, "backbone.stem.conv1", 64, 3, 7)
        # one block per stage is enough to exercise the mapping
        conv_norm(sd, "backbone.res2.0.conv1", 64, 64, 1)
        conv_norm(sd, "backbone.res2.0.conv2", 64, 64, 3)
        conv_norm(sd, "backbone.res2.0.conv3", 256, 64, 1)
        conv_norm(sd, "backbone.res2.0.shortcut", 256, 64, 1)
        conv_norm(sd, "roi_heads.res5.0.conv1", 512, 1024, 1)
        sd["proposal_generator.rpn_head.conv.weight"] = torch.randn(1024, 1024, 3, 3)
        sd["proposal_generator.rpn_head.conv.bias"] = torch.randn(1024)
        sd["proposal_generator.rpn_head.objectness_logits.weight"] = torch.randn(15, 1024, 1, 1)
        sd["proposal_generator.rpn_head.objectness_logits.bias"] = torch.randn(15)
        sd["proposal_generator.rpn_head.anchor_deltas.weight"] = torch.randn(60, 1024, 1, 1)
        sd["proposal_generator.rpn_head.anchor_deltas.bias"] = torch.randn(60)

        out = convert_detectron2_rcnn(sd)
        assert out["base"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert "bn1" in out["base"]
        blk = out["base"]["layer1"]["block_0"]
        assert blk["downsample_conv"]["kernel"].shape == (1, 1, 64, 256)
        assert "downsample_bn" in blk and "bn2" in blk
        assert out["top"]["layer4"]["block_0"]["conv1"]["kernel"].shape == (1, 1, 1024, 512)
        assert out["rpn"]["conv"]["kernel"].shape == (3, 3, 1024, 1024)
        assert out["rpn"]["cls_logits"]["kernel"].shape == (1, 1, 1024, 15)
        assert out["rpn"]["bbox_pred"]["kernel"].shape == (1, 1, 1024, 60)

    def test_vg_heads_conversion(self):
        """The trained VG heads (RPN + 1601-way classifier) convert with the
        exact upstream key layout (reference fasterrcnn_vg_rpn.py:242-288
        loads RCNN_rpn.RPN_* and RCNN_cls_score by direct key match)."""
        import torch

        from multimodal_classification_tpu.extractors.convert import convert_vg_heads

        sd = {
            "RCNN_rpn.RPN_Conv.weight": torch.randn(512, 1024, 3, 3),
            "RCNN_rpn.RPN_Conv.bias": torch.randn(512),
            "RCNN_rpn.RPN_cls_score.weight": torch.randn(24, 512, 1, 1),
            "RCNN_rpn.RPN_cls_score.bias": torch.randn(24),
            "RCNN_rpn.RPN_bbox_pred.weight": torch.randn(48, 512, 1, 1),
            "RCNN_rpn.RPN_bbox_pred.bias": torch.randn(48),
            "RCNN_cls_score.weight": torch.randn(1601, 2048),
            "RCNN_cls_score.bias": torch.randn(1601),
        }
        heads = convert_vg_heads(sd)
        assert heads["rpn"]["RPN_Conv"]["kernel"].shape == (3, 3, 1024, 512)
        assert heads["rpn"]["RPN_cls_score"]["kernel"].shape == (1, 1, 512, 24)
        assert heads["rpn"]["RPN_bbox_pred"]["kernel"].shape == (1, 1, 512, 48)
        assert heads["cls"]["cls_score"]["kernel"].shape == (2048, 1601)
        np.testing.assert_allclose(
            heads["cls"]["cls_score"]["kernel"],
            sd["RCNN_cls_score.weight"].numpy().T,
        )

    def test_vg_rpn_checkpoint_roundtrip(self, tmp_path):
        """A fabricated VG checkpoint's RPN + classifier weights actually land
        in the extractor params and change its output (the reference loads
        them via load_vg_checkpoint, fasterrcnn_vg_rpn.py:242-288)."""
        import torch

        from multimodal_classification_tpu.extractors.frcnn import (
            FasterRCNNVGRPNExtractor,
        )

        g = torch.Generator().manual_seed(0)
        sd = {
            "RCNN_rpn.RPN_Conv.weight": torch.randn(512, 1024, 3, 3, generator=g) * 0.05,
            "RCNN_rpn.RPN_Conv.bias": torch.randn(512, generator=g) * 0.1,
            "RCNN_rpn.RPN_cls_score.weight": torch.randn(24, 512, 1, 1, generator=g) * 0.1,
            "RCNN_rpn.RPN_cls_score.bias": torch.randn(24, generator=g),
            "RCNN_rpn.RPN_bbox_pred.weight": torch.randn(48, 512, 1, 1, generator=g) * 0.02,
            "RCNN_rpn.RPN_bbox_pred.bias": torch.randn(48, generator=g) * 0.3,
            "RCNN_cls_score.weight": torch.randn(1601, 2048, generator=g) * 0.05,
            "RCNN_cls_score.bias": torch.randn(1601, generator=g),
        }
        ckpt = tmp_path / "vg.pth"
        torch.save(sd, ckpt)

        kw = dict(num_regions=4, image_size=96, pre_nms_top_n=64,
                  post_nms_top_n=8, dtype="float32")
        ext_rand = FasterRCNNVGRPNExtractor(**kw)
        ext_ckpt = FasterRCNNVGRPNExtractor(checkpoint=str(ckpt), **kw)
        p_rand = ext_rand.init_params(jax.random.key(0))
        p_ckpt = ext_ckpt.init_params(jax.random.key(0))

        np.testing.assert_allclose(
            np.asarray(p_ckpt["rpn"]["RPN_Conv"]["kernel"]),
            sd["RCNN_rpn.RPN_Conv.weight"].numpy().transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            np.asarray(p_ckpt["cls"]["cls_score"]["kernel"]),
            sd["RCNN_cls_score.weight"].numpy().T,
        )
        assert not np.allclose(
            np.asarray(p_rand["rpn"]["RPN_Conv"]["kernel"]),
            np.asarray(p_ckpt["rpn"]["RPN_Conv"]["kernel"]),
        )

        rng = np.random.default_rng(3)
        imgs = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
        f_rand, _ = ext_rand.extract_batch(p_rand, jnp.asarray(imgs))
        f_ckpt, _ = ext_ckpt.extract_batch(p_ckpt, jnp.asarray(imgs))
        assert not np.allclose(np.asarray(f_rand), np.asarray(f_ckpt))


class TestExtractorStore:
    def test_precompute_and_cache(self, tmp_path):
        from PIL import Image

        from multimodal_classification_tpu.extractors.store import ExtractorFeatureStore

        img_dir = tmp_path / "img"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        ids = ["100", "101", "102"]
        for i in ids:
            arr = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{i}.png")

        store = ExtractorFeatureStore(
            "resnet", image_root=str(tmp_path), max_regions=4,
            cache_path=str(tmp_path / "cache.h5"),
            extractor_kwargs={"arch": "resnet50", "image_size": 64, "grid_size": 2,
                              "dtype": "float32"},
            batch_size=2,
        )
        n = store.precompute(ids)
        assert n == 3
        f, s = store.get("100")
        assert f.shape == (4, 2048) and s.shape == (4, 5)
        assert store.get("missing") is None
        # disk cache round-trips
        store2 = ExtractorFeatureStore(
            "resnet", image_root=str(tmp_path), max_regions=4,
            cache_path=str(tmp_path / "cache.h5"),
            extractor_kwargs={"arch": "resnet50", "image_size": 64, "grid_size": 2,
                              "dtype": "float32"},
        )
        f2, _ = store2.get("100")
        np.testing.assert_allclose(f2, f, rtol=1e-5)
