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
            "fasterrcnn", arch="resnet50", num_regions=4, image_size=128, **SMALL
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


class TestConverters:
    def test_torchvision_resnet_conversion_structure(self):
        """Converter consumes a real torchvision-naming state dict (fabricated
        shapes) and produces params accepted by the flax trunk."""
        import torch

        from multimodal_classification_tpu.extractors.backbones.resnet import (
            STAGE_BLOCKS,
            ResNetTrunk,
        )
        from multimodal_classification_tpu.extractors.convert import (
            convert_torchvision_resnet,
            merge_into,
        )

        blocks = STAGE_BLOCKS["resnet50"]
        sd = {}
        sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{stat}"] = torch.randn(64)
        widths = (64, 128, 256, 512)
        in_ch = 64
        for stage in range(1, 5):
            w = widths[stage - 1]
            for b in range(blocks[stage - 1]):
                pre = f"layer{stage}.{b}"
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
