"""Faster R-CNN building-block tests beyond shape contracts: proposal
composition (top-k → decode → clip → min-size → NMS), FPN level assignment,
and multiscale RoIAlign level selection."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_classification_tpu.extractors.frcnn import (
    fpn_level_assign,
    multiscale_roi_align,
    rpn_proposals,
)
from multimodal_classification_tpu.ops.boxes import clip_boxes, decode_deltas, generate_anchors
from tests.test_ops import _nms_naive


class TestRPNProposals:
    def test_composition_matches_naive(self, rng):
        h = w = 8
        a = 3
        anchors = generate_anchors(h, w, stride=16, scales=(32, 64, 128), ratios=(1.0,))
        logits = rng.standard_normal((h, w, a)).astype(np.float32)
        deltas = (rng.standard_normal((h, w, a * 4)) * 0.1).astype(np.float32)
        img_hw = (128, 128)

        boxes, scores, valid = rpn_proposals(
            jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
            img_hw, pre_nms_top_n=64, post_nms_top_n=16, nms_thresh=0.7,
            min_size=1.0,
        )
        got = np.asarray(boxes)[np.asarray(valid)]

        # naive replication
        flat_scores = logits.reshape(-1)
        flat_deltas = deltas.reshape(-1, 4)
        order = np.argsort(-flat_scores, kind="stable")[:64]
        dec = np.asarray(decode_deltas(jnp.asarray(anchors[order]),
                                       jnp.asarray(flat_deltas[order])))
        dec = np.asarray(clip_boxes(jnp.asarray(dec), *img_hw))
        ws, hs = dec[:, 2] - dec[:, 0], dec[:, 3] - dec[:, 1]
        keep_mask = (ws >= 1.0) & (hs >= 1.0)
        masked = np.where(keep_mask, flat_scores[order], -np.inf)
        keep = _nms_naive(dec, masked, 0.7)
        keep = [k for k in keep if np.isfinite(masked[k])][:16]
        want = dec[keep]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_min_size_filter_suppresses_tiny_boxes(self, rng):
        h = w = 4
        anchors = generate_anchors(h, w, stride=16, scales=(2,), ratios=(1.0,))  # 2px anchors
        logits = np.ones((h, w, 1), np.float32)
        deltas = np.zeros((h, w, 4), np.float32)
        _boxes, scores, valid = rpn_proposals(
            jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
            (64, 64), pre_nms_top_n=16, post_nms_top_n=8, min_size=16.0,
        )
        assert not bool(np.asarray(valid).any())  # all proposals < min_size


class TestFPNLevels:
    def test_level_assignment_formula(self):
        # FPN paper: k = floor(4 + log2(sqrt(area)/224)), clipped to [2, 5]
        boxes = jnp.asarray([
            [0, 0, 224, 224],   # sqrt=224 → k=4
            [0, 0, 112, 112],   # k=3
            [0, 0, 448, 448],   # k=5
            [0, 0, 16, 16],     # clipped to 2
            [0, 0, 2000, 2000], # clipped to 5
        ], jnp.float32)
        np.testing.assert_array_equal(np.asarray(fpn_level_assign(boxes)), [4, 3, 5, 2, 5])

    def test_multiscale_roi_align_picks_assigned_level(self):
        # each level constant-valued; pooled output must equal its level's id
        pyramid = {}
        size = {"p2": 64, "p3": 32, "p4": 16, "p5": 8}
        for lvl, name in enumerate(["p2", "p3", "p4", "p5"], start=2):
            pyramid[name] = jnp.full((size[name], size[name], 4), float(lvl))
        boxes = jnp.asarray([
            [0, 0, 112, 112],   # level 3
            [0, 0, 224, 224],   # level 4
            [0, 0, 16, 16],     # level 2
        ], jnp.float32)
        pooled = np.asarray(multiscale_roi_align(pyramid, boxes, output_size=7))
        np.testing.assert_allclose(pooled[0], 3.0, atol=1e-5)
        np.testing.assert_allclose(pooled[1], 4.0, atol=1e-5)
        np.testing.assert_allclose(pooled[2], 2.0, atol=1e-5)
