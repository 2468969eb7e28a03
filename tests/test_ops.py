"""Numerical parity tests of ops.

Golden oracles: torch core functional ops where available (adaptive pooling,
bilinear interpolate, SDPA); naive-loop numpy implementations of the
torchvision kernel semantics (roi_align, roi_pool, nms, box decode) otherwise
— written straight from the published algorithm definitions.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_classification_tpu import ops


class TestPooling:
    @pytest.mark.parametrize("hw,out", [((38, 38), (6, 6)), ((7, 7), (6, 6)), ((37, 37), (6, 6)), ((14, 14), (1, 1))])
    def test_adaptive_avg_pool_matches_torch(self, rng, hw, out):
        x = rng.standard_normal((3, *hw)).astype(np.float32)
        got = np.asarray(ops.adaptive_avg_pool2d(jnp.asarray(x), out))
        want = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(x), out).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("hw,out", [((38, 38), (6, 6)), ((13, 17), (5, 3))])
    def test_adaptive_max_pool_matches_torch(self, rng, hw, out):
        x = rng.standard_normal((3, *hw)).astype(np.float32)
        got = np.asarray(ops.adaptive_max_pool2d(jnp.asarray(x), out))
        want = torch.nn.functional.adaptive_max_pool2d(torch.from_numpy(x), out).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("align", [False, True])
    @pytest.mark.parametrize("hw,out", [((37, 37), (6, 6)), ((6, 6), (37, 41))])
    def test_bilinear_resize_matches_torch(self, rng, hw, out, align):
        x = rng.standard_normal((2, 3, *hw)).astype(np.float32)
        got = np.asarray(ops.bilinear_resize(jnp.asarray(x), out, align_corners=align))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out, mode="bilinear", align_corners=align
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _random_boxes(rng, n, h, w):
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    x2 = x1 + rng.uniform(1, w - x1)
    y2 = y1 + rng.uniform(1, h - y1)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


def _bilinear_at(f, y, x):
    """Sample channel-stack f[C,H,W] at (y, x), torchvision boundary rules."""
    c, h, w = f.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c, f.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(math.floor(y)), int(math.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    fy, fx = y - y0, x - x0
    return (
        f[:, y0, x0] * (1 - fy) * (1 - fx)
        + f[:, y0, x1] * (1 - fy) * fx
        + f[:, y1, x0] * fy * (1 - fx)
        + f[:, y1, x1] * fy * fx
    )


def _roi_align_naive(f, boxes, out, scale, sr, aligned):
    r = boxes.shape[0]
    c = f.shape[0]
    p, q = out
    res = np.zeros((r, c, p, q), np.float32)
    off = 0.5 if aligned else 0.0
    for ri, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1, x2, y2 = bx1 * scale - off, by1 * scale - off, bx2 * scale - off, by2 * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / q, rh / p
        for i in range(p):
            for j in range(q):
                acc = np.zeros(c, np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        yy = y1 + i * bh + (iy + 0.5) * bh / sr
                        xx = x1 + j * bw + (ix + 0.5) * bw / sr
                        acc += _bilinear_at(f, yy, xx)
                res[ri, :, i, j] = acc / (sr * sr)
    return res


def _roi_pool_naive(f, boxes, out, scale):
    r = boxes.shape[0]
    c, h, w = f.shape
    p, q = out
    res = np.zeros((r, c, p, q), np.float32)
    for ri, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = round(bx1 * scale), round(by1 * scale)
        x2, y2 = round(bx2 * scale), round(by2 * scale)
        x2, y2 = max(x2, x1 + 1), max(y2, y1 + 1)
        lh, lw = y2 - y1, x2 - x1
        for i in range(p):
            for j in range(q):
                # exact rational bin boundaries via integer arithmetic
                hs = min(max(y1 + (i * lh) // p, 0), h)
                he = min(max(y1 + -((-(i + 1) * lh) // p), 0), h)
                ws = min(max(x1 + (j * lw) // q, 0), w)
                we = min(max(x1 + -((-(j + 1) * lw) // q), 0), w)
                if he > hs and we > ws:
                    res[ri, :, i, j] = f[:, hs:he, ws:we].reshape(c, -1).max(-1)
    return res


def _nms_naive(boxes, scores, thr):
    # stable: ties broken by lowest index (matches our argmax convention)
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[:, :2], boxes[i, :2])
        rb = np.minimum(boxes[:, 2:], boxes[i, 2:])
        wh = np.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas + areas[i] - inter, 1e-9)
        alive &= ~(iou > thr)
    return np.asarray(keep)


class TestRoi:
    @pytest.mark.parametrize("aligned", [False, True])
    def test_roi_align_matches_naive(self, rng, aligned):
        feats = rng.standard_normal((4, 19, 19)).astype(np.float32)
        boxes = _random_boxes(rng, 8, 300, 300)
        got = np.asarray(
            ops.roi_align(
                jnp.asarray(feats), jnp.asarray(boxes), (7, 7),
                spatial_scale=1 / 16, sampling_ratio=2, aligned=aligned,
            )
        )
        want = _roi_align_naive(feats, boxes, (7, 7), 1 / 16, 2, aligned)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_roi_pool_matches_naive(self, rng):
        feats = rng.standard_normal((4, 38, 38)).astype(np.float32)
        boxes = _random_boxes(rng, 8, 600, 600)
        got = np.asarray(
            ops.roi_pool(jnp.asarray(feats), jnp.asarray(boxes), (14, 14), spatial_scale=1 / 16)
        )
        want = _roi_pool_naive(feats, boxes, (14, 14), 1 / 16)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestNms:
    @pytest.mark.parametrize("iou_thr", [0.3, 0.5, 0.7])
    def test_nms_matches_naive(self, rng, iou_thr):
        boxes = _random_boxes(rng, 200, 100, 100)
        scores = rng.uniform(0, 1, 200).astype(np.float32)
        idx, valid = ops.nms(jnp.asarray(boxes), jnp.asarray(scores), iou_thr, 200)
        got = np.asarray(idx)[np.asarray(valid)]
        want = _nms_naive(boxes, scores, iou_thr)
        np.testing.assert_array_equal(got, want)

    def test_nms_truncates_to_max_outputs(self, rng):
        boxes = _random_boxes(rng, 100, 100, 100)
        scores = rng.uniform(0, 1, 100).astype(np.float32)
        idx, valid = ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
        assert idx.shape == (5,)
        full = _nms_naive(boxes, scores, 0.5)
        np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)], full[:5])

    def test_batched_nms_separates_classes(self, rng):
        boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (4, 1))
        scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
        cls = np.array([0, 1, 2, 3], np.int32)
        idx, valid = ops.batched_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5, 4
        )
        assert bool(np.all(np.asarray(valid)))


class TestBoxes:
    def test_iou_pairwise(self, rng):
        a = _random_boxes(rng, 20, 64, 64)
        b = _random_boxes(rng, 30, 64, 64)
        got = np.asarray(ops.box_iou(jnp.asarray(a), jnp.asarray(b)))
        area = lambda bx: (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
        want = np.zeros((20, 30), np.float32)
        for i in range(20):
            lt = np.maximum(a[i, :2], b[:, :2])
            rb = np.minimum(a[i, 2:], b[:, 2:])
            wh = np.maximum(rb - lt, 0)
            inter = wh[:, 0] * wh[:, 1]
            want[i] = inter / (area(a)[i] + area(b) - inter)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_decode_deltas_roundtrip_and_clamp(self, rng):
        anchors = _random_boxes(rng, 50, 200, 200)
        # zero deltas → identity
        out = np.asarray(ops.decode_deltas(jnp.asarray(anchors), jnp.zeros((50, 4))))
        np.testing.assert_allclose(out, anchors, rtol=1e-5, atol=1e-3)
        # huge dw is clamped at log(1000/16)
        big = np.zeros((50, 4), np.float32)
        big[:, 2] = 100.0
        out = np.asarray(ops.decode_deltas(jnp.asarray(anchors), jnp.asarray(big)))
        widths = out[:, 2] - out[:, 0]
        np.testing.assert_allclose(
            widths, (anchors[:, 2] - anchors[:, 0]) * 1000 / 16, rtol=1e-4
        )

    def test_anchor_grid_count_and_centering(self):
        a = ops.generate_anchors(3, 4, stride=16, scales=(32, 64), ratios=(1.0,))
        assert a.shape == (3 * 4 * 2, 4)
        # first cell anchors centred at (8, 8)
        np.testing.assert_allclose((a[0, :2] + a[0, 2:]) / 2, [8.0, 8.0])
        # scale-32 anchor is 32×32
        np.testing.assert_allclose(a[0, 2:] - a[0, :2], [32.0, 32.0])

    def test_grid_spatial_shape_and_range(self):
        sp = ops.grid_spatial(6)
        assert sp.shape == (36, 5)
        assert sp.min() >= 0.0 and sp.max() <= 1.0
        np.testing.assert_allclose(sp[:, 4].sum(), 1.0, atol=1e-5)

    def test_clip_boxes(self):
        b = jnp.asarray([[-5.0, -5.0, 200.0, 50.0]])
        out = np.asarray(ops.clip_boxes(b, 100.0, 150.0))
        np.testing.assert_allclose(out, [[0.0, 0.0, 150.0, 50.0]])


class TestAttention:
    def test_attention_matches_torch_sdpa(self, rng):
        q = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
        k = rng.standard_normal((2, 4, 24, 8)).astype(np.float32)
        v = rng.standard_normal((2, 4, 24, 8)).astype(np.float32)
        mask = (rng.uniform(size=(2, 24)) > 0.2).astype(np.float32)
        bias = np.asarray(ops.attention.mask_to_bias(jnp.asarray(mask)))
        got = np.asarray(
            ops.attention_core(*(jnp.asarray(t) for t in (q, k, v)), jnp.asarray(bias), impl="xla")
        )
        want = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=torch.from_numpy(bias),
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bi_attention_both_directions(self, rng):
        qv = jnp.asarray(rng.standard_normal((2, 2, 10, 8)).astype(np.float32))
        kt = jnp.asarray(rng.standard_normal((2, 2, 12, 8)).astype(np.float32))
        vt = jnp.asarray(rng.standard_normal((2, 2, 12, 8)).astype(np.float32))
        qt = jnp.asarray(rng.standard_normal((2, 2, 12, 8)).astype(np.float32))
        kv = jnp.asarray(rng.standard_normal((2, 2, 10, 8)).astype(np.float32))
        vv = jnp.asarray(rng.standard_normal((2, 2, 10, 8)).astype(np.float32))
        c1, c2 = ops.bi_attention_core(qv, (kt, vt), qt, (kv, vv), impl="xla")
        e1 = ops.attention_core(qv, kt, vt, impl="xla")
        e2 = ops.attention_core(qt, kv, vv, impl="xla")
        np.testing.assert_allclose(np.asarray(c1), np.asarray(e1))
        np.testing.assert_allclose(np.asarray(c2), np.asarray(e2))
