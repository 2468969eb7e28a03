"""Int8 serving quantization: op-level accuracy, tree construction, and
model-level logit agreement with the float path (ops/quant.py,
models/layers.py::QuantizableDense). No reference counterpart — the
reference serves fp32 eager torch (nodes.py:907-1009); gates here are
self-consistency bounds, not parity ports."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.config import facebook_vilbert_config
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
    init_params,
)
from multimodal_classification_tpu.ops.quant import (
    build_quant_tree,
    calibrate_quant_tree,
    count_quantized,
    int8_dot,
    int8_dynamic_dot,
    quantize_kernel,
)
from multimodal_classification_tpu.training.train import (
    make_eval_step,
    make_quant_eval_step,
    model_inputs,
)


def small_cfg():
    return facebook_vilbert_config(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        v_hidden_size=64,
        v_num_hidden_layers=2,
        v_num_attention_heads=4,
        v_intermediate_size=64,
        bi_hidden_size=64,
        bi_num_attention_heads=4,
        v_feature_size=96,
        co_attention_text_layers=(1, 3),
        classifier_hidden_size=64,
        use_pallas_attention=False,
    )


def test_int8_dot_matches_float_within_quant_noise():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    w = rng.standard_normal((256, 512)).astype(np.float32)
    q, s = quantize_kernel(w)
    ref = x @ w
    got = np.asarray(int8_dynamic_dot(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.02 and rel.max() < 0.2


def test_quantize_kernel_roundtrip_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((300, 300)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (300,)
    err = np.abs(q.astype(np.float32) * s - w)
    assert err.max() <= (s.max() / 2) + 1e-6  # half-ulp per channel


def test_build_quant_tree_structure_and_threshold():
    params = {
        "block": {
            "big": {"kernel": np.zeros((256, 512), np.float32), "bias": np.zeros(512)},
            "small": {"kernel": np.zeros((5, 512), np.float32), "bias": np.zeros(512)},
            "embed": {"embedding": np.zeros((100, 256), np.float32)},
        }
    }
    params["block"]["big"]["kernel"][0, 0] = 1.0
    quant = build_quant_tree(params, min_dim=256)
    assert count_quantized(quant) == 1
    assert set(quant["block"].keys()) == {"big"}
    assert quant["block"]["big"]["qkernel"].dtype == jnp.int8


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, batch_size=8, seq_len=16, num_regions=8)
    rng = np.random.default_rng(2)
    batch["visual_features"] = jnp.asarray(
        rng.standard_normal(batch["visual_features"].shape), jnp.float32
    )
    batch["input_ids"] = jnp.asarray(
        rng.integers(0, 128, batch["input_ids"].shape), jnp.int32
    )
    params = init_params(model, jax.random.key(0), model_inputs(batch))
    return model, params, batch


def test_model_quant_logits_track_float(model_and_params):
    model, params, batch = model_and_params
    ref = jax.jit(make_eval_step(model))(params, batch)
    quant = build_quant_tree(params, min_dim=64)
    assert count_quantized(quant) > 10  # the transformer kernels all qualify
    got = jax.jit(make_quant_eval_step(model))(params, quant, batch)
    ref, got = np.asarray(ref), np.asarray(got)
    # logits must rank-agree: same argmax and tightly correlated margins
    assert (ref.argmax(-1) == got.argmax(-1)).mean() >= 0.99
    margin_ref = ref[:, 1] - ref[:, 0]
    margin_got = got[:, 1] - got[:, 0]
    corr = np.corrcoef(margin_ref, margin_got)[0, 1]
    assert corr > 0.98, (corr, margin_ref, margin_got)


def test_int8_static_dot_matches_dynamic_within_quant_noise():
    """A static per-tensor scale covering the live range tracks the dynamic
    per-row path: same dot, coarser quantization grid."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    w = rng.standard_normal((256, 512)).astype(np.float32)
    q, s = quantize_kernel(w)
    ref = x @ w
    ascale = jnp.float32(np.abs(x).max() / 127.0)
    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                              ascale=ascale))
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.03 and rel.max() < 0.3


def test_calibrated_static_scales_track_float(model_and_params):
    """calibrate_quant_tree adds an ascale to EVERY quantized kernel (the
    calibration batch reaches all of them) and the static program's logits
    rank-agree with the float path like the dynamic one does."""
    model, params, batch = model_and_params
    quant = build_quant_tree(params, min_dim=64)
    calibrated = calibrate_quant_tree(model, params, quant, [batch])

    def n_ascales(t):
        return sum(
            (1 if "ascale" in v else n_ascales(v)) if isinstance(v, dict) else 0
            for v in t.values()
        )

    assert n_ascales(calibrated) == count_quantized(quant)
    ref = jax.jit(make_eval_step(model))(params, batch)
    got = jax.jit(make_quant_eval_step(model))(params, calibrated, batch)
    ref, got = np.asarray(ref), np.asarray(got)
    assert (ref.argmax(-1) == got.argmax(-1)).mean() >= 0.99
    corr = np.corrcoef(ref[:, 1] - ref[:, 0], got[:, 1] - got[:, 0])[0, 1]
    assert corr > 0.98, corr


def test_calibration_pass_leaves_float_outputs_untouched(model_and_params):
    """The calib sow must not change what the float path computes (both
    sides jitted — jit-vs-eager rounding would otherwise dominate)."""
    model, params, batch = model_and_params
    ref = jax.jit(make_eval_step(model))(params, batch)

    @jax.jit
    def calib_fwd(p, b):
        out, mut = model.apply({"params": p}, **model_inputs(b),
                               deterministic=True, mutable=["calib"])
        return out["logits"].astype(jnp.float32), mut["calib"]

    got, calib = calib_fwd(params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)
    assert len(jax.tree.leaves(calib)) > 10
    assert all(float(v) > 0 for v in jax.tree.leaves(calib))


def test_quant_collection_absent_is_exact_dense(model_and_params):
    """QuantizableDense without a quant collection must be the plain Dense
    float path (golden parity tests elsewhere pin it to the reference)."""
    model, params, batch = model_and_params
    a = jax.jit(make_eval_step(model))(params, batch)
    b = jax.jit(make_quant_eval_step(model))(params, {}, batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
