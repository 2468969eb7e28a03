"""ViLBERT model tests: shapes, determinism, both variants, masking, remat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.config import (
    core_vilbert_config,
    facebook_vilbert_config,
    tiny_vilbert_config,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
)


def _fp32(cfg):
    import dataclasses

    return dataclasses.replace(cfg, dtype="float32", use_pallas_attention=False)


class TestForward:
    def test_facebook_arch_shapes(self):
        cfg = _fp32(tiny_vilbert_config())
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg, batch_size=2, seq_len=16, num_regions=8)
        params = model.init(jax.random.key(0), **batch)["params"]
        out = model.apply({"params": params}, **batch)
        assert out["logits"].shape == (2, cfg.num_labels)
        assert out["text_output"].shape == (2, 16, cfg.hidden_size)
        assert out["visual_output"].shape == (2, 8, cfg.v_hidden_size)
        assert out["pooled_output"].shape == (2, cfg.bi_hidden_size + cfg.v_hidden_size)
        assert np.all(np.isfinite(np.asarray(out["logits"])))

    def test_core_arch_shapes(self):
        cfg = _fp32(
            core_vilbert_config(
                hidden_size=64, num_attention_heads=4, num_hidden_layers=4,
                intermediate_size=128, vocab_size=512, max_position_embeddings=64,
                v_hidden_size=64, v_num_attention_heads=4, v_num_hidden_layers=2,
                v_intermediate_size=128, bi_hidden_size=64, bi_num_attention_heads=4,
                co_attention_text_layers=(1, 3), v_feature_size=128,
                classifier_hidden_size=64,
            )
        )
        assert cfg.pooling == "cls_mean" and cfg.v_use_position_embeddings
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg, 2, 12, 6)
        params = model.init(jax.random.key(0), **batch)["params"]
        out = model.apply({"params": params}, **batch)
        assert out["logits"].shape == (2, 2)
        # core variant has unshared cross-attention blocks
        assert "biattention_v" in params["bert"]["encoder"]["c_layer_0"]

    def test_encoder_layer_counts(self):
        cfg = _fp32(tiny_vilbert_config())
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg)
        params = model.init(jax.random.key(0), **batch)["params"]
        enc = params["bert"]["encoder"]
        assert sum(k.startswith("layer_") for k in enc) == cfg.num_hidden_layers
        assert sum(k.startswith("v_layer_") for k in enc) == cfg.v_num_hidden_layers
        assert sum(k.startswith("c_layer_") for k in enc) == len(cfg.co_attention_text_layers)
        # FB-arch co-attention: shared bi-space projections
        assert "query1" in enc["c_layer_0"] and "query2" in enc["c_layer_0"]

    def test_deterministic_eval_is_reproducible(self):
        cfg = _fp32(tiny_vilbert_config())
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg)
        params = model.init(jax.random.key(0), **batch)["params"]
        a = model.apply({"params": params}, **batch)["logits"]
        b = model.apply({"params": params}, **batch)["logits"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_changes_output_under_train_mode(self):
        cfg = _fp32(tiny_vilbert_config())
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg)
        params = model.init(jax.random.key(0), **batch)["params"]
        a = model.apply(
            {"params": params}, **batch, deterministic=False,
            rngs={"dropout": jax.random.key(1)},
        )["logits"]
        b = model.apply(
            {"params": params}, **batch, deterministic=False,
            rngs={"dropout": jax.random.key(2)},
        )["logits"]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_visual_mask_blocks_padded_regions(self):
        """Fully-masked padded regions must not change the logits."""
        cfg = _fp32(tiny_vilbert_config())
        model = ViLBERTForClassification(cfg)
        rng = np.random.default_rng(0)
        base = dummy_batch(cfg, 1, 8, 6)
        feats = rng.standard_normal((1, 6, cfg.v_feature_size)).astype(np.float32)
        base["visual_features"] = jnp.asarray(feats)
        mask = np.ones((1, 6), np.float32)
        mask[:, 4:] = 0.0
        base["visual_attention_mask"] = jnp.asarray(mask)
        params = model.init(jax.random.key(0), **base)["params"]
        out1 = model.apply({"params": params}, **base)["logits"]
        # perturb the masked-out regions
        feats2 = feats.copy()
        feats2[:, 4:] = 1000.0
        base2 = dict(base, visual_features=jnp.asarray(feats2))
        out2 = model.apply({"params": params}, **base2)["logits"]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=1e-4)

    def test_remat_matches_non_remat(self):
        import dataclasses

        cfg = _fp32(tiny_vilbert_config())
        cfg_r = dataclasses.replace(cfg, remat=True)
        batch = dummy_batch(cfg)
        m1 = ViLBERTForClassification(cfg)
        m2 = ViLBERTForClassification(cfg_r)
        p = m1.init(jax.random.key(0), **batch)["params"]
        o1 = m1.apply({"params": p}, **batch)["logits"]
        o2 = m2.apply({"params": p}, **batch)["logits"]
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)

    def test_full_size_config_param_count(self):
        """FB arch at full size ≈ 250M params (sanity vs the reference model)."""
        cfg = _fp32(facebook_vilbert_config())
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg, 1, 4, 4)
        params = jax.eval_shape(
            lambda: model.init(jax.random.key(0), **batch)["params"]
        )
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert 200e6 < n < 320e6, f"param count {n:,}"


def test_attention_impl_defaults_are_xla():
    """Perf policy pinned by measurement (see docs/ARCHITECTURE.md "Pallas
    attention: measured and defaulted off"): XLA attention is the default
    for BOTH training and eval at the flagship shapes; the Pallas kernels
    are opt-in for longer-sequence configs."""
    from multimodal_classification_tpu.config import facebook_vilbert_config

    cfg = facebook_vilbert_config()
    assert cfg.use_pallas_attention is False
    assert cfg.pallas_attention_training is False
