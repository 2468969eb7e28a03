"""TPU-native BLIP captioner parity vs transformers' BlipForConditionalGeneration.

A randomly-initialised HF BLIP (tiny config, no network) is converted with
convert_hf_blip; logits and greedy captions must match — which proves the
real ``Salesforce/blip-image-captioning-base`` checkpoint loads correctly
once the network gate opens (reference augmentation.py:24-106 uses exactly
that model through transformers)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from multimodal_classification_tpu.models.blip import (
    BlipForCaptioning,
    convert_hf_blip,
    tiny_blip_config,
)


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import BlipConfig as HFBlipConfig
    from transformers import BlipForConditionalGeneration
    from transformers.models.blip.configuration_blip import (
        BlipTextConfig,
        BlipVisionConfig,
    )

    cfg = tiny_blip_config(bos_token_id=70, eos_token_id=71, pad_token_id=0)
    vc = BlipVisionConfig(
        hidden_size=cfg.vision_width, intermediate_size=cfg.vision_mlp,
        num_hidden_layers=cfg.vision_layers, num_attention_heads=cfg.vision_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
    )
    tc = BlipTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, encoder_hidden_size=cfg.vision_width,
        max_position_embeddings=cfg.max_position_embeddings,
        bos_token_id=70, sep_token_id=71, pad_token_id=0,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BlipForConditionalGeneration(
        HFBlipConfig(text_config=tc.to_dict(), vision_config=vc.to_dict())
    ).eval()
    ours = BlipForCaptioning(cfg)
    params = convert_hf_blip(hf.state_dict(), cfg)
    return hf, ours, params, cfg


def test_vision_tower_parity(hf_and_ours, rng):
    hf, ours, params, cfg = hf_and_ours
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    got = np.asarray(ours.encode(params, jnp.asarray(imgs)))
    with torch.no_grad():
        want = hf.vision_model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decoder_logits_parity(hf_and_ours, rng):
    hf, ours, params, cfg = hf_and_ours
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ids = np.array([[70, 5, 9, 12], [70, 3, 2, 8]], np.int64)
    enc = ours.encode(params, jnp.asarray(imgs))
    got = np.asarray(ours.logits(params, jnp.asarray(ids, jnp.int32), enc))
    with torch.no_grad():
        enc_t = hf.vision_model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).last_hidden_state
        want = hf.text_decoder(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=enc_t,
        ).logits.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_greedy_captions_match_hf_generate(hf_and_ours, rng):
    hf, ours, params, cfg = hf_and_ours
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    max_len = 8
    got = np.asarray(ours.generate_greedy(params, jnp.asarray(imgs), max_length=max_len))
    with torch.no_grad():
        out = hf.generate(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            max_length=max_len, num_beams=1, do_sample=False,
        ).numpy()
    # compare up to (and including) each row's first EOS
    for b in range(2):
        hf_row = out[b].tolist()
        hf_trim = hf_row[: hf_row.index(71) + 1] if 71 in hf_row else hf_row
        got_row = got[b].tolist()
        got_trim = got_row[: got_row.index(71) + 1] if 71 in got_row else got_row
        assert got_trim == hf_trim, (got_row, hf_row)


def test_caption_decoding_roundtrip():
    """Token ids → caption text via the native WordPiece vocab decode."""
    from multimodal_classification_tpu.data.augment import decode_caption_ids

    vocab = {"[PAD]": 0, "a": 5, "cat": 6, "[SEP]": 71, "[DEC]": 70, "##s": 7}
    inv = {v: k for k, v in vocab.items()}
    ids = [70, 5, 6, 7, 71, 0, 0]
    assert decode_caption_ids(ids, inv, eos_id=71, special={0, 70, 71}) == "a cats"


def test_cached_decode_matches_full_recompute(hf_and_ours, rng):
    """KV-cache decode (cross-K/V precomputed, self-K/V incremental) emits
    exactly the same tokens as the full-buffer recompute decode."""
    hf, ours, params, cfg = hf_and_ours
    imgs = rng.standard_normal((3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    full = np.asarray(ours.generate_greedy(params, jnp.asarray(imgs), max_length=10))
    cached = np.asarray(ours.generate_greedy_cached(params, jnp.asarray(imgs), max_length=10))
    np.testing.assert_array_equal(full, cached)


def test_cached_step_logits_match_decoder(hf_and_ours, rng):
    """Per-token cached-step logits agree with the full decoder's logits at
    every position (same params, two module views)."""
    hf, ours, params, cfg = hf_and_ours
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ids = jnp.asarray(np.array([[70, 5, 9, 12], [70, 3, 2, 8]]), jnp.int32)
    enc = ours.encode(params, jnp.asarray(imgs))
    want = np.asarray(ours.logits(params, ids, enc))  # [B, L, V]

    cross_k, cross_v = ours._cross_kv.apply({"params": params["text"]}, enc)
    d = cfg.hidden_size // cfg.num_heads
    L = ids.shape[1]
    kc = jnp.zeros((cfg.num_layers, 2, cfg.num_heads, L, d), jnp.dtype(cfg.dtype))
    vc = jnp.zeros_like(kc)
    for t in range(L):
        logits, kc, vc = ours._step.apply(
            {"params": params["text"]}, ids[:, t], t, kc, vc, cross_k, cross_v)
        np.testing.assert_allclose(np.asarray(logits), want[:, t, :],
                                   rtol=2e-4, atol=2e-4)
