"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX fake-backend trick for testing pjit/shard_map mesh
code without TPU hardware (SURVEY.md §4). jax may already be imported by the
interpreter's sitecustomize, so we must go through jax.config (env vars are
latched at jax import time); XLA_FLAGS is still read at backend-init time,
which has not happened yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` is the dev loop on the 1-core host; the
# full suite stays the CI gate. The list below is MEASURED (pytest
# --durations=0, round 4): every test that took ≥ ~40 s under load — the
# heavyweight integration tier (e2e fits, resume/preemption, pipeline runs,
# detector builds, interpret-mode kernel wiring). One place on purpose:
# re-measure and edit here rather than scattering marks across files.
_SLOW_TESTS = {
    "test_training.py::TestPreemption::test_sigterm_checkpoints_and_resume_is_bit_identical",  # 262s
    "test_training.py::TestTrainer::test_kill_and_resume_bit_identical",      # 159s
    "test_pipelines.py::TestLmdbTrainPipeline::test_pipeline_resume_continues",  # 149s
    "test_determinism.py::test_same_seed_same_trajectory",                    # 140s
    "test_training.py::TestTrainer::test_end_to_end_tiny_training_improves_auroc",  # 95s
    "test_device_cache.py::test_multi_step_packed_carry_is_bit_identical",    # 94s
    "test_pipelines.py::TestLmdbTrainPipeline::test_lmdb_freeze6_trains_end_to_end",  # 94s
    "test_pipelines.py::TestPrecomputedPipeline::test_hdf5_precomputed_training",  # 92s
    "test_grad_accum.py::test_grad_accum_updates_every_k_steps",              # 84s
    "test_training.py::TestPreemption::test_device_resident_resume_continues_trajectory",  # 82s
    "test_pipelines.py::TestLmdbTrainPipeline::test_train_evaluate_save",     # 69s
    "test_device_cache.py::test_trainer_fit_device_resident_multichip",       # 68s
    "test_device_cache.py::test_trainer_fit_device_resident_dp_mp",           # 67s
    "test_pipelines.py::TestLmdbTrainPipeline::test_ablation_config_plumbing",  # 62s
    "test_graft_entry.py::test_dryrun_multichip_8",                           # 57s
    "test_pipeline_extractor.py::test_on_the_fly_extractor_training",         # 57s
    "test_extractors.py::TestConverters::test_frcnn_v2_full_load",            # 55s
    "test_stacked_encoder.py::TestIntegration::test_train_step_runs_stacked",  # 55s
    "test_device_cache.py::test_sharded_device_data_multichip_training",      # 54s
    "test_extractors.py::TestFRCNNExtractors::test_x152_contract",            # 51s
    "test_fused_co_block.py::TestModelWiring::test_auto_policy",              # 49s
    "test_fused_attn_block_train.py::TestModelWiring::test_dispatch_and_grads",  # 44s
    "test_extractors.py::TestFRCNNExtractors::test_fasterrcnn_fpn_contract",  # 43s
    # chain-dependent: restore/predict from the checkpoint that the
    # (slow-marked) training tests in the same module write — they must
    # ride with that tier even though they are individually fast
    "test_pipelines.py::TestLmdbTrainPipeline::test_validate_pipeline_restores_checkpoint",
    "test_pipelines.py::TestLmdbTrainPipeline::test_inference_pipeline_writes_predictions",
    # the 20-40 s band (same measured run): second tier of integration /
    # interpret-mode-kernel tests — first fast-loop measurement came in at
    # ~26 min idle, still too heavy for the 1-core dev loop
    "test_device_cache.py::test_multi_step_scan_matches_sequential_steps",   # 39s
    "test_stacked_encoder.py::TestParity::test_gradients_reach_every_stacked_leaf",  # 34s
    "test_extractors.py::TestConverters::test_vg_rpn_checkpoint_roundtrip",  # 34s
    "test_fused_co_block.py::TestModelWiring::test_int8_quant_composes",     # 32s
    "test_stacked_encoder.py::TestParity::test_grad_parity_with_unstacked",  # 32s
    "test_train_parity.py::test_losses_match_per_step",                      # 30s setup
    "test_pipelines.py::TestLmdbTrainPipeline::test_device_resident_training",  # 29s
    "test_extractors.py::TestFRCNNExtractors::test_vg_contract",             # 27s
    "test_pipelines.py::TestEveryVariantConfigBuilds::test_int8_serving_inference_agrees_with_float",  # 26s
    "test_fused_attn_block.py::TestKernel::test_visual_stream_padding_parity",  # 25s
    "test_fused_layer.py::TestModelWiring::test_int8_quant_dispatches_and_predictions_agree",  # 24s
    "test_fused_ffn_train.py::TestModelWiring::test_grads_flow_through_fused_path",  # 24s
    "test_extractors.py::TestGridExtractors::test_resnet_grid_contract",     # 24s
    "test_extractors.py::TestViTExtractors::test_clip_extractor",            # 23s
    "test_extractors.py::TestROIExtractor::test_roi_extractor_contract",     # 23s
    "test_device_cache.py::test_device_train_step_decreases_loss",           # 22s
    "test_extractors.py::TestViTExtractors::test_dinov2_interpolate",        # 22s
    # round-5 measurement (pytest --durations=60 under load, concurrent with
    # a TPU bench host process — same conditions as the round-4 numbers):
    # the new integration tests + the ≥25 s band that had crept above the
    # cut. Cheaper siblings of each remain in the fast tier.
    "test_flat_slab.py::test_trainer_flat_slab_end_to_end_and_ckpt_interchange",  # 129s
    "test_extractors.py::TestFRCNNExtractors::test_vg_rpn_contract",         # 124s
    "test_device_cache.py::test_seq_bucket_train_step_runs_and_learns",      # 93s
    "test_device_cache.py::test_seq_bucket_eval_is_exact",                   # 81s
    "test_device_cache.py::test_device_eval_matches_host_eval",              # 77s
    "test_flat_slab.py::test_train_trajectory_matches_per_leaf[65536]",      # 53s
    "test_convert_core.py::test_core_converter_full_merge",                  # 51s
    "test_flat_slab.py::test_train_trajectory_matches_per_leaf[-1]",         # 49s
    "test_extractors.py::TestViTExtractors::test_dinov2_attention_selection",  # 41s
    "test_bench_orchestration.py::test_main_falls_back_when_headline_stalls",  # 37s
    "test_export.py::test_bf16_wire_signature_contract",                     # 34s
    "test_flat_slab.py::test_checkpoint_layout_round_trip",                  # 32s
    "test_blip.py::test_cached_decode_matches_full_recompute",               # 31s
    "test_rotation.py::test_rotating_trajectory_bit_equals_full_resident",   # 30s
    "test_preflight.py::test_dry_run_preflight_passes",                      # 29s
    "test_fused_ffn.py::TestModelWiring::test_training_keeps_unfused_path",  # 29s
    "test_fused_attn_block.py::TestModelWiring::test_int8_quant_composes",   # 28s
    "test_extractors.py::TestFRCNNExtractors::test_vg_rpn_non_divisible_image_size",  # 28s
    "test_flat_slab.py::test_single_step_and_eval_with_slab",                # 27s
    "test_convert_parity.py::test_reverse_export_torch_forward_parity",      # 26s
    "test_convert_parity.py::test_forward_parity",                           # 78s module setup
    "test_rotation.py::test_trainer_fit_with_small_cap_end_to_end",          # 22s
    "test_export.py::test_exported_predict_parity",                          # 20s
    "test_bench_orchestration.py::test_main_upgrades_fallback_to_headline",  # 19s
    # round-5 second cut, measured IDLE (--durations on the quiet host;
    # idle times run ~half the under-load ones): the ≥8 s idle band. A
    # CPU-side persistent JAX compile cache was probed as the alternative
    # and REFUTED on this host (XLA:CPU AOT entries are rejected with a
    # machine-feature mismatch on reload — no speedup), so tier rebalance
    # is the lever; every family keeps faster siblings in the fast tier
    # and the full suite remains the CI gate.
    "test_flops.py::test_train_step_count_brackets_xla",                     # 26s idle
    "test_extractors.py::TestViTExtractors::test_dinov2_multilayer_fusions[concat]",  # 21s
    "test_fused_ffn_train.py::TestModelWiring::test_param_tree_unchanged_and_train_dispatches",  # 20s
    "test_extractors.py::TestConverters::test_torchvision_resnet_conversion_structure",  # 16s
    "test_cli.py::test_doctor_distinguishes_stalled_relay_from_down_relay",  # 15s
    "test_fused_attn_block.py::TestModelWiring::test_training_path_unchanged",  # 14s
    "test_fused_co_block.py::TestModelWiring::test_param_tree_untouched_and_logits_match",  # 14s
    "test_export.py::test_exported_calibrated_int8_parity",                  # 13s
    "test_serving.py::test_mesh_sharded_serving_int8_and_batch_divisibility",  # 13s
    "test_stacked_encoder.py::TestParity::test_forward_parity_eval",         # 13s
    "test_stacked_encoder.py::TestParity::test_forward_parity_core_variant",  # 13s
    "test_fused_attn_block.py::TestModelWiring::test_param_tree_untouched_and_logits_match",  # 12s+12s setup
    "test_bench_orchestration.py::test_spawn_keeps_banked_json_if_child_later_hangs",  # 12s
    "test_fused_layer.py::TestModelWiring::test_param_tree_untouched_and_float_path_falls_back",  # 12s
    "test_flops.py::test_forward_count_brackets_xla",                        # 12s
    "test_fused_co_block.py::TestModelWiring::test_training_path_unchanged",  # 10s
    "test_quant.py::test_calibrated_static_scales_track_float",              # 10s
    "test_convert_core.py::test_fabricated_facebook_state_dict_full_merge",  # 10s
    "test_export.py::test_self_contained_artifact_and_checksum",             # 9s
    "test_fused_layer.py::TestModelWiring::test_training_path_unchanged",    # 9s
    "test_export.py::test_http_server_over_artifact",                        # 8s
    "test_fused_ffn_train.py::TestStrategies::test_cols_multichunk_forward_and_grads",  # 8s
    "test_rotation.py::test_rotation_resume_continues_trajectory",           # 3 Trainer fits
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("tests/", "", 1)
        if nid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
