"""Flagship-shape dispatch guard: the serving record depends on the fused
Pallas kernels ACCEPTING the real model's shapes. A layout-picker change
that silently starts refusing them would cost ~30% serving throughput with
every test still green — these assertions pin the dispatch itself, derived
from the shipped config so they track reality."""

import jax.numpy as jnp
import pytest

from multimodal_classification_tpu.config import facebook_vilbert_config
from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_attn_block as ak,
)
from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_co_block as ck,
)

CFG = facebook_vilbert_config()
SEQ = 32       # serving text bucket (text_bucket_multiple)
REGIONS = 100  # LMDB feature regions


@pytest.mark.parametrize("batch", [1, 16, 64, 128])
@pytest.mark.parametrize("int8", [False, True])
class TestFlagshipShapesDispatch:
    def test_text_attention_block(self, batch, int8):
        assert ak.supported(
            batch, SEQ, CFG.hidden_size, CFG.num_attention_heads,
            jnp.bfloat16, int8=int8,
        )

    def test_visual_attention_block(self, batch, int8):
        # 100 regions pad to a lane-aligned per-item tile in-kernel; the
        # 1024-d visual layers must still fit the VMEM budget
        assert ak.supported(
            batch, REGIONS, CFG.v_hidden_size, CFG.v_num_attention_heads,
            jnp.bfloat16, int8=int8,
        )

    def test_co_attention_both_directions(self, batch, int8):
        # v->t: visual queries over text keys/values; t->v: the reverse
        assert ck.supported_co(
            REGIONS, SEQ, CFG.v_hidden_size, CFG.hidden_size,
            CFG.bi_hidden_size, CFG.bi_num_attention_heads, jnp.bfloat16,
            int8=int8,
        )
        assert ck.supported_co(
            SEQ, REGIONS, CFG.hidden_size, CFG.v_hidden_size,
            CFG.bi_hidden_size, CFG.bi_num_attention_heads, jnp.bfloat16,
            int8=int8,
        )


def test_train_seq128_text_attention_still_dispatches():
    # the validate pipeline's 128-token bucket also rides the fused path
    assert ak.supported(16, 128, CFG.hidden_size, CFG.num_attention_heads,
                        jnp.bfloat16, int8=False)


def test_refusals_stay_refusals():
    # lane-misaligned hidden and head dims must keep falling back
    assert not ak.supported(16, 32, 768 + 64, 12, jnp.bfloat16)
    assert not ck.supported_co(32, 100, 768, 1024, 1000, 8, jnp.bfloat16)
