"""Static Mosaic block-shape rule enforcement (no TPU needed).

Round 2 shipped a flash-attention ``lse`` BlockSpec ``(1, block_q)`` over
a ``(b*h, sq)`` array that every interpret-mode test accepted but the
real chip rejected (Mosaic: last two block dims must be divisible by
(8, 128) or equal the array dims).  These tests pin the rule statically:
the exact bench/model shapes are traced (jax.eval_shape — no execution)
so an illegal BlockSpec fails here, on CPU, at trace time.

Analog of the reference's compile-only GPU golden tests
(tests/test_gpu.nim:21-34).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exprgrad_tpu.ops.mosaic_check import (
    MosaicBlockError,
    check_block,
    check_specs,
)
from exprgrad_tpu.ops.attention import (
    flash_attention,
    flash_attention_backward,
    flash_attention_forward,
)


def test_round2_lse_spec_is_rejected():
    # the exact spec that broke on hardware: block (1, 128) over (32, 2048)
    with pytest.raises(MosaicBlockError):
        check_block((1, 128), (32, 2048), what="lse")


def test_fixed_lse_layout_is_legal():
    check_block((1, 128, 1), (32, 2048, 1), what="lse")       # bench shape
    check_block((1, 128, 1), (32, 4096, 1), what="lse")       # window bench
    check_block((1, 64, 1), (4, 64, 1), what="lse")           # block == dim


def test_block_equal_to_array_dim_is_legal():
    check_block((7, 5), (7, 5))        # whole-array block, odd dims
    check_block((4, 96), (4, 96))      # both dims full
    check_block((128, 1), (1024, 1))   # trailing singleton


def test_violations_rejected():
    with pytest.raises(MosaicBlockError):
        check_block((4, 128), (32, 2048))   # sublane dim 4: not 8k, not 32
    with pytest.raises(MosaicBlockError):
        check_block((8, 96), (32, 2048))    # lane dim 96: not 128k, not 2048
    with pytest.raises(MosaicBlockError):
        check_block((1, 128), (32, 2048, 1))  # rank mismatch


def test_check_specs_skips_default_whole_array():
    class _Default:
        block_shape = None

    check_specs([_Default()], [(32, 2048)], kernel="k")


# ---------------------------------------------------------------------------
# Trace-time enforcement at the shapes the benches and models actually use.
# jax.eval_shape runs the pallas_call trace (and with it check_specs)
# without executing anything — this is exactly the check interpret-mode
# execution could not provide.

BENCH_SHAPES = [
    # (b, h, hkv, sq, skv, d, causal, window)   — bench.py / models
    (8, 4, 4, 2048, 2048, 128, True, None),     # attention bench
    (8, 4, 4, 2048, 2048, 128, False, None),
    (1, 8, 8, 4096, 4096, 128, True, 512),      # window-attention bench
    (8, 4, 4, 512, 512, 128, True, None),       # flash_transformer train
    (2, 4, 1, 1024, 1024, 128, True, None),     # MQA validate shape
    (4, 8, 2, 256, 256, 64, True, None),        # GQA small-d
]


@pytest.mark.parametrize("b,h,hkv,sq,skv,d,causal,window", BENCH_SHAPES)
def test_forward_traces_at_bench_shapes(b, h, hkv, sq, skv, d, causal,
                                        window):
    q = jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32)
    k = jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32)
    v = jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32)
    out, lse = jax.eval_shape(
        lambda q, k, v: flash_attention_forward(
            q, k, v, causal=causal, window=window, interpret=True
        ),
        q, k, v,
    )
    assert out.shape == (b, h, sq, d)
    assert lse.shape == (b * h, sq)


@pytest.mark.parametrize("b,h,hkv,sq,skv,d,causal,window", BENCH_SHAPES)
def test_backward_traces_at_bench_shapes(b, h, hkv, sq, skv, d, causal,
                                         window):
    q = jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32)
    k = jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32)
    v = jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32)
    out = jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32)
    lse = jax.ShapeDtypeStruct((b * h, sq), jnp.float32)
    dq, dk, dv = jax.eval_shape(
        lambda q, k, v, o, l, g: flash_attention_backward(
            q, k, v, o, l, g, causal=causal, window=window, interpret=True
        ),
        q, k, v, out, lse, out,
    )
    assert dq.shape == q.shape
    assert dk.shape == k.shape
    assert dv.shape == v.shape


def test_custom_vjp_traces_at_bench_shape():
    b, h, sq, d = 8, 4, 2048, 128
    q = jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True))

    grads = jax.eval_shape(jax.grad(loss, argnums=(0, 1, 2)), q, q, q)
    assert all(g.shape == (b, h, sq, d) for g in grads)


def test_pallas_matmul_traces_at_bench_shapes():
    from exprgrad_tpu.ops.matmul import pallas_matmul

    for (m, k, n) in [(8192, 8192, 8192), (1024, 2048, 1024), (256, 256, 256)]:
        a = jax.ShapeDtypeStruct((m, k), jnp.float32)
        bb = jax.ShapeDtypeStruct((k, n), jnp.float32)
        out = jax.eval_shape(
            lambda a, b: pallas_matmul(a, b, interpret=True), a, bb
        )
        assert out.shape == (m, n)
