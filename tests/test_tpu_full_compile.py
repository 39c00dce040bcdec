"""Deviceless FULL TPU backend compiles — the strongest chip-less net.

``lower_tpu`` (test_mosaic_aot.py) verifies the Mosaic *lowering*; late
backend passes (vector-layout inference, register allocation, VMEM
assignment) only run in the actual TPU compiler.  A live tunnel flap
proved this gap real: a kernel that passed AOT lowering was rejected by
the chip's compiler with ``infer-vector-layout: unsupported shape
cast``.  This module closes the gap locally: JAX topology descriptions
(`jax.experimental.topologies`, a deviceless v5e:2x2) let the full
XLA:TPU + Mosaic pipeline produce a real TPU executable on this
CPU-only host.  One representative of every Pallas family compiles
end-to-end here, plus the flagship train step.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, exp, input, irange, iters, select, to_index

from aot_util import compile_tpu, full_compile_fn


def test_matmul_with_epilogue_full_compile():
    a, b, bias = input("a"), input("b"), input("bias")
    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 128, "x": 128, "it": 128}, parallel=["y", "x"])
    y2, x2 = iters("y2", "x2")
    out = Fun("out")
    out[y2, x2] = select(c[y2, x2] + bias[x2] > 0.0,
                         c[y2, x2] + bias[x2], 0.0)
    ex = compile_tpu([c.target("c"), out.target("out")], "out",
                     {"a": (256, 256), "b": (256, 256), "bias": (256,)})
    assert ex.stats.get("pallas-fused") == 1, ex.stats


def test_mapreduce_masked_ragged_full_compile():
    inp = input("inp")
    y, x = iters("y", "x")
    rr = Fun("rr")
    rr[y] = exp(inp[y, x])
    rr.schedule(tile={"x": 100})  # ragged: padded + identity-masked
    ex = compile_tpu(rr.target("rr"), "rr", {"inp": (16, 200)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_rowchain_causal_softmax_full_compile():
    inp = input("inp")
    q, k = iters("q", "k")
    mx = Fun("mx")
    mx.maximize[q] = select(k <= q, inp[q, k], -1e30)
    mx.schedule(tile={"q": 32})
    q, k = iters("q", "k")
    sm = Fun("sm")
    sm[q] = select(k <= q, exp(inp[q, k] - mx[q]), 0.0)
    sm.schedule(tile={"q": 32})
    q, k = iters("q", "k")
    out = Fun("out")
    out[q, k] = select(k <= q, exp(inp[q, k] - mx[q]) / sm[q], 0.0)
    out.schedule(tile={"q": 32})
    ex = compile_tpu(out.target("out"), "out", {"inp": (128, 128)})
    assert ex.stats.get("pallas-rowchain") == 1, ex.stats


def test_onehot_gather_full_compile():
    """The one-hot MXU class (rest == [lane]) through the full backend —
    exactly the formulation the live chip validated."""
    tok, table = input("tokens"), input("emb")
    out = Fun("out")
    n, t, d = iters("n", "t", "d")
    out[n, t, d] = table[to_index(tok[n, t]), d]
    out.with_shape([tok.shape[0], tok.shape[1], table.shape[1]])
    out.schedule(tile={"n": 2, "t": 8})
    ex = compile_tpu(out.target("out"), "out",
                     {"tokens": (8, 16), "emb": (32, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_cmpred_gather_full_compile():
    x, a = input("x"), input("a")
    out = Fun("out")
    i, j = iters("i", "j")
    out[i, j] = x[i, j] + a[(i * j) % 96]
    out.with_shape([x.shape[0], x.shape[1]])
    out.schedule(tile={"i": 8})
    ex = compile_tpu(out.target("out"), "out", {"x": (16, 128), "a": (96,)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_cmpred_dynamic_hull_full_compile():
    """The EXACT kernel shape the live chip rejected under the old
    one-hot formulation (suffix sums over a dynamic hull) — must survive
    the full backend under cmpred."""
    a = input("a")
    x = irange("x", 0, a.shape[0])
    dx = irange("dx", 0, a.shape[0] - x)
    out = Fun("out")
    out[x] = a[x + dx]
    out.with_shape([a.shape[0]])
    out.schedule(tile={"x": 8})
    ex = compile_tpu(out.target("out"), "out", {"a": (32,)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_cmpred_scatter_full_compile():
    x = input("x")
    out = Fun("out")
    i, j = iters("i", "j")
    out[(i * j) % 48] = x[i, j]
    out.with_shape([48])
    out.schedule(tile={"j": 64})
    ex = compile_tpu(out.target("out"), "out", {"x": (16, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_onehot_scatter_full_compile():
    tok, v = input("tokens"), input("vals")
    out = Fun("demb")
    i, d = iters("i", "d")
    out[to_index(tok[i]), d] = v[i, d]
    out.with_shape([32, 128])
    out.schedule(tile={"i": 16})
    ex = compile_tpu(out.target("demb"), "demb",
                     {"tokens": (64,), "vals": (64, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_cmpred_max_scatter_full_compile():
    tok, v = input("tokens"), input("vals")
    out = Fun("out")
    i, d = iters("i", "d")
    out.maximize[to_index(tok[i]), d] = v[i, d]
    out.with_shape([16, 128])
    out.schedule(tile={"i": 16})
    ex = compile_tpu(out.target("out"), "out",
                     {"tokens": (64,), "vals": (64, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_onehot_scatter_bench_shape_full_compile():
    """The r4 on-chip failure (BENCH_DETAILS scatter_add_error): at the
    bench shape n=16384 v=2048 d=512 the kernel's real working set
    (24MB) exceeded Mosaic's default 16MB scoped-vmem cap while the
    planner estimated <=14MB.  Pinned at the exact bench config —
    toy shapes hid it."""
    tok, v = input("tokens"), input("vals")
    out = Fun("demb")
    i, d = iters("i", "d")
    out[to_index(tok[i]), d] = v[i, d]
    out.with_shape([2048, 512])
    # tile keys must NAME the iterators: an earlier revision wrote
    # {"x": 256}, which silently left d untiled — the planner shrank d
    # freely and this test passed while the bench (iterator really
    # named x, so the 256 was pinned) declined on the VMEM budget
    out.schedule(tile={"i": 512, "d": 256})
    ex = compile_tpu(out.target("demb"), "demb",
                     {"tokens": (16384,), "vals": (16384, 512)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_flash_attention_fwd_bwd_full_compile():
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    q = jnp.zeros((2, 2, 256, 128), jnp.float32)

    def fwd(q, k, v):
        out = flash_attention(q, k, v, causal=True)
        return jnp.sum(out * out)

    g = jax.grad(fwd, argnums=(0, 1, 2))
    full_compile_fn(g, q, q, q)


def test_flash_attention_bench_shape_default_blocks_full_compile():
    """The r5 auto block default (dense causal -> 256x512) through the
    FULL XLA:TPU + Mosaic pipeline at the bench sequence length — the
    config the on-chip block sweep ranked fastest (BENCH_DETAILS
    flash_block_sweep); fwd + both bwd kernels."""
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    q = jnp.zeros((2, 4, 2048, 128), jnp.float32)

    def fwd(q, k, v):
        out = flash_attention(q, k, v, causal=True)
        return jnp.sum(out * out)

    g = jax.grad(fwd, argnums=(0, 1, 2))
    full_compile_fn(g, q, q, q)


@pytest.mark.parametrize("head_mode", ["batched", "unroll"])
def test_paged_decode_attention_full_compile(head_mode):
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import PagedKVPool
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    b, h, hkv, t, d, P, page = 2, 4, 2, 1, 128, 4, 64
    q = jnp.zeros((b, h, t, d), jnp.float32)
    pk = jnp.zeros((4 * P, hkv, page, d), jnp.float32)
    table = jnp.zeros((b, P), jnp.int32)
    key_pos = jnp.zeros((b, P * page), jnp.int32)
    q_pos = jnp.zeros((b, t), jnp.int32)

    def f(q, pk, pv, table, key_pos, q_pos):
        return paged_decode_attention(
            q, PagedKVPool(k=pk, v=pv), table, key_pos, q_pos,
            head_mode=head_mode,
        )

    full_compile_fn(f, q, pk, pk, table, key_pos, q_pos)


@pytest.mark.parametrize("head_mode", ["batched", "unroll"])
def test_paged_decode_attention_bench_shape_full_compile(head_mode):
    """The exact BENCH shape (b8 hkv8 page128 x16 pages d128, bf16 pool)
    through the complete deviceless v5e pipeline — the r4 scatter-add
    lesson: toy shapes hide real-compiler rejections."""
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import PagedKVPool
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    b, h, hkv, t, d, P, page = 8, 8, 8, 1, 128, 16, 128
    q = jnp.zeros((b, h, t, d), jnp.float32)
    pk = jnp.zeros((b * P + 1, hkv, page, d), jnp.bfloat16)
    table = jnp.zeros((b, P), jnp.int32)
    key_pos = jnp.zeros((b, P * page), jnp.int32)
    q_pos = jnp.zeros((b, t), jnp.int32)

    def f(q, pk, pv, table, key_pos, q_pos):
        return paged_decode_attention(
            q, PagedKVPool(k=pk, v=pv), table, key_pos, q_pos,
            head_mode=head_mode,
        )

    full_compile_fn(f, q, pk, pk, table, key_pos, q_pos)


def test_flash_transformer_train_step_full_compile():
    """The flagship program — a full flash_transformer train target
    (extern flash fwd + symbolic backward + adam) through the complete
    v5e backend, chip-less."""
    from exprgrad_tpu.models.transformer import flash_transformer

    graphs = flash_transformer(vocab=64, dim=128, heads=2, hidden=256,
                               blocks=1, max_seq=256, impl="flash")
    ex = compile_tpu(graphs, "train",
                     {"tokens": (4, 256), "labels": (4, 256, 64)})
    assert ex.stats.get("attention-impl:flash") == 1, ex.stats
