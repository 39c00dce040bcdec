"""AOT TPU (Mosaic) lowering verification — no chip required.

Interpret-mode tests execute kernel bodies with numpy semantics and skip
the Mosaic lowering entirely, so a construct the TPU compiler rejects
can survive a fully green CPU suite (this happened twice: round 2's
flash ``lse`` block layout, and the strided-read family's
``vector.extract_strided_slice`` stride>1 slices, caught only when a
tunnel flap briefly exposed the real backend).

``jax.jit(fn).trace(...).lower(lowering_platforms=("tpu",))`` builds and
VERIFIES the actual Mosaic kernels on this CPU-only host — the
full-strength version of the static spec checks in ``ops/mosaic_check``
(and the analog of the reference's compile-only golden GPU tests,
tests/test_gpu.nim:21-34).  The ``REAL_LOWERING`` hook forces the
package's pallas_calls out of interpret mode for the duration.

Every test here lowers one representative emitter family for TPU and
asserts the expected Pallas route was actually taken.
"""

import numpy as np
import pytest

import exprgrad_tpu.ops.mosaic_check as mosaic_check
from exprgrad_tpu import (
    Fun,
    compile,
    exp,
    input,
    irange,
    iters,
    select,
    sq,
)


@pytest.fixture(autouse=True)
def real_lowering(monkeypatch):
    monkeypatch.setattr(mosaic_check, "REAL_LOWERING", True)


@pytest.fixture(autouse=True)
def chip_dtype_conditions():
    """Real TPU runs have x64 OFF (the suite's conftest enables it for
    f64 oracle parity); lower under chip conditions so weak Python-float
    constants trace as f32, as they do on hardware."""
    import jax

    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


from aot_util import lower_tpu  # noqa: E402


def test_harness_detects_mosaic_violations():
    """Meta-test: a deliberately illegal kernel (strided vector slice)
    must FAIL AOT verification — proving the harness has teeth."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def body(x_ref, o_ref):
        v = jax.lax.slice_in_dim(x_ref[...], 1, 16, stride=2, axis=0)
        o_ref[...] = v * 2.0

    def f(x):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec((16, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        )(x)

    x = jnp.zeros((16, 128), jnp.float32)
    with pytest.raises(Exception, match="Mosaic|Verification|strides"):
        jax.jit(f).trace(x).lower(lowering_platforms=("tpu",))


def test_strided_pool_read_lowers():
    """The stride-plan family (pool windows, s*i + c reads) — the family
    the strided-slice Mosaic bug lived in (fixed via reshape phase
    split, _strided_phase)."""
    t = input("t")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = t[2 * y, x] + t[2 * y + 1, x]
    out.schedule(tile={"y": 8})
    ex = lower_tpu(out.target("out"), "out", {"t": (32, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_grouped_upsample_read_lowers():
    t = input("t")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = t[y // 2, x] * 2.0
    out.with_shape([t.shape[0] * 2, t.shape[1]])
    out.schedule(tile={"y": 16})
    ex = lower_tpu(out.target("out"), "out", {"t": (16, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_shifted_stencil_lane_lowers():
    img = input("img")
    out = Fun("out")
    y = iters("y")
    x = irange("x", 0, img.shape[1] - 2)
    out[y, x] = (img[y, x] + img[y, x + 1] + img[y, x + 2]) * (1.0 / 3.0)
    out.schedule(tile={"y": 8})
    ex = lower_tpu(out.target("out"), "out", {"img": (32, 130)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_strided_phase_read_sublane_lowers():
    """Strided (s=2, phase 1) read on a non-lane axis — the exact shape
    that surfaced the Mosaic strided-slice rejection during a tunnel
    flap (rank-3, tiled middle axis): now a reshape phase split."""
    base, t2 = input("base"), input("t2")
    out = Fun("out")
    b, y, x = iters("b", "y", "x")
    out[b, x] = base[b, y, x] * t2[b, 2 * y + 1, x]
    out.schedule(tile={"y": 8})
    ex = lower_tpu(out.target("out"), "out",
                   {"base": (4, 24, 128), "t2": (4, 48, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_masked_ragged_matmul_lowers():
    a, b = input("a"), input("b")
    c = Fun("c")
    y, x, it = iters("y", "x", "it")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 16, "x": 48, "it": 100}, parallel=["y", "x"])
    ex = lower_tpu(c.target("c"), "c", {"a": (37, 211), "b": (211, 93)})
    assert ex.stats.get("pallas") == 1, ex.stats


def test_iterator_mask_and_ragged_reduction_lower():
    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y] = select(x <= y, exp(a[y, x]), 0.0)
    out.schedule(tile={"x": 100})  # ragged lane tile: 200 -> 256 padded
    ex = lower_tpu(out.target("out"), "out", {"a": (16, 200)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_triangular_dynamic_bound_lowers():
    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    out = Fun("out")
    out[y] = a[y, x]
    out.schedule(tile={"y": 32})
    ex = lower_tpu(out.target("out"), "out", {"a": (128, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_permuted_write_lowers():
    a = input("a")
    out = Fun("out")
    y, x = iters("y", "x")
    out[x, y] = a[y, x] * 2.0
    out.schedule(tile={"y": 16})
    ex = lower_tpu(out.target("out"), "out", {"a": (64, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_raw_activation_lowers():
    inp = input("inp")
    out = Fun("out")
    it = iters("it")
    out.raw[it] = select(inp.raw[it] >= 0.0, inp.raw[it], 0.0)
    out.schedule(tile={"it": 256})
    ex = lower_tpu(out.target("out"), "out", {"inp": (64, 100)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_scalar_loss_lowers():
    a, b = input("a"), input("b")
    loss = Fun("loss")
    y, x = iters("y", "x")
    loss[0] = sq(a[y, x] - b[y, x])
    loss.schedule(tile={"y": 16})
    ex = lower_tpu(loss.target("loss"), "loss",
                   {"a": (64, 128), "b": (64, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_gather_embedding_lookup_lowers():
    """The data-dependent read family (emb[to_index(tok[n, t]), d]):
    whole-resident table + one-hot MXU row selection."""
    from exprgrad_tpu import to_index

    tok, table = input("tokens"), input("emb")
    out = Fun("out")
    n, t, d = iters("n", "t", "d")
    out[n, t, d] = table[to_index(tok[n, t]), d]
    out.with_shape([tok.shape[0], tok.shape[1], table.shape[1]])
    out.schedule(tile={"n": 2, "t": 8})
    ex = lower_tpu(out.target("out"), "out",
                   {"tokens": (8, 16), "emb": (32, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_scatter_add_embedding_grad_lowers():
    """The data-dependent write family (demb[to_index(tok[i]), d] +=
    v[i, d]): transposed one-hot contraction into a whole-resident out
    block."""
    from exprgrad_tpu import to_index

    tok, v = input("tokens"), input("vals")
    out = Fun("demb")
    i, d = iters("i", "d")
    out[to_index(tok[i]), d] = v[i, d]
    out.with_shape([32, 128])
    out.schedule(tile={"i": 16})
    ex = lower_tpu(out.target("demb"), "demb",
                   {"tokens": (64,), "vals": (64, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_pure_iterator_computed_read_lowers():
    """Non-affine pure-iterator read index (a[(i * j) % V]): the
    computed-index gather (iota-built index + one-hot MXU selection)
    must survive real Mosaic lowering."""
    x, a = input("x"), input("a")
    out = Fun("out")
    i, j = iters("i", "j")
    out[i, j] = x[i, j] + a[(i * j) % 96]
    out.with_shape([x.shape[0], x.shape[1]])
    out.schedule(tile={"i": 8})
    ex = lower_tpu(out.target("out"), "out",
                   {"x": (16, 128), "a": (96,)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_pure_iterator_computed_scatter_lowers():
    """Non-affine pure-iterator WRITE index (out[(i * j) % V] += x[i, j])
    through the transposed one-hot scatter-add under real Mosaic."""
    x = input("x")
    out = Fun("out")
    i, j = iters("i", "j")
    out[(i * j) % 48] = x[i, j]
    out.with_shape([48])
    out.schedule(tile={"j": 64})
    ex = lower_tpu(out.target("out"), "out", {"x": (16, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_cmpred_scatter_nonlane_lowers():
    """Compare-reduce scatter (out axis != lane, trailing flat V) under
    real Mosaic lowering."""
    x = input("x")
    out = Fun("out")
    i0, i1, i2 = iters("i0", "i1", "i2")
    out[(i1 * i2) % 40, i0] = x[i0, i1, i2]
    out.with_shape([40, 16])
    out.schedule(tile={"i0": 8})
    ex = lower_tpu(out.target("out"), "out", {"x": (16, 8, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_multi_computed_read_write_lowers():
    """Flat-folded multi-dim computed read + two-dim computed scatter
    under real Mosaic lowering."""
    a, x = input("a"), input("x")
    out = Fun("out")
    i, j = iters("i", "j")
    out[(2 * i) % 16, (j * j) % 24] = x[i, j] * a[(i + j) % 40, (i * j) % 16]
    out.with_shape([16, 24])
    out.schedule(tile={"i": 8})
    ex = lower_tpu(out.target("out"), "out",
                   {"a": (40, 16), "x": (16, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_epoch_operand_kernel_lowers():
    """The epoch() scalar operand ((1, 1) int32 block) under real Mosaic
    lowering."""
    from exprgrad_tpu import epoch, to_scalar

    w = input("w")
    out = Fun("out")
    y, x = iters("y", "x")
    out[y, x] = w[y, x] * to_scalar(epoch() + 1)
    out.schedule(tile={"y": 8})
    ex = lower_tpu(out.target("out"), "out", {"w": (16, 128)})
    assert ex.stats.get("pallas-mapreduce") == 1, ex.stats


def test_rowchain_softmax_lowers():
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile={"y": 32})
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(inp[y, x] - mx[y])
    sums.schedule(tile={"y": 32})
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = exp(inp[y, x] - mx[y]) / sums[y]
    out.schedule(tile={"y": 32})
    ex = lower_tpu(out.target("out"), "out", {"inp": (256, 512)})
    assert ex.stats.get("pallas-rowchain") == 1, ex.stats


def test_rowchain_escaping_output_lowers():
    """Multi-output fused chain (escaping intermediate)."""
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile={"y": 32})
    y, x = iters("y", "x")
    out = Fun("out")
    out[y, x] = inp[y, x] - mx[y]
    out.schedule(tile={"y": 32})
    z = iters("z")
    esc = Fun("esc")
    esc[z] = mx[z] * 2.0
    ex = lower_tpu([out.target("out"), esc.target("esc")], "out",
                   {"inp": (128, 256)})
    assert ex.stats.get("pallas-rowchain") == 1, ex.stats


def test_causal_softmax_rowchain_lowers():
    """The causal-masked softmax row chain (iota mask blocks inside a
    fused chain) under real Mosaic lowering."""
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
    ex = lower_tpu(out.target("out"), "out", {"inp": (128, 128)})
    assert ex.stats.get("pallas-rowchain") == 1, ex.stats


def test_epilogue_fused_dense_lowers():
    a, b, bias = input("a"), input("b"), input("bias")
    c = Fun("c")
    y, x, it = iters("y", "x", "it")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 128, "x": 128, "it": 128}, parallel=["y", "x"])
    r = Fun("r")
    y, x = iters("y", "x")
    r[y, x] = select(c[y, x] + bias[x] >= 0.0, c[y, x] + bias[x], 0.0)
    ex = lower_tpu(r.target("r"), "r",
                   {"a": (256, 256), "b": (256, 256), "bias": (256,)})
    assert ex.stats.get("pallas-fused") == 1, ex.stats


# ---------------------------------------------------------------------------
# flagship ops kernels: verify the round-4 rewrites (triangle-enumerated
# causal grids, banded window grids, head-chunked paged decode) on real
# Mosaic — none of these have seen the chip yet this round
# ---------------------------------------------------------------------------


def _lower_fn(f, *args):
    import jax

    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def test_flash_attention_causal_fwd_bwd_lowers():
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    q = jnp.zeros((2, 4, 512, 128), jnp.float32)

    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=True).sum()

    _lower_fn(fwd, q, q, q)
    _lower_fn(jax.grad(fwd, argnums=(0, 1, 2)), q, q, q)


def test_flash_attention_windowed_fwd_bwd_lowers():
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    q = jnp.zeros((1, 4, 1024, 128), jnp.float32)

    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=True, window=256).sum()

    _lower_fn(fwd, q, q, q)
    _lower_fn(jax.grad(fwd, argnums=(0, 1, 2)), q, q, q)


def test_flash_attention_gqa_lowers():
    import jax.numpy as jnp

    from exprgrad_tpu.ops.attention import flash_attention

    q = jnp.zeros((2, 8, 256, 128), jnp.float32)
    kv = jnp.zeros((2, 2, 256, 128), jnp.float32)
    _lower_fn(lambda q, k, v: flash_attention(q, k, v, causal=True),
              q, kv, kv)


def test_pallas_matmul_fwd_bwd_lowers():
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops.matmul import pallas_matmul

    a = jnp.zeros((512, 512), jnp.float32)

    def f(a, b):
        return pallas_matmul(a, b).sum()

    _lower_fn(f, a, a)
    _lower_fn(jax.grad(f, argnums=(0, 1)), a, a)


@pytest.mark.parametrize("head_mode", ["batched", "unroll"])
def test_paged_decode_attention_lowers(head_mode):
    """The round-4 regridded (row, head-chunk, page) decode kernel with
    scalar-prefetched page tables, both head-chunk compute modes."""
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import PagedKVPool
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    b, h, hkv, t, d, P, page = 2, 4, 2, 1, 128, 4, 64
    pool = PagedKVPool(
        k=jnp.zeros((4 * P, hkv, page, d), jnp.float32),
        v=jnp.zeros((4 * P, hkv, page, d), jnp.float32),
    )
    q = jnp.zeros((b, h, t, d), jnp.float32)
    table = jnp.zeros((b, P), jnp.int32)
    key_pos = jnp.zeros((b, P * page), jnp.int32)
    q_pos = jnp.zeros((b, t), jnp.int32)

    def f(q, pk, pv, table, key_pos, q_pos):
        return paged_decode_attention(
            q, PagedKVPool(k=pk, v=pv), table, key_pos, q_pos,
            head_mode=head_mode,
        )

    _lower_fn(f, q, pool.k, pool.v, table, key_pos, q_pos)


def test_paged_decode_attention_windowed_lowers():
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import PagedKVPool
    from exprgrad_tpu.ops.paged_attention import paged_decode_attention

    b, h, hkv, t, d, P, page = 2, 4, 4, 1, 128, 4, 64
    pk = jnp.zeros((4 * P, hkv, page, d), jnp.float32)
    q = jnp.zeros((b, h, t, d), jnp.float32)
    table = jnp.zeros((b, P), jnp.int32)
    key_pos = jnp.zeros((b, P * page), jnp.int32)
    q_pos = jnp.zeros((b, t), jnp.int32)

    def f(q, pk, pv, table, key_pos, q_pos):
        return paged_decode_attention(
            q, PagedKVPool(k=pk, v=pv), table, key_pos, q_pos, window=40
        )

    _lower_fn(f, q, pk, pk, table, key_pos, q_pos)


def test_flash_transformer_train_step_lowers():
    """The flagship end-to-end program: a flash_transformer train target
    (extern flash attention fwd + symbolic backward + adam updates, ~195
    kernels in one jit) lowered for TPU in full."""
    from exprgrad_tpu.models.transformer import flash_transformer

    graphs = flash_transformer(vocab=64, dim=128, heads=2, hidden=256,
                               blocks=2, max_seq=256, impl="flash")
    ex = lower_tpu(graphs, "train",
                   {"tokens": (4, 256), "labels": (4, 256, 64)})
    assert ex.stats.get("attention-impl:flash") == 2, ex.stats
    assert ex.stats.get("attention-grad-impl:flash") == 2, ex.stats
