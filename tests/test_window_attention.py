"""Sliding-window flash attention (forward + backward, GQA): parity
against a dense masked-softmax oracle in interpret mode.  The band mask
is (r - window, r] combined with causal; out-of-band tiles are skipped
entirely by the kernels (the predicate is exercised here because S spans
multiple blocks with window < S)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exprgrad_tpu.ops.attention import flash_attention

B, H, S, D = 2, 2, 256, 32
BLOCK = 64


def _qkv(hkv=H, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda h: jnp.asarray(
        rng.normal(size=(B, h, S, D)).astype(np.float32))
    return mk(H), mk(hkv), mk(hkv)


def _dense(q, k, v, window, causal=True):
    """Dense masked-softmax oracle (f32)."""
    group = q.shape[1] // k.shape[1]
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    keep = rows >= cols if causal else np.ones((S, S), bool)
    if window is not None:
        keep = keep & (cols > rows - window)
    s = jnp.where(keep, s, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("window", [1, 32, 100, 256])
def test_window_forward_matches_dense(window):
    q, k, v = _qkv()
    out = flash_attention(q, k, v, causal=True, window=window,
                          block_q=BLOCK, block_k=BLOCK)
    ref = _dense(q, k, v, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_window_full_equals_causal():
    """window >= S keeps the whole causal triangle: identical output."""
    q, k, v = _qkv(seed=1)
    w = flash_attention(q, k, v, causal=True, window=S,
                        block_q=BLOCK, block_k=BLOCK)
    c = flash_attention(q, k, v, causal=True,
                        block_q=BLOCK, block_k=BLOCK)
    np.testing.assert_allclose(np.asarray(w), np.asarray(c), atol=1e-6)


@pytest.mark.parametrize("window", [32, 100])
def test_window_gradients_match_dense(window):
    q, k, v = _qkv(seed=2)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, window=window,
                                       block_q=BLOCK, block_k=BLOCK) * g)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, window) * g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_window_gqa():
    """Grouped-query heads with a window: forward + backward parity."""
    q, k, v = _qkv(hkv=1, seed=4)
    out = flash_attention(q, k, v, causal=True, window=64,
                          block_q=BLOCK, block_k=BLOCK)
    ref = _dense(q, k, v, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    got = jax.grad(lambda *a: jnp.sum(flash_attention(
        *a, causal=True, window=64, block_q=BLOCK, block_k=BLOCK) * g),
        argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(lambda *a: jnp.sum(_dense(*a, 64) * g),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_window_validation():
    q, k, v = _qkv(seed=6)
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, k, v, causal=False, window=16)
    with pytest.raises(ValueError, match="window"):
        flash_attention(q, k, v, causal=True, window=0)


# ---------------------------------------------------------------------------
# through the DSL extern seam and the serving stack
# ---------------------------------------------------------------------------

def _train_windowed(window, impl="auto", steps=150):
    from exprgrad_tpu import compile, one_hot
    from exprgrad_tpu.models import flash_transformer

    model = compile(
        flash_transformer(vocab=6, dim=16, heads=2, eta=0.01,
                          window=window, impl=impl),
        seed=1, backend="jax",
    )
    rng = np.random.default_rng(0)
    toks = ((rng.integers(0, 6, 16)[:, None] + np.arange(8)[None, :]) % 6
            ).astype(np.float32)
    labels = one_hot(((toks + 1) % 6).astype(int), 6).reshape(16, 8, 6)
    for _ in range(steps):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return model, toks


@pytest.mark.parametrize("impl", ["xla", "flash"])
def test_windowed_transformer_interp_parity(impl):
    """Windowed attention through the extern seam: the jax backend and
    the independent numpy oracle agree on predict."""
    from exprgrad_tpu import compile
    from exprgrad_tpu.models import flash_transformer

    net = flash_transformer(vocab=6, dim=16, heads=2, window=4, impl=impl)
    mj = compile(net, seed=3, backend="jax")
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 6, (2, 8)).astype(np.float32)
    pj = np.asarray(mj.call("predict", {"tokens": toks}))

    net2 = flash_transformer(vocab=6, dim=16, heads=2, window=4, impl=impl)
    mi = compile(net2, seed=3, backend="interp")
    for tid in mj.params:
        mi.params[tid] = np.asarray(mj.params[tid]).copy()
    pi = np.asarray(mi.call("predict", {"tokens": toks}))
    np.testing.assert_allclose(pj, pi, rtol=1e-4, atol=1e-5)


def test_windowed_model_differs_from_global():
    """The window actually changes the math (same seed, same data)."""
    from exprgrad_tpu import compile
    from exprgrad_tpu.models import flash_transformer

    rng = np.random.default_rng(2)
    toks = rng.integers(0, 6, (2, 8)).astype(np.float32)
    mw = compile(flash_transformer(vocab=6, dim=16, heads=2, window=2),
                 seed=5, backend="jax")
    mg = compile(flash_transformer(vocab=6, dim=16, heads=2),
                 seed=5, backend="jax")
    pw = np.asarray(mw.call("predict", {"tokens": toks}))
    pg = np.asarray(mg.call("predict", {"tokens": toks}))
    assert np.abs(pw - pg).max() > 1e-4


def test_windowed_server_matches_predict():
    """FlashLMServer discovers the window from the extern attrs; its
    prefill logits match the compiled predict target, and generation
    matches sliding-window greedy decoding through the model."""
    import jax.numpy as jnp

    from exprgrad_tpu.models import FlashLMServer

    model, toks = _train_windowed(window=4)
    server = FlashLMServer(model, cache_dtype=jnp.float32)
    assert server.window == 4

    logits, _ = server.prefill(toks[:2], server.init_caches(2))
    probs = np.asarray(jnp.asarray(
        jnp.exp(logits - jnp.max(logits, -1, keepdims=True))))
    probs = probs / probs.sum(-1, keepdims=True)
    want = np.asarray(model.call("predict", {"tokens": toks[:2]}))
    np.testing.assert_allclose(probs, want, rtol=1e-4, atol=1e-5)

    got = np.asarray(server.generate(
        np.asarray([[2.0, 3.0, 4.0]], np.float32), n_new=5))[0].astype(int)
    ref = [2, 3, 4]
    for _ in range(5):
        win = np.asarray(ref, np.float32)[None, :]
        p = np.asarray(model.call("predict", {"tokens": win}))
        ref.append(int(p[0, -1].argmax()))
    assert list(got) == ref[3:]


def test_server_rejects_mixed_windows():
    """A program mixing windowed and full-causal attention blocks cannot
    be served with one decode mask: ModelRuntimeError, not silent
    truncation of the full-attention blocks."""
    from exprgrad_tpu import ModelRuntimeError
    from exprgrad_tpu.models import FlashLMServer

    model, _ = _train_windowed(window=4, steps=1)
    # flip ONE attention extern to full causal (window attr 0)
    flipped = False
    for target in model.program.targets.values():
        for kern in target.kernels:
            if kern.extern is not None and kern.extern.name == "attention":
                kern.extern.attrs["window"] = 0
                flipped = True
                break
        if flipped:
            break
    assert flipped
    with pytest.raises(ModelRuntimeError, match="window"):
        FlashLMServer(model)


def test_windowed_attrs_survive_checkpoint(tmp_path):
    """window rides the extern attrs through save/load; the reloaded
    oracle-backend model reproduces predictions."""
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.models import FlashLMServer

    model, toks = _train_windowed(window=4, steps=20)
    path = str(tmp_path / "windowed.egt")
    save_model(model, path)
    re = load_model(path, backend="interp")
    a = np.asarray(model.call("predict", {"tokens": toks[:1]}))
    b = np.asarray(re.call("predict", {"tokens": toks[:1]}))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    re_jax = load_model(path, backend="jax")
    assert FlashLMServer(re_jax).window == 4


def test_banded_grid_extent_is_o_window():
    """The windowed kernels shrink the GRID to the live band (dead tiles
    are never visited — pl.when alone still pays the grid step + block
    DMA): at S=4096 W=512 with 128-blocks the kv dim drops 32 -> ~6."""
    from exprgrad_tpu.ops.attention import _kv_band, _q_band

    s, w, bq, bk = 4096, 512, 128, 128
    num_q, num_kv = s // bq, s // bk
    band_kv = _kv_band(num_q, num_kv, bq, bk, w)
    band_q = _q_band(num_q, num_kv, bq, bk, w)
    assert band_kv <= (w + bq) // bk + 1, band_kv
    assert band_q <= (w + bk) // bq + 1, band_q
    assert band_kv < num_kv // 4
    assert band_q < num_q // 4


def test_flash_tile_counts_bench_shape():
    """Static visited-vs-live accounting (VERDICT r4 #7): at the window
    bench shape (S=4096 W=512, 128-blocks) the banded grids visit 160
    tiles of which 150 are live — dead tiles are ~6%, so any measured
    shortfall below the 3.3x tile bound is per-step/per-row overhead."""
    from exprgrad_tpu.ops.attention import flash_tile_counts

    t = flash_tile_counts(4096, 4096, 128, 128, causal=True, window=512)
    for kern in ("fwd", "dq", "dkv"):
        assert t[kern]["visited"] == 160, t
        assert t[kern]["live"] == 150, t
        assert t[kern]["dead"] == 10, t
    assert t["causal_visited"] == 528
    assert abs(t["tile_bound"] - 3.3) < 0.01

    # plain causal triangle enumeration is exact: zero dead steps
    c = flash_tile_counts(4096, 4096, 128, 128, causal=True)
    for kern in ("fwd", "dq", "dkv"):
        assert c[kern]["visited"] == c[kern]["live"] == 528, c
        assert c[kern]["dead"] == 0

    # dead fraction stays small across block configs
    for bq, bk in ((128, 256), (256, 128), (256, 256), (128, 512)):
        w = flash_tile_counts(4096, 4096, bq, bk, causal=True, window=512)
        for kern in ("fwd", "dq", "dkv"):
            assert w[kern]["visited"] >= w[kern]["live"], (bq, bk, w)
            assert w[kern]["dead"] <= 0.25 * w[kern]["visited"], (bq, bk, w)


def test_mask_gating_branches_cover_band_edges():
    """The mask-free fast path must fire only on fully-live tiles: check
    the predicate against a brute-force element mask on every tile of a
    windowed grid (including the clamped band edges)."""
    import numpy as np

    from exprgrad_tpu.ops.attention import _tile_needs_mask

    s, w, bq, bk = 1024, 256, 128, 128
    num = s // bq
    for i in range(num):
        for j in range(num):
            rows = np.arange(i * bq, (i + 1) * bq)[:, None]
            cols = np.arange(j * bk, (j + 1) * bk)[None, :]
            keep = (cols <= rows) & (cols > rows - w)
            intersects = keep.any()
            any_masked = bool((~keep).any())
            needs = _tile_needs_mask(i, j, block_q=bq, block_k=bk,
                                     causal=True, window=w, offs_ref=None)
            needs = bool(needs)
            if intersects and not any_masked:
                assert not needs, (i, j)
            if intersects and any_masked:
                assert needs, (i, j)


def test_flash_tile_counts_mirror_kernel_grid_conditions():
    """flash_tile_counts must report the grid the kernels actually
    build (r5 review finding): banding needs sq == skv; off the square
    shape the kernels walk the full rectangular grid even when
    windowed, and the no-window baseline is the full grid when the
    triangle enumeration doesn't apply."""
    from exprgrad_tpu.ops.attention import flash_tile_counts

    # windowed but sq != skv: the kernels do NOT band (banded requires
    # sq == skv) — visited must be the full grid, tile_bound 1.0
    t = flash_tile_counts(4096, 2048, 128, 128, causal=True, window=512)
    full = (4096 // 128) * (2048 // 128)
    for kern in ("fwd", "dq", "dkv"):
        assert t[kern]["visited"] == full, t
    assert t["causal_visited"] == full
    assert t["tile_bound"] == 1.0

    # non-causal windowed is rejected by flash_attention._resolve
    # ("window requires causal=True"); the accounting mirrors the error
    # instead of reporting counts for an unreachable config
    with pytest.raises(ValueError, match="window requires causal"):
        flash_tile_counts(4096, 4096, 128, 128, causal=False, window=512)

    # causal square without window: triangle enumeration (unchanged pin)
    c = flash_tile_counts(4096, 4096, 128, 128, causal=True)
    assert c["fwd"]["visited"] == 528
