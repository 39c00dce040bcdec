"""Flash attention tests (interpret mode on CPU) vs a naive reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exprgrad_tpu.ops.attention import flash_attention


def naive_attention(q, k, v, sm_scale, causal):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if causal:
        sq, skv = s.shape[-2], s.shape[-1]
        mask = np.tril(np.ones((sq, skv), bool))
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _rand_qkv(b=2, h=3, sq=256, skv=256, d=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32), dtype)
    return mk((b, h, sq, d)), mk((b, h, skv, d)), mk((b, h, skv, d))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_naive(causal):
    q, k, v = _rand_qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = naive_attention(q, k, v, scale, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_rectangular_and_small_blocks():
    q, k, v = _rand_qkv(sq=128, skv=384, d=32, seed=1)
    out = flash_attention(q, k, v, block_q=64, block_k=128)
    ref = naive_attention(q, k, v, 1.0 / np.sqrt(32), False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_gradients():
    q, k, v = _rand_qkv(b=1, h=2, sq=128, skv=128, d=32, seed=2)
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive_attention(q, k, v, scale, False) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_flash_bf16():
    q, k, v = _rand_qkv(dtype=jnp.bfloat16, seed=3)
    out = flash_attention(q, k, v)
    ref = naive_attention(q, k, v, 1.0 / np.sqrt(64), False)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_vs_naive(causal):
    """Pallas backward kernels vs autodiff through the naive attention."""
    q, k, v = _rand_qkv(b=1, h=2, sq=256, skv=256, d=32, seed=4)
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive_attention(q, k, v, scale, causal) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_flash_gradients_rectangular():
    """Backward with sq != skv and uneven block sizes."""
    q, k, v = _rand_qkv(b=1, h=1, sq=128, skv=384, d=64, seed=5)
    scale = 1.0 / np.sqrt(64)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=64, block_k=128) ** 2
        )

    def loss_naive(q, k, v):
        return jnp.sum(naive_attention(q, k, v, scale, False) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_vs_xla_vjp(causal):
    """Pallas backward kernels vs the independent plain-XLA VJP oracle,
    with a non-trivial upstream gradient."""
    from exprgrad_tpu.ops.attention import xla_attention_vjp

    q, k, v = _rand_qkv(b=2, h=2, sq=128, skv=128, d=32, seed=6)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=causal)

    _, vjp_fn = jax.vjp(fwd, q, k, v)
    got = vjp_fn(g)
    want = xla_attention_vjp(q, k, v, g, causal=causal)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("hkv", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_gqa(hkv, causal):
    """Grouped-query / multi-query attention: KV heads broadcast over
    query-head groups; gradients reduce over the group."""
    h = 4
    q, _, _ = _rand_qkv(b=2, h=h, sq=128, skv=128, d=32, seed=8)
    _, k, v = _rand_qkv(b=2, h=hkv, sq=128, skv=128, d=32, seed=9)
    group = h // hkv
    k_rep = jnp.repeat(k, group, axis=1)
    v_rep = jnp.repeat(v, group, axis=1)
    scale = 1.0 / np.sqrt(32)

    out = flash_attention(q, k, v, causal=causal)
    ref = naive_attention(q, k_rep, v_rep, scale, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    def loss_gqa(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_rep(q, k, v):
        return jnp.sum(naive_attention(
            q, jnp.repeat(k, group, axis=1), jnp.repeat(v, group, axis=1),
            scale, causal) ** 2)

    got = jax.grad(loss_gqa, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_rep, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=2e-5)


def test_flash_mismatched_heads_rejected():
    q, k, v = _rand_qkv(b=1, h=3, sq=128, skv=128, d=32, seed=10)
    with pytest.raises(ValueError):
        flash_attention(q, k[:, :2], v[:, :2])


def test_flash_attention_bfloat16():
    """bf16 q/k/v through fwd+bwd (the Model.astype('bfloat16') serving
    path feeds bf16 into the kernels): matches the f32 oracle within
    bf16 tolerance, outputs keep the input dtype."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    b, h, s, d = 2, 2, 256, 64
    mk = lambda: (rng.normal(size=(b, h, s, d)) * 0.2).astype(np.float32)
    qf, kf, vf, gf = mk(), mk(), mk(), mk()
    q16, k16, v16 = (jnp.asarray(x, jnp.bfloat16) for x in (qf, kf, vf))

    out16, vjp16 = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, causal=True), q16, k16,
        v16,
    )
    assert out16.dtype == jnp.bfloat16
    grads16 = vjp16(jnp.asarray(gf, jnp.bfloat16))
    out32, vjp32 = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, causal=True),
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf),
    )
    grads32 = vjp32(jnp.asarray(gf))
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=2e-2
    )
    for g16, g32 in zip(grads16, grads32):
        assert g16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g16, np.float32), np.asarray(g32), atol=6e-2
        )


def test_tri_schedule_enumerates_exactly_the_live_tiles():
    """Plain causal attention walks a flat grid of exactly the live
    (q, kv) tiles (scalar-prefetch enumeration) — about half the
    rectangular grid's steps and DMAs."""
    from exprgrad_tpu.ops.attention import _tri_schedule

    num_q = num_kv = 16
    q_of, kv_of, first, last = _tri_schedule(num_q, num_kv, 128, 128, "q")
    assert len(q_of) == num_q * (num_q + 1) // 2  # triangle, not square
    # every enumerated tile is causally live; bands start/end correctly
    for t in range(len(q_of)):
        assert kv_of[t] <= q_of[t]
        assert (kv_of[t] == 0) == bool(first[t])
        assert (kv_of[t] == q_of[t]) == bool(last[t])
    kq, kk, kf, kl = _tri_schedule(num_q, num_kv, 128, 128, "kv")
    assert len(kq) == len(q_of)
    for t in range(len(kq)):
        assert kk[t] <= kq[t]
