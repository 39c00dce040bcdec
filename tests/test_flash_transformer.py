"""flash_transformer: the layer-library causal LM (fused attention +
rank-polymorphic norms/dense, zero manual reshapes)."""

import numpy as np
import pytest

from exprgrad_tpu import compile
from exprgrad_tpu.models import flash_transformer

VOCAB = 6


def _data(rng, n=4, t=8):
    toks = rng.integers(0, VOCAB, (n, t)).astype(np.float32)
    labels = np.eye(VOCAB, dtype=np.float32)[rng.integers(0, VOCAB, (n, t))]
    return {"tokens": toks, "labels": labels}


def test_flash_transformer_matches_oracle():
    mj = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2),
                 backend="jax", seed=0)
    mi = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2),
                 backend="interp", seed=0)
    rng = np.random.default_rng(0)
    args = _data(rng)
    p_diff = np.max(np.abs(
        mj.call("predict", {"tokens": args["tokens"]})
        - mi.call("predict", {"tokens": args["tokens"]})
    ))
    assert p_diff < 1e-6
    for _ in range(3):
        mj.epoch += 1
        mi.epoch += 1
        lj = mj.call("loss", args)[0]
        li = mi.call("loss", args)[0]
        assert abs(float(lj) - float(li)) < 1e-5
        mj.apply("train", args)
        mi.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(np.asarray(mj.params[tid]) - mi.params[tid])) < 1e-5


def test_flash_transformer_learns():
    model = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2),
                    backend="jax", seed=1)
    rng = np.random.default_rng(1)
    args = _data(rng)
    first = float(model.call("loss", args)[0])
    for _ in range(40):
        model.epoch += 1
        model.apply("train", args)
    last = float(model.call("loss", args)[0])
    assert last < first * 0.5


def test_flash_transformer_gqa_compiles_and_trains():
    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=4, kv_heads=2),
        backend="jax", seed=2,
    )
    rng = np.random.default_rng(2)
    args = _data(rng)
    model.epoch += 1
    model.apply("train", args)
    for tid in model.params:
        assert np.isfinite(np.asarray(model.params[tid])).all()


def test_flash_transformer_lowering_guard():
    """Backend regression guard: the train step must stay free of scatter
    lowerings except the single embedding-table gradient, and route
    attention through the extern kernels."""
    model = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2),
                    backend="jax", seed=3)
    rng = np.random.default_rng(3)
    args = _data(rng)
    model.epoch += 1
    model.apply("train", args)
    stats = model.lowering_stats("train")
    assert stats.get("extern:attention") == 2      # out + lse kernels
    assert stats.get("extern:attention_grad") == 3  # dq, dk, dv
    assert stats.get("general-scatter", 0) <= 1    # embedding grad only
    assert "general-gather" not in stats


def test_flash_transformer_aot_export_roundtrip():
    """AOT serving artifact (jax.export) of the extern-attention predict
    target reproduces the live model."""
    from exprgrad_tpu import load_compiled

    model = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2),
                    backend="jax", seed=4)
    rng = np.random.default_rng(4)
    toks = rng.integers(0, VOCAB, (2, 8)).astype(np.float32)
    data = model.export_compiled("predict", {"tokens": [2, 8]})
    served = load_compiled(data)
    live = np.asarray(model.call("predict", {"tokens": toks}))
    aot = np.asarray(served({"tokens": toks}))
    np.testing.assert_allclose(aot, live, rtol=1e-5, atol=1e-6)


def test_tied_embeddings_gradient_is_sum_of_both_paths():
    """tie_embeddings=True: one parameter feeds the input gather AND the
    LM head; the symbolic autodiff must accumulate both gradient
    contributions.  Checked against central finite differences of the
    loss (gd(rate=1) step = -gradient)."""
    from exprgrad_tpu import make_opt
    from exprgrad_tpu.layers import gradient_descent

    def build():
        return compile(
            flash_transformer(vocab=4, dim=8, heads=2, hidden=8,
                              tie_embeddings=True,
                              opt=make_opt(gradient_descent, rate=1.0)),
            seed=5,
        )

    model = build()
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 4, (2, 4)).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (2, 4))]
    args = {"tokens": toks, "labels": labels}

    embed_tid = next(
        t for t in model.program.params
        if model.program.tensors[t].name == "embed"
    )
    before = np.asarray(model.params[embed_tid]).copy()
    model.epoch += 1
    model.apply("train", args)
    grad = before - np.asarray(model.params[embed_tid])

    # finite differences on a few entries via fresh models (same seed)
    eps = 1e-3
    for (i, j) in [(0, 0), (1, 3), (3, 5)]:
        vals = []
        for sign in (+1, -1):
            m2 = build()
            p = np.asarray(m2.params[embed_tid]).copy()
            p[i, j] += sign * eps
            m2.params[embed_tid] = p
            vals.append(float(m2.call("loss", args)[0]))
        fd = (vals[0] - vals[1]) / (2 * eps)
        assert abs(fd - grad[i, j]) < 5e-3 * max(1.0, abs(fd)), (
            f"embed[{i},{j}]: fd {fd} vs autodiff {grad[i, j]}"
        )


def test_tied_embeddings_param_count_and_serving():
    """Tied model drops the vocab x dim head matrix; FlashLMServer serves
    it (head = embed.T) with prefill matching the predict target."""
    import jax

    from exprgrad_tpu.models.serve import FlashLMServer

    tied = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2,
                          tie_embeddings=True), seed=0
    )
    untied = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2), seed=0
    )
    n_tied = sum(np.prod(np.shape(v)) for v in tied.params.values())
    n_untied = sum(np.prod(np.shape(v)) for v in untied.params.values())
    assert n_untied - n_tied == VOCAB * 16  # the head matrix is gone

    rng = np.random.default_rng(3)
    toks = rng.integers(0, VOCAB, (3, 8)).astype(np.float32)
    labels = np.eye(VOCAB, dtype=np.float32)[
        rng.integers(0, VOCAB, (3, 8))
    ]
    for _ in range(10):
        tied.epoch += 1
        tied.apply("train", {"tokens": toks, "labels": labels})

    import jax.numpy as jnp

    probs = tied.call("predict", {"tokens": toks})
    server = FlashLMServer(tied, cache_dtype=jnp.float32)  # exact parity
    logits, _ = server.prefill(toks, server.init_caches(3))
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(got, probs, atol=1e-5)


def test_rope_matches_oracle_and_learns():
    """Rotary flash_transformer: interp/jax agree through training (the
    rotation + its derived backward are ordinary kernels), and the model
    still learns the +1 cycle without any position table."""
    mj = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2,
                                   rope=True, eta=0.02), seed=0)
    mi = compile(flash_transformer(vocab=VOCAB, dim=16, heads=2,
                                   rope=True, eta=0.02),
                 backend="interp", seed=0)
    assert "pos" not in {
        mj.program.tensors[t].name for t in mj.program.params
    }
    rng = np.random.default_rng(0)
    args = _data(rng)
    for m in (mj, mi):
        m.epoch += 1
        m.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(
            np.asarray(mj.params[tid]) - mi.params[tid]
        )) < 1e-5

    phase = rng.integers(0, VOCAB, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % VOCAB).astype(
        np.float32
    )
    labels = np.eye(VOCAB, dtype=np.float32)[
        ((toks + 1) % VOCAB).astype(int)
    ]
    pat = {"tokens": toks, "labels": labels}
    first = float(mj.call("loss", pat)[0])
    for _ in range(40):
        mj.epoch += 1
        mj.apply("train", pat)
    assert float(mj.call("loss", pat)[0]) < first * 0.5


def test_swiglu_matches_oracle_and_learns():
    """ffn='swiglu': silu gating written in scalar DSL ops — interp/jax
    parity through a training step, and the gated model learns."""
    kw = dict(vocab=VOCAB, dim=16, heads=2, hidden=16, ffn="swiglu",
              eta=0.02)
    mj = compile(flash_transformer(**kw), seed=0)
    mi = compile(flash_transformer(**kw), backend="interp", seed=0)
    rng = np.random.default_rng(0)
    args = _data(rng)
    for m in (mj, mi):
        m.epoch += 1
        m.apply("train", args)
    for tid in mj.params:
        assert np.max(np.abs(
            np.asarray(mj.params[tid]) - mi.params[tid]
        )) < 1e-5

    phase = rng.integers(0, VOCAB, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % VOCAB).astype(
        np.float32
    )
    labels = np.eye(VOCAB, dtype=np.float32)[
        ((toks + 1) % VOCAB).astype(int)
    ]
    pat = {"tokens": toks, "labels": labels}
    first = float(mj.call("loss", pat)[0])
    for _ in range(40):
        mj.epoch += 1
        mj.apply("train", pat)
    assert float(mj.call("loss", pat)[0]) < first * 0.5

    with pytest.raises(ValueError, match="swiglu"):
        flash_transformer(vocab=VOCAB, ffn="gelu")


def test_llama_style_block_serves():
    """The full modern stack — rope + swiglu + tied embeddings +
    rms_norm — trains and serves (quantized too) with exact greedy
    agreement."""
    import jax.numpy as jnp

    from exprgrad_tpu.models.serve import FlashLMServer

    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, hidden=16,
                          rope=True, ffn="swiglu", tie_embeddings=True,
                          eta=0.01),
        seed=0,
    )
    rng = np.random.default_rng(0)
    phase = rng.integers(0, VOCAB, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % VOCAB).astype(
        np.float32
    )
    labels = np.eye(VOCAB, dtype=np.float32)[
        ((toks + 1) % VOCAB).astype(int)
    ]
    for _ in range(40):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})

    server = FlashLMServer(model, cache_dtype=jnp.float32)
    assert server.blocks[0].w3 is not None and server.blocks[0].b1 is None
    probs = np.asarray(model.call("predict", {"tokens": toks[:2]}))
    import jax

    logits, _ = server.prefill(toks[:2], server.init_caches(2))
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits, -1)), probs, atol=1e-5
    )

    prompt = toks[:1, :4]
    out = np.asarray(server.generate(prompt, n_new=10))
    quant = FlashLMServer(model, weight_dtype=jnp.int8,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(quant.generate(prompt, n_new=10)), out
    )
    cont = np.concatenate([prompt, out], axis=1)
    assert (cont[:, 1:] == (cont[:, :-1] + 1) % VOCAB).mean() > 0.9
