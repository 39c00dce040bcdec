"""Smoke tests: every example script must run end to end (reduced sizes)."""

import pathlib
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


def test_derivative_example(capsys):
    import derivative

    derivative.main()
    out = capsys.readouterr().out
    assert "grad_x" in out


def test_matmul_example(capsys):
    import matmul as matmul_example

    matmul_example.main()
    assert "max err" in capsys.readouterr().out


def test_xor_example(monkeypatch, capsys):
    import xor

    real_range = range
    monkeypatch.setattr(
        xor, "range", lambda n: real_range(min(n, 400)), raising=False
    )
    xor.main()
    assert "[" in capsys.readouterr().out


def test_xor_from_scratch_example(monkeypatch, capsys):
    import xor_from_scratch

    real_range = range
    monkeypatch.setattr(
        xor_from_scratch, "range", lambda n: real_range(min(n, 400)),
        raising=False,
    )
    xor_from_scratch.main()
    assert "[" in capsys.readouterr().out


def test_gan_example(tmp_path, monkeypatch, capsys):
    import gan

    monkeypatch.chdir(tmp_path)
    gan.main(steps=3)
    out = capsys.readouterr().out
    assert "discr" in out


def test_fashion_mnist_example(tmp_path, monkeypatch, capsys):
    import fashion_mnist

    def tiny_dataset(path="data"):
        rng = np.random.default_rng(0)

        def synth(n):
            labels = rng.integers(0, 10, n)
            x = rng.normal(0, 0.1, (n, 28, 28)).astype(np.float32)
            for i, label in enumerate(labels):
                x[i, label : label + 10, label : label + 10] += 1.0
            from exprgrad_tpu import one_hot

            return x, one_hot(labels, 10)

        a, b = synth(256)
        c, d = synth(64)
        return a, b, c, d

    monkeypatch.setattr(fashion_mnist, "load_dataset", tiny_dataset)
    real_range = range
    monkeypatch.setattr(
        fashion_mnist, "range", lambda n: real_range(min(n, 2)), raising=False
    )
    monkeypatch.chdir(tmp_path)
    fashion_mnist.main()
    out = capsys.readouterr().out
    assert "test accuracy" in out


def test_transformer_example(monkeypatch, capsys):
    import transformer as transformer_example

    real_range = range
    monkeypatch.setattr(
        transformer_example, "range", lambda n: real_range(min(n, 50)),
        raising=False,
    )
    transformer_example.main()
    assert "accuracy" in capsys.readouterr().out


def test_inverse_rendering_example(tmp_path, monkeypatch, capsys):
    import inverse_rendering

    monkeypatch.setattr(inverse_rendering, "SIZE", 24)
    real_range = range
    monkeypatch.setattr(
        inverse_rendering, "range", lambda n: real_range(min(n, 12)),
        raising=False,
    )
    monkeypatch.chdir(tmp_path)
    inverse_rendering.main()
    assert "learned colors" in capsys.readouterr().out


def test_long_context_attention_example(capsys, monkeypatch):
    import long_context_attention as lca

    # shrink for the smoke run
    def small_main():
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from exprgrad_tpu.ops.attention import flash_attention
        from exprgrad_tpu.parallel import sequence_parallel_attention

        rng = np.random.default_rng(0)
        mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        q, k, v = mk((1, 2, 256, 32)), mk((1, 2, 256, 32)), mk((1, 2, 256, 32))
        out = flash_attention(q, k, v, causal=True)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        ring = sequence_parallel_attention(q, k, v, mesh, causal=True)
        err = float(jnp.max(jnp.abs(ring - out)))
        print(f"ring vs single-device max abs err: {err:.2e}")
        assert err < 1e-5

    monkeypatch.setattr(lca, "main", small_main)
    lca.main()
    assert "max abs err" in capsys.readouterr().out


def test_text_generation_example(monkeypatch, capsys):
    import text_generation

    monkeypatch.setattr(text_generation, "STEPS", 150)
    text_generation.main()
    out = capsys.readouterr().out
    assert "generated:" in out and "serving artifact max dev: 0.0" in out


def test_flash_lm_example(monkeypatch, capsys):
    import flash_lm

    monkeypatch.setattr(flash_lm, "STEPS", 60)
    flash_lm.main()
    out = capsys.readouterr().out
    assert "generation accuracy" in out
    assert "checkpoint reload" in out


def test_seq2seq_example(monkeypatch, capsys):
    import seq2seq as s2s_example

    monkeypatch.setattr(s2s_example, "STEPS", 250)
    s2s_example.main()
    out = capsys.readouterr().out
    assert "reversal accuracy" in out
    acc = float(out.rsplit(":", 1)[1])
    assert acc > 0.9, out


def test_moe_example(monkeypatch, capsys):
    import moe as moe_example

    monkeypatch.setattr(moe_example, "STEPS", 400)
    moe_example.main()
    out = capsys.readouterr().out
    assert "MoE wins by" in out
    ratio = float(out.rsplit("by", 1)[1].rstrip("x)\n"))
    assert ratio > 1.0, out


def test_serving_suite_example(monkeypatch, capsys):
    import serving_suite

    monkeypatch.setattr(serving_suite, "STEPS", 30)
    serving_suite.main()
    out = capsys.readouterr().out
    assert "int8 agrees : True" in out
    assert "exact=True" in out


def test_diffusion_example(monkeypatch, capsys):
    import diffusion

    monkeypatch.setattr(diffusion, "STEPS", 20)
    diffusion.main()
    out = capsys.readouterr().out
    assert "sample mean" in out and "loss" in out


def test_vae_example(monkeypatch, capsys):
    import vae

    monkeypatch.setattr(vae, "STEPS", 20)
    vae.main()
    out = capsys.readouterr().out
    assert "reconstruction mse" in out and "elbo" in out


def test_rnn_lm_example(monkeypatch, capsys):
    import rnn_lm

    monkeypatch.setattr(rnn_lm, "STEPS", 80)
    rnn_lm.main()
    out = capsys.readouterr().out
    assert "generated:" in out


def test_production_training_example(tmp_path, monkeypatch, capsys):
    import production_training

    monkeypatch.chdir(tmp_path)
    production_training.main(epochs=3)
    out = capsys.readouterr().out
    assert "resumed from epoch" in out and "ok" in out


def test_scheduled_kernels_example(capsys):
    import scheduled_kernels

    scheduled_kernels.main()
    out = capsys.readouterr().out
    assert "every scheduled kernel lowered through Pallas" in out
    assert out.count("pallas") >= 6
