"""Model-level weight-only quantization (Model.quantize_weights).

The contraction axes come from the kernel IR (quant.infer_quant_axes):
read axes indexed by reduction iterators fold into the scale, the rest
keep per-channel scales.  Embeddings (computed-index reads), biases
(elementwise reads), and extern-consumed tensors must decline
automatically.
"""

import numpy as np
import pytest

from exprgrad_tpu import ModelRuntimeError, Tensor, compile, input
from exprgrad_tpu.layers import conv2, dense, relu, sigmoid
from exprgrad_tpu.quant import QuantW, infer_quant_axes


def _names(model):
    return {
        model.program.tensors[t].name: t for t in model.program.params
    }


def test_infer_axes_dense_and_conv():
    """dense w[in,out] contracts axis 0; conv2 filters [co,kh,kw,ci]
    contract (1,2,3); biases decline (no contraction)."""
    net = (
        input("x")
        .pipe(dense, 8, 16)
        .pipe(relu)
        .pipe(dense, 16, 4)
        .target("predict")
    )
    model = compile(net, seed=0)
    by_name = {}
    for tid in model.program.params:
        name = model.program.tensors[tid].name
        by_name.setdefault(name, []).append(
            infer_quant_axes(model.program, tid, "predict")
        )
    assert by_name["weights"] == [(0,), (0,)]
    assert by_name["bias"] == [None, None]

    cnn = conv2(input("images"), input("filters")).target("out")
    cm = compile(cnn, seed=0)
    # filters is an input here, but axis inference is kind-agnostic
    flt = cm.program.inputs["filters"]
    assert infer_quant_axes(cm.program, flt, "out") == (1, 2, 3)


def test_quantize_weights_mlp_parity_and_guards():
    from exprgrad_tpu import make_opt
    from exprgrad_tpu.layers import gradient_descent, mse

    net = (
        input("x")
        .pipe(dense, 8, 64)
        .pipe(relu)
        .pipe(dense, 64, 4)
        .pipe(sigmoid)
        .target("predict")
        .pipe(mse, input("y"))
        .target("loss")
        .backprop(make_opt(gradient_descent, rate=0.1))
        .target("train")
    )
    model = compile(net, seed=3)
    rng = np.random.default_rng(0)
    x = Tensor.rand([16, 8], rng=rng)
    full = model.call("predict", {"x": x})

    done = model.quantize_weights(min_size=32)
    assert done == {"weights": (0,)}  # both matrices share the name
    n_q = sum(
        isinstance(v, QuantW) for v in model.params.values()
    )
    assert n_q == 2  # two dense matrices; biases stay f32

    quant = model.call("predict", {"x": x})
    rel = float(np.linalg.norm(quant - full) / np.linalg.norm(full))
    assert rel < 0.02, f"quantized predict drifted {rel:.4f}"

    # training a quantized parameter must refuse
    y = Tensor.rand([16, 4], rng=rng)
    with pytest.raises(ModelRuntimeError, match="inference-only"):
        model.apply("train", {"x": x, "y": y})
    # astype after quantization must refuse
    with pytest.raises(ModelRuntimeError, match="astype"):
        model.astype("bfloat16")
    # second call is a no-op (already quantized)
    assert model.quantize_weights(min_size=32) == {}


def test_quantize_weights_flash_transformer():
    """Embeddings/positions decline (gather reads), dense matrices
    quantize, and greedy predictions survive on a trained model."""
    from exprgrad_tpu.models import flash_transformer

    model = compile(
        flash_transformer(vocab=6, dim=16, heads=2, eta=0.01), seed=0
    )
    rng = np.random.default_rng(0)
    phase = rng.integers(0, 6, 16)
    toks = ((phase[:, None] + np.arange(8)[None, :]) % 6).astype(
        np.float32
    )
    labels = np.eye(6, dtype=np.float32)[((toks + 1) % 6).astype(int)]
    for _ in range(30):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})

    full = model.call("predict", {"tokens": toks})
    done = model.quantize_weights(min_size=64)
    assert "embed" not in done and "pos" not in done
    assert "weights" in done  # the FFN/head matrices
    quant = model.call("predict", {"tokens": toks})
    assert (
        np.argmax(quant, axis=-1) == np.argmax(full, axis=-1)
    ).mean() > 0.99


def test_quantize_weights_validation():
    net = input("x").pipe(dense, 4, 4).target("predict")
    model = compile(net, seed=0)
    with pytest.raises(ModelRuntimeError, match="int8"):
        model.quantize_weights(dtype="float16")
    with pytest.raises(ModelRuntimeError, match="target"):
        model.quantize_weights(target_name="nope")
    interp = compile(net, backend="interp", seed=0)
    with pytest.raises(ModelRuntimeError, match="interp"):
        interp.quantize_weights()


def test_quantized_model_guards_every_path():
    """Review regressions: every execution/serialization path must give
    the clean inference-only error, not a pytree TypeError."""
    import jax

    from exprgrad_tpu import make_opt
    from exprgrad_tpu.layers import gradient_descent, mse

    net = (
        input("x")
        .pipe(dense, 8, 32)
        .pipe(relu)
        .pipe(dense, 32, 4)
        .target("predict")
        .pipe(mse, input("y"))
        .target("loss")
        .backprop(make_opt(gradient_descent, rate=0.1))
        .target("train")
    )
    model = compile(net, seed=0)
    model.quantize_weights(min_size=32)
    rng = np.random.default_rng(0)
    x = Tensor.rand([16, 8], rng=rng)
    y = Tensor.rand([16, 4], rng=rng)

    # fit in BOTH modes dies cleanly (the scan path used to raise a
    # confusing carry-structure TypeError)
    for scan in (False, True):
        with pytest.raises(ModelRuntimeError, match="inference-only"):
            model.fit("train", {"x": x, "y": y}, batch_size=8,
                      log_status=False, scan_batches=scan)

    # export_compiled refuses instead of crashing in jnp.asarray
    with pytest.raises(ModelRuntimeError, match="export"):
        model.export_compiled("predict", {"x": [4, 8]})

    # sharded execution refuses up front (it would silently dequantize)
    if len(jax.devices()) >= 8:
        from exprgrad_tpu.parallel import ShardedExecutor, make_mesh

        with pytest.raises(ModelRuntimeError, match="sharded"):
            ShardedExecutor(model, "train", {"x": [16, 8], "y": [16, 4]},
                            make_mesh(8))


def test_servers_reject_prequantized_models():
    """FlashLMServer/Seq2SeqServer must name the right fix when handed a
    Model.quantize_weights model (weight_dtype is the server-side path)."""
    from exprgrad_tpu.models import FlashLMServer, flash_transformer
    from exprgrad_tpu.models.serve import FlashLMServer as _FS

    model = compile(flash_transformer(vocab=6, dim=16, heads=2), seed=0)
    model.quantize_weights(min_size=64)
    with pytest.raises(ModelRuntimeError, match="weight_dtype"):
        FlashLMServer(model)
