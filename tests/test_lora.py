"""Parameter freezing + LoRA fine-tuning (param(frozen=), layers.lora_dense,
layers.merge_lora).

Contracts pinned here:
- frozen params receive NO optimizer update (and their graph is still
  initialized/checkpointed like any param);
- an all-frozen graph raises at optimize() time;
- lora_dense starts exactly equal to its frozen base (B zero-init),
  trains only the adapters, and merge_lora folds them into the base
  in place without changing forward outputs;
- interp/jax backends agree through the adapter branch.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.errors import ParserError
from exprgrad_tpu.layers import (
    adam, dense, gradient_descent, lora_dense, merge_lora, mse,
)


def _by_name(model):
    out = {}
    for tid in model.program.params:
        nm = model.program.tensors[tid].name
        if nm:
            out[nm] = tid
    return out


def _data(n=32, inp=8, outp=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, inp)).astype(np.float32)
    w = rng.normal(size=(inp, outp)).astype(np.float32)
    y = (x @ w + 0.01 * rng.normal(size=(n, outp))).astype(np.float32)
    return x, y


def _mixed_graph():
    y, x, it = iters("y", "x", "it")
    w_frozen = param([8, 4], (-0.5, 0.5), name="w_frozen", frozen=True)
    w_train = param([4, 4], (-0.5, 0.5), name="w_train")
    inp, lbl = input("inp"), input("lbl")
    h = Fun("h")
    h[y, x] = inp[y, it] * w_frozen[it, x]
    pred = Fun("pred")
    pred[y, x] = h[y, it] * w_train[it, x]
    loss = mse(pred, lbl)
    return loss.target("loss").backwards()


def test_frozen_param_not_updated():
    bw = _mixed_graph()
    net = bw.optimize(make_opt(gradient_descent, rate=0.1)).target("train")
    m = compile(net, backend="jax", seed=3)
    names = _by_name(m)
    frz0 = np.asarray(m.params[names["w_frozen"]]).copy()
    trn0 = np.asarray(m.params[names["w_train"]]).copy()
    inp, lbl = _data()
    for _ in range(3):
        m.apply("train", {"inp": inp, "lbl": lbl})
    np.testing.assert_array_equal(np.asarray(m.params[names["w_frozen"]]), frz0)
    assert np.abs(np.asarray(m.params[names["w_train"]]) - trn0).max() > 1e-6


def test_frozen_grad_kernels_eliminated():
    """No gradient/update tensors for the frozen param survive compilation."""
    bw = _mixed_graph()
    net = bw.optimize(make_opt(gradient_descent, rate=0.1)).target("train")
    m = compile(net, backend="jax", seed=0)
    names = [t.name for t in m.program.tensors]
    assert not any("w_frozen.grad" in (nm or "") for nm in names)


def test_explicit_params_override_freezing():
    """Passing params= explicitly trains exactly that list, frozen or not."""
    bw = _mixed_graph()
    frz = [p for p in bw.params() if p.name == "w_frozen"]
    net = bw.optimize(make_opt(gradient_descent, rate=0.1),
                      params=frz).target("train")
    m = compile(net, backend="jax", seed=3)
    names = _by_name(m)
    frz0 = np.asarray(m.params[names["w_frozen"]]).copy()
    trn0 = np.asarray(m.params[names["w_train"]]).copy()
    inp, lbl = _data()
    m.apply("train", {"inp": inp, "lbl": lbl})
    assert np.abs(np.asarray(m.params[names["w_frozen"]]) - frz0).max() > 1e-6
    np.testing.assert_array_equal(np.asarray(m.params[names["w_train"]]), trn0)


def test_all_frozen_raises():
    y, x, it = iters("y", "x", "it")
    w = param([8, 4], name="w", frozen=True)
    pred = Fun("pred")
    pred[y, x] = input("inp")[y, it] * w[it, x]
    bw = mse(pred, input("lbl")).target("loss").backwards()
    with pytest.raises(ParserError, match="frozen"):
        bw.optimize(make_opt(gradient_descent, rate=0.1))


def _lora_graph(rank=2, alpha=None, optim=None):
    x = input("inp")
    out = lora_dense(x, 8, 4, rank=rank, alpha=alpha,
                     lead_rank=2).target("pred")
    loss = mse(out, input("lbl"))
    bw = loss.target("loss").backwards()
    if optim is None:
        return bw
    return bw.optimize(optim).target("train")


def test_lora_initial_forward_is_base():
    """B zero-init: initial forward == x @ W + bias exactly."""
    m = compile(_lora_graph(optim=make_opt(gradient_descent, rate=0.1)),
                backend="jax", seed=11)
    names = _by_name(m)
    inp, _ = _data()
    got = np.asarray(m.call("pred", {"inp": inp}))
    w = np.asarray(m.params[names["weights"]])
    b = np.asarray(m.params[names["bias"]])
    np.testing.assert_allclose(got, inp @ w + b, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m.params[names["lora_b"]]), 0.0)


def test_lora_trains_only_adapters():
    opt = make_opt(adam, eta=0.02)
    m = compile(_lora_graph(rank=4, optim=opt), backend="jax", seed=5)
    names = _by_name(m)
    w0 = np.asarray(m.params[names["weights"]]).copy()
    b0 = np.asarray(m.params[names["bias"]]).copy()
    a0 = np.asarray(m.params[names["lora_a"]]).copy()
    inp, lbl = _data(64)
    args = {"inp": inp, "lbl": lbl}
    l0 = float(np.asarray(m.call("loss", args)).reshape(-1)[0])
    for _ in range(30):
        m.fit("train", args, batch_size=32, log_status=False)
    l1 = float(np.asarray(m.call("loss", args)).reshape(-1)[0])
    assert l1 < l0 * 0.2, (l0, l1)
    np.testing.assert_array_equal(np.asarray(m.params[names["weights"]]), w0)
    np.testing.assert_array_equal(np.asarray(m.params[names["bias"]]), b0)
    assert np.abs(np.asarray(m.params[names["lora_a"]]) - a0).max() > 1e-6
    assert np.abs(np.asarray(m.params[names["lora_b"]])).max() > 1e-6


def test_merge_lora_preserves_forward():
    opt = make_opt(adam, eta=0.02)
    m = compile(_lora_graph(rank=4, optim=opt), backend="jax", seed=5)
    names = _by_name(m)
    inp, lbl = _data(64)
    for _ in range(10):
        m.fit("train", {"inp": inp, "lbl": lbl}, batch_size=32,
              log_status=False)
    before = np.asarray(m.call("pred", {"inp": inp}))
    w_old = np.asarray(m.params[names["weights"]]).copy()
    a = np.asarray(m.params[names["lora_a"]]).copy()
    b = np.asarray(m.params[names["lora_b"]]).copy()
    merged = merge_lora(m)
    assert merged == ["weights"]
    # base absorbed the adapter product; adapter branch now adds zero
    np.testing.assert_allclose(np.asarray(m.params[names["weights"]]),
                               w_old + a @ b, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(m.params[names["lora_b"]]), 0.0)
    after = np.asarray(m.call("pred", {"inp": inp}))
    np.testing.assert_allclose(after, before, rtol=1e-5, atol=1e-6)
    # the merged weights serve through a PLAIN dense of the same names
    x = input("inp")
    plain = compile(dense(x, 8, 4, rank=2).target("dense"), backend="jax",
                    seed=0)
    pn = _by_name(plain)
    plain.params[pn["weights"]] = np.asarray(m.params[names["weights"]])
    plain.params[pn["bias"]] = np.asarray(m.params[names["bias"]])
    got = np.asarray(plain.call("dense", {"inp": inp}))
    np.testing.assert_allclose(got, before, rtol=1e-5, atol=1e-6)


def test_lora_alpha_scaling():
    """alpha scales the adapter branch by alpha/rank (checked via merge)."""
    opt = make_opt(gradient_descent, rate=0.005)
    m = compile(_lora_graph(rank=2, alpha=8.0, optim=opt), backend="jax",
                seed=7)
    names = _by_name(m)
    inp, lbl = _data(32)
    for _ in range(5):
        m.apply("train", {"inp": inp, "lbl": lbl})
    before = np.asarray(m.call("pred", {"inp": inp}))
    w_old = np.asarray(m.params[names["weights"]]).copy()
    a = np.asarray(m.params[names["lora_a"]]).copy()
    b = np.asarray(m.params[names["lora_b"]]).copy()
    merge_lora(m, alpha=8.0)
    np.testing.assert_allclose(np.asarray(m.params[names["weights"]]),
                               w_old + (8.0 / 2.0) * (a @ b),
                               rtol=1e-6, atol=1e-7)
    after = np.asarray(m.call("pred", {"inp": inp}))
    np.testing.assert_allclose(after, before, rtol=1e-5, atol=1e-6)


def test_lora_interp_jax_parity():
    opt = make_opt(gradient_descent, rate=0.05)
    inp, lbl = _data(16)
    outs = []
    for bk in ("interp", "jax"):
        m = compile(_lora_graph(rank=2, optim=opt), backend=bk, seed=9)
        m.apply("train", {"inp": inp, "lbl": lbl})
        outs.append(np.asarray(m.call("pred", {"inp": inp})))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_lora_checkpoint_roundtrip(tmp_path):
    """Frozen base + adapters persist; training resumes identically."""
    from exprgrad_tpu.io import load_model, save_model

    opt = make_opt(adam, eta=0.02)
    inp, lbl = _data(32)
    m = compile(_lora_graph(rank=2, optim=opt), backend="jax", seed=13)
    m.apply("train", {"inp": inp, "lbl": lbl})
    path = tmp_path / "lora.egt"
    save_model(m, str(path))
    r = load_model(str(path), backend="jax")
    for t in (m, r):
        t.apply("train", {"inp": inp, "lbl": lbl})
    got_m = np.asarray(m.call("pred", {"inp": inp}))
    got_r = np.asarray(r.call("pred", {"inp": inp}))
    np.testing.assert_allclose(got_r, got_m, rtol=1e-6, atol=1e-7)


def test_merge_errors():
    opt = make_opt(gradient_descent, rate=0.1)
    y, x, it = iters("y", "x", "it")
    w = param([8, 4], name="w")
    pred = Fun("pred")
    pred[y, x] = input("inp")[y, it] * w[it, x]
    net = (mse(pred, input("lbl")).target("loss").backwards()
           .optimize(opt).target("train"))
    m = compile(net, backend="jax", seed=0)
    with pytest.raises(ParserError, match="no lora_a"):
        merge_lora(m)
    with pytest.raises(ParserError, match="rank >= 1"):
        lora_dense(input("inp"), 8, 4, rank=0)

    # duplicate (un-prefixed) lora layers cannot be merged unambiguously
    h = lora_dense(input("inp"), 8, 8, rank=2, lead_rank=2)
    out = lora_dense(h, 8, 4, rank=2, lead_rank=2)
    net2 = (mse(out, input("lbl")).target("loss").backwards()
            .optimize(opt).target("train"))
    m2 = compile(net2, backend="jax", seed=0)
    with pytest.raises(ParserError, match="unique prefix"):
        merge_lora(m2)
