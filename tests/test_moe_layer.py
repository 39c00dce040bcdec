"""DSL-level mixture-of-experts FFN (layers.moe_ffn, ops/moe.py).

The extern seam gives top-k routed expert FFNs symbolic-autodiff
gradients like fused attention: forward parity between the jax backend
and the numpy oracle, training-step parity (jax vjp vs the hand-derived
numpy backward), routing exactness, and the MoE transformer variant.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, to_scalar
from exprgrad_tpu.fun import make_opt
from exprgrad_tpu.layers import adam, moe_ffn
from exprgrad_tpu.models import flash_transformer

DIM, HID, E = 8, 16, 4


def _fwd_graph(k=2):
    x = input("x")
    return moe_ffn(x, DIM, HID, n_experts=E, k=k).target("y")


def _train_graph(k=2):
    x = input("x")
    t = input("t")
    y = moe_ffn(x, DIM, HID, n_experts=E, k=k)
    i, j, kk = iters("i", "j", "k")
    loss = Fun("loss")
    loss[0] = (y[i, j, kk] - t[i, j, kk]) ** 2 / to_scalar(
        x.shape[0] * x.shape[1]
    )
    return (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(adam, eta=0.01))
        .target("train")
    )


@pytest.mark.parametrize("k", [1, 2, 4])
def test_forward_matches_oracle(k):
    rng = np.random.default_rng(k)
    v = rng.normal(size=(2, 5, DIM)).astype(np.float32)
    g = _fwd_graph(k)
    a = np.asarray(compile(g, backend="jax", seed=3).call("y", {"x": v}))
    b = np.asarray(compile(g, backend="interp", seed=3).call("y", {"x": v}))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_training_step_parity_between_backends():
    """The numpy backward (hand-derived vjp incl. the softmax/top-k
    renormalization chain) matches jax.vjp step for step."""
    rng = np.random.default_rng(0)
    g = _train_graph()
    mj = compile(g, backend="jax", seed=5)
    mi = compile(g, backend="interp", seed=5)
    args = {
        "x": rng.normal(size=(2, 5, DIM)).astype(np.float32),
        "t": rng.normal(size=(2, 5, DIM)).astype(np.float32),
    }
    for _ in range(3):
        mj.epoch += 1
        mi.epoch += 1
        mj.apply("train", args)
        mi.apply("train", args)
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), np.asarray(mi.params[tid]),
            atol=5e-6,
        )


def test_moe_trains():
    rng = np.random.default_rng(1)
    m = compile(_train_graph(), backend="jax", seed=2)
    args = {
        "x": rng.normal(size=(2, 5, DIM)).astype(np.float32),
        "t": rng.normal(size=(2, 5, DIM)).astype(np.float32),
    }
    l0 = float(np.asarray(m.call("loss", args))[0])
    for _ in range(60):
        m.epoch += 1
        m.apply("train", args)
    l1 = float(np.asarray(m.call("loss", args))[0])
    assert np.isfinite(l1) and l1 < l0 * 0.5


def test_top1_routing_is_single_expert():
    """With k=1 the output is exactly the argmax expert's FFN (routing
    weight renormalizes to 1)."""
    from exprgrad_tpu.ops.moe import _np_moe

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, DIM)).astype(np.float32)
    gate = rng.normal(size=(DIM, E)).astype(np.float32)
    w1 = rng.normal(size=(E, DIM, HID)).astype(np.float32) * 0.2
    b1 = rng.normal(size=(E, HID)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(E, HID, DIM)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(E, DIM)).astype(np.float32) * 0.1
    out = _np_moe([x, gate, w1, b1, w2, b2], {"k": 1})
    best = (x.astype(np.float64) @ gate).argmax(-1)  # [1, 3]
    for tpos in range(3):
        e = int(best[0, tpos])
        h = np.maximum(x[0, tpos].astype(np.float64) @ w1[e] + b1[e], 0)
        want = h @ w2[e] + b2[e]
        np.testing.assert_allclose(out[0, tpos], want, atol=1e-5)


def test_moe_grad_numpy_matches_finite_differences():
    """Spot-check the hand-derived numpy vjp against central differences
    on the gate (the trickiest path: softmax -> top-k -> renormalize)."""
    from exprgrad_tpu.ops.moe import _np_moe, _np_moe_grad

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, DIM)).astype(np.float64)
    gate = rng.normal(size=(DIM, E)).astype(np.float64)
    w1 = rng.normal(size=(E, DIM, HID)).astype(np.float64) * 0.2
    b1 = rng.normal(size=(E, HID)).astype(np.float64) * 0.1
    w2 = rng.normal(size=(E, HID, DIM)).astype(np.float64) * 0.2
    b2 = rng.normal(size=(E, DIM)).astype(np.float64) * 0.1
    g = rng.normal(size=(1, 2, DIM)).astype(np.float64)
    attrs = {"k": 2}
    grads = _np_moe_grad([x, gate, w1, b1, w2, b2, g], attrs)
    dgate = grads[1]
    eps = 1e-6
    for _ in range(10):
        i, j = rng.integers(0, DIM), rng.integers(0, E)
        gp, gm = gate.copy(), gate.copy()
        gp[i, j] += eps
        gm[i, j] -= eps
        fp = float((_np_moe([x, gp, w1, b1, w2, b2], attrs) * g).sum())
        fm = float((_np_moe([x, gm, w1, b1, w2, b2], attrs) * g).sum())
        want = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(dgate[i, j], want, rtol=1e-4, atol=1e-7)


def test_moe_transformer_variant_trains():
    rng = np.random.default_rng(4)
    m = compile(
        flash_transformer(vocab=8, dim=16, heads=2, hidden=32, max_seq=16,
                          moe_experts=4, moe_k=2, eta=0.02),
        seed=0,
    )
    names = {m.program.tensors[t].name for t in m.program.params}
    assert "blk0.moe.gate" in names and "blk0.moe.w1" in names
    toks = rng.integers(0, 8, (4, 16)).astype(np.float32)
    labels = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (4, 16))]
    args = {"tokens": toks, "labels": labels}
    l0 = float(np.asarray(m.call("loss", args))[0])
    for _ in range(40):
        m.epoch += 1
        m.apply("train", args)
    l1 = float(np.asarray(m.call("loss", args))[0])
    assert np.isfinite(l1) and l1 < l0 * 0.7, (l0, l1)


def test_bad_k_rejected():
    x = input("x")
    with pytest.raises(ValueError, match="k must be"):
        moe_ffn(x, DIM, HID, n_experts=4, k=5)
    with pytest.raises(ValueError, match="k must be"):
        moe_ffn(x, DIM, HID, n_experts=4, k=0)
