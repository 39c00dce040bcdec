"""Optimizer zoo: each optimizer's compiled update must match an exact
numpy replica, step for step, on a model with a known gradient.

Model: param w[4], loss = sum((w - x)^2)  =>  dL/dw = 2*(w - x).
float64 + several steps with varying x so state tensors (velocity,
moments, leaky averages) are genuinely exercised.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param, sq
from exprgrad_tpu.layers import adamw, lion, momentum, rmsprop


def _model(opt, backend="jax"):
    x = input("x")
    it = iters("it")
    w = param([4], init_range=(0.4, 0.6), name="w")
    loss = Fun()
    loss[0] = sq(w.raw[it] - x.raw[it])
    net = loss.target("loss").backprop(opt).target("train")
    model = compile(net, dtype="float64", backend=backend)
    wid = next(iter(model.params))
    return model, wid


def _drive(model, wid, xs):
    """Apply one train step per row of xs; return the param trajectory."""
    traj = []
    for xv in xs:
        model.epoch += 1
        model.apply("train", {"x": xv})
        traj.append(np.asarray(model.params[wid]).copy())
    return traj


XS = [np.full(4, fv) + np.arange(4) * 0.1 for fv in (0.0, 1.0, -0.5, 0.25)]


@pytest.mark.parametrize("nesterov", [False, True])
def test_momentum_matches_numpy(nesterov):
    model, wid = _model(make_opt(momentum, eta=0.05, mu=0.9,
                                 nesterov=nesterov))
    w = np.asarray(model.params[wid]).copy()
    v = np.zeros_like(w)
    want = []
    for xv in XS:
        g = 2.0 * (w - xv)
        v = 0.9 * v + g
        w = w - 0.05 * ((g + 0.9 * v) if nesterov else v)
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_rmsprop_matches_numpy():
    model, wid = _model(make_opt(rmsprop, eta=0.01, rho=0.9, eps=1e-8))
    w = np.asarray(model.params[wid]).copy()
    a = np.zeros_like(w)
    want = []
    for xv in XS:
        g = 2.0 * (w - xv)
        a = 0.9 * a + 0.1 * g * g
        w = w - 0.01 * g / (np.sqrt(a) + 1e-8)
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for x, y in zip(got, want):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def test_adamw_matches_numpy():
    eta, b1, b2, eps, wd = 0.01, 0.9, 0.999, 1e-8, 0.1
    model, wid = _model(make_opt(adamw, eta=eta, beta1=b1, beta2=b2,
                                 eps=eps, weight_decay=wd))
    w = np.asarray(model.params[wid]).copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    want = []
    for t, xv in enumerate(XS, start=1):
        g = 2.0 * (w - xv)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / (1 - b1 ** t)
        v_hat = v / (1 - b2 ** t)
        w = w - eta * (m_hat / (np.sqrt(v_hat) + eps) + wd * w)
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for x, y in zip(got, want):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def test_lion_matches_numpy():
    eta, b1, b2, wd = 0.02, 0.9, 0.99, 0.1
    model, wid = _model(make_opt(lion, eta=eta, beta1=b1, beta2=b2,
                                 weight_decay=wd))
    w = np.asarray(model.params[wid]).copy()
    m = np.zeros_like(w)
    want = []
    for xv in XS:
        g = 2.0 * (w - xv)
        u = b1 * m + (1 - b1) * g
        w = w - eta * (np.sign(u) + wd * w)
        m = b2 * m + (1 - b2) * g
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for x, y in zip(got, want):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def test_lion_uses_old_momentum():
    """Adversarial gradient sequence where sign(b1*m_old + (1-b1)*g)
    differs from sign of the same blend with the NEW momentum: the paper
    recurrence must win (the lowering reads the updated cache, so the
    implementation recovers m_old algebraically — this pins it)."""
    eta, b1, b2 = 0.02, 0.9, 0.99
    model, wid = _model(make_opt(lion, eta=eta, beta1=b1, beta2=b2))
    w = np.asarray(model.params[wid]).copy()
    m = np.zeros_like(w)
    # g=-1 then g=0.085: u_paper = 0.9*(-0.01) + 0.1*0.085 < 0 but the
    # new-momentum blend is > 0 — opposite update directions
    for g_target in (-1.0, 0.085, 0.5, -0.03):
        xv = w - g_target / 2.0  # makes grad exactly g_target everywhere
        model.epoch += 1
        model.apply("train", {"x": xv})
        g = np.full_like(w, g_target)
        u = b1 * m + (1 - b1) * g
        w = w - eta * np.sign(u)
        m = b2 * m + (1 - b2) * g
        np.testing.assert_allclose(np.asarray(model.params[wid]), w,
                                   rtol=1e-12)


def test_optimizers_agree_across_backends():
    """interp oracle and jax backend produce the same adamw trajectory."""
    opt = lambda: make_opt(adamw, eta=0.01, weight_decay=0.05)
    mj, wj = _model(opt(), backend="jax")
    mi, wi = _model(opt(), backend="interp")
    mi.params[wi] = np.asarray(mj.params[wj]).copy()
    gj = _drive(mj, wj, XS)
    gi = _drive(mi, wi, XS)
    for a, b in zip(gj, gi):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_optimizer_state_survives_checkpoint(tmp_path):
    """Momentum velocity is a cache tensor: save/load mid-run and the
    continued trajectory matches an uninterrupted one."""
    from exprgrad_tpu.io import load_model, save_model

    model, wid = _model(make_opt(momentum, eta=0.05, mu=0.9))
    ref, _ = _model(make_opt(momentum, eta=0.05, mu=0.9))
    rid = next(iter(ref.params))
    ref.params[rid] = np.asarray(model.params[wid]).copy()

    _drive(model, wid, XS[:2])
    _drive(ref, rid, XS[:2])
    path = str(tmp_path / "momentum.ckpt")
    save_model(model, path)
    resumed = load_model(path, backend="jax")
    rid2 = next(iter(resumed.params))
    got = _drive(resumed, rid2, XS[2:])
    want = _drive(ref, rid, XS[2:])
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_clip_gradients_matches_numpy():
    """Elementwise clip wrapper: grad 2*(w-x) with a far-away x saturates
    the bound; update magnitude is exactly eta*bound."""
    from exprgrad_tpu.layers import clip_gradients, gradient_descent

    model, wid = _model(
        clip_gradients(make_opt(gradient_descent, rate=0.1), bound=0.5)
    )
    w = np.asarray(model.params[wid]).copy()
    want = []
    for xv in XS:
        g = np.clip(2.0 * (w - xv), -0.5, 0.5)
        w = w - 0.1 * g
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_clip_gradients_composes_with_adamw():
    from exprgrad_tpu.layers import clip_gradients

    eta, b1, b2, eps, wd, bound = 0.01, 0.9, 0.999, 1e-8, 0.1, 0.3
    model, wid = _model(
        clip_gradients(
            make_opt(adamw, eta=eta, beta1=b1, beta2=b2, eps=eps,
                     weight_decay=wd),
            bound,
        )
    )
    w = np.asarray(model.params[wid]).copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    want = []
    for t, xv in enumerate(XS, start=1):
        g = np.clip(2.0 * (w - xv), -bound, bound)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / (1 - b1 ** t)
        v_hat = v / (1 - b2 ** t)
        w = w - eta * (m_hat / (np.sqrt(v_hat) + eps) + wd * w)
        want.append(w.copy())
    got = _drive(model, wid, XS)
    for x, y in zip(got, want):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def _two_param_model(opt):
    """Two differently-shaped params so the global norm is genuinely
    cross-tensor: loss = sum((w1-x)^2) + sum(w2^2)."""
    from exprgrad_tpu import input as eg_input

    x = eg_input("x")
    it = iters("it")
    w1 = param([3], init_range=(1.0, 1.0), name="w1")
    w2 = param([2], init_range=(-2.0, -2.0), name="w2")
    loss = Fun()
    loss[0] = sq(w1.raw[it] - x.raw[it])
    it2 = iters("it")
    loss[0] = sq(w2.raw[it2])
    net = loss.target("loss").backprop(opt).target("train")
    model = compile(net, dtype="float64", backend="jax")
    ids = {model.program.tensors[t].name: t for t in model.params}
    return model, ids


def test_clip_by_global_norm_matches_numpy():
    from exprgrad_tpu.layers import clip_by_global_norm, gradient_descent

    model, ids = _two_param_model(
        clip_by_global_norm(make_opt(gradient_descent, rate=0.1),
                            max_norm=1.0)
    )
    w1 = np.asarray(model.params[ids["w1"]]).copy()
    w2 = np.asarray(model.params[ids["w2"]]).copy()
    for xv in [np.zeros(3), np.full(3, 0.7), np.full(3, -0.2)]:
        model.epoch += 1
        model.apply("train", {"x": xv})
        g1, g2 = 2 * (w1 - xv), 2 * w2
        s = min(1.0, 1.0 / (np.sqrt((g1**2).sum() + (g2**2).sum()) + 1e-12))
        w1, w2 = w1 - 0.1 * g1 * s, w2 - 0.1 * g2 * s
        np.testing.assert_allclose(np.asarray(model.params[ids["w1"]]), w1,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(model.params[ids["w2"]]), w2,
                                   rtol=1e-12)


def test_clip_by_global_norm_inactive_below_bound():
    """Small gradients pass through unscaled (scale clamps at 1)."""
    from exprgrad_tpu.layers import clip_by_global_norm, gradient_descent

    model, ids = _two_param_model(
        clip_by_global_norm(make_opt(gradient_descent, rate=0.1),
                            max_norm=1e6)
    )
    w1 = np.asarray(model.params[ids["w1"]]).copy()
    model.epoch += 1
    model.apply("train", {"x": np.zeros(3)})
    np.testing.assert_allclose(
        np.asarray(model.params[ids["w1"]]), w1 - 0.1 * 2 * w1, rtol=1e-12
    )


def test_clip_by_global_norm_recipe_is_reusable():
    """One recipe object compiles into several models without dragging
    the first graph into the second (per-backwards-node norm tensor)."""
    from exprgrad_tpu.layers import clip_by_global_norm, gradient_descent

    recipe = clip_by_global_norm(make_opt(gradient_descent, rate=0.1),
                                 max_norm=1.0)
    m1, ids1 = _two_param_model(recipe)
    m2, ids2 = _two_param_model(recipe)
    for m, ids in ((m1, ids1), (m2, ids2)):
        w1 = np.asarray(m.params[ids["w1"]]).copy()
        w2 = np.asarray(m.params[ids["w2"]]).copy()
        m.apply("train", {"x": np.zeros(3)})
        g1, g2 = 2 * w1, 2 * w2
        s = min(1.0, 1.0 / (np.sqrt((g1**2).sum() + (g2**2).sum()) + 1e-12))
        np.testing.assert_allclose(np.asarray(m.params[ids["w1"]]),
                                   w1 - 0.1 * g1 * s, rtol=1e-12)


def test_clip_by_global_norm_composes_with_adam():
    """End to end through adam: still trains xor."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.layers import adam, clip_by_global_norm
    from exprgrad_tpu.models import xor_mlp

    opt = clip_by_global_norm(make_opt(adam, eta=0.05), max_norm=0.5)
    model = compile(xor_mlp(opt=opt), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(400):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    pred = np.asarray(model.call("predict", {"x": x})).reshape(-1)
    assert np.abs(pred - np.asarray([0, 1, 1, 0])).max() < 0.2


def test_with_ema_matches_numpy():
    """EMA shadow follows decay*ema + (1-decay)*post_update_param; the
    ema.w companion tracks 1-decay^steps exactly, so ema_params() is
    debiased by the true step count (not model.epoch)."""
    from exprgrad_tpu.layers import gradient_descent, with_ema

    model, wid = _model(
        with_ema(make_opt(gradient_descent, rate=0.1), decay=0.9)
    )
    w = np.asarray(model.params[wid]).copy()
    ema = np.zeros_like(w)
    for t, xv in enumerate(XS, 1):
        # do NOT advance model.epoch: debiasing must not depend on it
        model.apply("train", {"x": xv})
        w = w - 0.1 * 2.0 * (w - xv)
        ema = 0.9 * ema + 0.1 * w
        np.testing.assert_allclose(np.asarray(model.params[wid]), w,
                                   rtol=1e-12)
        np.testing.assert_allclose(model.ema_params()[wid],
                                   ema / (1 - 0.9 ** t), rtol=1e-12)


def test_with_ema_composes_and_survives_checkpoint(tmp_path):
    """EMA over adam, shadow rides checkpoints; swapped-in EMA weights
    serve a reasonable xor prediction."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.layers import adam, with_ema

    opt = with_ema(make_opt(adam, eta=0.05), decay=0.98)
    model = compile(xor_mlp_ema(opt), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(400):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})

    path = str(tmp_path / "ema.ckpt")
    save_model(model, path)
    re = load_model(path, backend="jax")
    ema = re.ema_params()
    np.testing.assert_allclose(
        sorted(np.asarray(v).sum() for v in ema.values()),
        sorted(np.asarray(v).sum() for v in model.ema_params().values()),
        rtol=1e-6,
    )
    re.params.update(ema)
    pred = np.asarray(re.call("predict", {"x": x})).reshape(-1)
    assert np.abs(pred - np.asarray([0, 1, 1, 0])).max() < 0.25


def xor_mlp_ema(opt):
    from exprgrad_tpu.models import xor_mlp

    return xor_mlp(opt=opt)


def test_ema_params_errors():
    from exprgrad_tpu import ModelRuntimeError
    from exprgrad_tpu.layers import gradient_descent, with_ema

    model, _ = _model(make_opt(gradient_descent, rate=0.1))
    with pytest.raises(ModelRuntimeError, match="EMA"):
        model.ema_params()
    model2, _ = _model(with_ema(make_opt(gradient_descent, rate=0.1), 0.9))
    with pytest.raises(ModelRuntimeError, match="steps"):
        model2.ema_params()  # shadow exists but never updated
    with pytest.raises(ValueError, match="decay"):
        with_ema(make_opt(gradient_descent, rate=0.1), decay=1.0)


def test_ema_debias_exact_under_fit():
    """fit() runs many batches per epoch increment; the ema.w companion
    still debiases by the true number of applied steps."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.layers import gradient_descent, with_ema
    from exprgrad_tpu.models import xor_mlp

    decay = 0.9
    model = compile(
        xor_mlp(opt=with_ema(make_opt(gradient_descent, rate=0.1), decay)),
        backend="jax", seed=0,
    )
    x = Tensor.new([8, 2], [0, 0, 0, 1, 1, 0, 1, 1, 0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([8, 1], [0.0, 1, 1, 0, 0, 1, 1, 0])
    model.fit("train", {"x": x, "y": y}, batch_size=4, log_status=False)
    # 2 batches ran but epoch advanced once: true step count is 2
    ema = model.ema_params()
    wid = next(iter(model.params))
    w = np.asarray(model.params[wid])
    # after n steps the debiased EMA is a convex combination of the
    # post-step params; with 2 steps it cannot exceed the param scale
    assert np.all(np.abs(ema[wid]) <= np.abs(w).max() + 1.0)
    # and the weight cache equals 1 - decay^2 exactly
    for tid, tdef in enumerate(model.program.tensors):
        if tdef.name == "ema.w" and tid in model.caches:
            np.testing.assert_allclose(
                np.asarray(model.caches[tid]),
                np.full_like(np.asarray(model.caches[tid]),
                             1 - decay ** 2),
                rtol=1e-6,
            )


def test_lion_rejects_zero_beta2():
    from exprgrad_tpu.layers import lion as lion_opt

    with pytest.raises(ValueError, match="beta2"):
        _model(make_opt(lion_opt, beta2=0.0))


def test_xor_converges_with_new_optimizers():
    """End to end: xor trains to correct outputs under rmsprop."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(opt=make_opt(rmsprop, eta=0.02)),
                    backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(400):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    pred = np.asarray(model.call("predict", {"x": x})).reshape(-1)
    assert np.abs(pred - np.asarray([0, 1, 1, 0])).max() < 0.2


# --- adafactor ------------------------------------------------------------

def _adafactor_oracle(w0, xs, eta=None, eps1=1e-30, eps2=1e-3, clip=1.0,
                      p=0.8, wd=0.0, factored=True):
    """Exact numpy replica of layers.adafactor on loss sum((w-x)^2)."""
    w = w0.copy()
    if factored and w.ndim >= 2:
        vr = np.zeros(w.shape[:-1])
        vc = np.zeros(w.shape[:-2] + w.shape[-1:])
    else:
        v = np.zeros_like(w)
    out = []
    for t, xv in enumerate(xs, start=1):
        g = 2.0 * (w - xv)
        rho = 1 - t ** -p
        if factored and w.ndim >= 2:
            vr = rho * vr + (1 - rho) * np.mean(g * g + eps1, axis=-1)
            vc = rho * vc + (1 - rho) * np.mean(g * g + eps1, axis=-2)
            vhat = (vr[..., :, None] * vc[..., None, :]
                    / np.mean(vr, axis=-1)[..., None, None])
            u = g / np.sqrt(vhat)
        else:
            v = rho * v + (1 - rho) * (g * g + eps1)
            u = g / np.sqrt(v)
        denom = max(1.0, np.sqrt(np.mean(u * u)) / clip)
        if eta is None:
            lr = min(0.01, 1 / np.sqrt(t))
            alpha = max(eps2, np.sqrt(np.mean(w * w))) * lr
        else:
            alpha = eta
        w = w - alpha * (u / denom + wd * w)
        out.append(w.copy())
    return out


def _model2(opt, backend="jax"):
    """Rank-2 param model: loss = sum((w - x)^2) over w[2, 3]."""
    x = input("x")
    y, c = iters("y", "c")
    w = param([2, 3], init_range=(0.4, 0.6), name="w")
    loss = Fun()
    loss[0] = sq(w[y, c] - x[y, c])
    net = loss.target("loss").backprop(opt).target("train")
    model = compile(net, dtype="float64", backend=backend)
    wid = next(iter(model.params))
    return model, wid


XS2 = [np.arange(6, dtype=np.float64).reshape(2, 3) * 0.1,
       np.full((2, 3), 0.3), np.full((2, 3), -0.2),
       np.arange(6, dtype=np.float64).reshape(2, 3) * -0.05]


@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_adafactor_factored_matches_numpy(backend):
    from exprgrad_tpu.layers import adafactor

    model, wid = _model2(make_opt(adafactor), backend=backend)
    w0 = np.asarray(model.params[wid]).copy()
    want = _adafactor_oracle(w0, XS2)
    got = _drive(model, wid, XS2)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    # the point of adafactor: factored second moments are O(R + C)
    cache_shapes = sorted(
        np.asarray(model.caches[tid]).shape for tid in model.caches
    )
    assert cache_shapes == [(2,), (3,)]


def test_adafactor_unfactored_matches_numpy():
    """Rank-1 params always take the full-shape moment path."""
    from exprgrad_tpu.layers import adafactor

    model, wid = _model(make_opt(adafactor))
    w0 = np.asarray(model.params[wid]).copy()
    want = _adafactor_oracle(w0, XS, factored=False)
    got = _drive(model, wid, XS)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    (tid,) = [t for t in model.caches]
    assert np.asarray(model.caches[tid]).shape == (4,)


def test_adafactor_fixed_eta_and_weight_decay():
    """eta given: constant step, no parameter-scale multiplier."""
    from exprgrad_tpu.layers import adafactor

    model, wid = _model2(make_opt(adafactor, eta=0.05, weight_decay=0.1))
    w0 = np.asarray(model.params[wid]).copy()
    want = _adafactor_oracle(w0, XS2, eta=0.05, wd=0.1)
    got = _drive(model, wid, XS2)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_adafactor_checkpoint_resume(tmp_path):
    """Factored vr/vc caches ride checkpoints like any other state."""
    from exprgrad_tpu.io import load_model, save_model
    from exprgrad_tpu.layers import adafactor

    model, wid = _model2(make_opt(adafactor))
    _drive(model, wid, XS2[:2])
    path = str(tmp_path / "af.ckpt")
    save_model(model, path)
    resumed = load_model(path, backend="jax")
    a = _drive(model, wid, XS2[2:])
    b = _drive(resumed, wid, XS2[2:])
    np.testing.assert_allclose(a[-1], b[-1], rtol=1e-12)


# --- muon -----------------------------------------------------------------

def _muon_oracle(w0, xs, eta=0.05, mu=0.95, nesterov=True, steps=5,
                 eps=1e-7):
    """Exact numpy replica of layers.muon on loss sum((w-x)^2)."""
    w = w0.copy()
    m = np.zeros_like(w)
    out = []
    for xv in xs:
        g = 2.0 * (w - xv)
        m = mu * m + g
        gu = g + mu * m if nesterov else m
        if w.ndim == 2:
            rows, cols = w.shape
            x = gu.T if rows > cols else gu
            x = x / (np.linalg.norm(x) + eps)
            for _ in range(steps):
                a = x @ x.T
                b = -4.7750 * a + 2.0315 * (a @ a)
                x = 3.4445 * x + b @ x
            upd = x.T if rows > cols else x
            w = w - eta * max(1.0, rows / cols) ** 0.5 * upd
        else:
            w = w - eta * gu
        out.append(w.copy())
    return out


def _muon_model(shape, backend="jax", **kw):
    from exprgrad_tpu.layers import muon

    x = input("x")
    idx = iters(*[f"d{k}" for k in range(len(shape))])
    idx = idx if isinstance(idx, tuple) else (idx,)
    w = param(shape, init_range=(0.4, 0.6), name="w")
    loss = Fun()
    loss[0] = sq(w[idx] - x[idx])
    model = compile(loss.target("loss").backprop(
        make_opt(muon, eta=0.05, **kw)).target("train"),
        dtype="float64", backend=backend)
    return model, next(iter(model.params))


@pytest.mark.parametrize("shape", [(2, 3), (5, 2), (4,)])
@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_muon_matches_numpy_ns5(shape, backend):
    """Wide (direct), tall (transposed orthogonalization + sqrt(R/C)
    scaling), and rank-1 (momentum fallback) parameters, both backends."""
    model, wid = _muon_model(shape, backend=backend)
    w0 = np.asarray(model.params[wid]).copy()
    rng = np.random.default_rng(1)
    xs = [rng.random(shape) for _ in range(4)]
    want = _muon_oracle(w0, xs)
    got = _drive(model, wid, xs)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_muon_plain_momentum_variant():
    model, wid = _muon_model((3, 3), nesterov=False)
    w0 = np.asarray(model.params[wid]).copy()
    rng = np.random.default_rng(2)
    xs = [rng.random((3, 3)) for _ in range(3)]
    want = _muon_oracle(w0, xs, nesterov=False)
    got = _drive(model, wid, xs)
    np.testing.assert_allclose(got[-1], want[-1], rtol=1e-10)


def test_xor_converges_under_muon():
    """End to end: the orthogonalized update actually trains (dense
    weights via NS5, biases via the momentum fallback)."""
    from exprgrad_tpu import Tensor
    from exprgrad_tpu.layers import muon as muon_opt
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(opt=make_opt(muon_opt, eta=0.05)),
                    backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(300):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    pred = np.asarray(model.call("predict", {"x": x})).reshape(-1)
    assert np.abs(pred - np.asarray([0, 1, 1, 0])).max() < 0.25
