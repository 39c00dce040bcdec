"""Layer-API tests (ported from reference tests/test_dnn.nim) plus oracle
cross-checks of every dnn layer's forward AND derived backward kernels."""

import numpy as np
import pytest

from exprgrad_tpu import Fun, Tensor, compile, input, make_opt
from exprgrad_tpu.layers import (
    adam,
    avgpool2,
    conv2,
    dense,
    dropout,
    gradient_descent,
    leaky_relu,
    maxpool2,
    mse,
    relu,
    sigmoid,
    softmax,
    tanh,
    upsample2,
)


def _xor_net():
    return (
        input("x")
        .pipe(dense, 2, 4)
        .pipe(leaky_relu)
        .pipe(dense, 4, 1)
        .pipe(sigmoid)
        .target("predict")
        .pipe(mse, input("y"))
        .target("loss")
        .backprop(make_opt(gradient_descent, rate=0.2))
        .target("train")
    )


TRAIN_X = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
TRAIN_Y = Tensor.new([4, 1], [0, 1, 1, 0])


@pytest.mark.parametrize("backend", ["jax", "interp"])
def test_xor(backend):
    model = compile(_xor_net(), backend=backend, seed=10)
    iterations = 2000
    for _ in range(iterations):
        model.apply("train", {"x": TRAIN_X, "y": TRAIN_Y})
    internal_loss = float(model.call("loss", {"x": TRAIN_X, "y": TRAIN_Y}).sum())
    pred = model.call("predict", {"x": TRAIN_X})
    loss = float(((pred - TRAIN_Y) ** 2).sum())
    assert internal_loss < 0.1
    assert loss < 0.1
    assert abs(loss / TRAIN_Y.size - internal_loss) < 1e-4


def test_xor_fit():
    model = compile(_xor_net(), backend="jax", seed=10)
    for _ in range(2000):
        model.fit(
            "train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4, log_status=False
        )
    pred = model.call("predict", {"x": TRAIN_X})
    assert float(((pred - TRAIN_Y) ** 2).sum()) < 0.1


def test_xor_adam():
    net = (
        input("x")
        .pipe(dense, 2, 4)
        .pipe(leaky_relu)
        .pipe(dense, 4, 1)
        .pipe(sigmoid)
        .target("predict")
        .pipe(mse, input("y"))
        .target("loss")
        .backprop(make_opt(adam, eta=0.05))
        .target("train")
    )
    model = compile(net, backend="jax", seed=10)
    for _ in range(300):
        model.fit(
            "train", {"x": TRAIN_X, "y": TRAIN_Y}, batch_size=4, log_status=False
        )
    pred = model.call("predict", {"x": TRAIN_X})
    assert float(((pred - TRAIN_Y) ** 2).sum()) < 0.1


# --- forward/backward oracle cross-checks --------------------------------

def _both(graph_fn, args, targets):
    """Run the same graph on jax + interp backends with identical params."""
    m_jax = compile(graph_fn(), backend="jax", seed=7)
    m_np = compile(graph_fn(), backend="interp", seed=7)
    for tid in m_np.params:
        m_np.params[tid] = np.array(m_jax.params[tid])
    outs = []
    for t in targets:
        a = m_jax.call(t, args)
        b = m_np.call(t, args)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
        outs.append(a)
    return outs


def _grad_graph(layer_out, x):
    """loss = sum(layer(x)); return targets for output and d/dx."""
    from exprgrad_tpu import iters, sq

    it = iters("it")
    loss = Fun()
    loss[0] = sq(layer_out.raw[it])
    bw = loss.target("loss").backwards()
    return [layer_out.target("out"), bw.grad(x).target("dx")]


@pytest.mark.parametrize(
    "layer,shape",
    [
        (relu, [2, 6]),
        (leaky_relu, [2, 6]),
        (sigmoid, [2, 6]),
        (tanh, [2, 6]),
    ],
)
def test_activation_fwd_bwd_oracle(layer, shape):
    rng = np.random.default_rng(0)
    x_val = rng.normal(size=shape).astype(np.float32)

    def graph():
        x = input("x")
        return _grad_graph(layer(x), x)

    _both(graph, {"x": x_val}, ["out", "dx"])


def test_conv2_fwd_bwd_oracle():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)

    def graph():
        x = input("images")
        f = input("filters")
        return _grad_graph(conv2(x, f), x)

    _both(graph, {"images": images, "filters": filters}, ["out", "dx"])


def test_conv2_filter_grad_oracle():
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)

    def graph():
        from exprgrad_tpu import iters, sq

        x = input("images")
        f = input("filters")
        out = conv2(x, f)
        it = iters("it")
        loss = Fun()
        loss[0] = sq(out.raw[it])
        bw = loss.target("loss").backwards()
        return [bw.grad(f).target("df")]

    _both(graph, {"images": images, "filters": filters}, ["df"])


def test_pool_layers_oracle():
    rng = np.random.default_rng(2)
    images = rng.normal(size=(2, 6, 4, 3)).astype(np.float32)

    for layer in (maxpool2, avgpool2, upsample2):
        def graph(layer=layer):
            x = input("images")
            return _grad_graph(layer(x), x)

        _both(graph, {"images": images}, ["out", "dx"])


def test_softmax_oracle():
    rng = np.random.default_rng(3)
    x_val = rng.normal(size=(5, 7)).astype(np.float32)

    def graph():
        x = input("x")
        return _grad_graph(softmax(x), x)

    (out, _) = _both(graph, {"x": x_val}, ["out", "dx"])
    np.testing.assert_allclose(out.sum(axis=1), np.ones(5), rtol=1e-5)


def test_dense_matches_numpy():
    rng = np.random.default_rng(4)
    x_val = rng.normal(size=(3, 5)).astype(np.float32)
    model = compile(
        input("x").pipe(dense, 5, 2).target("y"), backend="jax", seed=0
    )
    out = model.call("y", {"x": x_val})
    w = np.array(list(model.params.values())[0])
    b = np.array(list(model.params.values())[1])
    np.testing.assert_allclose(out, x_val @ w + b, rtol=1e-5)


def test_dropout_statistics():
    x_val = np.ones((100, 100), dtype=np.float32)
    model = compile(
        input("x").pipe(dropout, 0.5).target("y"), backend="jax", seed=0
    )
    out = model.call("y", {"x": x_val})
    kept = (out != 0).mean()
    assert 0.4 < kept < 0.6
    # kept values are scaled by 1/(1-p)
    np.testing.assert_allclose(out[out != 0], 2.0, rtol=1e-6)
    # fresh randomness per call
    out2 = model.call("y", {"x": x_val})
    assert (out != out2).any()


def test_xor_fit_scan_batches():
    """Compiled-epoch training (lax.scan over batches) matches per-batch fit."""
    m_loop = compile(_xor_net(), backend="jax", seed=10)
    m_scan = compile(_xor_net(), backend="jax", seed=10)
    data = {
        "x": np.tile(TRAIN_X, (4, 1)),
        "y": np.tile(TRAIN_Y, (4, 1)),
    }
    for _ in range(20):
        m_loop.fit("train", data, batch_size=4, log_status=False)
        m_scan.fit("train", data, batch_size=4, log_status=False,
                   scan_batches=True)
    for tid in m_loop.params:
        np.testing.assert_allclose(
            np.asarray(m_loop.params[tid]),
            np.asarray(m_scan.params[tid]),
            rtol=1e-5, atol=1e-7,
        )


def test_activations_extreme_inputs():
    """tanh/sigmoid/softmax must stay finite (fwd and derived bwd) at
    magnitudes where naive exp formulations overflow float32."""
    from exprgrad_tpu import Fun, iters, sq

    x_val = np.array([[-200.0, -50.0, 0.0, 50.0, 200.0]], dtype=np.float32)
    for layer in (tanh, sigmoid, softmax):
        def graph(layer=layer):
            x = input("x")
            out = layer(x)
            it = iters("it")
            loss = Fun()
            loss[0] = sq(out.raw[it])
            bw = loss.target("loss").backwards()
            return [out.target("out"), bw.grad(x).target("dx")]

        model = compile(graph(), backend="jax")
        out = model.call("out", {"x": x_val})
        dx = model.call("dx", {"x": x_val})
        assert np.isfinite(out).all(), (layer.__name__, out)
        assert np.isfinite(dx).all(), (layer.__name__, dx)
    t = compile(
        [input("x").pipe(tanh).target("t")], backend="jax"
    ).call("t", {"x": x_val})
    np.testing.assert_allclose(t, np.tanh(x_val), atol=1e-6)


def test_layer_norm_forward_and_gradient():
    """layer_norm vs a numpy reference; the derived gradient through both
    reductions vs finite differences."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.layers import layer_norm

    dim = 8
    x_in = input("x")
    net = layer_norm(x_in, dim)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(net.raw[it])
    graph = [
        net.target("out"),
        loss.target("loss").backwards().grad(x_in).target("dx"),
    ]
    model = compile(graph, dtype="float64", backend="jax", seed=0)
    model_i = compile(graph, dtype="float64", backend="interp", seed=0)
    model_i.params = {k: np.asarray(v) for k, v in model.params.items()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, dim)) * 3 + 1
    got = model.call("out", {"x": x})

    params = {t: np.asarray(v) for t, v in model.params.items()}
    gamma, beta = (params[t] for t in sorted(params))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-5) * gamma + beta
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # oracle agreement + finite differences for d loss/d x
    gj = model.call("dx", {"x": x})
    gi = model_i.call("dx", {"x": x})
    np.testing.assert_allclose(gj, gi, rtol=1e-9)

    def loss_at(xv):
        return float(model_i.call("loss", {"x": xv})[0])

    h = 1e-6
    fd = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy().reshape(-1), x.copy().reshape(-1)
        xp[i] += h
        xm[i] -= h
        fd.reshape(-1)[i] = (
            loss_at(xp.reshape(x.shape)) - loss_at(xm.reshape(x.shape))
        ) / (2 * h)
    np.testing.assert_allclose(gj, fd, rtol=5e-4, atol=1e-7)


def test_rms_norm():
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.layers import rms_norm

    dim = 8
    x_in = input("x")
    net = rms_norm(x_in, dim)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(net.raw[it])
    graph = [
        net.target("out"),
        loss.target("loss").backwards().grad(x_in).target("dx"),
    ]
    mj = compile(graph, dtype="float64", backend="jax", seed=0)
    mi = compile(graph, dtype="float64", backend="interp", seed=0)
    mi.params = {k: np.asarray(v) for k, v in mj.params.items()}

    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, dim)) * 2
    (gamma,) = (np.asarray(v) for v in mj.params.values())
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * gamma
    np.testing.assert_allclose(mj.call("out", {"x": x}), want, rtol=1e-9)
    np.testing.assert_allclose(
        mj.call("dx", {"x": x}), mi.call("dx", {"x": x}), rtol=1e-9
    )


def test_depthwise_conv2_forward_and_gradients():
    """Depthwise conv: forward + BOTH derived gradient kernels must lower
    as grouped convolutions (no gathers) and match the oracle + FD."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.layers import depthwise_conv2

    images = input("images")
    flt = input("flt")
    net = depthwise_conv2(images, flt)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(net.raw[it])
    graph = [
        net.target("out"),
        loss.target("loss").backwards().grad(images).target("dimg"),
        loss.target("loss2").backwards().grad(flt).target("dflt"),
    ]
    mj = compile(graph, dtype="float64", backend="jax")
    mi = compile(graph, dtype="float64", backend="interp")

    rng = np.random.default_rng(0)
    args = {
        "images": rng.normal(size=(2, 8, 8, 3)),
        "flt": rng.normal(size=(3, 3, 3)),
    }
    got = np.asarray(mj.call("out", args))
    want = np.zeros((2, 6, 6, 3))
    for a in range(3):
        for b in range(3):
            want += args["images"][:, a:a + 6, b:b + 6, :] * args["flt"][a, b]
    np.testing.assert_allclose(got, want, rtol=1e-12)

    for target in ("dimg", "dflt"):
        np.testing.assert_allclose(
            mj.call(target, args), mi.call(target, args), rtol=1e-10
        )
    # all three programs stay on the conv path (grouped convs, no gather)
    for target in ("out", "dimg", "dflt"):
        stats = mj.lowering_stats(target)
        assert stats.get("general-scatter") is None, (target, stats)
        assert stats.get("conv", 0) >= 1, (target, stats)

    # finite differences on the filter
    def loss_at(fv):
        a = dict(args)
        a["flt"] = fv
        return float(mi.call("loss2", a)[0])

    g = np.asarray(mj.call("dflt", args))
    fd = np.zeros_like(args["flt"])
    h = 1e-6
    base = args["flt"]
    for i in range(base.size):
        xp, xm = base.copy().reshape(-1), base.copy().reshape(-1)
        xp[i] += h
        xm[i] -= h
        fd.reshape(-1)[i] = (
            loss_at(xp.reshape(base.shape)) - loss_at(xm.reshape(base.shape))
        ) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-8)


def test_strided_depthwise_and_general_grouped_conv():
    """Strided depthwise and the general grouped form
    out[n,y,x,g,f] += img[n,y+dy,x+dx,g,c] * flt[g,dy,dx,c,f]."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters

    # strided depthwise
    img, flt = input("img"), input("flt")
    n, y, x, c, dy, dx = iters("n", "y", "x", "c", "dy", "dx")
    out = Fun()
    out[n, y, x, c] = img[n, 2 * y + dy, 2 * x + dx, c] * flt[dy, dx, c]
    m = compile(out.target("o"), dtype="float64", backend="jax")
    rng = np.random.default_rng(1)
    iv = rng.normal(size=(2, 9, 9, 3))
    fv = rng.normal(size=(3, 3, 3))
    got = np.asarray(m.call("o", {"img": iv, "flt": fv}))
    want = np.zeros((2, 4, 4, 3))
    for a in range(3):
        for b in range(3):
            want += iv[:, a:a + 8:2, b:b + 8:2, :][:, :4, :4] * fv[a, b]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert m.lowering_stats("o").get("conv") == 1

    # general grouped conv (groups x in/out channels per group)
    img2, flt2 = input("img2"), input("flt2")
    n, y, x, g, cc, f, dy, dx = iters("n", "y", "x", "g", "c", "f", "dy", "dx")
    out2 = Fun()
    out2[n, y, x, g, f] = (
        img2[n, y + dy, x + dx, g, cc] * flt2[g, dy, dx, cc, f]
    )
    m2 = compile(out2.target("o"), dtype="float64", backend="jax")
    mi2 = compile(out2.target("o"), dtype="float64", backend="interp")
    iv2 = rng.normal(size=(2, 6, 6, 2, 3))   # G=2 groups, C=3 per group
    fv2 = rng.normal(size=(2, 3, 3, 3, 4))   # F=4 outputs per group
    args = {"img2": iv2, "flt2": fv2}
    np.testing.assert_allclose(
        np.asarray(m2.call("o", args)), np.asarray(mi2.call("o", args)),
        rtol=1e-10,
    )
    assert m2.lowering_stats("o").get("conv") == 1


def test_maxpool2_odd_input_gradient():
    """Odd spatial sizes: trailing rows/cols never enter the forward max
    and must get ZERO gradient.  (The reference's custom-grad loop reads
    grad(out) out of bounds here, dnn.nim:64-70 — a latent bug; our loop
    is bounded to the pooled extent.)"""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.layers import maxpool2

    img = input("img")
    net = maxpool2(img)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(net.raw[it])
    graph = loss.target("loss").backwards().grad(img).target("dimg")
    mj = compile(graph, dtype="float64", backend="jax")
    mi = compile(graph, dtype="float64", backend="interp")
    x = np.random.default_rng(0).normal(size=(1, 5, 5, 2))
    gj = np.asarray(mj.call("dimg", {"img": x}))
    gi = np.asarray(mi.call("dimg", {"img": x}))
    np.testing.assert_allclose(gj, gi, rtol=1e-12)
    # trailing row/col get zero gradient
    assert (gj[:, 4, :, :] == 0).all() and (gj[:, :, 4, :] == 0).all()
    # interior: one argmax per 2x2 window carries 2*max
    pooled = np.max(
        [x[:, a:4:2, b:4:2, :] for a in range(2) for b in range(2)], axis=0
    )
    np.testing.assert_allclose(np.sort(gj[:, :4, :4][gj[:, :4, :4] != 0]),
                               np.sort(2 * pooled.reshape(-1)))


def test_pools_odd_sizes_match_oracle():
    """avgpool2/maxpool2/upsample2 gradients on odd spatial extents: the
    jax lowering and the oracle must agree exactly (guards the class of
    out-of-bounds bug fixed in maxpool2's custom gradient)."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, sq
    from exprgrad_tpu.layers import avgpool2, maxpool2, upsample2

    for layer in (avgpool2, maxpool2, upsample2):
        img = input("img")
        net = layer(img)
        it = iters("it")
        loss = Fun()
        loss[0] = sq(net.raw[it])
        graph = [
            net.target("out"),
            loss.target("loss").backwards().grad(img).target("dimg"),
        ]
        mj = compile(graph, dtype="float64", backend="jax")
        mi = compile(graph, dtype="float64", backend="interp")
        for hw in (4, 5, 7):
            x = np.random.default_rng(hw).normal(size=(1, hw, hw, 2))
            np.testing.assert_allclose(
                mj.call("out", {"img": x}), mi.call("out", {"img": x}),
                rtol=1e-12, err_msg=f"{layer.__name__} fwd {hw}",
            )
            np.testing.assert_allclose(
                mj.call("dimg", {"img": x}), mi.call("dimg", {"img": x}),
                rtol=1e-12, err_msg=f"{layer.__name__} grad {hw}",
            )
