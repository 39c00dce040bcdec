"""DSL + compiler + runtime tests, ported from the reference test suite
(tests/test_model.nim) and run against BOTH backends: the numpy oracle and
the XLA path on CPU."""

import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    ShapeError,
    Tensor,
    array,
    compile,
    cos,
    exp,
    grad,
    input,
    irange,
    iters,
    ln,
    log,
    log2,
    log10,
    param,
    pow_,
    select,
    sin,
    sq,
    to_scalar,
)

BACKENDS = ["interp", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_identity(backend):
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x").raw[it]
    model = compile(out.target("y"), backend=backend)
    x = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(model.call("y", {"x": x}), x)


def test_double(backend):
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x").raw[it] * 2.0
    model = compile(out.target("y"), backend=backend)
    x = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(model.call("y", {"x": x}), x * 2)


def test_matmul(backend):
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    model = compile(c.target("c"), backend=backend)
    a = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    b = Tensor.new([3, 2], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(model.call("c", {"a": a, "b": b}), a @ b)


def test_relu(backend):
    inp = input("inp")
    it = iters("it")
    out = Fun()
    out.raw[it] = select(0.0 < inp.raw[it], inp.raw[it], 0.0)
    model = compile(out.target("outp"), backend=backend)
    x = Tensor.new([2, 3], [0, -1, 10, -20, 0.1, -0.1])
    np.testing.assert_allclose(
        model.call("outp", {"inp": x}),
        Tensor.new([2, 3], [0, 0, 10, 0, 0.1, 0]),
    )


def test_mean_squared_error(backend):
    it = iters("it")
    loss = Fun()
    loss[0] = sq(input("pred").raw[it] - input("labels").raw[it])
    model = compile(loss.target("loss"), backend=backend)
    pred = Tensor.new([2, 2], [1, 2, 3, 4])
    labels = Tensor.new([2, 2], [4, 3, 2, 1])
    np.testing.assert_allclose(
        model.call("loss", {"pred": pred, "labels": pred}), [0.0]
    )
    np.testing.assert_allclose(
        model.call("loss", {"pred": pred, "labels": labels}), [20.0]
    )


def test_transpose(backend):
    y, x = iters("y", "x")
    b = Fun()
    b[y, x] = input("a")[x, y]
    model = compile(b.target("b"), backend=backend)
    a = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(model.call("b", {"a": a}), a.T)


def test_max(backend):
    from exprgrad_tpu import maximum

    x = input("x")
    it = iters("it")
    res = Fun()
    res.raw[it] = maximum(x.raw[it], input("y").raw[it])
    res.copy_shape(x)
    model = compile(res.target("z"), backend=backend)
    out = model.call(
        "z",
        {
            "x": Tensor.new([3, 2], [1, 0, 3, 4, -10, 6]),
            "y": Tensor.new([3, 2], [1, 2, -3, 2, 5, 5.5]),
        },
    )
    np.testing.assert_allclose(out, Tensor.new([3, 2], [1, 2, 3, 4, 5, 6]))


def test_conv1(backend):
    x, dx = iters("x", "dx")
    res = Fun()
    res[x] = input("image")[x + dx] * input("filter")[dx]
    model = compile(res.target("res"), backend=backend)
    out = model.call(
        "res",
        {
            "image": Tensor.new([7], [1, 2, 3, 2, 1, 0, -1]),
            "filter": Tensor.new([3], [1, 2, 3]),
        },
    )
    np.testing.assert_allclose(out, [14, 14, 10, 4, -2])


def test_blur(backend):
    res = Fun()
    x = irange("x", 0, res.shape[0])
    image = input("image")
    res[x] = (image[x] + image[x + 1] + image[x + 2]) / 3.0
    model = compile(res.target("res"), backend=backend)
    out = model.call("res", {"image": Tensor.new([7], [1, 2, 3, 2, 1, 0, -1])})
    np.testing.assert_allclose(out, [2, 7 / 3, 2, 1, 0], rtol=1e-6)


def test_blur_center(backend):
    image = input("image")
    x = irange("x", 1, image.shape[0] - 1)
    res = Fun()
    res[x - 1] = (image[x - 1] + image[x] + image[x + 1]) / 3.0
    model = compile(res.target("res"), backend=backend)
    out = model.call("res", {"image": Tensor.new([7], [1, 2, 3, 2, 1, 0, -1])})
    np.testing.assert_allclose(out, [2, 7 / 3, 2, 1, 0], rtol=1e-6)


def test_blur_offset(backend):
    image = input("image")
    x = irange("x", 0, image.shape[0] - 2)
    res = Fun()
    res[x + 1] = (image[x] + image[x + 1] + image[x + 2]) / 3.0
    res.with_shape([image.shape[0]])
    model = compile(res.target("res"), backend=backend)
    out = model.call("res", {"image": Tensor.new([7], [1, 2, 3, 2, 1, 0, -1])})
    np.testing.assert_allclose(out, [0, 2, 7 / 3, 2, 1, 0, 0], rtol=1e-6)


def test_single_write(backend):
    res = Fun()
    res[0] = 10.0
    model = compile(res.target("y"), dtype="float64", backend=backend)
    np.testing.assert_allclose(model.call("y"), [10.0])


def test_shape(backend):
    it = iters("it")
    res = Fun()
    res.raw[it] = 1.0
    res.with_shape([3, 2, 1])
    model = compile(res.target("y"), dtype="float64", backend=backend)
    np.testing.assert_allclose(model.call("y"), np.ones([3, 2, 1]))


def test_dimensions(backend):
    inp = input("x")
    res = Fun()
    res[0] = to_scalar(inp.shape[0])
    res[1] = to_scalar(inp.shape[-2])
    res[2] = to_scalar(inp.shape[-1])
    res[3] = to_scalar(inp.shape.rank)
    res[4] = to_scalar(inp.size)
    res.with_shape([5])
    model = compile(res.target("y"), dtype="float64", backend=backend)
    np.testing.assert_allclose(
        model.call("y", {"x": Tensor.new([1, 2, 3, 4], 0.0)}), [1, 3, 4, 4, 24]
    )
    np.testing.assert_allclose(
        model.call("y", {"x": Tensor.new([2, 3], 0.0)}), [2, 2, 3, 2, 6]
    )


def test_extern(backend):
    for factor in range(-2, 3):
        it = iters("it")
        res = Fun()
        res.raw[it] = input("x").raw[it] * float(factor)
        model = compile(res.target("y"), dtype="float64", backend=backend)
        x = Tensor.new([2, 3], [1, 2, 3, 4, 5, 6], dtype=np.float64)
        np.testing.assert_allclose(model.call("y", {"x": x}), x * factor)


def test_xor(backend):
    y, x, it = iters("y", "x", "it")
    hidden = Fun()
    hidden[y, x] = input("x")[y, it] * param([2, 4])[it, x]
    hidden[y, x] = param([4])[x]
    hr = Fun()
    hr.raw[it] = select(hidden.raw[it] <= 0.0, 0.1 * hidden.raw[it], hidden.raw[it])
    out = Fun()
    out[y, x] = hr[y, it] * param([4, 1])[it, x]
    out[y, x] = param([1])[x]
    sig = Fun()
    sig.raw[it] = 1.0 / (1.0 + exp(-out.raw[it]))
    pred = sig.target("predict")
    loss = Fun()
    loss[0] = sq(pred.raw[it] - input("y").raw[it])

    def optim(p, g):
        i = iters("i")
        p.raw[i] = -0.1 * g.raw[i]

    net = loss.target("loss").backprop(optim).target("train")
    model = compile(net, backend=backend, seed=10)
    tx = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    ty = Tensor.new([4, 1], [0, 1, 1, 0])
    for _ in range(1000):
        model.apply("train", {"x": tx, "y": ty})
    p = model.call("predict", {"x": tx})
    assert float(((p - ty) ** 2).sum()) < 0.1


def test_custom_grad(backend):
    inp = input("inp")
    x = iters("x")
    identity = Fun()
    identity.raw[x] = inp.raw[x]
    with identity.custom_grad():
        x = iters("x")
        grad(inp).raw[x] = inp.raw[x] * 2.0 * grad(identity).raw[x]

    graph = identity.target("identity").backwards().grad(inp).target("grad")
    model = compile(graph, backend=backend)
    t = Tensor.new([2, 2], [1, 2, 3, 4])
    np.testing.assert_allclose(model.call("identity", {"inp": t}), t)
    np.testing.assert_allclose(model.call("grad", {"inp": t}), t * 2)


def test_dynamic_ast(backend):
    from exprgrad_tpu.expr import as_scalar

    def elementwise_pow(fun, n):
        it = iters("it")
        prod = as_scalar(1.0)
        for _ in range(n):
            prod = prod * fun.raw[it]
        out = Fun()
        out.raw[it] = prod
        out.copy_shape(fun)
        return out

    x = Tensor.new([3, 2], [1, 2, 3, 4, 5, 6])
    expected = np.ones([3, 2], dtype=np.float32)
    for n in range(3):
        model = compile(
            elementwise_pow(input("x"), n).target("y"), backend=backend
        )
        out = model.call("y", {"x": x})
        np.testing.assert_allclose(out, expected, rtol=1e-5)
        expected = expected * x


def test_array(backend):
    x = iters("x")
    res = Fun()
    arr = array([1.0, 2.0, 3.0])
    res[x] = arr[x] + to_scalar(arr.length)
    res.with_shape([3])
    model = compile(res.target("y"), backend=backend)
    np.testing.assert_allclose(model.call("y"), [4, 5, 6])


def test_nested_array(backend):
    y, x = iters("y", "x")
    res = Fun()
    arr = array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    res[y, x] = arr[y][x]
    res.with_shape([3, 3])
    model = compile(res.target("y"), backend=backend)
    np.testing.assert_allclose(
        model.call("y"), np.arange(1, 10).reshape(3, 3)
    )


def test_loop_bounds(backend):
    res = Fun()
    res[irange("x", 2, 4)] = 1.0
    res[irange("x", 0, 1)] = -1.0
    res[irange("x", 1, 1)] = -2.0
    res.with_shape([5])
    model = compile(res.target("res"), backend=backend)
    np.testing.assert_allclose(model.call("res"), [-1, 0, 1, 1, 0])


# --- gradient correctness suite (reference derive/*) ----------------------

def _grad_model(build, backend, dtype="float32"):
    x = input("x")
    funs, names = build(x)
    graphs = [
        f.backwards().grad(x).target(name) for f, name in zip(funs, names)
    ]
    return compile(graphs, dtype=dtype, backend=backend)


def test_derive_polynomial(backend):
    def build(x):
        it = iters("it")
        y = Fun()
        y.raw[it] = sq(x.raw[it]) + 2.0 * x.raw[it] + 1.0
        return [y], ["poly"]

    model = _grad_model(build, backend)
    x = Tensor.linspace(-8, 8, 17)
    np.testing.assert_allclose(
        model.call("poly", {"x": x}), 2 * x + 2, rtol=1e-5
    )


def test_derive_multiply(backend):
    def build(x):
        it = iters("it")
        a = Fun(); a.raw[it] = x.raw[it] * x.raw[it] * x.raw[it]
        it = iters("it")
        b = Fun(); b.raw[it] = x.raw[it] / 2.0
        it = iters("it")
        c = Fun(); c.raw[it] = 1.0 / x.raw[it]
        it = iters("it")
        d = Fun(); d.raw[it] = x.raw[it] / x.raw[it]
        return [a, b, c, d], ["x^3", "x/2", "1/x", "x/x"]

    model = _grad_model(build, backend)
    x = Tensor.linspace(-8, 8, 16)
    np.testing.assert_allclose(model.call("x^3", {"x": x}), 3 * x * x, rtol=1e-5)
    np.testing.assert_allclose(model.call("x/2", {"x": x}), np.full(16, 0.5))
    np.testing.assert_allclose(
        model.call("1/x", {"x": x}), -1 / (x * x), rtol=1e-5
    )
    assert float((model.call("x/x", {"x": x}) ** 2).sum()) < 1e-5


def test_derive_trigonometry(backend):
    def build(x):
        it = iters("it")
        a = Fun(); a.raw[it] = sin(x.raw[it])
        it = iters("it")
        b = Fun(); b.raw[it] = cos(x.raw[it])
        return [a, b], ["sin", "cos"]

    model = _grad_model(build, backend)
    x = Tensor.linspace(-8, 8, 17)
    np.testing.assert_allclose(
        model.call("sin", {"x": x}), np.cos(x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        model.call("cos", {"x": x}), -np.sin(x), rtol=1e-5, atol=1e-6
    )


def test_derive_exp(backend):
    def build(x):
        it = iters("it")
        a = Fun(); a.raw[it] = exp(x.raw[it])
        it = iters("it")
        b = Fun(); b.raw[it] = exp(2.0 * x.raw[it])
        it = iters("it")
        c = Fun(); c.raw[it] = pow_(x.raw[it], 3.0)
        it = iters("it")
        d = Fun(); d.raw[it] = pow_(2.0, x.raw[it])
        it = iters("it")
        e = Fun(); e.raw[it] = pow_(x.raw[it], x.raw[it])
        return [a, b, c, d, e], ["exp(x)", "exp(2x)", "x^3", "2^x", "x^x"]

    model = _grad_model(build, backend)
    x = Tensor.linspace(-8, 8, 17)
    np.testing.assert_allclose(model.call("exp(x)", {"x": x}), np.exp(x), rtol=1e-5)
    np.testing.assert_allclose(
        model.call("exp(2x)", {"x": x}), np.exp(2 * x) * 2, rtol=1e-4
    )
    np.testing.assert_allclose(model.call("x^3", {"x": x}), 3 * x * x, rtol=1e-5)
    np.testing.assert_allclose(
        model.call("2^x", {"x": x}), 2.0**x * np.log(2), rtol=1e-5
    )
    x2 = Tensor.linspace(1, 8, 5)
    expected = x2**x2 * (np.log(x2) + 1)
    np.testing.assert_allclose(model.call("x^x", {"x": x2}), expected, rtol=2e-5)


def test_derive_log(backend):
    def build(x):
        it = iters("it")
        a = Fun(); a.raw[it] = ln(x.raw[it])
        it = iters("it")
        b = Fun(); b.raw[it] = log10(x.raw[it])
        it = iters("it")
        c = Fun(); c.raw[it] = log2(x.raw[it])
        it = iters("it")
        d = Fun(); d.raw[it] = log(x.raw[it], 5.0)
        it = iters("it")
        e = Fun(); e.raw[it] = log(2.0, x.raw[it])
        return [a, b, c, d, e], ["ln", "log10", "log2", "log(x,5)", "log(2,x)"]

    model = _grad_model(build, backend)
    x = Tensor.linspace(1, 8, 8)
    np.testing.assert_allclose(model.call("ln", {"x": x}), 1 / x, rtol=1e-5)
    np.testing.assert_allclose(
        model.call("log10", {"x": x}), 1 / (x * np.log(10)), rtol=1e-5
    )
    np.testing.assert_allclose(
        model.call("log2", {"x": x}), 1 / (x * np.log(2)), rtol=1e-5
    )
    np.testing.assert_allclose(
        model.call("log(x,5)", {"x": x}), 1 / (x * np.log(5)), rtol=1e-5
    )
    # x away from 1: d/dx log_x(2) has a pole there (inf == inf would
    # pass, but the oracle should stay warning-clean)
    x2 = Tensor.linspace(2, 9, 8)
    expected = -np.log(2) / (x2 * np.log(x2) ** 2)
    np.testing.assert_allclose(
        model.call("log(2,x)", {"x": x2}), expected, rtol=5e-4
    )


def test_upsample_div(backend):
    """Index division in read indices (upsample2 pattern)."""
    y, x = iters("y", "x")
    res = Fun()
    inp = input("inp")
    res[y, x] = inp[y // 2, x // 2]
    res.with_shape([inp.shape[0] * 2, inp.shape[1] * 2])
    model = compile(res.target("up"), backend=backend)
    a = Tensor.new([2, 2], [1, 2, 3, 4])
    np.testing.assert_allclose(
        model.call("up", {"inp": a}),
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
    )


def test_multi_target_reuse(backend):
    """Two targets sharing intermediate results."""
    it = iters("it")
    a = Fun()
    a.raw[it] = input("x").raw[it] * 2.0
    it = iters("it")
    b = Fun()
    b.raw[it] = a.raw[it] + 1.0
    model = compile([a.target("a"), b.target("b")], backend=backend)
    x = Tensor.new([3], [1, 2, 3])
    np.testing.assert_allclose(model.call("a", {"x": x}), x * 2)
    np.testing.assert_allclose(model.call("b", {"x": x}), x * 2 + 1)


def test_epoch(backend):
    from exprgrad_tpu import epoch

    res = Fun()
    res[0] = to_scalar(epoch())
    res.with_shape([1])
    model = compile(res.target("y"), backend=backend)
    np.testing.assert_allclose(model.call("y"), [0.0])
    model.epoch = 42
    np.testing.assert_allclose(model.call("y"), [42.0])


def test_weight_tying(backend):
    """The same param used in two kernels: gradients accumulate."""
    w = param([3, 3], name="tied")
    x = input("x")
    y_, x_, it = iters("y", "x", "it")
    h = Fun()
    h[y_, x_] = x[y_, it] * w[it, x_]
    y_, x_, it = iters("y", "x", "it")
    out = Fun()
    out[y_, x_] = h[y_, it] * w[it, x_]
    it = iters("it")
    loss = Fun()
    loss[0] = out.raw[it]
    graph = loss.target("loss").backwards().grad(w).target("dw")
    model = compile(graph, dtype="float64", backend=backend, seed=0)

    rng = np.random.default_rng(0)
    xv = rng.normal(size=(2, 3))
    wv = np.asarray(model.params[next(iter(model.params))])
    got = model.call("dw", {"x": xv})
    # loss = sum(x @ w @ w); d/dw = x^T 1 1^T w^T + w^T x^T 1 1^T
    ones = np.ones((2, 3))
    expected = (xv.T @ ones) @ wv.T + wv.T @ (xv.T @ ones)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_reshape_param_and_grad(backend):
    """Reshape of a parameter, with gradients flowing through the reshape."""
    w = param([2, 3], name="w")
    flat = w.reshape([6])
    i = iters("i")
    out = Fun()
    out[i] = flat[i] * flat[i]
    graph = out.target("out").backwards().grad(w).target("dw")
    model = compile(graph, dtype="float64", backend=backend, seed=1)
    wv = np.asarray(model.params[next(iter(model.params))])
    np.testing.assert_allclose(
        model.call("out"), (wv.reshape(-1) ** 2), rtol=1e-12
    )
    got = model.call("dw")
    np.testing.assert_allclose(got, 2 * wv, rtol=1e-12)


def test_lr_schedule_in_the_language():
    """decayed_gradient_descent: the schedule is a kernel expression of
    epoch(), compiled into the training program; stepping epoch shrinks the
    actual update magnitude by the decay factor."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters, make_opt, param, sq
    from exprgrad_tpu.layers import decayed_gradient_descent

    x = input("x")
    it = iters("it")
    w = param([4], init_range=(0.5, 0.6), name="w")
    loss = Fun()
    loss[0] = sq(w.raw[it] - x.raw[it])
    net = loss.target("loss").backprop(
        make_opt(decayed_gradient_descent, rate=0.1, decay=0.5, every=1)
    ).target("train")
    model = compile(net, dtype="float64", backend="jax")
    xv = np.zeros(4)

    def update_norm(epoch):
        model.epoch = epoch
        before = np.asarray(model.params[next(iter(model.params))]).copy()
        model.apply("train", {"x": xv})
        after = np.asarray(model.params[next(iter(model.params))])
        return np.abs(after - before).sum(), before

    n1, w1 = update_norm(0)   # lr = 0.1 * 0.5^0
    # reset weights for a fair comparison
    for tid in model.params:
        model.params[tid] = w1
    n2, _ = update_norm(2)    # lr = 0.1 * 0.5^2
    assert n2 < n1 * 0.3 and n2 > 0


def test_fit_monitor_reports_loss(backend, capsys):
    """fit(monitor="loss") returns the post-epoch loss and it decreases."""
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(rate=0.5), backend=backend, seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    first = model.fit("train", {"x": x, "y": y}, batch_size=4,
                      log_status=False, monitor="loss")
    for _ in range(60):
        last = model.fit("train", {"x": x, "y": y}, batch_size=4,
                         log_status=False, monitor="loss")
    assert last < first
    from exprgrad_tpu import ModelRuntimeError

    with pytest.raises(ModelRuntimeError, match="monitor"):
        model.fit("train", {"x": x, "y": y}, batch_size=4,
                  log_status=False, monitor="nope")


def test_remat_on_extern_warns():
    """remat() marks on extern-produced tensors warn instead of silently
    doing nothing."""
    import warnings

    from exprgrad_tpu import RematWarning, input as einput, to_scalar
    from exprgrad_tpu.layers import fused_attention

    q, k, v = einput("q"), einput("k"), einput("v")
    att = fused_attention(q, k, v, impl="xla")
    att.remat()
    it = iters("it")
    loss = Fun("loss")
    loss[0] = att.raw[it] * att.raw[it]
    graph = loss.target("loss").backwards().grad(q).target("dq")
    with pytest.warns(RematWarning, match="extern"):
        compile(graph, backend="jax")
