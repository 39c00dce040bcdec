"""Error-path tests (ported from reference tests/test_errors.nim)."""

import pytest

from exprgrad_tpu import (
    Fun,
    ModelRuntimeError,
    ShapeError,
    Tensor,
    compile,
    input,
    iters,
)


def test_invalid_target():
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x").raw[it]
    model = compile(out.target("y"), backend="interp")
    with pytest.raises(ModelRuntimeError):
        model.call("my_target")


def test_invalid_input():
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x").raw[it]
    model = compile(out.target("y"), backend="interp")
    with pytest.raises(ModelRuntimeError):
        model.call(
            "y",
            {"x": Tensor.new([2, 3], 0.0), "abc": Tensor.new([2, 3], 0.0)},
        )


def test_static_shape_mismatch():
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x", [2, 3]).raw[it]
    model = compile(out.target("y"), backend="interp")
    with pytest.raises(ShapeError):
        model.call("y", {"x": Tensor.new([10, 10], 0.0)})


def test_underconstrained_shapes():
    # raw write, no reads
    it = iters("it")
    res = Fun()
    res.raw[it] = 1.0
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")

    # indexed write with unconstrained iterator
    x = iters("x")
    res = Fun()
    res[x] = 1.0
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")

    # write iterator not tied to any read
    x, y = iters("x", "y")
    res = Fun()
    res[x] = input("inp")[y]
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")

    # raw write where no read uses the write's identity index: no copy
    # constraint possible
    it = iters("it")
    c = Fun()
    c.raw[it] = input("a").raw[0] + input("b").raw[0]
    with pytest.raises(ShapeError):
        compile(c.target("c"), backend="interp")


@pytest.mark.parametrize("backend", ["interp", "jax"])
def test_elementwise_two_read_raw_write_infers_shape(backend):
    """c{it} = a{it} + b{it} copies a's shape (the identity-indexed read
    pins the iterator extent); an undersized b errors at call time
    instead of reading out of bounds / silently clamping."""
    import numpy as np

    it = iters("it")
    c = Fun()
    c.raw[it] = input("a").raw[it] + input("b").raw[it]
    model = compile(c.target("c"), backend=backend)
    out = model.call("c", {"a": Tensor.new([2, 2], 1.0),
                           "b": Tensor.new([2, 2], 2.0)})
    np.testing.assert_allclose(np.asarray(out), np.full((2, 2), 3.0))
    with pytest.raises(ShapeError, match="elementwise"):
        model.call("c", {"a": Tensor.new([2, 2], 1.0),
                         "b": Tensor.new([3], 2.0)})


def test_read_dimension_conflict():
    # a written rank-1 via shape [x], read rank-2
    inp = input("x")
    x = iters("x")
    a = Fun()
    a[0] = inp[x]
    b = Fun()
    x = iters("x")
    b[0] = a[0, x]
    with pytest.raises(ShapeError):
        compile(b.target("y"), backend="interp")

    # static rank 2 input read with rank 1
    inp = input("x", [2, 3])
    x = iters("x")
    res = Fun()
    res[0] = inp[x]
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")


def test_write_dimension_conflict():
    res = Fun()
    res[0] = 1.0
    res[0, 0] = 1.0
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")

    res = Fun()
    res[0] = 1.0
    res.with_shape([2, 3])
    with pytest.raises(ShapeError):
        compile(res.target("y"), backend="interp")


def test_runtime_shape_mismatch():
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    model = compile(c.target("c"), backend="interp")
    with pytest.raises(ShapeError):
        model.call(
            "c",
            {"a": Tensor.new([2, 3], 0.0), "b": Tensor.new([4, 2], 0.0)},
        )


def test_missing_input():
    it = iters("it")
    out = Fun()
    out.raw[it] = input("x").raw[it]
    model = compile(out.target("y"), backend="interp")
    with pytest.raises(ShapeError):
        model.call("y")


def test_duplicate_target_names():
    from exprgrad_tpu import ParserError

    it = iters("it")
    a = Fun()
    a.raw[it] = input("x").raw[it]
    it = iters("it")
    b = Fun()
    b.raw[it] = input("x").raw[it] * 2.0
    with pytest.raises(ParserError):
        compile([a.target("y"), b.target("y")], backend="interp")


def test_shape_errors_name_the_tensor():
    """Diagnostics carry the user-visible tensor name, not just an id."""
    import pytest

    from exprgrad_tpu import Fun, compile, input, iters
    from exprgrad_tpu.errors import ShapeError

    y, x = iters("y", "x")
    out = Fun()
    out[y] = input("data")[y, x]
    model = compile(out.target("o"), backend="interp")
    with pytest.raises(ShapeError, match="data"):
        model.call("o", {})

    a = input("a")
    dx = iters("dx")
    pooled = Fun("pooled")
    pooled[y] = a[2 * y + dx]
    model2 = compile(pooled.target("o"), backend="interp")
    with pytest.raises(ShapeError, match="pooled.*underconstrained"):
        import numpy as np

        model2.call("o", {"a": np.zeros(8, np.float32)})


def test_type_errors_carry_kernel_provenance():
    """IR-level type errors (the backstop behind the typed front end) say
    which tensor's kernel failed."""
    import pytest

    from exprgrad_tpu import ir
    from exprgrad_tpu.errors import KernelTypeError
    from exprgrad_tpu.passes.typecheck import infer_types

    program = ir.Program()
    tid = program.alloc_tensor(ir.TensorDef(ir.TensorKind.RESULT, name="bad"))
    src = program.alloc_tensor(
        ir.TensorDef(ir.TensorKind.INPUT, name="src")
    )
    kernel = ir.Kernel()
    data = kernel.alloc_reg()
    i = kernel.alloc_reg()
    kernel.loops.append(ir.Loop(iter_reg=i, has_bounds=True,
                                start=ir.LinearIndex.of_const(0),
                                stop=ir.LinearIndex.of_const(4), step=1))
    # raw access with TWO indices: ill-formed at the IR level
    kernel.reads.append(ir.TensorOp(
        tensor=src, is_raw=True, data=data,
        dims=[ir.LinearIndex.of_reg(i), ir.LinearIndex.of_reg(i)],
    ))
    kernel.expr = ir.Expr(res=data)
    kernel.write = ir.TensorOp(
        tensor=tid, is_raw=True, data=data, dims=[ir.LinearIndex.of_reg(i)]
    )
    target = ir.Target(name="t")
    target.kernels.append(kernel)
    program.targets["t"] = target
    program.stages = set(ir.ALL_STAGES)
    with pytest.raises(KernelTypeError, match="bad.*target 't'"):
        infer_types(program)


def test_locked_tensor_rejects_further_writes():
    """lock() guards a custom-gradient tensor against later accumulation
    (the reference declares but never enforces this; we do)."""
    import pytest

    from exprgrad_tpu import Fun, input, iters
    from exprgrad_tpu.errors import ParserError
    from exprgrad_tpu.layers import maxpool2

    pooled = maxpool2(input("images"))
    y = iters("y")
    with pytest.raises(ParserError, match="locked"):
        pooled.raw[y] = 1.0


def test_unsolvable_read_extents_name_the_tensors():
    """The 'no solution' shape error names the destination and the read
    tensors with their shapes (a bare message was undiagnosable).

    Unit-stride reads keep exact-cover semantics, so two identity-indexed
    reads of different sizes conflict; strided reads with slack < stride
    are legal since the floor-bound relaxation (solve_floor) and no longer
    raise — see tests/test_strided_shapes.py."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters
    from exprgrad_tpu.errors import ShapeError

    i0, i2 = iters("i0", "i2")
    out = Fun("out")
    out[i0, i2] = input("base")[i0, i2] + input("t")[i0, i2]
    m = compile(out.target("out"), backend="interp")
    with pytest.raises(ShapeError, match="'t'.*span each tensor dim"):
        m.call("out", {"base": np.zeros((16, 8), np.float32),
                       "t": np.zeros((12, 8), np.float32)})

    # the strided sibling of the same program is now legal (floor slack)
    i0, i2 = iters("i0", "i2")
    out2 = Fun("out2")
    out2[i0, i2] = input("base")[i0, i2] + input("t")[i0 * 2, i2]
    m2 = compile(out2.target("out"), backend="interp")
    res = m2.call("out", {"base": np.ones((16, 8), np.float32),
                          "t": np.ones((32, 8), np.float32)})
    np.testing.assert_allclose(np.asarray(res), np.full((16, 8), 2.0))


def test_shifted_self_read_of_result_is_rejected():
    """``h[i] = f(h[i-1])`` on a fresh result silently reads zeros (both
    backends snapshot pre-kernel contents), so the validate pass rejects
    it with a recurrence hint.  Same-index self-updates (optimizer
    style) and shifted reads of OTHER tensors stay legal."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters
    from exprgrad_tpu.errors import ValidationError

    i = iters("i")
    h = Fun("h")
    h[i] = input("x")[i] + h[i - 1]
    h.copy_shape(input("x"))
    with pytest.raises(ValidationError, match="own output.*'h'"):
        compile(h.target("h"), backend="interp")

    # same-index self-update is the optimizer idiom; must stay legal
    i = iters("i")
    w = Fun("w")
    w[i] = w[i] + input("x2")[i]
    w.copy_shape(input("x2"))
    m = compile(w.target("w"), backend="interp")
    got = np.asarray(m.call("w", {"x2": np.ones(4, np.float32)}))
    np.testing.assert_allclose(got, np.ones(4))

    # a shifted self-read AFTER an earlier kernel populated the result
    # is a deterministic snapshot of that kernel's output: stays legal,
    # and both backends agree
    x3 = input("x3")
    i = iters("i")
    y = Fun("y")
    y[i] = x3[i] * 2.0
    i = iters("i")
    y[i] = y[i - 1]
    y.copy_shape(x3)
    xv = np.arange(4, dtype=np.float32)
    outs = [
        np.asarray(compile(y.target("y"), backend=be).call(
            "y", {"x3": xv}))
        for be in ("interp", "jax")
    ]
    np.testing.assert_allclose(outs[0], outs[1])
