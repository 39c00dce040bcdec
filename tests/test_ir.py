"""IR-level unit tests: LinearIndex arithmetic, passes, and golden IR files.

The golden-file mechanism mirrors the reference's cached-IR GPU tests
(tests/test_gpu.nim:21-34 ``checkCache``): the pretty-printed compiled
program is compared against tests/golden/*.ir, writing the file on first
run.  Run with ``UPDATE_GOLDEN=1`` to regenerate after intentional changes.
"""

import os
import pathlib

import pytest

from exprgrad_tpu import Fun, input, iters, param, select, sq, to_program
from exprgrad_tpu.ir import LinearIndex, Stage
from exprgrad_tpu.irprint import fmt_program
from exprgrad_tpu.passes import compile_program
from exprgrad_tpu.errors import StageError

GOLDEN = pathlib.Path(__file__).parent / "golden"


def check_golden(name: str, text: str) -> None:
    GOLDEN.mkdir(exist_ok=True)
    path = GOLDEN / f"{name}.ir"
    if not path.exists() or os.environ.get("UPDATE_GOLDEN"):
        path.write_text(text)
        return
    assert path.read_text() == text, (
        f"golden IR mismatch for {name}; run UPDATE_GOLDEN=1 pytest to refresh"
    )


def test_linear_index_arithmetic():
    a = LinearIndex.of_reg(1) + LinearIndex.of_const(2)
    b = a.scaled(3)
    assert b.factors == {1: 3} and b.constant == 6
    c = b - LinearIndex.of_reg(1).scaled(3)
    assert c.factors == {} and c.constant == 6
    assert LinearIndex.of_reg(5).only_register() == 5
    assert (LinearIndex.of_reg(5) + LinearIndex.of_const(1)).only_register() is None
    assert b.eval({1: 10}) == 36


def test_stage_tracking():
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    program = to_program(c.target("c"))
    from exprgrad_tpu.passes.shapes import infer_static_shapes

    with pytest.raises(StageError):
        infer_static_shapes(program)  # requires sorted shapes
    assert Stage.SORTED_SHAPES not in program.stages


def test_golden_matmul():
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    program = to_program(c.target("c"))
    compile_program(program)
    check_golden("matmul", fmt_program(program))


def test_golden_xor_train():
    """The full forward+backward+update program of an MLP: exercises the
    autodiff pass output shape (one gradient kernel per read, custom seed
    kernel, optimizer kernels)."""
    from exprgrad_tpu import exp

    y, x, it = iters("y", "x", "it")
    hidden = Fun()
    hidden[y, x] = input("x")[y, it] * param([2, 4])[it, x]
    hr = Fun()
    hr.raw[it] = select(hidden.raw[it] <= 0.0, 0.1 * hidden.raw[it], hidden.raw[it])
    out = Fun()
    out[y, x] = hr[y, it] * param([4, 1])[it, x]
    sig = Fun()
    sig.raw[it] = 1.0 / (1.0 + exp(-out.raw[it]))
    loss = Fun()
    loss[0] = sq(sig.raw[it] - input("y").raw[it])

    def optim(p, g):
        i = iters("i")
        p.raw[i] = -0.1 * g.raw[i]

    net = loss.target("loss").backprop(optim).target("train")
    program = to_program(net)
    compile_program(program)
    check_golden("xor_train", fmt_program(program))


def test_golden_conv_grad():
    """Scatter-add gradient kernels for a convolution."""
    x, dx = iters("x", "dx")
    res = Fun()
    res[x] = input("image")[x + dx] * input("filter")[dx]
    img = input("image")
    graph = (
        res.target("res").backwards().grad(img).target("dimg")
    )
    program = to_program(graph)
    compile_program(program)
    check_golden("conv1_grad", fmt_program(program))


def test_reorder_loops_matmul_locality():
    y, x, it = iters("y", "x", "it")
    c = Fun()
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    program = to_program(c.target("c"))
    compile_program(program)
    kernel = program.targets["c"].kernels[0]
    # y must be the outermost loop (lowest locality pressure)
    names = [kernel.regs[l.iter_reg].name for l in kernel.loops]
    assert names[0] == "y"


def test_dedup_reads():
    it = iters("it")
    a = input("a")
    c = Fun()
    c.raw[it] = a.raw[it] * a.raw[it]
    program = to_program(c.target("c"))
    compile_program(program)
    kernel = program.targets["c"].kernels[0]
    assert len(kernel.reads) == 1


def test_dead_kernel_elim():
    it = iters("it")
    unused = Fun()
    unused.raw[it] = input("a").raw[it] * 3.0
    used = Fun()
    it = iters("it")
    used.raw[it] = input("a").raw[it] * 2.0
    program = to_program([used.target("y"), unused.target("z")])
    compile_program(program)
    # target y must only contain the kernel writing y's output
    assert len(program.targets["y"].kernels) == 1


def test_golden_cnn_train():
    """Pin the full fashion-MNIST train target: conv/pool/reshape forward,
    every derived gradient kernel (conv grads, maxpool custom grad, softmax
    grads) and the adam update kernels."""
    from exprgrad_tpu.models import fashion_mnist_cnn

    program = to_program(fashion_mnist_cnn())
    compile_program(program)
    check_golden("cnn_train", fmt_program(program))


def test_golden_triangular_max():
    """Locks the IR for the two language extensions: a max-accumulation
    kernel over a triangular (iterator-dependent) loop nest, plus its
    derived argmax-gated gradient."""
    from exprgrad_tpu import irange, sq

    a = input("a")
    y = iters("y")
    x = irange("x", 0, y + 1)
    m = Fun("runmax")
    m.maximize[y] = a[y, x]
    it = iters("it")
    loss = Fun()
    loss[0] = sq(m.raw[it])
    graph = loss.target("loss").backwards().grad(a).target("da")
    program = to_program(graph)
    compile_program(program)
    check_golden("triangular_max_grad", fmt_program(program))


def test_golden_cross_attention():
    """Cross-attention extern pair through the custom-grad seam: pins the
    extern kernel layout (out + lse writers, dq/dk/dv grad kernels with
    placeholder reads) and the projection einsum kernels."""
    from exprgrad_tpu.layers import multi_head_cross_attention

    x = input("x")
    ctx = input("ctx")
    y = multi_head_cross_attention(x, ctx, dim=4, heads=2, context_dim=6)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(y.raw[it])

    def optim(p, g):
        i = iters("i")
        p.raw[i] = -0.1 * g.raw[i]

    net = loss.target("loss").backprop(optim).target("train")
    program = to_program(net)
    compile_program(program)
    check_golden("cross_attention_train", fmt_program(program))


def test_golden_moe_train():
    """MoE extern pair through the custom-grad seam: pins the routed
    forward writer and the six grad kernels (dx/dgate/dw1/db1/dw2/db2
    extern outputs accumulated through the symbolic backward)."""
    from exprgrad_tpu.layers import moe_ffn

    x = input("x")
    y = moe_ffn(x, dim=4, hidden=8, n_experts=2, k=1)
    it = iters("it")
    loss = Fun()
    loss[0] = sq(y.raw[it])

    def optim(p, g):
        i = iters("i")
        p.raw[i] = -0.1 * g.raw[i]

    net = loss.target("loss").backprop(optim).target("train")
    program = to_program(net)
    compile_program(program)
    check_golden("moe_train", fmt_program(program))


def test_golden_accum_train():
    """optimize_accum compiler output: pins the grad-sum accumulate
    kernels of the ``.accum`` target and the mean-gradient optimizer +
    cache-reset kernels of the ``.step`` target (gradient accumulation,
    fun.py optimize_accum)."""
    from exprgrad_tpu import make_opt
    from exprgrad_tpu.layers import gradient_descent, mse

    y, x, it = iters("y", "x", "it")
    w = param([8, 4], (-0.5, 0.5), name="w")
    pred = Fun("pred")
    pred[y, x] = input("inp")[y, it] * w[it, x]
    loss = mse(pred, input("lbl"))
    net = (loss.target("loss").backwards()
           .optimize_accum(make_opt(gradient_descent, rate=0.1), 4))
    program = to_program(net)
    compile_program(program)
    check_golden("accum_train", fmt_program(program))


def test_golden_scheduled_pool():
    """Scheduled strided-window pooling: pins the IR the windowed/strided
    Pallas family consumes (affine read indices + tile schedule)."""
    from exprgrad_tpu import maximum

    imgs = input("imgs")
    i, y, x, c = iters("i", "y", "x", "c")
    out = Fun("out")
    out[i, y, x, c] = maximum(
        maximum(imgs[i, y * 2, x * 2, c], imgs[i, y * 2 + 1, x * 2, c]),
        maximum(imgs[i, y * 2, x * 2 + 1, c],
                imgs[i, y * 2 + 1, x * 2 + 1, c]),
    )
    out.schedule(tile={"y": 8})
    program = to_program(out.target("out"))
    compile_program(program)
    check_golden("scheduled_pool", fmt_program(program))


def test_golden_diffusion_train():
    """The DDPM program: pins cond routing (computed x_t for train, a
    runtime input for predict), the irange time embedding with its
    index-expression frequencies, offset-write concat, and the derived
    backward pass through all of it."""
    from exprgrad_tpu.models.diffusion import tiny_diffusion

    program = to_program(tiny_diffusion(data_dim=2, hidden=4, emb=2))
    compile_program(program)
    check_golden("diffusion_train", fmt_program(program))
