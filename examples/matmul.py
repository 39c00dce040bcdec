"""Minimal matmul through the DSL (reference examples/matmul)."""

import numpy as np

from exprgrad_tpu import Fun, Tensor, compile, input, iters


def main() -> None:
    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    model = compile(c.target("c"))

    a = Tensor.rand([256, 128], rng=np.random.default_rng(0))
    b = Tensor.rand([128, 64], rng=np.random.default_rng(1))
    out = model.call("c", {"a": a, "b": b})
    print("result", out.shape, "max err", float(np.abs(out - a @ b).max()))


if __name__ == "__main__":
    main()
