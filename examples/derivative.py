"""Symbolic gradients of a DSL kernel (reference examples/derivative)."""

from exprgrad_tpu import Fun, Tensor, compile, input, iters


def main() -> None:
    x = input("x")
    it = iters("it")
    y = Fun("y")
    y[it] = x[it] * x[it]

    graph = y.target("y").backwards().grad(x).target("grad_x")
    model = compile(graph)

    xs = Tensor.linspace(-2, 2, 9)
    print("x:      ", xs)
    print("y:      ", model.call("y", {"x": xs}))
    print("grad_x: ", model.call("grad_x", {"x": xs}))


if __name__ == "__main__":
    main()
