"""XOR written directly in the kernel language: the compiler derives the
whole backward pass (reference examples/xor_from_scratch, README.md:35-53)."""

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.models import xor_from_scratch


def main() -> None:
    model = compile(xor_from_scratch(rate=0.1), seed=10)
    train_x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    train_y = Tensor.new([4, 1], [0, 1, 1, 0])
    for _ in range(5000):
        model.apply("train", {"x": train_x, "y": train_y})
    print(model.call("predict", {"x": train_x}))


if __name__ == "__main__":
    main()
