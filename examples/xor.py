"""XOR via the layer API (reference examples/xor/xor.nim, README.md:6-29)."""

import numpy as np

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.models import xor_mlp


def main() -> None:
    model = compile(xor_mlp(rate=0.1), seed=10)
    train_x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    train_y = Tensor.new([4, 1], [0, 1, 1, 0])
    for _ in range(5000):
        model.apply("train", {"x": train_x, "y": train_y})
    print(model.call("predict", {"x": train_x}))


if __name__ == "__main__":
    main()
