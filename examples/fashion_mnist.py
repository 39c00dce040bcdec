"""Fashion-MNIST CNN training (reference examples/fashion_mnist).

Looks for the standard IDX files under ``data/``; without them, trains on a
synthetic structured dataset so the example always runs.  Saves a model
checkpoint and a DOT graph of the loss target each epoch.
"""

import os
import time

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.graphics import to_dot_graph
from exprgrad_tpu.io import load_idx, save_model
from exprgrad_tpu.models import fashion_mnist_cnn


def load_dataset(path: str = "data"):
    files = {
        "train_x": "train-images-idx3-ubyte",
        "train_y": "train-labels-idx1-ubyte",
        "test_x": "t10k-images-idx3-ubyte",
        "test_y": "t10k-labels-idx1-ubyte",
    }
    if all(
        os.path.exists(os.path.join(path, f))
        or os.path.exists(os.path.join(path, f + ".gz"))
        for f in files.values()
    ):
        def load(name):
            p = os.path.join(path, files[name])
            return load_idx(p if os.path.exists(p) else p + ".gz")

        train_x = load("train_x").astype(np.float32) / 255.0
        train_y = one_hot(load("train_y"), 10)
        test_x = load("test_x").astype(np.float32) / 255.0
        test_y = one_hot(load("test_y"), 10)
        return train_x, train_y, test_x, test_y

    print("no dataset under data/, using synthetic data")
    rng = np.random.default_rng(0)

    def synth(n):
        labels = rng.integers(0, 10, n)
        x = rng.normal(0, 0.1, (n, 28, 28)).astype(np.float32)
        for i, label in enumerate(labels):
            x[i, label : label + 10, label : label + 10] += 1.0
        return x, one_hot(labels, 10)

    train_x, train_y = synth(4096)
    test_x, test_y = synth(512)
    return train_x, train_y, test_x, test_y


def main() -> None:
    train_x, train_y, test_x, test_y = load_dataset()
    model = compile(fashion_mnist_cnn(eta=0.01), seed=0)

    with open("model.gv", "w") as f:
        f.write(to_dot_graph(model.program, "loss"))

    for epoch in range(5):
        t = time.monotonic()
        test_loss = model.call("loss", {"x": test_x, "y": test_y})
        loss_time = time.monotonic() - t
        print(f"epoch {epoch}  test loss {float(test_loss[0]):.4f} "
              f"(eval {loss_time:.2f}s)")
        t = time.monotonic()
        model.fit("fit", {"x": train_x, "y": train_y}, batch_size=32,
                  shuffle=True, scan_batches=True, log_status=False)
        print(f"fit: {time.monotonic() - t:.2f}s")
        save_model(model, "model.bin")

    pred = model.call("predict", {"x": test_x}).argmax(axis=1)
    accuracy = (pred == test_y.argmax(axis=1)).mean()
    print(f"test accuracy: {accuracy:.4f}")


if __name__ == "__main__":
    main()
