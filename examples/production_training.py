"""The production training loop, end to end.

Everything a long-running training job needs, composed from library
pieces (the reference stops at a hand-rolled epoch loop,
examples/fashion_mnist/fashion_mnist.nim:58-73):

* async input pipeline — ``Batches`` + ``Prefetcher`` overlap batch
  assembly and host->device transfer with the device step;
* ``train()`` — validation, early stopping, metric history;
* ``CheckpointManager`` — rotating numbered checkpoints, keep-K,
  crash-resume that is bit-identical to never stopping (the checkpoint
  carries params, optimizer state, epoch AND the host RNG stream);
* the same state restores onto a device mesh (``sharded=True`` +
  ``load_sharded``) when scaling out.

Run: PYTHONPATH=. python examples/production_training.py
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from exprgrad_tpu import Fun, compile, input, iters, make_opt, param
from exprgrad_tpu.io import Batches, CheckpointManager, Prefetcher, fit_epochs
from exprgrad_tpu.layers import adam, dense, leaky_relu, mse
from exprgrad_tpu.train import train

CKPT_DIR = "ckpts"


def regression_net():
    """Two-layer MLP on a synthetic nonlinear regression task."""
    net = (
        input("x")
        .pipe(dense, 16, 64)
        .pipe(leaky_relu)
        .pipe(dense, 64, 1)
    )
    loss = mse(net, input("y"))
    return (loss.target("loss").backwards()
            .optimize(make_opt(adam, eta=0.003)).target("train"))


_TRUE_W = np.random.default_rng(99).normal(size=(16, 1))


def make_data(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    y = np.tanh(x @ _TRUE_W * 0.5) + 0.05 * rng.normal(size=(n, 1))
    return {"x": x, "y": y.astype(np.float32)}


def main(epochs: int = 8) -> None:
    shutil.rmtree(CKPT_DIR, ignore_errors=True)
    data = make_data(2048, seed=0)
    val = make_data(256, seed=1)

    # -- phase 1: train with rotating checkpoints + early stopping -----
    model = compile(regression_net(), seed=42)
    mgr = CheckpointManager(CKPT_DIR, keep=3)
    history = train(
        model, "train", data,
        epochs=epochs, batch_size=128,
        validation=val, monitor="loss", patience=4,
        checkpoint=mgr, checkpoint_every=1,
        log=print,
    )
    print(f"trained {len(history)} epochs; checkpoints kept: {mgr.steps()}")

    # -- phase 2: 'crash' — a fresh process resumes from the latest ----
    resumed = CheckpointManager(CKPT_DIR, keep=3).restore()
    print(f"resumed from epoch {resumed.epoch}")

    # -- phase 3: keep training through the async input pipeline -------
    batches = Batches(data, batch_size=128, shuffle=True, seed=7)
    fit_epochs(resumed, "train", batches, epochs=2, prefetch=2)
    final = float(np.asarray(
        resumed.call("loss", val)).reshape(-1)[0])
    print(f"val loss after prefetched epochs: {final:.5f}")

    # the pipeline can also place dp-sharded batches straight on a mesh:
    # Prefetcher(batches, placement=NamedSharding(mesh, P("data")))
    assert final < history[0]["val_loss"], "training must improve val loss"
    print("ok")


if __name__ == "__main__":
    main()
