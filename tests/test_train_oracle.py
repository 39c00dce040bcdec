"""End-to-end training equality: several adam steps of a small CNN must
produce identical parameters on the XLA backend and the numpy oracle (f64).

This pins the semantics of the ENTIRE training program: forward kernels,
every derived gradient kernel (conv grads, maxpool custom grad, softmax
grads, reshape copies), optimizer cache updates and epoch bias correction.
"""

import numpy as np

from exprgrad_tpu import compile, input, make_opt, one_hot
from exprgrad_tpu.layers import (
    adam,
    conv2,
    cross_entropy,
    dense,
    leaky_relu,
    maxpool2,
    softmax,
)


def small_cnn():
    return (
        input("x")
        .reshape([-1, 12, 12, 1])
        .pipe(conv2, 1, 3, 3, 4)
        .pipe(leaky_relu)
        .pipe(maxpool2)
        .reshape([-1, 5 * 5 * 4])
        .pipe(dense, 5 * 5 * 4, 10)
        .pipe(softmax)
        .target("predict")
        .pipe(cross_entropy, input("y"))
        .target("loss")
        .backwards()
        .optimize(make_opt(adam, eta=0.01))
        .target("train")
    )


def test_cnn_training_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 12, 12)).astype(np.float64)
    y = one_hot(rng.integers(0, 10, 8), 10).astype(np.float64)

    mj = compile(small_cnn(), dtype="float64", backend="jax", seed=5)
    mi = compile(small_cnn(), dtype="float64", backend="interp", seed=5)
    for tid in mi.params:
        np.testing.assert_array_equal(mi.params[tid], mj.params[tid])

    for step in range(3):
        mj.epoch += 1
        mi.epoch += 1
        mj.apply("train", {"x": x, "y": y})
        mi.apply("train", {"x": x, "y": y})

    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]),
            np.asarray(mi.params[tid]),
            rtol=1e-9,
            atol=1e-12,
        )
    for tid in mj.caches:
        np.testing.assert_allclose(
            np.asarray(mj.caches[tid]),
            np.asarray(mi.caches[tid]),
            rtol=1e-9,
            atol=1e-12,
        )
    # losses agree after training
    lj = mj.call("loss", {"x": x, "y": y})
    li = mi.call("loss", {"x": x, "y": y})
    np.testing.assert_allclose(lj, li, rtol=1e-9)


def test_cnn_training_is_scatter_free():
    """Every kernel of the CNN training program must lower without
    scatter-adds: convs and their gradients hit the conv matcher, dense hits
    einsum, pooling gradients hit direct/grouped writes."""
    from exprgrad_tpu.models import fashion_mnist_cnn

    model = compile(fashion_mnist_cnn(), backend="jax", seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 28, 28)).astype(np.float32)
    y = one_hot(rng.integers(0, 10, 16), 10)
    model.epoch += 1
    model.apply("fit", {"x": x, "y": y})
    stats = model.lowering_stats("fit")
    assert stats, stats
    assert "general-scatter" not in stats, stats
    assert stats.get("conv", 0) >= 5, stats
