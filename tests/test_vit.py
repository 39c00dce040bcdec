"""Vision-Transformer model tests: the attention vision family."""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import tiny_vit
from exprgrad_tpu.models.vit import patchify

IMAGE, PATCH, CLASSES, BATCH = 12, 4, 4, 32
GRID = IMAGE // PATCH


def _task(rng, n=BATCH):
    """Class = which of the first CLASSES patches is brightest."""
    x = rng.normal(size=(n, IMAGE, IMAGE)).astype(np.float32)
    boost = rng.integers(0, CLASSES, n)
    for i, c in enumerate(boost):
        r, col = (c // GRID) * PATCH, (c % GRID) * PATCH
        x[i, r:r + PATCH, col:col + PATCH] += 2.0
    return x, one_hot(boost, CLASSES)


def test_patchify_matches_numpy():
    from exprgrad_tpu import input

    model = compile(
        patchify(input("x"), IMAGE, PATCH).target("patches"),
        backend="jax", seed=0,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, IMAGE, IMAGE)).astype(np.float32)
    got = np.asarray(model.call("patches", {"x": x}))
    want = (
        x.reshape(3, GRID, PATCH, GRID, PATCH)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, GRID * GRID, PATCH * PATCH)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_vit_shapes_and_probabilities():
    model = compile(tiny_vit(), backend="jax", seed=0)
    rng = np.random.default_rng(0)
    x, _ = _task(rng)
    probs = model.call("predict", {"x": x})
    assert probs.shape == (BATCH, CLASSES)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_vit_learns():
    model = compile(tiny_vit(eta=0.01), backend="jax", seed=1)
    rng = np.random.default_rng(1)
    x, labels = _task(rng)
    first = float(model.call("loss", {"x": x, "labels": labels})[0])
    for _ in range(100):
        model.epoch += 1
        model.apply("train", {"x": x, "labels": labels})
    last = float(model.call("loss", {"x": x, "labels": labels})[0])
    assert last < first * 0.3, (first, last)
    acc = (
        model.call("predict", {"x": x}).argmax(-1) == labels.argmax(-1)
    ).mean()
    assert acc > 0.9, acc


def test_vit_matches_oracle():
    mj = compile(tiny_vit(blocks=1), dtype="float64", backend="jax", seed=2)
    mi = compile(tiny_vit(blocks=1), dtype="float64", backend="interp",
                 seed=2)
    mi.params = {k: np.asarray(v) for k, v in mj.params.items()}
    mi.caches = {k: np.asarray(v) for k, v in mj.caches.items()}
    rng = np.random.default_rng(2)
    x, _ = _task(rng, n=4)
    a = mj.call("predict", {"x": x.astype(np.float64)})
    b = mi.call("predict", {"x": x.astype(np.float64)})
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_vit_lowering_is_mxu_friendly():
    """Every projection must hit the einsum (MXU) path; the attention core
    goes through the fused extern; patchify must not scatter."""
    model = compile(tiny_vit(), backend="jax", seed=3)
    rng = np.random.default_rng(3)
    x, labels = _task(rng)
    model.apply("train", {"x": x, "labels": labels})
    stats = model.lowering_stats("train")
    assert stats.get("einsum", 0) >= 20
    assert stats.get("extern:attention", 0) == 4  # q,k,v,o per block x 2
    assert stats.get("general-scatter") is None


def test_vit_trains_on_mesh():
    """The ViT train step runs under the dp x tp sharded executor: the
    patchify gather, position-table accumulation, and non-causal
    attention extern all partition; params match the solo step."""
    from exprgrad_tpu.parallel import ShardedExecutor, make_mesh

    rng = np.random.default_rng(4)
    x, labels = _task(rng, n=16)
    shapes = {"x": [16, IMAGE, IMAGE], "labels": [16, CLASSES]}

    solo = compile(tiny_vit(blocks=1), backend="jax", seed=6)
    solo.epoch = 1
    solo.apply("train", {"x": x, "labels": labels})

    mesh_model = compile(tiny_vit(blocks=1), backend="jax", seed=6)
    ex = ShardedExecutor(
        mesh_model, "train", shapes, make_mesh(8, model=2),
        batch_inputs=["x", "labels"],
    )
    ex.run({"x": x, "labels": labels}, epoch=1, seed=0)

    for tid in solo.params:
        np.testing.assert_allclose(
            np.asarray(solo.params[tid]), np.asarray(mesh_model.params[tid]),
            rtol=2e-5, atol=1e-7,
        )
