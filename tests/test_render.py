"""Inverse-rendering test: gradients through a raytracer kernel."""

import numpy as np

from exprgrad_tpu import Tensor, compile, input, make_opt
from exprgrad_tpu.layers import gradient_descent, mse
from exprgrad_tpu.models.render import render, two_sphere_scene

SIZE = 32
SCENE_ARGS = {
    "camera": Tensor.new([1], [1.0]),
    "background": Tensor.new([3], [0.5, 0.5, 0.5]),
    "sphere0.geom": Tensor.new([4], [0.5, 0.2, 4.0, 0.5]),
    "sphere1.geom": Tensor.new([4], [-0.6, -0.35, 3.0, 0.5]),
    "light": Tensor.new([3], [1.0, 1.0, -0.5]),
}
TRUE_COLORS = {
    "sphere0.color": Tensor.new([3], [1.0, 0.0, 0.0]),
    "sphere1.color": Tensor.new([3], [0.0, 0.0, 1.0]),
}


def _render_target():
    scene = two_sphere_scene(trainable_colors=False)
    model = compile(render(scene, SIZE, SIZE).target("render"), backend="jax")
    return model.call("render", {**SCENE_ARGS, **TRUE_COLORS}).clip(0, 1)


def test_render_shapes_and_background():
    target = _render_target()
    assert target.shape == (SIZE, SIZE, 3)
    # corners are background
    np.testing.assert_allclose(target[0, 0], [0.5, 0.5, 0.5], atol=1e-6)
    # some pixels are sphere-colored (red channel dominates somewhere)
    assert (target[:, :, 0] > 0.55).any()


def test_inverse_rendering_recovers_colors():
    target = _render_target()
    scene = two_sphere_scene(trainable_colors=True)
    graph = (
        render(scene, SIZE, SIZE)
        .target("render")
        .pipe(mse, input("target"))
        .target("loss")
        .backprop(make_opt(gradient_descent, rate=0.02))
        .target("train")
    )
    model = compile(graph, backend="jax", seed=0)
    args = {**SCENE_ARGS, "target": target}
    first_loss = float(model.call("loss", args)[0])
    for _ in range(250):
        model.apply("train", args)
    last_loss = float(model.call("loss", args)[0])
    assert last_loss < first_loss * 0.05
    learned = {
        model.program.tensors[tid].name: np.asarray(v)
        for tid, v in model.params.items()
    }
    np.testing.assert_allclose(
        learned["sphere0.color"], [1, 0, 0], atol=0.2
    )
    np.testing.assert_allclose(
        learned["sphere1.color"], [0, 0, 1], atol=0.2
    )
