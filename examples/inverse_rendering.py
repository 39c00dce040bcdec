"""Inverse rendering: recover sphere colors from a target image by
differentiating through a DSL raytracer (reference examples/inverse_rendering)."""

import numpy as np

from exprgrad_tpu import Tensor, compile, input, make_opt
from exprgrad_tpu.io import save_ppm
from exprgrad_tpu.layers import gradient_descent, mse
from exprgrad_tpu.models.render import render, two_sphere_scene

SIZE = 128

SCENE_ARGS = {
    "camera": Tensor.new([1], [1.0]),
    "background": Tensor.new([3], [0.5, 0.5, 0.5]),
    "sphere0.geom": Tensor.new([4], [0.5, 0.2, 4.0, 0.5]),
    "sphere1.geom": Tensor.new([4], [-0.6, -0.35, 3.0, 0.5]),
    "light": Tensor.new([3], [1.0, 1.0, -0.5]),
}


def save_image(image: np.ndarray, path: str) -> None:
    save_ppm((np.clip(image, 0, 1) * 255).astype(np.uint8), path)


def main() -> None:
    # render the target with known colors
    scene = two_sphere_scene(trainable_colors=False)
    target_model = compile(render(scene, SIZE, SIZE).target("render"))
    target = target_model.call(
        "render",
        {
            **SCENE_ARGS,
            "sphere0.color": Tensor.new([3], [1.0, 0.0, 0.0]),
            "sphere1.color": Tensor.new([3], [0.0, 0.0, 1.0]),
        },
    ).clip(0, 1)
    save_image(target, "target.ppm")

    # optimize unknown sphere colors to match
    scene = two_sphere_scene(trainable_colors=True)
    graph = (
        render(scene, SIZE, SIZE)
        .target("render")
        .pipe(mse, input("target"))
        .target("loss")
        .backprop(make_opt(gradient_descent, rate=0.01))
        .target("train")
    )
    model = compile(graph, seed=0)
    args = {**SCENE_ARGS, "target": target}
    for step in range(100):
        if step % 10 == 0:
            loss = model.call("loss", args)
            print(f"step {step}  loss {float(loss[0]):.6f}")
            save_image(model.call("render", args), f"train_{step:03d}.ppm")
        model.apply("train", args)
    print("learned colors:")
    for tid, value in model.params.items():
        print(" ", model.program.tensors[tid].name, np.asarray(value))


if __name__ == "__main__":
    main()
