"""Dataset IO round-trips (IDX, PPM, CSV) + DOT export."""

import dataclasses

import numpy as np
import pytest

from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.io import load_idx, load_ppm, save_idx, save_ppm
from exprgrad_tpu.io.csvfmt import csv_column, iter_csv, load_csv_columns


def test_idx_roundtrip(tmp_path):
    for dtype in (np.uint8, np.int32, np.float32, np.float64):
        arr = (np.arange(24).reshape(2, 3, 4) % 7).astype(dtype)
        path = str(tmp_path / f"t_{np.dtype(dtype).name}.idx")
        save_idx(arr, path)
        out = load_idx(path)
        assert out.dtype == arr.dtype
        np.testing.assert_array_equal(out, arr)


def test_idx_gzip(tmp_path):
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    path = str(tmp_path / "t.idx.gz")
    save_idx(arr, path)
    np.testing.assert_array_equal(load_idx(path), arr)


def test_idx_invalid(tmp_path):
    path = tmp_path / "bad.idx"
    path.write_bytes(b"nope")
    with pytest.raises(ModelRuntimeError):
        load_idx(str(path))


def test_ppm_roundtrip(tmp_path):
    rgb = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    path = str(tmp_path / "img.ppm")
    save_ppm(rgb, path)
    np.testing.assert_array_equal(load_ppm(path), rgb)

    gray = (np.arange(6) * 40).astype(np.uint8).reshape(2, 3)
    path = str(tmp_path / "img.pgm")
    save_ppm(gray, path)
    np.testing.assert_array_equal(load_ppm(path), gray)


def test_ppm_ascii(tmp_path):
    path = tmp_path / "img.ppm"
    path.write_text("P2\n# comment\n3 2\n255\n0 50 100\n150 200 250\n")
    out = load_ppm(str(path))
    np.testing.assert_array_equal(out, [[0, 50, 100], [150, 200, 250]])


def test_csv_typed_rows(tmp_path):
    path = tmp_path / "data.csv"
    path.write_text("Name,Age,alive\nada,36,true\ngrace,85,false\n")

    @dataclasses.dataclass
    class Person:
        alive: bool
        name: str = csv_column("Name", default="")
        age: float = csv_column("Age", default=0.0)

    rows = list(iter_csv(str(path), Person))
    assert rows == [
        Person(alive=True, name="ada", age=36.0),
        Person(alive=False, name="grace", age=85.0),
    ]


def test_csv_columns(tmp_path):
    path = tmp_path / "data.csv"
    path.write_text("a,b\n1,2.5\n3,4.5\n")
    cols = load_csv_columns(str(path), {"a": int, "b": float})
    assert cols == {"a": [1, 3], "b": [2.5, 4.5]}


def test_dot_graph():
    from exprgrad_tpu import compile
    from exprgrad_tpu.graphics import to_dot_graph
    from exprgrad_tpu.models import xor_mlp

    model = compile(xor_mlp(), backend="interp")
    dot = to_dot_graph(model.program, "train")
    assert dot.startswith('digraph "train"')
    assert "parallelogram" in dot  # params are drawn
    assert "->" in dot


def test_json_tensor_roundtrip(tmp_path):
    from exprgrad_tpu.io.jsonformat import load_json, save_json

    value = {
        "name": "ckpt",
        "weights": np.arange(6, dtype=np.float32).reshape(2, 3),
        "count": np.int64(7),
    }
    path = str(tmp_path / "v.json")
    save_json(value, path)
    out = load_json(path)
    assert out["name"] == "ckpt"
    assert out["count"] == 7
    np.testing.assert_array_equal(out["weights"], value["weights"])
    assert out["weights"].dtype == np.float32


def test_canvas_svg(tmp_path):
    from exprgrad_tpu.graphics import Canvas, GridLayout

    c = Canvas(100, 80, background="white")
    c.line(0, 0, 100, 80)
    c.rect(10, 10, 30, 20, fill="#eee")
    c.circle(50, 40, 5)
    c.text(5, 70, "hello")
    c.plot([1.0, 3.0, 2.0, 5.0], label="loss")
    svg = c.to_svg()
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    for tag in ("<line", "<rect", "<circle", "<text", "<polyline"):
        assert tag in svg
    path = tmp_path / "fig.svg"
    c.save(str(path))
    assert path.read_text() == svg

    grid = GridLayout(columns=2, cell_width=50, cell_height=40)
    for _ in range(3):
        cell = grid.add()
        cell.circle(25, 20, 10)
    combined = grid.render()
    assert combined.to_svg().count("<circle") == 3

    img = Canvas(60, 60)
    img.image(0, 0, 60, 60, np.arange(64, dtype=np.uint8).reshape(8, 8))
    assert "data:image/x-portable-pixmap" in img.to_svg()


def test_export_import_params_npz(tmp_path):
    """Interop: params/caches round-trip through a standard .npz that
    plain numpy can read without the framework."""
    import numpy as np

    from exprgrad_tpu import Tensor, compile, make_opt
    from exprgrad_tpu.io import export_params_npz, import_params_npz
    from exprgrad_tpu.layers import adam
    from exprgrad_tpu.models import xor_mlp
    from exprgrad_tpu.errors import ModelRuntimeError
    import pytest

    model = compile(xor_mlp(opt=make_opt(adam)), backend="jax", seed=0)
    x = Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1])
    y = Tensor.new([4, 1], [0.0, 1, 1, 0])
    for _ in range(3):
        model.epoch += 1
        model.apply("train", {"x": x, "y": y})
    ref = np.asarray(model.call("predict", {"x": x}))

    p = str(tmp_path / "params.npz")
    export_params_npz(model, p)
    with np.load(p) as data:  # plain numpy reads it
        assert len(data.files) == len(model.params) + len(model.caches)
        assert any(k.startswith("cache:adam.m#") for k in data.files)

    fresh = compile(xor_mlp(opt=make_opt(adam)), backend="jax", seed=99)
    assert not np.allclose(
        np.asarray(fresh.call("predict", {"x": x})), ref)
    import_params_npz(fresh, p)
    np.testing.assert_allclose(
        np.asarray(fresh.call("predict", {"x": x})), ref, rtol=1e-6)

    from exprgrad_tpu import input as eg_input
    from exprgrad_tpu.layers import dense, leaky_relu, mse, sigmoid
    net5 = (eg_input("x").pipe(dense, 2, 5).pipe(leaky_relu)
            .pipe(dense, 5, 1).pipe(sigmoid).target("predict")
            .pipe(mse, eg_input("y")).target("loss")
            .backprop(make_opt(adam)).target("train"))
    other = compile(net5, backend="jax")
    with pytest.raises(ModelRuntimeError, match="shape|matching"):
        import_params_npz(other, p)
