"""The schedule DSL surface, end to end.

The reference tunes kernels with per-target schedule blocks
(``schedule: tile(...), cache(...), parallel(...)``,
parser.nim:519-564; the tiled16 GPU matmul in
benchmarks/matmul/matmul_gpu.nim:48-66).  Here schedules are routed
hints: under ``schedule_mode="force"`` every matched kernel lowers as a
hand-tiled Pallas TPU program; the default ``"auto"`` mode only honors a
schedule when the on-chip-calibrated cost model predicts a win.

This example walks the whole surface: a tiled matmul, a ragged
(non-dividing tile) matmul on padded blocks, a softmax family with a
gridded reduction, an iterator-masked (causal) kernel, a shifted-stencil
blur, and a scalar all-reduce loss — printing which lowering path each
took.
"""

import numpy as np

try:  # fall back to CPU (interpret-mode Pallas) when no TPU is reachable
    import jax

    jax.devices()
except Exception:
    import jax

    jax.config.update("jax_platforms", "cpu")

from exprgrad_tpu import (
    Fun, compile, exp, input, irange, iters, select, sq,
)

def main() -> None:
    rng = np.random.default_rng(0)


    def show(name, model, target, args, want):
        got = np.asarray(model.call(target, args))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        print(f"{name:<28} -> {model.lowering_stats(target)}")


    # 1. Tiled matmul: tiles -> BlockSpecs, k gridded with a VMEM accumulator.
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    c = Fun("c")
    c[y, x] = a[y, it] * b[it, x]
    c.schedule(tile={"y": 128, "x": 128, "it": 128}, parallel=["y", "x"])
    av = rng.normal(size=(256, 256)).astype(np.float32)
    bv = rng.normal(size=(256, 256)).astype(np.float32)
    show("tiled matmul", compile(c.target("c"), schedule_mode="force"),
         "c", {"a": av, "b": bv}, av @ bv)

    # 2. Ragged shapes: the tile does not divide 30x70x50 — blocks pad to
    # Mosaic-aligned multiples, bounds are guarded, the output slices back.
    y, x, it = iters("y", "x", "it")
    a, b = input("a"), input("b")
    cr = Fun("cr")
    cr[y, x] = a[y, it] * b[it, x]
    cr.schedule(tile={"y": 16, "x": 16, "it": 16})
    av = rng.normal(size=(30, 50)).astype(np.float32)
    bv = rng.normal(size=(50, 70)).astype(np.float32)
    show("ragged masked matmul", compile(cr.target("cr"), schedule_mode="force"),
         "cr", {"a": av, "b": bv}, av @ bv)

    # 3. Map/reduce family: three softmax kernels, row-tiled.
    inp = input("inp")
    y, x = iters("y", "x")
    mx = Fun("mx")
    mx.maximize[y] = inp[y, x]
    mx.schedule(tile={"y": 64})
    y, x = iters("y", "x")
    sums = Fun("sums")
    sums[y] = exp(inp[y, x] - mx[y])
    sums.schedule(tile={"y": 64})
    y, x = iters("y", "x")
    sm = Fun("sm")
    sm[y, x] = exp(inp[y, x] - mx[y]) / sums[y]
    sm.schedule(tile={"y": 64})
    v = rng.normal(size=(256, 512)).astype(np.float32)
    e = np.exp(v - v.max(axis=1, keepdims=True))
    show("scheduled softmax (3 kernels -> ONE fused row-chain kernel)",
         compile(sm.target("sm"), schedule_mode="force"),
         "sm", {"inp": v}, e / e.sum(axis=1, keepdims=True))

    # 4. Iterator masks: the causal triangle as an index expression — the
    # iterators materialize as broadcasted_iota blocks inside the kernel.
    inp = input("inp")
    q, k = iters("q", "k")
    causal = Fun("causal")
    causal[q, k] = select(k <= q, inp[q, k], 0.0)
    causal.schedule(tile={"q": 64})
    v = rng.normal(size=(128, 128)).astype(np.float32)
    show("iterator-masked (causal)",
         compile(causal.target("causal"), schedule_mode="force"),
         "causal", {"inp": v},
         np.where(np.arange(128)[None, :] <= np.arange(128)[:, None], v, 0.0))

    # 5. Shifted stencil (the reference's blur family): the shifted axis
    # stays whole-in-block; the kernel takes static slices.
    img = input("img")
    y = iters("y")
    x = irange("x", 0, img.shape[1] - 2)
    blur = Fun("blur")
    blur[y, x] = (img[y, x] + img[y, x + 1] + img[y, x + 2]) * (1.0 / 3.0)
    blur.schedule(tile={"y": 32})
    v = rng.normal(size=(64, 258)).astype(np.float32)
    show("shifted-stencil blur",
         compile(blur.target("blur"), schedule_mode="force"),
         "blur", {"img": v}, (v[:, :256] + v[:, 1:257] + v[:, 2:258]) / 3)

    # 6. Scalar all-reduce: the loss family.
    a, b = input("a"), input("b")
    y, x = iters("y", "x")
    loss = Fun("loss")
    loss[0] = sq(a[y, x] - b[y, x])
    loss.schedule(tile={"y": 32})
    av = rng.normal(size=(128, 256)).astype(np.float32)
    bv = rng.normal(size=(128, 256)).astype(np.float32)
    show("scalar loss all-reduce",
         compile(loss.target("loss"), schedule_mode="force"),
         "loss", {"a": av, "b": bv}, [((av - bv) ** 2).sum()])

    # 7. Triangular (dynamic) bounds: the hull iterates, out-of-bound
    # points mask to the accumulation identity inside the kernel.
    from exprgrad_tpu import irange as _ir

    ta = input("ta")
    y = iters("y")
    x = _ir("x", 0, y + 1)
    tri = Fun("tri")
    tri[y] = ta[y, x]
    tri.schedule(tile={"y": 32})
    v = rng.normal(size=(128, 128)).astype(np.float32)
    show("triangular (dynamic-bound) row sums",
         compile(tri.target("tri"), schedule_mode="force"),
         "tri", {"ta": v}, np.tril(v).sum(axis=1))

    # 8. The stock row-family layers fuse whole: layers.rms_norm with
    # row_tile= becomes ONE Pallas kernel (input read once, ms in VMEM).
    from exprgrad_tpu.layers import rms_norm

    rn_in = input("rn")
    rn = rms_norm(rn_in, 256, row_tile=32)
    v = rng.normal(size=(64, 256)).astype(np.float32)
    m = compile(rn.target("rn_out"), schedule_mode="force")
    got = np.asarray(m.call("rn_out", {"rn": v}))
    gamma = np.asarray(m.params[next(iter(m.params))])
    want = v / np.sqrt((v**2).mean(axis=1, keepdims=True) + 1e-5) * gamma
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    stats = next(iter(m._executors.values())).stats
    assert stats.get("pallas-rowchain") == 1, stats
    print(f"fused rms_norm layer (row-chain)        -> {stats}")

    # 9. Computed indices: ANY index expression compiles into the kernel
    # (clgen parity) — data-dependent lookups, pure-iterator arithmetic,
    # diagonals, and scatter-add writes at computed positions.
    from exprgrad_tpu import to_index

    tok, table = input("tok"), input("table")
    i, d = iters("i", "d")
    emb = Fun("emb")
    emb[i, d] = table[to_index(tok[i]), d]         # data-dependent gather
    emb.with_shape([tok.shape[0], table.shape[1]])
    emb.schedule(tile={"i": 8})
    tokv = rng.integers(0, 32, 16).astype(np.float32)
    tabv = rng.normal(size=(32, 128)).astype(np.float32)
    show("embedding lookup (one-hot MXU gather)",
         compile(emb.target("emb"), schedule_mode="force"),
         "emb", {"tok": tokv, "table": tabv}, tabv[tokv.astype(int)])

    ha, hx = input("ha"), input("hx")
    y2, x2 = iters("y2", "x2")
    hashed = Fun("hashed")
    hashed[y2, x2] = hx[y2, x2] * ha[(y2 * x2) % 17]   # pure-iterator index
    hashed.with_shape([hx.shape[0], hx.shape[1]])
    hashed.schedule(tile={"y2": 8})
    hv = rng.normal(size=(16, 64)).astype(np.float32)
    av2 = rng.normal(size=(17,)).astype(np.float32)
    idx = (np.arange(16)[:, None] * np.arange(64)[None, :]) % 17
    show("hashed LUT read (compare-reduce gather)",
         compile(hashed.target("hashed"), schedule_mode="force"),
         "hashed", {"hx": hv, "ha": av2}, hv * av2[idx])

    sv = input("sv")
    si, sj = iters("si", "sj")
    hist = Fun("hist")
    hist[(si + sj) % 11] = sv[si, sj]          # computed scatter-add
    hist.with_shape([11])
    hist.schedule(tile={"si": 8})
    svv = rng.normal(size=(16, 64)).astype(np.float32)
    want = np.zeros(11, np.float32)
    np.add.at(want, (np.arange(16)[:, None] + np.arange(64)[None, :]) % 11,
              svv)
    show("banded histogram (compare-reduce scatter)",
         compile(hist.target("hist"), schedule_mode="force"),
         "hist", {"sv": svv}, want)

    print("every scheduled kernel lowered through Pallas and matched numpy")


if __name__ == "__main__":
    main()
