"""Differential fuzz for the windowed/strided Pallas read family.

Random map/reduce kernels mixing pure-iterator, affine (s*i + c), and
grouped (i // k) reads, run with ``schedule_mode="force"`` (Pallas
emitter active where legal) against the numpy interpreter oracle — the
same guard the epilogue-fusion fuzz provides for the matmul family.
A base read covers every axis purely so loop bounds and shapes always
infer; the transformed reads stress the band-block + in-kernel
slice/repeat machinery (backend/pallasgen.py PallasMapReduce).
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters, maximum

SIZES = (16, 16, 128)  # i2 is the lane axis (pure reads only there)


def _build(rng):
    i0, i1, i2 = iters("i0", "i1", "i2")
    its = (i0, i1, i2)
    inputs = {"base": SIZES}
    reads = [input("base")[i0, i1, i2]]

    n_extra = int(rng.integers(1, 3))
    for r in range(n_extra):
        # per-axis plan; strided axes read EVERY phase (like pooling) so
        # the tensor size s*L is consistent with the exact shape
        # equations AND the Pallas matcher's D == s*L rule — a lone
        # phase c < s-1 over a s*L tensor is unsolvable once another
        # read pins the loop bound
        plans = []
        shape = []
        for a in range(3):
            kind = "iter" if a == 2 else rng.choice(
                ["iter", "iter", "stride2", "stride3", "div2", "div4",
                 "shift1", "shift3"]
            )
            L = SIZES[a]
            if kind == "iter":
                plans.append(("iter", 1))
                shape.append(L)
            elif kind == "shift1":
                plans.append(("shift", 1))
                shape.append(L + 1)
            elif kind == "shift3":
                plans.append(("shift", 3))
                shape.append(L + 3)
            elif kind == "stride2":
                plans.append(("stride", 2))
                shape.append(2 * L)
            elif kind == "stride3":
                plans.append(("stride", 3))
                shape.append(3 * L)
            elif kind == "div2":
                plans.append(("div", 2))
                shape.append(L // 2)
            else:
                plans.append(("div", 4))
                shape.append(L // 4)
        name = f"t{r}"
        inputs[name] = tuple(shape)
        t = input(name)

        def dims_for(phases):
            dims = []
            for a, (kind, p) in enumerate(plans):
                if kind == "iter":
                    dims.append(its[a])
                elif kind == "shift":
                    dims.append(its[a] + p)
                elif kind == "stride":
                    dims.append(its[a] * p + phases[a])
                else:
                    dims.append(its[a] // p)
            return tuple(dims)

        stride_axes = [a for a, (kind, _) in enumerate(plans)
                       if kind == "stride"]
        # enumerate every phase combination across strided axes (the
        # pooling pattern); combine phases with max or add
        combos = [[0] * 3]
        for a in stride_axes:
            combos = [c[:a] + [ph] + c[a + 1:]
                      for c in combos for ph in range(plans[a][1])]
        phase_reads = [t[dims_for(c)] for c in combos]
        val = phase_reads[0]
        comb = rng.choice(["max", "add"])
        for pr in phase_reads[1:]:
            val = maximum(val, pr) if comb == "max" else val + pr
        reads.append(val)

    expr = reads[0]
    for other in reads[1:]:
        op = rng.choice(["add", "mul", "max"])
        if op == "add":
            expr = expr + other
        elif op == "mul":
            expr = expr * other
        else:
            expr = maximum(expr, other)
    if rng.random() < 0.3:
        expr = exp(expr * 0.05)

    out = Fun("out")
    keep = [2] + [a for a in (0, 1) if rng.random() < 0.6]
    keep = sorted(keep)
    idx = tuple(its[a] for a in keep)
    use_max = rng.random() < 0.25
    if use_max:
        out.maximize[idx] = expr
    else:
        out[idx] = expr

    tiles = {}
    for a in keep:
        if a != 2 and rng.random() < 0.6:
            tiles[f"i{a}"] = int(rng.choice([8, 16]))
    red = [a for a in (0, 1) if a not in keep]
    if red and rng.random() < 0.4 and not use_max:
        tiles[f"i{red[0]}"] = 8
    if tiles:
        out.schedule(tile=tiles)
    else:
        out.schedule(parallel=[f"i{keep[0]}"])
    return out.target("out"), inputs


_PALLAS_HITS = []


@pytest.mark.parametrize("seed", range(40))
def test_windowed_fuzz_force_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    graph, inputs = _build(rng)
    args = {
        name: (rng.normal(size=shape) * 0.5).astype(np.float32)
        for name, shape in inputs.items()
    }
    mj = compile(graph, backend="jax", schedule_mode="force")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = np.asarray(mj.call("out", args))
    want = np.asarray(
        compile(graph, backend="interp").call("out", args)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    stats = next(iter(mj._executors.values())).stats
    _PALLAS_HITS.append(stats.get("pallas-mapreduce", 0))
    if seed % 3 == 0:  # every 3rd seed: AOT Mosaic verification (TPU)
        from aot_util import lower_tpu

        lower_tpu(graph, "out", inputs)


def test_windowed_fuzz_exercised_pallas():
    """The sweep must actually hit the Pallas route a healthy fraction of
    the time — otherwise the fuzz is only testing XLA fallbacks."""
    if len(_PALLAS_HITS) < 40:
        pytest.skip(
            "coverage meter needs the full 40-seed sweep in this process "
            f"(saw {len(_PALLAS_HITS)})"
        )
    assert sum(1 for h in _PALLAS_HITS if h) >= len(_PALLAS_HITS) * 0.5, (
        f"pallas-mapreduce hit in only {sum(1 for h in _PALLAS_HITS if h)}"
        f"/{len(_PALLAS_HITS)} cases"
    )


@pytest.mark.parametrize("seed", range(10))
def test_windowed_gradient_fuzz(seed):
    """Training-step parity: a pooling/upsampling program with scheduled
    kernels derives gradients (scatter-free i//k and strided writes) that
    match the interp oracle step for step."""
    from exprgrad_tpu import to_scalar
    from exprgrad_tpu.fun import input as eg_input, make_opt, param
    from exprgrad_tpu.layers import adam

    rng = np.random.default_rng(3000 + seed)
    i0, i1, i2 = iters("i0", "i1", "i2")
    x = eg_input("x")
    w = param([SIZES[2]], init_range=(-0.3, 0.3), name="w")
    mode = rng.choice(["pool", "up"])
    h = Fun("h")
    if mode == "pool":
        # strided 2x reduction on i0 (both phases)
        h[i0, i1, i2] = (
            x[i0 * 2, i1, i2] + x[i0 * 2 + 1, i1, i2]
        ) * w[i2]
        in_shape = (2 * SIZES[0], SIZES[1], SIZES[2])
    else:
        h[i0, i1, i2] = x[i0 // 2, i1, i2] * w[i2]
        h.with_shape([x.shape[0] * 2, x.shape[1], x.shape[2]])
        in_shape = (SIZES[0] // 2, SIZES[1], SIZES[2])
    if rng.random() < 0.7:
        h.schedule(tile={"i0": 8})
    t = eg_input("t")
    j = iters("j")
    loss = Fun("loss")
    loss[0] = (h.raw[j] - t.raw[j]) ** 2 / to_scalar(
        SIZES[0] * SIZES[1] * SIZES[2]
    )
    graph = (
        loss.target("loss")
        .backwards()
        .optimize(make_opt(adam, eta=0.05))
        .target("train")
    )
    out_shape = (
        (SIZES[0], SIZES[1], SIZES[2]) if mode == "pool"
        else (SIZES[0], SIZES[1], SIZES[2])
    )
    args = {
        "x": rng.normal(size=in_shape).astype(np.float32),
        "t": rng.normal(size=out_shape).astype(np.float32),
    }
    mj = compile(graph, backend="jax", seed=seed,
                 schedule_mode="force")
    mi = compile(graph, backend="interp", seed=seed)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(2):
            mj.epoch += 1
            mi.epoch += 1
            mj.apply("train", args)
            mi.apply("train", args)
    for tid in mj.params:
        np.testing.assert_allclose(
            np.asarray(mj.params[tid]), np.asarray(mi.params[tid]),
            atol=1e-5,
        )
