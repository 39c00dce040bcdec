"""Differential fuzz for the round-4 emitter generality widenings
(backend/pallasgen.py): permuted (transposed) reads, permuted write
dims, and dynamic (iterator-dependent) loop bounds.

Random map/reduce kernels whose reads visit the loop axes in random
order, whose write dims are randomly permuted, and whose innermost
reduction axis may carry a triangular ``irange(0, other + c)`` bound,
run under ``schedule_mode="force"`` against the numpy interpreter
oracle.  Unsupported combinations must *fall back* (never silently
mis-lower), so every seed asserts numbers regardless of the route
taken, and a coverage meter keeps the sweep honest about actually
hitting the Pallas path.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, irange, iters, maximum

SIZE_CHOICES = ([13, 30, 48], [10, 24, 36], [100, 128, 200])


def _build(rng):
    sizes = [int(rng.choice(c)) for c in SIZE_CHOICES]

    # maybe make axis 1 dynamic: i1 in [0, i0 + c) — the hull is
    # sizes[0] - 1 + c, which becomes axis 1's extent so reads stay in
    # range (the triangular family)
    dynamic = rng.random() < 0.4
    i0 = iters("i0")
    if dynamic:
        c = int(rng.integers(1, 8))
        sizes[1] = sizes[0] - 1 + c
        i1 = irange("i1", 0, i0 + c)
    else:
        i1 = iters("i1")
    i2 = iters("i2")
    its = (i0, i1, i2)

    inputs = {"base": tuple(sizes)}
    exprs = [input("base")[i0, i1, i2]]

    # extra reads over random axis subsets in RANDOM dim order
    for r in range(int(rng.integers(1, 3))):
        axes = sorted({2} | {a for a in (0, 1) if rng.random() < 0.5})
        order = list(rng.permutation(len(axes)))
        perm_axes = [axes[i] for i in order]
        name = f"t{r}"
        inputs[name] = tuple(sizes[a] for a in perm_axes)
        exprs.append(input(name)[tuple(its[a] for a in perm_axes)])

    expr = exprs[0]
    for other in exprs[1:]:
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
    # write covers the non-dynamic axes (dynamic axis always reduces);
    # write dims in random order
    keep = sorted({2} | {0 for _ in (0,) if rng.random() < 0.7})
    if not dynamic and rng.random() < 0.5:
        keep = sorted(set(keep) | {1})
    order = list(rng.permutation(len(keep)))
    idx = tuple(its[keep[i]] for i in order)
    use_max = rng.random() < 0.2
    if use_max:
        out.maximize[idx] = expr
    else:
        out[idx] = expr

    tiles = {}
    for a in keep:
        if rng.random() < 0.6:
            tiles[f"i{a}"] = int(rng.choice([8, 16, 48, 100]))
    if tiles:
        out.schedule(tile=tiles)
    else:
        out.schedule(parallel=[f"i{keep[0]}"])
    return out.target("out"), inputs


_PALLAS_HITS = []


@pytest.mark.parametrize("seed", range(25))
def test_general_fuzz_force_matches_oracle(seed):
    rng = np.random.default_rng(9100 + seed)
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
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    stats = next(iter(mj._executors.values())).stats
    _PALLAS_HITS.append(stats.get("pallas-mapreduce", 0))
    if seed % 3 == 0:  # every 3rd seed: AOT Mosaic verification (TPU)
        from aot_util import lower_tpu

        lower_tpu(graph, "out", inputs)


def test_general_fuzz_exercised_pallas():
    if len(_PALLAS_HITS) < 25:
        pytest.skip(
            "coverage meter needs the full sweep in this process "
            f"(saw {len(_PALLAS_HITS)})"
        )
    hits = sum(1 for h in _PALLAS_HITS if h)
    assert hits >= len(_PALLAS_HITS) * 0.5, (
        f"pallas-mapreduce hit in only {hits}/{len(_PALLAS_HITS)} cases"
    )
