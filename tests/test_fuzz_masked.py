"""Differential fuzz for the masked ragged-tile + iterator-mask Pallas
paths (backend/pallasgen.py).

Random map/reduce kernels over NON-tile-aligned extents with random
(often non-dividing) tile schedules, expressions mixing reads with loop
iterator comparisons (select masks — the triangular/banded family), run
``schedule_mode="force"`` against the numpy interpreter oracle.  This
guards the padding/identity-masking/slicing machinery the same way
test_fuzz_windowed guards the strided/grouped read plans.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters, maximum, select

# ragged on purpose: nothing here is a multiple of the 8/128 Mosaic tile
SIZE_CHOICES = ([13, 30, 48], [10, 24, 36], [100, 128, 200])


def _build(rng):
    sizes = [int(rng.choice(c)) for c in SIZE_CHOICES]
    i0, i1, i2 = iters("i0", "i1", "i2")
    its = (i0, i1, i2)
    inputs = {"base": tuple(sizes)}
    exprs = [input("base")[i0, i1, i2]]

    # extra reads covering random axis subsets (always including the
    # lane axis keeps Mosaic layouts simple)
    for r in range(int(rng.integers(0, 2))):
        axes = sorted({2} | {a for a in (0, 1) if rng.random() < 0.5})
        name = f"t{r}"
        inputs[name] = tuple(sizes[a] for a in axes)
        exprs.append(input(name)[tuple(its[a] for a in axes)])

    expr = exprs[0]
    for other in exprs[1:]:
        op = rng.choice(["add", "mul", "max"])
        if op == "add":
            expr = expr + other
        elif op == "mul":
            expr = expr * other
        else:
            expr = maximum(expr, other)

    # iterator masks: banded/triangular selects on random axis pairs
    n_masks = int(rng.integers(0, 3))
    for _ in range(n_masks):
        a, b = rng.choice(3, size=2, replace=False)
        kind = rng.choice(["le", "lt", "band"])
        if kind == "le":
            cond = its[a] <= its[b]
        elif kind == "lt":
            cond = its[a] < its[b]
        else:
            width = int(rng.integers(2, 12))
            cond = its[a] < its[b] + width
        expr = select(cond, expr, 0.0)
    if rng.random() < 0.3:
        expr = exp(expr * 0.05)

    out = Fun("out")
    keep = sorted({2} | {a for a in (0, 1) if rng.random() < 0.6})
    idx = tuple(its[a] for a in keep)
    use_max = rng.random() < 0.25 and n_masks == 0  # -inf vs 0.0 base
    if use_max:
        out.maximize[idx] = expr
    else:
        out[idx] = expr

    # ragged tiles: mostly non-dividing, sometimes misaligned on purpose
    tiles = {}
    for a in keep:
        if rng.random() < 0.7:
            tiles[f"i{a}"] = int(rng.choice([7, 8, 16, 48, 100]))
    red = [a for a in (0, 1, 2) if a not in keep]
    if red and rng.random() < 0.5:
        tiles[f"i{red[0]}"] = int(rng.choice([8, 16]))
    if tiles:
        out.schedule(tile=tiles)
    else:
        out.schedule(parallel=[f"i{keep[0]}"])
    return out.target("out"), inputs


_PALLAS_HITS = []


@pytest.mark.parametrize("seed", range(30))
def test_masked_fuzz_force_matches_oracle(seed):
    rng = np.random.default_rng(7000 + seed)
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


def test_masked_fuzz_exercised_pallas():
    """The sweep must actually hit the masked Pallas route a healthy
    fraction of the time."""
    if len(_PALLAS_HITS) < 30:
        pytest.skip(
            "coverage meter needs the full 30-seed sweep in this process "
            f"(saw {len(_PALLAS_HITS)})"
        )
    assert sum(1 for h in _PALLAS_HITS if h) >= len(_PALLAS_HITS) * 0.5, (
        f"pallas-mapreduce hit in only {sum(1 for h in _PALLAS_HITS if h)}"
        f"/{len(_PALLAS_HITS)} cases"
    )
