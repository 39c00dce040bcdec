"""Differential fuzz for row-chain fusion (PallasRowChain).

Random 2-4-kernel map/reduce chains — reduce heads (add or max),
row-indexed intermediate reads, a final elementwise or reducing member,
random row tiles (often ragged), sometimes an extra outside consumer
(forcing an escaping intermediate output) — run under
``schedule_mode="force"`` against the numpy interpreter oracle.  The
planner may fuse or decline per seed; numbers must match either way,
and a coverage meter keeps the sweep honest about actually fusing.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters, maximum, sq, sqrt

ROWS = [48, 100, 128]
COLS = [128, 200, 256]


def _build(rng):
    r = int(rng.choice(ROWS))
    c = int(rng.choice(COLS))
    inp = input("inp")
    tile = int(rng.choice([16, 32, 48]))

    funs = []
    # head: a row reduction of the input
    y, x = iters("y", "x")
    head = Fun("k0")
    use_max = rng.random() < 0.4
    if use_max:
        head.maximize[y] = inp[y, x]
    else:
        head[y] = exp(inp[y, x] * 0.1)
    head.schedule(tile={"y": tile})
    funs.append(head)

    # middle members: reductions mixing the input with prior row values
    n_mid = int(rng.integers(0, 2))
    for i in range(n_mid):
        y, x = iters("y", "x")
        m = Fun(f"k{i + 1}")
        prev = funs[-1]
        kind = rng.choice(["exp", "sq", "mix"])
        if kind == "exp":
            m[y] = exp((inp[y, x] - prev[y]) * 0.1)
        elif kind == "sq":
            m[y] = sq(inp[y, x] * 0.05) + prev[y] * 0.01
        else:
            m[y] = maximum(inp[y, x] * 0.1, prev[y] * 0.05)
        m.schedule(tile={"y": tile})
        funs.append(m)

    # final member: elementwise over rows+cols or another row reduce
    y, x = iters("y", "x")
    out = Fun("out")
    prev = funs[-1]
    first = funs[0]
    if rng.random() < 0.7:
        out[y, x] = (inp[y, x] - first[y] * 0.5) / sqrt(
            prev[y] * prev[y] + 1.0
        )
    else:
        out[y] = (inp[y, x] - first[y] * 0.01) * 0.1 + prev[y]
    out.schedule(tile={"y": tile})
    funs.append(out)

    graphs = [out.target("out")]
    # outside consumer of a random intermediate -> escaping output
    if rng.random() < 0.4 and len(funs) > 1:
        victim = funs[int(rng.integers(0, len(funs) - 1))]
        z = iters("z")
        esc = Fun("esc")
        esc[z] = victim[z] * 3.0
        graphs.append(esc.target("esc"))
    return graphs, (r, c)


_FUSED = []


@pytest.mark.parametrize("seed", range(25))
def test_rowchain_fuzz_matches_oracle(seed):
    rng = np.random.default_rng(8200 + seed)
    graphs, shape = _build(rng)
    v = (rng.normal(size=shape) * 2).astype(np.float32)
    mj = compile(graphs, backend="jax", schedule_mode="force")
    mi = compile(graphs, backend="interp")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = np.asarray(mj.call("out", {"inp": v}))
    want = np.asarray(mi.call("out", {"inp": v}))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    if len(graphs) > 1:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ge = np.asarray(mj.call("esc", {"inp": v}))
        we = np.asarray(mi.call("esc", {"inp": v}))
        np.testing.assert_allclose(ge, we, rtol=3e-4, atol=3e-4)
    stats = next(iter(mj._executors.values())).stats
    _FUSED.append(stats.get("pallas-rowchain", 0))
    if seed % 3 == 0:  # every 3rd seed: AOT Mosaic verification (TPU)
        from aot_util import lower_tpu

        lower_tpu(graphs, "out", {"inp": shape})


def test_rowchain_fuzz_exercised_fusion():
    if len(_FUSED) < 25:
        pytest.skip(
            f"coverage meter needs the full sweep (saw {len(_FUSED)})"
        )
    hits = sum(1 for h in _FUSED if h)
    assert hits >= len(_FUSED) * 0.5, f"fused in only {hits}/{len(_FUSED)}"
