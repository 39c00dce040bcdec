"""Differential fuzz for the computed-index (pure-iterator) gather and
scatter family (backend/pallasgen.py).

Random map/reduce kernels whose reads (and sometimes writes) index a
tensor at a non-affine pure-iterator expression — ``(a*i + b*j) % V``,
``(i * j) % V``, ``(i*i + c) % V``, ``(i // k) % V`` — run under
``schedule_mode="force"`` against the numpy interpreter oracle.  These
lower through either the one-hot MXU gather (rest == [lane] class) or
the layout-safe compare-reduce gather; both must agree with the oracle
exactly, fall back loudly when unsupported, and survive AOT Mosaic
lowering (every 3rd seed).
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, exp, input, iters


def _index_expr(rng, its, sizes, V):
    """A random pure-iterator index expression, always reduced mod V so
    it stays in range for a size-V tensor dim."""
    a, b = rng.choice(len(its), size=2, replace=False)
    form = rng.integers(0, 4)
    ia, ib = its[int(a)], its[int(b)]
    if form == 0:
        e = ia * ib
    elif form == 1:
        k1, k2 = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        e = ia * k1 + ib * k2
    elif form == 2:
        e = ia * ia + int(rng.integers(0, 7))
    else:
        e = ia // int(rng.integers(2, 5)) + ib
    return e % V


def _build(rng):
    sizes = [int(rng.integers(4, 20)), int(rng.integers(4, 20)),
             int(rng.choice([32, 64, 128]))]
    i0, i1, i2 = iters("i0", "i1", "i2")
    its = (i0, i1, i2)
    V = int(rng.integers(5, 60))

    inputs = {"base": tuple(sizes)}
    expr = input("base")[i0, i1, i2]

    # 1-2 computed-index reads: bare gathered vector, or gathered dim +
    # a trailing plain iterator dim (the one-hot rest==[lane] class when
    # that iterator is the innermost loop)
    for r in range(int(rng.integers(1, 3))):
        name = f"g{r}"
        gidx = _index_expr(rng, its, sizes, V)
        roll = rng.random()
        if roll < 0.3:
            trail = int(rng.choice([0, 1, 2]))
            inputs[name] = (V, sizes[trail])
            read = input(name)[gidx, its[trail]]
        elif roll < 0.5:
            # TWO computed dims in one read: they fold into one flat
            # gather index over the flattened subspace
            V2 = int(rng.integers(4, 20))
            gidx2 = _index_expr(rng, its, sizes, V2)
            inputs[name] = (V, V2)
            read = input(name)[gidx, gidx2]
        else:
            inputs[name] = (V,)
            read = input(name)[gidx]
        expr = expr + read if rng.random() < 0.5 else expr * read
    if rng.random() < 0.3:
        expr = exp(expr * 0.05)

    out = Fun("out")
    scatter = rng.random() < 0.35
    if scatter:
        # computed write index: out[(expr) % Vout, keep...] += value;
        # a third of the scatters accumulate max/min instead of add
        # (the compare-reduce combine with the matching +-inf identity)
        acc_roll = rng.random()
        dst = (out.maximize if acc_roll < 1 / 6
               else out.minimize if acc_roll < 1 / 3 else out)
        Vout = int(rng.integers(5, 40))
        widx = _index_expr(rng, its, sizes, Vout)
        roll = rng.random()
        if roll < 0.3:
            dst[widx, i2] = expr
            shape = [Vout, sizes[2]]
        elif roll < 0.5:
            # TWO computed write dims (flat-folded scatter)
            Vout2 = int(rng.integers(4, 16))
            widx2 = _index_expr(rng, its, sizes, Vout2)
            dst[widx, widx2] = expr
            shape = [Vout, Vout2]
        elif roll < 0.7:
            # plain out axis that is NOT the lane axis (cmpred class)
            dst[widx, i0] = expr
            shape = [Vout, sizes[0]]
        else:
            dst[widx] = expr
            shape = [Vout]
        out.with_shape(shape)
    else:
        keep = sorted({2} | {a for a in (0, 1) if rng.random() < 0.6})
        idx = tuple(its[a] for a in keep)
        out[idx] = expr
        out.with_shape([sizes[a] for a in keep])

    tiles = {}
    for a in range(3):
        if rng.random() < 0.5:
            tiles[f"i{a}"] = int(rng.choice([4, 8, 16, 64]))
    if tiles:
        out.schedule(tile=tiles)
    else:
        out.schedule(parallel=["i0"])
    return out.target("out"), inputs


_PALLAS_HITS = []


@pytest.mark.parametrize("seed", range(25))
def test_cmpred_fuzz_force_matches_oracle(seed):
    rng = np.random.default_rng(41000 + seed)
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


def test_cmpred_fuzz_exercised_pallas():
    if len(_PALLAS_HITS) < 25:
        pytest.skip(
            "coverage meter needs the full sweep in this process "
            f"(saw {len(_PALLAS_HITS)})"
        )
    hits = sum(1 for h in _PALLAS_HITS if h)
    assert hits >= len(_PALLAS_HITS) * 0.6, (
        f"pallas-mapreduce hit in only {hits}/{len(_PALLAS_HITS)} cases"
    )
