"""Data-dependent (computed-index) reads and writes through the
scheduled Pallas emitter — the gather/scatter family.

The reference's GPU codegen emits ANY computed index into the kernel
body (clgen.nim:249-257: `emb[toIndex(tok[i]), d]` compiles like any
other read).  The TPU rebuild keeps the gathered dim whole-resident in
every block and selects rows with a one-hot MXU contraction
(exact row selection at Precision.HIGHEST), so embedding lookups and
their scatter-add gradients lower as scheduled Pallas kernels instead of
declining to the XLA gather/scatter path.
"""

import warnings

import numpy as np
import pytest

from exprgrad_tpu import (
    Fun,
    ScheduleWarning,
    compile,
    input,
    iters,
    param,
    sq,
    to_index,
)


def _stats(model):
    ex = next(iter(model._executors.values()))
    return ex.stats


def _force(graph):
    with warnings.catch_warnings():
        warnings.simplefilter("error", ScheduleWarning)
        return compile(graph, backend="jax", schedule_mode="force")


def test_scheduled_embedding_lookup_pallas():
    """emb[to_index(tok[n, t]), d] lowers through PallasMapReduce."""
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 16, size=(4, 8)).astype(np.float32)
    emb = rng.normal(size=(16, 128)).astype(np.float32)

    def graph():
        n, t, d = iters("n", "t", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun("out")
        out[n, t, d] = table[to_index(tok[n, t]), d]
        out.with_shape([tok.shape[0], tok.shape[1], table.shape[1]])
        out.schedule(tile={"n": 2, "t": 4})
        return out.target("embed")

    mj = _force(graph())
    out = mj.call("embed", {"tokens": tokens, "emb": emb})
    np.testing.assert_allclose(out, emb[tokens.astype(int)], rtol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_scheduled_gather_matches_oracle():
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 11, size=(6,)).astype(np.float32)
    emb = rng.normal(size=(11, 96)).astype(np.float32)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun("out")
        # arithmetic around the gathered value exercises the expression
        # evaluator over the gathered block
        out[i, d] = table[to_index(tok[i]), d] * 2.0 + 1.0
        out.with_shape([tok.shape[0], table.shape[1]])
        out.schedule(tile={"i": 3})
        return out.target("g")

    mj = _force(graph())
    a = mj.call("g", {"tokens": tokens, "emb": emb})
    b = compile(graph(), backend="interp").call(
        "g", {"tokens": tokens, "emb": emb}
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1


def test_scheduled_gather_with_reduction():
    """Gather + reduction over a trailing iterator (bag-of-embeddings:
    out[n, d] = sum_t emb[tok[n, t], d])."""
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 8, size=(3, 5)).astype(np.float32)
    emb = rng.normal(size=(8, 64)).astype(np.float32)

    def graph():
        n, t, d = iters("n", "t", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun("out")
        out[n, d] = table[to_index(tok[n, t]), d]
        out.with_shape([tok.shape[0], table.shape[1]])
        out.schedule(tile={"n": 1})
        return out.target("bag")

    mj = _force(graph())
    out = mj.call("bag", {"tokens": tokens, "emb": emb})
    expected = emb[tokens.astype(int)].sum(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1


def test_scheduled_scatter_add():
    """A data-dependent write dim (demb[tok[i], d] += v[i, d] — the
    embedding-gradient shape) lowers as a scheduled Pallas scatter-add
    (transposed one-hot contraction)."""
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 6, size=(9,)).astype(np.float32)
    vals = rng.normal(size=(9, 32)).astype(np.float32)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        v = input("vals")
        out = Fun("demb")
        out[to_index(tok[i]), d] = v[i, d]
        out.with_shape([6, 32])
        out.schedule(tile={"d": 32})
        return out.target("demb")

    mj = _force(graph())
    got = mj.call("demb", {"tokens": tokens, "vals": vals})
    expected = np.zeros((6, 32), np.float32)
    for i, tk in enumerate(tokens.astype(int)):
        expected[tk] += vals[i]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_scheduled_scatter_add_2d_index():
    """Scatter over a 2-D token array (grad of the batched embedding
    lookup: demb[tok[n, t], d] += g[n, t, d])."""
    rng = np.random.default_rng(6)
    tokens = rng.integers(0, 5, size=(3, 4)).astype(np.float32)
    vals = rng.normal(size=(3, 4, 16)).astype(np.float32)

    def graph():
        n, t, d = iters("n", "t", "d")
        tok = input("tokens")
        v = input("vals")
        out = Fun("demb")
        out[to_index(tok[n, t]), d] = v[n, t, d]
        out.with_shape([5, 16])
        out.schedule(tile={"n": 1})
        return out.target("demb")

    mj = _force(graph())
    got = mj.call("demb", {"tokens": tokens, "vals": vals})
    b = compile(graph(), backend="interp").call(
        "demb", {"tokens": tokens, "vals": vals}
    )
    np.testing.assert_allclose(got, b, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_embedding_train_step_scatter_scheduled():
    """End-to-end: the autodiff-generated embedding gradient (a
    scatter-add kernel) matches the oracle when the forward lookup is
    scheduled through Pallas."""
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, 6, size=(9,)).astype(np.float32)
    emb0 = rng.normal(size=(6, 32)).astype(np.float32)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = param([6, 32], name="emb")
        out = Fun("out")
        out[i, d] = table[to_index(tok[i]), d]
        out.with_shape([tok.shape[0], 32])
        out.schedule(tile={"i": 3})
        it = iters("it")
        loss = Fun("loss")
        loss[0] = sq(out.raw[it])
        return loss.target("loss").backwards().grad(table).target("demb")

    mj = compile(graph(), backend="jax", schedule_mode="force")
    mj.params[next(iter(mj.params))] = emb0
    got = mj.call("demb", {"tokens": tokens})
    expected = np.zeros_like(emb0)
    for i, tk in enumerate(tokens.astype(int)):
        expected[tk] += 2 * emb0[tk]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_scheduled_gather_strided_lane_folds_flat():
    """A strided lane-axis dim in the same read as a gather dim: both
    dims fold into ONE flat computed index over the row-major-flattened
    subspace (emb[to_index(tok[i]), 2*d] -> flat idx = tok[i]*W + 2*d),
    gathered via compare-reduce."""
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 8, size=(4,)).astype(np.float32)
    emb = rng.normal(size=(8, 64)).astype(np.float32)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun("out")
        out[i, d] = table[to_index(tok[i]), 2 * d]
        out.with_shape([tok.shape[0], table.shape[1] // 2])
        out.schedule(tile={"i": 2})
        return out.target("g")

    mj = _force(graph())
    a = mj.call("g", {"tokens": tokens, "emb": emb})
    b = compile(graph(), backend="interp").call(
        "g", {"tokens": tokens, "emb": emb}
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        a, emb[tokens.astype(int)][:, ::2], rtol=1e-6
    )
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_multi_computed_dims_fold_flat():
    """TWO computed dims in one read (a[i + j, i - j + C] — rotated
    coordinates) fold into one flat gather index."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(12, 16)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        ain = input("a")
        out = Fun("out")
        # + 16 keeps the index nonnegative: % is Nim-style TRUNCATED
        # mod in the IR (sign of the dividend), not Python floor mod
        out[i, j] = ain[i + j, (i - j + 16) % 16]
        out.with_shape([6, 6])
        out.schedule(tile={"i": 2})
        return out.target("g")

    mj = _force(graph())
    got = mj.call("g", {"a": a})
    oracle = compile(graph(), backend="interp").call("g", {"a": a})
    ii, jj = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    want = a[ii + jj, (ii - jj + 16) % 16]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(got, oracle, rtol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_gather_interp_jax_parity_unscheduled_unchanged():
    """Without a schedule the gather family still routes through the XLA
    take path (no regression from the new classifier)."""
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 5, size=(7,)).astype(np.float32)
    emb = rng.normal(size=(5, 24)).astype(np.float32)

    def graph():
        i, d = iters("i", "d")
        tok = input("tokens")
        table = input("emb")
        out = Fun("out")
        out[i, d] = table[to_index(tok[i]), d]
        out.with_shape([tok.shape[0], table.shape[1]])
        return out.target("g")

    mj = compile(graph(), backend="jax")
    a = mj.call("g", {"tokens": tokens, "emb": emb})
    np.testing.assert_allclose(a, emb[tokens.astype(int)], rtol=1e-6)
    assert not _stats(mj).get("pallas-mapreduce")


def test_pure_iterator_computed_read():
    """Non-affine pure-iterator read index (a[(i * j) % 7]): the
    computed-index gather evaluates the index from iota blocks alone —
    no data source needed (clgen.nim:249-257 emits ANY computed index;
    here it rides the one-hot gather instead of declining)."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(6, 8)).astype(np.float32)
    a = rng.normal(size=(7,)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        xin = input("x")
        ain = input("a")
        out = Fun("out")
        out[i, j] = xin[i, j] + ain[(i * j) % 7]
        out.with_shape([xin.shape[0], xin.shape[1]])
        out.schedule(tile={"i": 2})
        return out.target("g")

    mj = _force(graph())
    got = mj.call("g", {"x": x, "a": a})
    idx = (np.arange(6)[:, None] * np.arange(8)[None, :]) % 7
    np.testing.assert_allclose(got, x + a[idx], rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_pure_iterator_quadratic_read_with_reduction():
    """Quadratic index (b[i * i]) combined with a reduced iterator: the
    gather axes and the in-block reduction coexist."""
    rng = np.random.default_rng(7)
    y = rng.normal(size=(5, 4)).astype(np.float32)
    b = rng.normal(size=(26,)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        yin = input("y")
        bin_ = input("b")
        out = Fun("out")
        out[i] = yin[i, j] * bin_[i * i]
        out.with_shape([yin.shape[0]])
        out.schedule(tile={"i": 1})
        return out.target("g")

    mj = _force(graph())
    got = mj.call("g", {"y": y, "b": b})
    exp = y.sum(axis=1) * b[np.arange(5) ** 2]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_pure_iterator_computed_scatter_add():
    """Non-affine pure-iterator WRITE index (out[(i * j) % 5] += x[i, j])
    rides the transposed one-hot scatter-add, indices from iota alone."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=(6, 8)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        xin = input("x")
        out = Fun("out")
        out[(i * j) % 5] = xin[i, j]
        out.with_shape([5])
        out.schedule(tile={"j": 4})
        return out.target("s")

    mj = _force(graph())
    got = mj.call("s", {"x": x})
    exp = np.zeros(5, np.float32)
    for i in range(6):
        for j in range(8):
            exp[(i * j) % 5] += x[i, j]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_pure_iterator_gather_interp_parity():
    """interp oracle parity for the pure-iterator computed-index family
    (both backends, same graph, bit-level agreement tolerance)."""
    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, 6)).astype(np.float32)
    a = rng.normal(size=(9,)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        xin = input("x")
        ain = input("a")
        out = Fun("out")
        out[i, j] = xin[i, j] * ain[(i + 2 * j) % 9]
        out.with_shape([xin.shape[0], xin.shape[1]])
        out.schedule(tile={"i": 2, "j": 3})
        return out.target("g")

    mj = _force(graph())
    a_jax = mj.call("g", {"x": x, "a": a})
    b_interp = compile(graph(), backend="interp").call(
        "g", {"x": x, "a": a}
    )
    np.testing.assert_allclose(a_jax, b_interp, rtol=1e-6, atol=1e-7)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_multi_computed_write_dims_fold_flat():
    """TWO computed write dims (out[(2*i) % 4, (j*j) % 5] += x[i, j])
    fold into one flat scatter index (compare-reduce scatter)."""
    rng = np.random.default_rng(12)
    x = rng.normal(size=(6, 8)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        xin = input("x")
        out = Fun("out")
        out[(2 * i) % 4, (j * j) % 5] = xin[i, j]
        out.with_shape([4, 5])
        out.schedule(tile={"i": 2})
        return out.target("s")

    mj = _force(graph())
    got = mj.call("s", {"x": x})
    want = np.zeros((4, 5), np.float32)
    for i in range(6):
        for j in range(8):
            want[(2 * i) % 4, (j * j) % 5] += x[i, j]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


def test_scatter_self_referencing_written_axis():
    """A scatter index depending on a directly-written axis
    (out[i, (i + j) % W] += v[i, j]) — previously a decline, now the
    compare-reduce scatter keeps the written axis in place."""
    rng = np.random.default_rng(13)
    v = rng.normal(size=(6, 9)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        vin = input("v")
        out = Fun("out")
        out[i, (i + j) % 7] = vin[i, j]
        out.with_shape([6, 7])
        out.schedule(tile={"i": 2})
        return out.target("s")

    mj = _force(graph())
    got = mj.call("s", {"v": v})
    want = np.zeros((6, 7), np.float32)
    for i in range(6):
        for j in range(9):
            want[i, (i + j) % 7] += v[i, j]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)
    b = compile(graph(), backend="interp").call("s", {"v": v})
    np.testing.assert_allclose(got, b, rtol=1e-6, atol=1e-7)


def test_scatter_non_lane_out_axis():
    """A scatter whose plain out axis is NOT the lane axis
    (out[(i1 * i2) % 5, i0] += x[i0, i1, i2]) routes through the
    compare-reduce scatter (the one-hot class requires out == [lane])."""
    rng = np.random.default_rng(14)
    x = rng.normal(size=(4, 5, 6)).astype(np.float32)

    def graph():
        i0, i1, i2 = iters("i0", "i1", "i2")
        xin = input("x")
        out = Fun("out")
        out[(i1 * i2) % 5, i0] = xin[i0, i1, i2]
        out.with_shape([5, 4])
        out.schedule(tile={"i0": 2})
        return out.target("s")

    mj = _force(graph())
    got = mj.call("s", {"x": x})
    want = np.zeros((5, 4), np.float32)
    for i0 in range(4):
        for i1 in range(5):
            for i2 in range(6):
                want[(i1 * i2) % 5, i0] += x[i0, i1, i2]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)


@pytest.mark.parametrize("mode", ["maximize", "minimize"])
def test_scatter_max_min_accumulation(mode):
    """Max/min-accumulating computed-index scatters
    (out.maximize[to_index(tok[i]), d] = v[i, d]) route through the
    compare-reduce scatter: the combine is max/min with the matching
    +-inf identity, and rows no token maps to keep the identity —
    matching the interp oracle's extreme-initialized results."""
    rng = np.random.default_rng(15)
    n, V, d = 48, 11, 24
    toks = rng.integers(0, V, size=(n,)).astype(np.float32)
    vals = rng.normal(size=(n, d)).astype(np.float32)

    def graph():
        i, x = iters("i", "x")
        tok, g = input("tok"), input("g")
        out = Fun("out")
        getattr(out, mode)[to_index(tok[i]), x] = g[i, x]
        out.with_shape([V, d])
        out.schedule(tile={"i": 16})
        return out.target("s")

    mj = _force(graph())
    got = np.asarray(mj.call("s", {"tok": toks, "g": vals}))
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)
    ufunc = np.maximum if mode == "maximize" else np.minimum
    ident = -np.inf if mode == "maximize" else np.inf
    want = np.full((V, d), ident, np.float32)
    ufunc.at(want, toks.astype(np.int64), vals)
    np.testing.assert_array_equal(
        np.isfinite(got), np.isfinite(want)
    )
    np.testing.assert_allclose(
        np.where(np.isfinite(want), got, 0.0),
        np.where(np.isfinite(want), want, 0.0),
        rtol=1e-6, atol=1e-6,
    )
    interp = np.asarray(
        compile(graph(), backend="interp").call(
            "s", {"tok": toks, "g": vals}
        )
    )
    np.testing.assert_array_equal(got, interp)


def test_scatter_max_pure_iterator_index():
    """Max scatter with a pure-iterator computed index
    (out.maximize[(i * j) % 7] = x[i, j]) — the allow_pure fallback now
    covers non-add accumulation too."""
    rng = np.random.default_rng(16)
    x = rng.normal(size=(6, 8)).astype(np.float32)

    def graph():
        i, j = iters("i", "j")
        xin = input("x")
        out = Fun("out")
        out.maximize[(i * j) % 7] = xin[i, j]
        out.with_shape([7])
        out.schedule(tile={"j": 4})
        return out.target("s")

    mj = _force(graph())
    got = np.asarray(mj.call("s", {"x": x}))
    assert _stats(mj).get("pallas-mapreduce") == 1, _stats(mj)
    want = np.full(7, -np.inf, np.float32)
    for i in range(6):
        for j in range(8):
            want[(i * j) % 7] = max(want[(i * j) % 7], x[i, j])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_policy_charges_gather_work():
    """Auto-mode routing charges computed-index kernels loop_space x V
    work on the Pallas side: with calibrated equal-bandwidth constants a
    plain map kernel routes to Pallas while the same-size gather kernel
    (V candidate touches per position) falls back to XLA."""
    from exprgrad_tpu.backend.policy import SchedulePolicy

    pol = SchedulePolicy("auto")
    pol.constants = dict(pol.constants)
    pol.constants.update(
        xla_elementwise_gbps=600.0, pallas_elementwise_gbps=900.0,
        pallas_launch_us=1.0, calibrated=True,
    )
    nbytes = 64 * 2**20
    assert pol.mapreduce(nbytes).use_pallas
    assert pol.mapreduce(nbytes, work_bytes=0).use_pallas
    # V = 4096 candidates per position: the compare work dwarfs the
    # bandwidth edge
    assert not pol.mapreduce(nbytes, work_bytes=nbytes * 64).use_pallas
