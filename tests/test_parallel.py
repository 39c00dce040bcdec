"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from exprgrad_tpu import Tensor, compile
from exprgrad_tpu.models import xor_mlp
from exprgrad_tpu.parallel import ShardedExecutor, make_mesh, sharded_fit

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh():
    mesh = make_mesh(8, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(Exception):
        make_mesh(8, data=3, model=2)


def test_dp_training_matches_single_device():
    """Data-parallel training must produce the same parameters as
    single-device training (gradients are summed over the batch either way)."""
    x = np.tile(Tensor.new([4, 2], [0, 0, 0, 1, 1, 0, 1, 1]), (4, 1))
    y = np.tile(Tensor.new([4, 1], [0, 1, 1, 0]), (4, 1))

    m_single = compile(xor_mlp(rate=0.1), backend="jax", seed=10)
    m_shard = compile(xor_mlp(rate=0.1), backend="jax", seed=10)
    for tid in m_single.params:
        np.testing.assert_allclose(m_single.params[tid], m_shard.params[tid])

    mesh = make_mesh(8, model=1)
    for _ in range(3):
        m_single.fit("train", {"x": x, "y": y}, batch_size=16, log_status=False)
        sharded_fit(m_shard, "train", {"x": x, "y": y}, mesh, batch_size=16)

    for tid in m_single.params:
        np.testing.assert_allclose(
            np.asarray(m_single.params[tid]),
            np.asarray(m_shard.params[tid]),
            rtol=1e-5,
            atol=1e-7,
        )


def test_tp_dense_sharding():
    """Tensor-parallel mesh: dense weights shard over the model axis and the
    forward pass still matches the unsharded run."""
    from exprgrad_tpu import input
    from exprgrad_tpu.layers import dense, sigmoid

    net = input("x").pipe(dense, 8, 16).pipe(sigmoid).target("predict")
    model = compile(net, backend="jax", seed=1)
    x = Tensor.rand([16, 8], rng=np.random.default_rng(0))
    expected = model.call("predict", {"x": x})

    mesh = make_mesh(8, model=2)
    ex = ShardedExecutor(model, "predict", {"x": [16, 8]}, mesh)
    out_id = model.program.targets["predict"].output
    result = ex.run({"x": x})
    np.testing.assert_allclose(
        np.asarray(result[out_id]), expected, rtol=1e-5
    )
    # weights [8, 16] must actually be sharded over the model axis
    w_tid = model.program.params[0]
    sharding = ex.in_shardings[w_tid]
    assert "model" in str(sharding.spec)


def test_graft_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_transformer_sharded_train_step():
    """dp x tp sharding of the full transformer training step (embedding
    gathers, attention einsums, adam) compiles and updates all params."""
    from exprgrad_tpu import one_hot
    from exprgrad_tpu.models import tiny_transformer

    model = compile(tiny_transformer(vocab=6, dim=16), backend="jax", seed=0)
    mesh = make_mesh(8, model=2)
    batch = 16
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 6, (batch, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 6, (batch, 8)), 6).reshape(batch, 8, 6)

    ex = ShardedExecutor(
        model, "train",
        {"tokens": [batch, 8], "labels": [batch, 8, 6]},
        mesh, batch_inputs=["tokens", "labels"],
    )
    before = {k: np.asarray(v).copy() for k, v in model.params.items()}
    result = ex.run({"tokens": toks, "labels": labels}, epoch=1)
    jax.block_until_ready(result)
    moved = sum(
        not np.allclose(np.asarray(model.params[k]), before[k])
        for k in before
    )
    assert moved == len(before)
    for v in result.values():
        assert np.isfinite(np.asarray(v)).all()


def test_transformer_sequence_parallel():
    """Sequence parallelism: tokens sharded (data, model) -> XLA partitions
    the attention along the sequence dim and inserts the collectives; the
    result must match the unsharded forward pass."""
    from jax.sharding import PartitionSpec as P

    from exprgrad_tpu import one_hot
    from exprgrad_tpu.models import tiny_transformer

    model = compile(tiny_transformer(vocab=6, dim=16), backend="jax", seed=3)
    batch, seq = 8, 8
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 6, (batch, seq)).astype(np.float32)
    expected = model.call("predict", {"tokens": toks})

    mesh = make_mesh(8, model=2)
    ex = ShardedExecutor(
        model, "predict", {"tokens": [batch, seq]}, mesh,
        batch_inputs=["tokens"],
        input_specs={"tokens": P("data", "model")},
    )
    out_id = model.program.targets["predict"].output
    result = ex.run({"tokens": toks})
    np.testing.assert_allclose(
        np.asarray(result[out_id]), expected, rtol=1e-5, atol=1e-6
    )


def test_sharded_scheduled_pallas_matmul():
    """Schedule-driven Pallas kernels compose with mesh sharding (SPMD
    partitions around the custom call)."""
    import numpy as np

    from exprgrad_tpu import Fun, compile, input, iters
    from exprgrad_tpu.parallel import ShardedExecutor, make_mesh

    y, x, it = iters("y", "x", "it")
    c = Fun("c")
    c[y, x] = input("a")[y, it] * input("b")[it, x]
    c.schedule(tile={"y": 64, "x": 128, "it": 128}, parallel=["y", "x"])
    model = compile(c.target("c"), backend="jax", schedule_mode="force")
    mesh = make_mesh(8)
    ex = ShardedExecutor(
        model, "c", {"a": [256, 128], "b": [128, 256]}, mesh,
        batch_inputs=["a"],
    )
    rng = np.random.default_rng(0)
    a = rng.normal(size=(256, 128)).astype(np.float32)
    b = rng.normal(size=(128, 256)).astype(np.float32)
    res = ex.run({"a": a, "b": b})
    out = np.asarray(res[model.program.targets["c"].output])
    np.testing.assert_allclose(out, a @ b, rtol=1e-4)


def test_flash_transformer_sharded_train_step():
    """dp x tp sharding of the flash_transformer train step: the extern
    attention kernels (impl-routed to the partitionable XLA form on this
    backend) trace under the sharded jit; params update and the sharded
    loss matches the single-device loss."""
    from exprgrad_tpu import one_hot
    from exprgrad_tpu.models import flash_transformer

    model = compile(flash_transformer(vocab=6, dim=16, heads=2),
                    backend="jax", seed=1)
    batch = 16
    rng = np.random.default_rng(4)
    toks = rng.integers(0, 6, (batch, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 6, (batch, 8)), 6).reshape(batch, 8, 6)
    single_loss = float(model.call(
        "loss", {"tokens": toks, "labels": labels})[0])

    mesh = make_mesh(8, model=2)
    ex = ShardedExecutor(
        model, "train",
        {"tokens": [batch, 8], "labels": [batch, 8, 6]},
        mesh, batch_inputs=["tokens", "labels"],
    )
    before = {k: np.asarray(v).copy() for k, v in model.params.items()}
    result = ex.run({"tokens": toks, "labels": labels}, epoch=1)
    jax.block_until_ready(result)
    moved = sum(
        not np.allclose(np.asarray(model.params[k]), before[k])
        for k in before
    )
    assert moved == len(before)

    loss_ex = ShardedExecutor(
        compile(flash_transformer(vocab=6, dim=16, heads=2), backend="jax",
                seed=1),
        "loss", {"tokens": [batch, 8], "labels": [batch, 8, 6]},
        mesh, batch_inputs=["tokens", "labels"],
    )
    sharded = loss_ex.run({"tokens": toks, "labels": labels})
    out_id = loss_ex.model.program.targets["loss"].output
    assert abs(float(np.asarray(sharded[out_id])[0]) - single_loss) < 1e-5


def test_zero_optimizer_state_sharding():
    """ZeRO-1: optimizer caches shard 1/N per device over the data axis;
    one training step matches the replicated layout to
    reduction-order noise."""
    from exprgrad_tpu import compile as eg_compile, one_hot
    from exprgrad_tpu.models import flash_transformer

    mesh = make_mesh(4)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 6, (8, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 6, 8 * 8), 6).reshape(8, 8, 6)

    results = {}
    for zero in (False, True):
        model = eg_compile(
            flash_transformer(vocab=6, dim=16, heads=2), seed=0
        )
        ex = ShardedExecutor(
            model, "train", {"tokens": [8, 8], "labels": [8, 8, 6]},
            mesh, batch_inputs=["tokens", "labels"], zero=zero,
        )
        ex.run({"tokens": toks, "labels": labels}, epoch=1, seed=0)
        results[zero] = {
            tid: np.asarray(v) for tid, v in model.params.items()
        }
        if zero:
            # every shardable optimizer cache is actually split over data
            split = 0
            for tid, val in model.caches.items():
                shard_shape = val.sharding.shard_shape(val.shape)
                if val.shape and val.shape[0] % 4 == 0 and val.shape[0] > 0:
                    if shard_shape[0] == val.shape[0] // 4:
                        split += 1
            assert split > 0, "no optimizer cache was ZeRO-sharded"
    for tid in results[False]:
        np.testing.assert_allclose(
            results[True][tid], results[False][tid], rtol=1e-6, atol=1e-7
        )


def test_multistep_tp_training():
    """Several sharded steps in sequence: step outputs (compiler-chosen
    layouts) must feed the next step without tripping jit's in_shardings
    check (regression: run() used to skip device_put for already-sharded
    arrays)."""
    from exprgrad_tpu import compile as eg_compile, one_hot
    from exprgrad_tpu.models import flash_transformer

    mesh = make_mesh(8, model=2)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 6, (8, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 6, 64), 6).reshape(8, 8, 6)
    model = eg_compile(flash_transformer(vocab=6, dim=16, heads=2), seed=0)
    ex = ShardedExecutor(
        model, "train", {"tokens": [8, 8], "labels": [8, 8, 6]},
        mesh, batch_inputs=["tokens", "labels"],
    )
    for step in range(3):
        ex.run({"tokens": toks, "labels": labels}, epoch=1 + step,
               seed=step)
    for v in model.params.values():
        assert np.isfinite(np.asarray(v)).all()


def test_fsdp_param_sharding():
    """FSDP (ZeRO-3): parameters themselves shard 1/N over the data axis
    (XLA all-gathers weights at use, reduce-scatters their grads); one
    training step matches the replicated layout to reduction-order
    noise, and it
    composes with tensor parallelism (data x model sharded matrices)."""
    from exprgrad_tpu import compile as eg_compile, one_hot
    from exprgrad_tpu.models import flash_transformer

    mesh = make_mesh(8, model=2)  # data=4, model=2
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 8, (8, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 8, 8 * 8), 8).reshape(8, 8, 8)

    results = {}
    for fsdp in (False, True):
        model = eg_compile(
            flash_transformer(vocab=8, dim=16, heads=2), seed=0
        )
        ex = ShardedExecutor(
            model, "train", {"tokens": [8, 8], "labels": [8, 8, 8]},
            mesh, batch_inputs=["tokens", "labels"], fsdp=fsdp,
        )
        ex.run({"tokens": toks, "labels": labels}, epoch=1, seed=0)
        results[fsdp] = {
            tid: np.asarray(v) for tid, v in model.params.items()
        }
        if fsdp:
            data_axis = mesh.shape["data"]
            split = both = 0
            for tid, val in model.params.items():
                if not val.shape:
                    continue
                shard = val.sharding.shard_shape(val.shape)
                if any(
                    s == full // data_axis
                    for s, full in zip(shard, val.shape)
                    if full % data_axis == 0 and full >= data_axis
                ):
                    split += 1
                    if shard[-1] < val.shape[-1]:  # also model-sharded
                        both += 1
            assert split > 0, "no parameter was FSDP-sharded"
            assert both > 0, "no parameter was data x model sharded"
    for tid in results[False]:
        np.testing.assert_allclose(
            results[True][tid], results[False][tid], rtol=1e-6, atol=1e-7
        )


def test_zero_sharding_with_factored_adafactor_state():
    """Adafactor's vr/vc caches have shapes DIFFERENT from their param
    (factored second moments): the cache-follows-param sharding rule must
    not apply the param's model-axis layout to them.  One tp+zero step on
    the flagship must match the replicated layout."""
    from exprgrad_tpu import compile as eg_compile, make_opt, one_hot
    from exprgrad_tpu.layers import adafactor
    from exprgrad_tpu.models import flash_transformer

    mesh = make_mesh(4, model=2)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 6, (4, 8)).astype(np.float32)
    labels = one_hot(rng.integers(0, 6, 32), 6).reshape(4, 8, 6)

    results = {}
    for shard in (False, True):
        model = eg_compile(
            flash_transformer(vocab=6, dim=16, heads=2,
                              opt=make_opt(adafactor, eta=0.05)),
            seed=0,
        )
        if shard:
            ex = ShardedExecutor(
                model, "train", {"tokens": [4, 8], "labels": [4, 8, 6]},
                mesh, batch_inputs=["tokens", "labels"], zero=True,
            )
            ex.run({"tokens": toks, "labels": labels}, epoch=1, seed=0)
        else:
            model.epoch = 1
            model.apply("train", {"tokens": toks, "labels": labels})
        results[shard] = {
            tid: np.asarray(v) for tid, v in model.params.items()
        }
        if shard:
            # factored state exists and kept its reduced shape
            factored = [
                np.asarray(v)
                for tid, v in model.caches.items()
                if model.program.tensors[tid].name == "adafactor.vr"
            ]
            assert factored, "no factored adafactor state found"
    for tid in results[False]:
        np.testing.assert_allclose(
            results[True][tid], results[False][tid], rtol=2e-5, atol=1e-6
        )


def test_offload_opt_state_matches_device_resident():
    """offload_opt_state=True parks adam state in pinned_host memory
    between steps; the training trajectory is unchanged (a memory
    placement, not an algorithm) and the cache arrays really live in
    host memory after each step."""
    from exprgrad_tpu import Fun, input, iters, make_opt, param
    from exprgrad_tpu.layers import adam, mse
    from exprgrad_tpu import ir

    def graph():
        y, x, it = iters("y", "x", "it")
        w = param([8, 16], (-0.5, 0.5), name="w")
        inp, lbl = input("inp"), input("lbl")
        pred = Fun("pred")
        pred[y, x] = inp[y, it] * w[it, x]
        return (mse(pred, lbl).target("loss").backwards()
                .optimize(make_opt(adam, eta=0.01)).target("train"))

    rng = np.random.default_rng(0)
    data = {"inp": rng.normal(size=(16, 8)),
            "lbl": rng.normal(size=(16, 16))}
    shapes = {"inp": [16, 8], "lbl": [16, 16]}
    mesh = make_mesh(8, model=2)

    base = compile(graph(), backend="jax", seed=13)
    off = compile(graph(), backend="jax", seed=13)
    ex_base = ShardedExecutor(base, "train", shapes, mesh, fsdp=True)
    ex_off = ShardedExecutor(off, "train", shapes, mesh, fsdp=True,
                             offload_opt_state=True)
    for k in range(3):
        base.epoch = off.epoch = k + 1
        ex_base.run(data)
        ex_off.run(data)

    for tid in base.params:
        a = np.asarray(base.params[tid])
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, np.asarray(off.params[tid]),
                                   rtol=1e-6, atol=1e-9)
    n_caches = 0
    for tid, v in off.caches.items():
        if off.program.tensors[tid].kind == ir.TensorKind.CACHE:
            assert v.sharding.memory_kind == "pinned_host"
            n_caches += 1
    assert n_caches >= 2  # adam m and v at least
    # params stayed in device memory
    for tid, v in off.params.items():
        assert v.sharding.memory_kind == "device"
