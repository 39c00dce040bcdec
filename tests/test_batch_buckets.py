"""Shape-bucketed padding: batch-size changes within a bucket reuse ONE
compiled executor (every new shape signature is otherwise a fresh XLA
trace+compile — minutes through the TPU tunnel).

The reference runs any input shape through one JITted function per
target (model.nim:392-406, runtime shape inference passes.nim:1386);
bucketing is the XLA-static-shape counterpart.
"""

import numpy as np
import pytest

from exprgrad_tpu import Fun, compile, input, iters
from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.layers import dense, relu, softmax
from exprgrad_tpu.models import flash_transformer


def _mlp():
    x = input("x")
    h = relu(dense(x, 8, 16))
    return softmax(dense(h, 16, 4)).target("predict")


def test_within_bucket_costs_zero_recompiles():
    model = compile(_mlp(), seed=0)
    model.set_batch_buckets([8, 32])
    rng = np.random.default_rng(0)
    outs = {}
    for b in (3, 5, 8, 2):
        outs[b] = model.call(
            "predict", {"x": rng.normal(size=(b, 8)).astype(np.float32)}
        )
    assert len(model._executors) == 1, model._executors.keys()
    for b, out in outs.items():
        assert out.shape == (b, 4)
    # crossing the bucket boundary compiles exactly one more
    model.call("predict",
               {"x": rng.normal(size=(20, 8)).astype(np.float32)})
    assert len(model._executors) == 2


def test_bucketed_output_matches_exact():
    model = compile(_mlp(), seed=0)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    exact = model.call("predict", {"x": x})
    model.set_batch_buckets([8])
    bucketed = model.call("predict", {"x": x})
    np.testing.assert_allclose(bucketed, exact, rtol=1e-6, atol=1e-7)


def test_pow2_buckets():
    model = compile(_mlp(), seed=0)
    model.set_batch_buckets("pow2")
    rng = np.random.default_rng(2)
    for b in (3, 4, 5, 7, 8):
        out = model.call(
            "predict", {"x": rng.normal(size=(b, 8)).astype(np.float32)}
        )
        assert out.shape == (b, 4)
    # 3,4 -> 4; 5,7,8 -> 8: two executors total
    assert len(model._executors) == 2


def test_training_targets_never_bucketed():
    """A mutating target (train) runs at the exact shape — padding would
    change batch-mean losses and gradients."""
    model = compile(
        flash_transformer(vocab=8, dim=16, heads=2, hidden=32, max_seq=16),
        seed=0,
    )
    model.set_batch_buckets([8])
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 8, (3, 16)).astype(np.float32)
    labels = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (3, 16))]
    before = {tid: np.asarray(v).copy() for tid, v in model.params.items()}
    model.epoch += 1
    model.apply("train", {"tokens": toks, "labels": labels})
    changed = any(
        not np.array_equal(before[tid], np.asarray(v))
        for tid, v in model.params.items()
    )
    assert changed
    # the exact batch-3 signature was compiled (not a padded batch-8 one)
    keys = [k for k in model._executors if k[0] == "train"]
    assert len(keys) == 1
    shapes = dict(keys[0][1])
    tok_id = model.program.inputs["tokens"]
    assert list(shapes[tok_id])[0] == 3


def test_beyond_largest_bucket_runs_exact():
    model = compile(_mlp(), seed=0)
    model.set_batch_buckets([4])
    rng = np.random.default_rng(4)
    out = model.call(
        "predict", {"x": rng.normal(size=(9, 8)).astype(np.float32)}
    )
    assert out.shape == (9, 4)


def test_bad_buckets_rejected():
    model = compile(_mlp(), seed=0)
    with pytest.raises(ModelRuntimeError):
        model.set_batch_buckets([])
    with pytest.raises(ModelRuntimeError):
        model.set_batch_buckets([0, 4])


def test_non_batch_tracking_target_runs_exact():
    """A target whose output leading dim does NOT track the batch (here a
    per-feature column sum whose size coincides with the bucket) is
    neither padded nor sliced — padding would contaminate the sums and
    slicing would drop features (review finding)."""
    from exprgrad_tpu import iters

    x = input("x")
    colsum = Fun("colsum")
    n, f = iters("n", "f")
    colsum[f] = x[n, f]  # reduce over the batch -> shape [4]
    model = compile(colsum.target("colsum"), seed=0)
    model.set_batch_buckets([4])
    rng = np.random.default_rng(7)
    v = rng.normal(size=(3, 4)).astype(np.float32)  # batch 3, features 4
    out = model.call("colsum", {"x": v})
    assert out.shape == (4,)
    np.testing.assert_allclose(out, v.sum(axis=0), rtol=1e-5)
    # compiled at the EXACT batch-3 signature, not padded batch-4
    key = next(k for k in model._executors if k[0] == "colsum")
    shapes = dict(key[1])
    x_id = model.program.inputs["x"]
    assert list(shapes[x_id])[0] == 3


def test_batch_reduced_aux_input_runs_exact():
    """An auxiliary input whose length coincides with the batch but is
    REDUCED into the output (review-found silent corruption) disables
    bucketing — the call runs exact and correct."""
    from exprgrad_tpu import iters

    x, r = input("x"), input("r")
    out = Fun("out")
    n, i = iters("n", "i")
    out[n] = x[n, i]
    n2, j = iters("n2", "j")
    out[n2] = r[j]  # reduced over j; len(r) == batch
    model = compile(out.target("out"), seed=0)
    model.set_batch_buckets([8])
    xv = np.arange(20, dtype=np.float32).reshape(5, 4)
    rv = np.arange(5, dtype=np.float32) * 10
    got = model.call("out", {"x": xv, "r": rv})
    np.testing.assert_allclose(got, xv.sum(1) + rv.sum(), rtol=1e-6)
    key = next(k for k in model._executors if k[0] == "out")
    assert dict(key[1])[model.program.inputs["x"]][0] == 5  # exact


def test_batch_mean_intermediate_runs_exact():
    """out[n] = x[n] - mean-over-batch(x): the intermediate reduces over
    the batch dim, so padding would contaminate every row — must run
    exact."""
    from exprgrad_tpu import iters, to_scalar

    x = input("x")
    mean = Fun("mean")
    n, f = iters("n", "f")
    mean[f] = x[n, f] / to_scalar(x.shape[0])
    out = Fun("out")
    n2, f2 = iters("n2", "f2")
    out[n2, f2] = x[n2, f2] - mean[f2]
    model = compile(out.target("out"), seed=0)
    model.set_batch_buckets([8])
    xv = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    got = model.call("out", {"x": xv})
    np.testing.assert_allclose(got, xv - xv.mean(0), rtol=1e-5, atol=1e-6)
    key = next(k for k in model._executors if k[0] == "out")
    assert dict(key[1])[model.program.inputs["x"]][0] == 5


def test_string_buckets_rejected_cleanly():
    model = compile(_mlp(), seed=0)
    with pytest.raises(ModelRuntimeError):
        model.set_batch_buckets("pow3")
