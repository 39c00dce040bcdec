"""Causal LM from the layer library: fused flash attention end to end.

Where examples/text_generation.py builds attention by hand in the raw
kernel DSL, this trains ``models.flash_transformer`` — multi-head
attention through the extern custom-grad seam (Pallas flash kernels or
partitionable XLA attention, cost-model routed), rank-3 rms_norm/dense
with no manual reshapes — then greedy-generates and round-trips the
trained model through a binary checkpoint onto the ORACLE backend to
show the whole stack (extern kernels included) serializes.
"""

import os
import tempfile

import numpy as np

from exprgrad_tpu import compile, make_opt, one_hot
from exprgrad_tpu.io.serialize import load_model, save_model
from exprgrad_tpu.layers import adamw, clip_by_global_norm, warmup_cosine
from exprgrad_tpu.models import flash_transformer

VOCAB, SEQ, BATCH = 6, 8, 32
STEPS = 300


def batch(rng):
    """Cyclic +1 sequences with random phase; labels = next token."""
    phase = rng.integers(0, VOCAB, BATCH)
    toks = (phase[:, None] + np.arange(SEQ)[None, :]) % VOCAB
    labels = (toks + 1) % VOCAB
    return (
        toks.astype(np.float32),
        one_hot(labels, VOCAB).reshape(BATCH, SEQ, VOCAB),
    )


def greedy_generate(model, prompt, n_new):
    """O(1)-per-token generation: the trained DSL weights drive the
    KV-cache decoder (models.serve.FlashLMServer); the whole loop is one
    jitted lax.scan instead of re-running predict per token."""
    from exprgrad_tpu.models import FlashLMServer

    server = FlashLMServer(model)
    out = server.generate(
        np.asarray(prompt, np.float32)[None, :], n_new,
        capacity=len(prompt) + n_new,
    )
    return list(prompt) + [int(t) for t in np.asarray(out)[0]]


def main() -> None:
    rng = np.random.default_rng(0)
    # the standard LM training recipe, all compiled INTO the train target:
    # adamw + decoupled decay, linear warmup into cosine annealing (an
    # epoch() expression, no host callback), global-norm gradient clipping
    # (cross-tensor reduction inside the one-jit program)
    recipe = clip_by_global_norm(
        make_opt(adamw, eta=warmup_cosine(0.02, warmup_steps=10,
                                          total=STEPS),
                 weight_decay=0.001),
        max_norm=1.0,
    )
    model = compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, opt=recipe),
        seed=1,
    )

    toks, labels = batch(rng)
    args = {"tokens": toks, "labels": labels}
    first = float(model.call("loss", args)[0])
    for _ in range(STEPS):
        model.epoch += 1
        model.apply("train", args)
    last = float(model.call("loss", args)[0])
    print(f"loss: {first:.3f} -> {last:.3f}")

    prompt = [2, 3, 4]
    out = greedy_generate(model, prompt, n_new=9)
    expected = [(prompt[0] + i) % VOCAB for i in range(len(out))]
    acc = np.mean([a == b for a, b in zip(out[3:], expected[3:])])
    print("generated:", out)
    print("pattern:  ", expected)
    print(f"generation accuracy: {acc:.2f}")

    # checkpoint round trip onto the independent numpy oracle backend
    path = os.path.join(tempfile.mkdtemp(), "flash_lm.egt")
    save_model(model, path)
    oracle = load_model(path, backend="interp")
    dev = float(
        np.abs(
            np.asarray(model.call("predict", {"tokens": toks[:1]}))
            - np.asarray(oracle.call("predict", {"tokens": toks[:1]}))
        ).max()
    )
    print(f"checkpoint reload on the oracle backend: max dev {dev:.2e}")


if __name__ == "__main__":
    main()
