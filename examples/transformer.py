"""Train a tiny causal transformer written in the kernel DSL
(embeddings, attention, causal masking — all with compiler-derived
gradients).  The task: continue a cyclic token pattern."""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import tiny_transformer

VOCAB, SEQ, BATCH = 8, 12, 32


def batch(rng):
    phase = rng.integers(0, VOCAB, BATCH)
    toks = (phase[:, None] + np.arange(SEQ)[None, :]) % VOCAB
    labels = one_hot((toks + 1) % VOCAB, VOCAB).reshape(BATCH, SEQ, VOCAB)
    return toks.astype(np.float32), labels


def main() -> None:
    model = compile(tiny_transformer(vocab=VOCAB, eta=0.005), seed=0)
    rng = np.random.default_rng(0)
    toks, labels = batch(rng)
    for step in range(800):
        if step % 100 == 0:
            loss = model.call("loss", {"tokens": toks, "labels": labels})
            print(f"step {step}: loss {float(loss[0]):.4f}")
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})

    pred = model.call("predict", {"tokens": toks}).argmax(-1)
    want = labels.argmax(-1)
    accuracy = (pred[:, 1:] == want[:, 1:]).mean()
    print(f"next-token accuracy: {accuracy:.3f}")
    print("sample:", toks[0].astype(int).tolist(), "->", pred[0].tolist())


if __name__ == "__main__":
    main()
