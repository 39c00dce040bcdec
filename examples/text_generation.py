"""Train the DSL transformer on a cyclic-sequence task, then generate.

End-to-end LM loop entirely on the framework: the model (embeddings,
causal attention, max-shifted softmax) is written in the kernel DSL with
compiler-derived gradients; generation greedy-decodes from the "predict"
target, and the trained model round-trips through an AOT serving
artifact (export_compiled / load_compiled).
"""

import numpy as np

from exprgrad_tpu import compile, load_compiled, one_hot
from exprgrad_tpu.models.transformer import tiny_transformer

VOCAB, SEQ, BATCH = 6, 8, 32
STEPS = 400


def batch(rng):
    """Cyclic +1 sequences with random phase; labels = next token."""
    phase = rng.integers(0, VOCAB, BATCH)
    toks = (phase[:, None] + np.arange(SEQ)[None, :]) % VOCAB
    labels = (toks + 1) % VOCAB
    return (
        toks.astype(np.float32),
        one_hot(labels, VOCAB).reshape(BATCH, SEQ, VOCAB),
    )


def greedy_generate(predict, prompt, n_new):
    """Greedy continuation; `predict` maps token ids [1, t] -> probs."""
    toks = list(prompt)
    for _ in range(n_new):
        window = np.asarray(toks[-SEQ:], np.float32)[None, :]
        probs = np.asarray(predict(window))
        toks.append(int(probs[0, -1].argmax()))
    return toks


def main() -> None:
    rng = np.random.default_rng(0)
    model = compile(tiny_transformer(vocab=VOCAB, eta=0.005), seed=1)

    toks, labels = batch(rng)
    first = float(model.call("loss", {"tokens": toks, "labels": labels})[0])
    for _ in range(STEPS):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    last = float(model.call("loss", {"tokens": toks, "labels": labels})[0])
    print(f"loss: {first:.3f} -> {last:.3f}")

    prompt = [2, 3, 4]
    out = greedy_generate(
        lambda w: model.call("predict", {"tokens": w}), prompt, n_new=9
    )
    print("generated:", out)
    expected = [(prompt[0] + i) % VOCAB for i in range(len(out))]
    print("pattern:  ", expected)

    # ship it: AOT artifact with the trained weights baked in
    data = model.export_compiled("predict", {"tokens": [1, SEQ]})
    served = load_compiled(data)
    window = np.asarray(out[-SEQ:], np.float32)[None, :]
    live = np.asarray(model.call("predict", {"tokens": window}))
    aot = np.asarray(served({"tokens": window}))
    print("serving artifact max dev:", float(np.abs(live - aot).max()))


if __name__ == "__main__":
    main()
