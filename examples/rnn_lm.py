"""Character LM with the recurrent family: BPE-tokenize text, train an
LSTM next-token model, generate a continuation.

The recurrence runs as a lax.scan extern with registered BPTT gradients
(ops/recurrent.py); everything around it — embedding gathers, the dense
head, softmax, cross-entropy, adam — is kernel DSL with compiler-derived
gradients, and the whole train target compiles into one XLA program.
"""

import numpy as np

from exprgrad_tpu import compile
from exprgrad_tpu.io.tokenizer import BPETokenizer
from exprgrad_tpu.models import tiny_recurrent_lm

TEXT = (
    "the quick brown fox jumps over the lazy dog. "
    "the quick brown fox naps under the lazy sun. "
) * 4
SEQ = 24
STEPS = 250


def main() -> None:
    tok = BPETokenizer.train(TEXT, vocab_size=300)
    ids = np.asarray(tok.encode(TEXT), np.int64)
    vocab = tok.vocab_size

    # overlapping next-token windows
    starts = np.arange(0, len(ids) - SEQ - 1, 4)
    toks = np.stack([ids[s:s + SEQ] for s in starts]).astype(np.float32)
    nxt = np.stack([ids[s + 1:s + SEQ + 1] for s in starts])
    labels = np.eye(vocab, dtype=np.float32)[nxt]

    model = compile(
        tiny_recurrent_lm(vocab=vocab, dim=24, hidden=48, cell="lstm",
                          eta=0.02),
        backend="jax", seed=0,
    )
    args = {"tokens": toks, "labels": labels}
    print("loss before:", float(np.asarray(model.call("loss", args))[0]))
    for step in range(STEPS):
        model.epoch += 1
        model.apply("train", args)
    print("loss after:", float(np.asarray(model.call("loss", args))[0]))

    # greedy continuation from a prompt
    prompt = list(tok.encode("the quick brown "))
    out = list(prompt)
    for _ in range(12):
        window = np.asarray(out[-SEQ:], np.float32)[None, :]
        probs = np.asarray(model.call("predict", {"tokens": window}))
        out.append(int(probs[0, -1].argmax()))
    print("generated:", repr(tok.decode(out)))


if __name__ == "__main__":
    main()
