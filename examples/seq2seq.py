"""Encoder-decoder (seq2seq) on sequence reversal.

Reversing a sequence is the canonical cross-attention probe: producing
output position ``i`` requires reading source position ``s-1-i``, which
the decoder can only do through its cross-attention over the encoder
states.  The model (models/seq2seq.py) is built entirely from the layer
library — bidirectional encoder self-attention, causal decoder
self-attention, cross-attention via the fused extern kernels — and the
whole forward + symbolic backward + adam step compiles into one XLA
program.
"""

import numpy as np

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import tiny_seq2seq

VOCAB, SEQ, BATCH, STEPS = 8, 6, 32, 350


def batch(rng, n=BATCH):
    src = rng.integers(1, VOCAB, (n, SEQ))
    out = src[:, ::-1]                       # target = reversed source
    tgt = np.concatenate([np.zeros((n, 1), int), out[:, :-1]], 1)  # shifted
    return (src.astype(np.float32), tgt.astype(np.float32),
            one_hot(out, VOCAB).reshape(n, SEQ, VOCAB))


def main() -> None:
    rng = np.random.default_rng(0)
    model = compile(tiny_seq2seq(vocab=VOCAB, dim=16, heads=2, eta=0.02),
                    seed=0)
    print(model.summary().splitlines()[0])

    src, tgt, labels = batch(rng)
    first = float(model.call("loss", {"src": src, "tgt": tgt,
                                      "labels": labels})[0])
    for _ in range(STEPS):
        model.epoch += 1
        src, tgt, labels = batch(rng)
        model.apply("train", {"src": src, "tgt": tgt, "labels": labels})
    last = float(model.call("loss", {"src": src, "tgt": tgt,
                                     "labels": labels})[0])
    print(f"loss: {first:.3f} -> {last:.3f}")

    # held-out sequences
    src, tgt, _ = batch(rng, n=4)
    pred = np.asarray(model.call("predict",
                                 {"src": src, "tgt": tgt})).argmax(-1)
    acc = (pred == src[:, ::-1].astype(int)).mean()
    print("source :", src.astype(int)[0].tolist())
    print("output :", pred[0].tolist())
    print(f"held-out reversal accuracy: {acc:.2f}")

    # KV-cache serving: encode once, O(1)-per-token decoding (vs
    # greedy_decode's exact O(t^2) re-forward); greedy token-equal
    from exprgrad_tpu.models import Seq2SeqServer

    server = Seq2SeqServer(model)
    served = np.asarray(server.generate(src, n_new=src.shape[1]))
    print("served :", served[0].tolist())
    acc_served = (served == src[:, ::-1].astype(np.int64)).mean()
    print(f"served reversal accuracy: {acc_served:.2f}")

    # continuous batching: sources of any length admit into slots the
    # moment one frees; encode-once, cursor decoding, greedy == solo
    from exprgrad_tpu.models import Seq2SeqBatcher

    b = Seq2SeqBatcher(server, slots=2)
    rids = [b.submit(row[row > 0] if (row > 0).any() else row,
                     max_new=src.shape[1]) for row in src]
    results = b.run()
    acc_b = np.mean([
        (results[rid][: src.shape[1]]
         == src[i, ::-1].astype(np.int64)).mean()
        for i, rid in enumerate(rids)
    ])
    print("scheduler", b.stats)
    print(f"batched reversal accuracy: {acc_b:.2f}")


if __name__ == "__main__":
    main()
