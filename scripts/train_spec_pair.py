"""Train a (target, draft) LM pair for the speculative-decoding bench.

VERDICT r3 #5: the speculative bench's random-weight draft measures the
worst-case acceptance FLOOR (no two random models agree); nothing showed
the feature ever winning.  This script trains both models on the same
deterministic successor task (a fixed random permutation pi over the
vocabulary: x[t+1] = pi(x[t]) — the bigram structure every LM learns
fast), so the greedy draft agrees with the greedy target almost always
and acceptance approaches 1.  The checkpoints are committed under
``benchmarks/spec_pair/`` and loaded by ``bench_speculative`` (trained
entry) on the chip — the measured BEST case, reported alongside the
random-draft floor.

Run on CPU: ``PYTHONPATH=. python scripts/train_spec_pair.py``
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from exprgrad_tpu import compile as eg_compile  # noqa: E402
from exprgrad_tpu.io import export_params_npz  # noqa: E402
from exprgrad_tpu.models import flash_transformer  # noqa: E402

VOCAB = 256
MAX_SEQ = 256  # bench needs prompt 64 + n_new 128 - 1 + k
SEQ = 32
BATCH = 16

TARGET_CFG = dict(vocab=VOCAB, dim=256, heads=4, hidden=1024, blocks=2,
                  max_seq=MAX_SEQ)
DRAFT_CFG = dict(vocab=VOCAB, dim=64, heads=4, hidden=256, blocks=1,
                 max_seq=MAX_SEQ)


def make_perm(seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.permutation(VOCAB).astype(np.int64)


def sample_batch(rng, perm, batch=BATCH, seq=SEQ):
    """Windows of the permutation-successor chain from random starts."""
    starts = rng.integers(0, VOCAB, batch)
    toks = np.empty((batch, seq + 1), np.int64)
    toks[:, 0] = starts
    for t in range(seq):
        toks[:, t + 1] = perm[toks[:, t]]
    x = toks[:, :seq].astype(np.float32)
    labels = np.eye(VOCAB, dtype=np.float32)[toks[:, 1:]]
    return {"tokens": x, "labels": labels}, toks[:, 1:]


def accuracy(model, perm, rng, n=4) -> float:
    hits = total = 0
    for _ in range(n):
        args, want = sample_batch(rng, perm)
        logits = np.asarray(model.call("predict", {"tokens": args["tokens"]}))
        pred = logits.argmax(-1)
        hits += int((pred == want).sum())
        total += want.size
    return hits / total


def train(name, cfg, perm, seed, steps, eta=0.01):
    model = eg_compile(
        flash_transformer(eta=eta, **cfg), backend="jax", seed=seed,
        precision="default",
    )
    rng = np.random.default_rng(seed + 100)
    t0 = time.time()
    for step in range(steps):
        model.epoch += 1
        args, _ = sample_batch(rng, perm)
        model.apply("train", args)
        if (step + 1) % 40 == 0:
            acc = accuracy(model, perm, np.random.default_rng(0))
            loss = float(model.call("loss", args)[0])
            print(f"{name} step {step + 1}: loss {loss:.4f} "
                  f"acc {acc:.4f} ({time.time() - t0:.0f}s)", flush=True)
            if acc > 0.999:
                break
    return model


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                           "spec_pair")
    os.makedirs(out_dir, exist_ok=True)
    perm = make_perm()
    target = train("target", TARGET_CFG, perm, seed=0,
                   steps=int(sys.argv[1]) if len(sys.argv) > 1 else 400)
    draft = train("draft", DRAFT_CFG, perm, seed=1,
                  steps=int(sys.argv[2]) if len(sys.argv) > 2 else 400)

    rng = np.random.default_rng(0)
    acc_t = accuracy(target, perm, rng)
    acc_d = accuracy(draft, perm, rng)
    # greedy agreement on the chain = the acceptance the bench will see
    args, want = sample_batch(np.random.default_rng(3), perm)
    pt = np.asarray(target.call("predict", {"tokens": args["tokens"]})).argmax(-1)
    pd = np.asarray(draft.call("predict", {"tokens": args["tokens"]})).argmax(-1)
    agree = float((pt == pd).mean())
    print(f"final: target acc {acc_t:.4f}, draft acc {acc_d:.4f}, "
          f"greedy agreement {agree:.4f}", flush=True)

    # params-only npz (the ~3x larger save_model checkpoint would drag
    # the adam m/v state into git for no benefit); the bench rebuilds
    # the same program from TARGET_CFG/DRAFT_CFG and imports by name+id
    for model, fname in ((target, "target.npz"), (draft, "draft.npz")):
        tmp = os.path.join(out_dir, fname + ".tmp")
        export_params_npz(model, tmp)
        with np.load(tmp) as data:
            params = {k: data[k] for k in data.files
                      if not k.startswith("cache:")}
        with open(os.path.join(out_dir, fname), "wb") as f:
            np.savez(f, **params)
        os.remove(tmp)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(
            "# Trained speculative-decoding pair\n\n"
            "Produced by `scripts/train_spec_pair.py` (CPU): target "
            f"{TARGET_CFG} and draft {DRAFT_CFG} trained on the "
            "deterministic permutation-successor task (fixed seed 7).\n\n"
            f"- target next-token accuracy: {acc_t:.4f}\n"
            f"- draft next-token accuracy: {acc_d:.4f}\n"
            f"- greedy agreement (acceptance ceiling): {agree:.4f}\n\n"
            "Used by `bench.py` (`speculative_decoding_trained`) to "
            "measure the best-case speculative speedup alongside the "
            "random-draft worst-case floor.\n"
        )
    print("saved", out_dir, flush=True)


if __name__ == "__main__":
    main()
