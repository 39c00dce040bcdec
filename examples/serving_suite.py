"""The production serving path, end to end.

Train a flash_transformer in the DSL (symbolic autodiff, one-jit train
program), then serve it through every FlashLMServer mode:

* greedy + temperature / top-k / top-p sampling
* ragged batches (per-sequence lengths) and prompt-width buckets
  (one traced program per bucket, greedy bit-equal)
* beam search with in-scan KV-cache reordering
* int8-quantized KV cache (~3x less cache HBM, greedy agreement)
* speculative decoding: a small draft proposes, the target verifies —
  output exactly equals the target's own greedy sequence with a
  fraction of the verify steps
"""

import numpy as np

import jax.numpy as jnp

from exprgrad_tpu import compile, one_hot
from exprgrad_tpu.models import FlashLMServer, flash_transformer

VOCAB, SEQ, BATCH = 8, 8, 32
STEPS = 150


def batch(rng):
    phase = rng.integers(0, VOCAB, BATCH)
    toks = (phase[:, None] + np.arange(SEQ)[None, :]) % VOCAB
    labels = (toks + 1) % VOCAB
    return (
        toks.astype(np.float32),
        one_hot(labels, VOCAB).reshape(BATCH, SEQ, VOCAB),
    )


def main() -> None:
    rng = np.random.default_rng(0)
    model = compile(
        flash_transformer(vocab=VOCAB, dim=32, heads=2, hidden=64,
                          blocks=2, max_seq=64, eta=0.02),
        seed=0,
    )
    for _ in range(STEPS):
        model.epoch += 1
        toks, labels = batch(rng)
        model.apply("train", {"tokens": toks, "labels": labels})
    print("trained:", model.summary().splitlines()[0])

    server = FlashLMServer(model)
    server.set_prompt_buckets("pow2")
    prompt = np.asarray([[1, 2, 3]], np.float32)
    greedy = np.asarray(server.generate(prompt, n_new=10))
    print("greedy      :", greedy[0].tolist())
    sampled = np.asarray(server.generate(prompt, n_new=10, temperature=0.8,
                                         top_p=0.9, seed=1))
    print("top-p 0.9   :", sampled[0].tolist())

    beams, scores = server.generate_beam(prompt, n_new=10, beams=3)
    print("beam best   :", np.asarray(beams)[0, 0].tolist(),
          f"(logp {float(np.asarray(scores)[0, 0]):.2f})")

    # ragged: two prompts of different lengths in one call
    ragged = np.zeros((2, 4), np.float32)
    ragged[0, :4] = [1, 2, 3, 4]
    ragged[1, :2] = [5, 6]
    out = np.asarray(server.generate(ragged, n_new=6, lengths=[4, 2]))
    print("ragged      :", out.tolist())

    # int8 KV cache: greedy agreement at ~3x less cache HBM
    q8 = FlashLMServer(model, cache_dtype=jnp.int8)
    q8_out = np.asarray(q8.generate(prompt, n_new=10))
    print("int8 agrees :", bool(np.array_equal(q8_out, greedy)))

    # speculative: a dim-8 draft proposes 4 tokens per verify step
    draft = FlashLMServer(compile(
        flash_transformer(vocab=VOCAB, dim=8, heads=2, hidden=16,
                          max_seq=64, eta=0.05),
        seed=1,
    ))
    spec, steps = server.generate_speculative(draft, prompt, n_new=10, k=4)
    print("speculative :", np.asarray(spec)[0].tolist(),
          f"({int(steps)} verify steps, exact="
          f"{bool(np.array_equal(np.asarray(spec), greedy))})")

    # W8A16: int8 weights (per-output-channel scales) + int8 KV cache —
    # the fully-quantized deployment config
    w8 = FlashLMServer(model, weight_dtype=jnp.int8, cache_dtype=jnp.int8)
    w8_out = np.asarray(w8.generate(prompt, n_new=10))
    print("w8a16 agrees:", bool(np.array_equal(w8_out, greedy)))

    # continuous batching + paged KV cache + prefix caching: the
    # production scheduler — requests of any length admit into slots of
    # a shared page pool the moment one frees; a pinned system prompt
    # is prefilled once and shared read-only by every matching request
    from exprgrad_tpu.models import ContinuousBatcher

    system = np.asarray([7, 6, 5, 4, 3, 2, 1, 0], np.float32)
    cb = ContinuousBatcher(server, slots=2, capacity=64, paged=True,
                           page_size=8, pool_pages=12)
    cb.register_prefix(system)
    reqs = {
        cb.submit(np.concatenate([system, [1, 2, 3]]), max_new=8): "chat0",
        cb.submit(np.concatenate([system, [5, 6]]), max_new=6): "chat1",
        cb.submit([2, 4, 6], max_new=10): "plain",
    }
    results = cb.run()
    for rid, name in reqs.items():
        print(f"batched {name} :", results[rid].tolist())
    print("scheduler   :", cb.stats)

    # speculative continuous batching: the draft proposes 4 tokens per
    # slot per dispatch, the target verifies them in one forward —
    # streams stay bit-equal to solo greedy
    sb = ContinuousBatcher(server, slots=2, capacity=64, draft=draft,
                           spec_k=4, stream_tokens=True)
    srid = sb.submit(np.asarray([1, 2, 3], np.float32), max_new=10)
    streamed = []
    while True:
        fin = sb.step()
        streamed += [t for r, t in sb.drain_tokens() if r == srid]
        if fin:
            break
    print("spec batched:", streamed,
          f"(== greedy: {streamed == greedy[0].tolist()}; "
          f"{sb.stats['spec_emitted']} tokens in "
          f"{sb.stats['spec_rounds']} verify dispatches)")

    # prompt-lookup speculation, solo AND batched: DRAFT-FREE — each
    # round proposes the k tokens that followed the last-ngram's most
    # recent earlier occurrence in the history, then one k-wide verify;
    # output is always exact greedy
    lk, lk_steps = server.generate_lookup(prompt, n_new=10, k=4)
    print("lookup solo :", np.asarray(lk)[0].tolist(),
          f"({int(lk_steps)} verify steps, exact="
          f"{bool(np.array_equal(np.asarray(lk), greedy))})")
    lb = ContinuousBatcher(server, slots=2, capacity=64, lookup=True,
                           spec_k=4)
    lrid = lb.submit(np.asarray([1, 2, 3], np.float32), max_new=10)
    lout = lb.run()[lrid]
    print("lookup batch:", lout.tolist(),
          f"(== greedy: {lout.tolist() == greedy[0].tolist()}; "
          f"{lb.stats['spec_emitted']} tokens in "
          f"{lb.stats['spec_rounds']} verify dispatches)")

    # multi-device: tensor-parallel weights + dp batches when the host
    # exposes a mesh (8 virtual devices under tests/conftest.py)
    import jax

    if len(jax.devices()) >= 8:
        from exprgrad_tpu.parallel import make_mesh

        tp = FlashLMServer(model, mesh=make_mesh(8, model=2))
        tp_out = np.asarray(tp.generate(prompt, n_new=10))
        print("tp serving  :", bool(np.array_equal(tp_out, greedy)),
              "(attention by head, FFN by column/row, head by vocab)")


if __name__ == "__main__":
    main()
