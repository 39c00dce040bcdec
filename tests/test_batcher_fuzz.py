"""Property fuzz for the serving scheduler: random request mixes,
random scheduler configs (paged/chunked/prefixed/tight pools), random
interleaving of submits and steps — EVERY greedy stream must equal solo
serving, and every page must return to the pool.

The scheduler is a pile of interacting policies (admission waiting,
preemption, prefix pinning, chunk fences); this is the net that catches
the interactions the directed tests don't."""

import numpy as np
import pytest

import exprgrad_tpu as eg
from exprgrad_tpu.models import (
    ContinuousBatcher,
    FlashLMServer,
    flash_transformer,
)

VOCAB = 32


@pytest.fixture(scope="module")
def draft_server():
    model = eg.compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, max_seq=96),
        backend="jax", seed=1,
    )
    rng = np.random.default_rng(1)
    toks = rng.integers(0, VOCAB, (4, 24)).astype(np.float32)
    labels = eg.one_hot(rng.integers(0, VOCAB, 96), VOCAB).reshape(
        4, 24, VOCAB)
    for _ in range(2):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return FlashLMServer(model)


@pytest.fixture(scope="module")
def window_server():
    model = eg.compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, max_seq=96,
                          window=8),
        backend="jax", seed=2,
    )
    rng = np.random.default_rng(2)
    toks = rng.integers(0, VOCAB, (4, 24)).astype(np.float32)
    labels = eg.one_hot(rng.integers(0, VOCAB, 96), VOCAB).reshape(
        4, 24, VOCAB)
    for _ in range(2):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return FlashLMServer(model)


@pytest.fixture(scope="module")
def server():
    model = eg.compile(
        flash_transformer(vocab=VOCAB, dim=16, heads=2, max_seq=96),
        backend="jax", seed=0,
    )
    rng = np.random.default_rng(0)
    toks = rng.integers(0, VOCAB, (4, 24)).astype(np.float32)
    labels = eg.one_hot(rng.integers(0, VOCAB, 96), VOCAB).reshape(
        4, 24, VOCAB)
    for _ in range(3):
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    return FlashLMServer(model)


def run_one(server, seed, draft=None, force_flash=False, lookup=False):
    rng = np.random.default_rng(seed)
    slots = int(rng.integers(1, 4))
    capacity = 96
    paged = force_flash or bool(rng.integers(0, 2))
    kw = {}
    spec = draft is not None and bool(rng.integers(0, 2))
    if lookup:
        # draft-free prompt-lookup speculation: same margins and
        # exclusions as draft mode (spec gates the decode_chunk and
        # per-request-override branches below)
        spec = True
        kw["lookup"] = True
        kw["spec_k"] = int(rng.integers(1, 5))
        kw["lookup_ngram"] = int(rng.integers(1, 4))
    elif spec:
        kw["draft"] = draft
        kw["spec_k"] = int(rng.integers(1, 5))
    if paged:
        page_size = int(rng.choice([8, 16] if force_flash
                                   else [4, 8, 16]))
        pages_per_slot = -(-capacity // page_size)
        dense_pages = slots * pages_per_slot
        kw.update(
            paged=True, page_size=page_size,
            pool_pages=int(rng.integers(
                max(4, pages_per_slot), dense_pages + 1)),
        )
        if rng.integers(0, 2):
            kw["prefill_chunk"] = page_size * int(rng.integers(1, 4))
        if page_size % 8 == 0 and (force_flash or rng.integers(0, 2)):
            # Pallas paged-attention kernel path (interpret mode on CPU)
            kw["attention"] = "flash"
    if not spec and rng.integers(0, 2):
        kw["decode_chunk"] = int(rng.integers(2, 6))
        if rng.integers(0, 2):
            # pipelined chunk dispatches: greedy streams must stay
            # bit-equal and the end-of-run page-leak check must hold
            # through quarantined releases
            kw["pipeline"] = int(rng.integers(1, 4))
    b = ContinuousBatcher(server, slots=slots, capacity=capacity, **kw)

    system = None
    if paged and rng.integers(0, 2):
        system = rng.integers(0, VOCAB, int(rng.integers(
            kw["page_size"], 3 * kw["page_size"] + 1))).astype(np.float32)
        try:
            cached = b.register_prefix(system)
            system = system[:cached]
        except Exception:
            system = None  # pool too small to pin: fine, skip

    n_req = int(rng.integers(2, 7))
    reqs = []
    for _ in range(n_req):
        base = rng.integers(0, VOCAB, int(rng.integers(1, 30))).astype(
            np.float32)
        if system is not None and rng.integers(0, 2):
            base = np.concatenate([system, base])
        max_new = int(rng.integers(1, 12))
        margin = kw.get("spec_k", 0)
        need = base.size + max_new - 1 + margin
        if need > capacity:
            base = base[:capacity - max_new + 1 - margin]
        reqs.append((base, max_new))

    solo = [np.asarray(server.generate(p[None], n_new=mn))[0]
            for p, mn in reqs]

    out, rids, i = {}, [], 0
    while len(out) < n_req:
        # random interleaving of submits and steps; some requests carry
        # per-request sampling overrides that stay greedy-deterministic
        # (top_k=1 == argmax at any temperature), keeping the solo
        # oracle exact while the traced-params path is exercised
        while i < n_req and rng.integers(0, 2):
            kw_req = {}
            if not spec and rng.integers(0, 2):
                kw_req = dict(temperature=float(rng.uniform(0.2, 1.5)),
                              top_k=1)
            try:
                rids.append(b.submit(reqs[i][0], reqs[i][1], **kw_req))
            except Exception:
                # infeasible under this pool/pin config: drop the
                # request from the oracle set
                reqs.pop(i)
                solo.pop(i)
                n_req -= 1
                continue
            i += 1
        if i < n_req and not rids and not out:
            continue  # must submit something first
        for rid, toks in b.step():
            out[rid] = toks
        if i >= n_req and not (b.queue or b.active.any()
                               or any(r is not None for r in b._req)):
            break

    assert len(out) == len(rids) == n_req
    for rid, (ref, (_, mn)) in zip(rids, zip(solo, reqs)):
        np.testing.assert_array_equal(
            out[rid], ref.astype(np.int64),
            err_msg=f"seed={seed} rid={rid} config={kw}",
        )
    if paged:
        pinned = b._pinned_total()
        assert len(b.free_pages) == b.pool_pages - pinned, (
            f"seed={seed}: page leak ({len(b.free_pages)} free, "
            f"{b.pool_pages} pool, {pinned} pinned)"
        )


@pytest.mark.parametrize("seed", range(8))
def test_scheduler_fuzz(server, seed):
    run_one(server, seed)


@pytest.mark.parametrize("seed", range(200, 205))
def test_scheduler_fuzz_speculative(server, draft_server, seed):
    run_one(server, seed, draft=draft_server)


@pytest.mark.parametrize("seed", range(400, 405))
def test_scheduler_fuzz_windowed(window_server, seed):
    """Window models: band eviction, chunked window admission, tight
    pools — every stream still equals solo serving."""
    run_one(window_server, seed)


@pytest.mark.parametrize("seed", range(600, 604))
def test_scheduler_fuzz_flash_attention(server, seed):
    """Force the Pallas paged-attention kernel under the random config
    mix (pools, prefixes, chunked decode/prefill, preemption); streams
    still equal solo serving."""
    run_one(server, seed, force_flash=True)


@pytest.mark.parametrize("seed", range(800, 805))
def test_scheduler_fuzz_lookup(server, seed):
    """Draft-free prompt-lookup speculation under the random config
    mix (paged pools, prefixes, tight pools, preemption): every greedy
    stream equals solo serving, every page returns."""
    run_one(server, seed, lookup=True)


@pytest.mark.parametrize("seed", range(900, 903))
def test_scheduler_fuzz_lookup_windowed(window_server, seed):
    """Lookup speculation on sliding-window models: the spec margin
    composes with band page eviction."""
    run_one(window_server, seed, lookup=True)
