"""Byte-level BPE tokenizer (io/tokenizer.py)."""

import numpy as np
import pytest

from exprgrad_tpu.errors import ModelRuntimeError
from exprgrad_tpu.io import BPETokenizer

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the quicker they come, the quicker they go! "
    "pack my box with five dozen liquor jugs; 1234 5678 1234. "
) * 20


def test_round_trip_any_text():
    tok = BPETokenizer.train(CORPUS, vocab_size=400)
    for text in (
        CORPUS[:100],
        "completely unseen words: zxqj vwpk!!",
        "unicode survives: héllo wörld — ça va? 日本語 🙂",
        "",
        "   \n\t  mixed   whitespace\n\n",
    ):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert ids.dtype == np.float32
        if ids.size:
            assert ids.min() >= 0 and ids.max() < tok.vocab_size


def test_merges_compress_the_training_corpus():
    tok = BPETokenizer.train(CORPUS, vocab_size=400)
    base = len(CORPUS.encode("utf-8"))
    n = tok.encode(CORPUS).size
    assert tok.vocab_size > 256  # merges were actually learned
    assert n < 0.6 * base, (n, base)  # real compression on the corpus
    # frequent words become few tokens
    assert tok.encode(" the").size <= 2


def test_training_is_deterministic():
    a = BPETokenizer.train(CORPUS, vocab_size=350)
    b = BPETokenizer.train(CORPUS, vocab_size=350)
    assert a.merges == b.merges


def test_save_load_round_trip(tmp_path):
    tok = BPETokenizer.train(CORPUS, vocab_size=330)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    loaded = BPETokenizer.load(p)
    assert loaded.merges == tok.merges
    text = "the quick brown fox"
    np.testing.assert_array_equal(loaded.encode(text), tok.encode(text))
    with pytest.raises(ModelRuntimeError, match="not a saved"):
        bad = str(tmp_path / "bad.json")
        open(bad, "w").write("{}")
        BPETokenizer.load(bad)


def test_validation():
    with pytest.raises(ModelRuntimeError, match="vocab_size"):
        BPETokenizer.train("abc", vocab_size=100)
    with pytest.raises(ModelRuntimeError, match="undefined token"):
        BPETokenizer([(9999, 0)])


def test_lm_pipeline_end_to_end():
    """Text -> tokenizer -> flash_transformer training -> server ->
    decoded text: the full LM loop on real characters."""
    import exprgrad_tpu as eg
    from exprgrad_tpu.models import FlashLMServer, flash_transformer

    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    ids = tok.encode(CORPUS)
    model = eg.compile(
        flash_transformer(vocab=tok.vocab_size, dim=32, heads=2,
                          max_seq=64),
        backend="jax", seed=0,
    )
    seq, batchn = 24, 8
    rng = np.random.default_rng(0)
    for _ in range(30):
        starts = rng.integers(0, ids.size - seq - 1, batchn)
        toks = np.stack([ids[s:s + seq] for s in starts])
        labels = eg.one_hot(
            np.stack([ids[s + 1:s + seq + 1] for s in starts]).astype(int)
            .reshape(-1), tok.vocab_size,
        ).reshape(batchn, seq, tok.vocab_size)
        model.epoch += 1
        model.apply("train", {"tokens": toks, "labels": labels})
    srv = FlashLMServer(model)
    prompt = tok.encode("the quick")
    out = np.asarray(srv.generate(prompt[None], n_new=8))[0]
    text = tok.decode(out)
    assert isinstance(text, str) and len(text) > 0


def test_native_encode_matches_python():
    """The C++ merge loop (native/egtpu_native.cpp) is bit-exact with
    the Python reference loop, including multi-byte utf-8 and empty
    input; falls back silently when the library is absent."""
    import numpy as np

    from exprgrad_tpu.io.tokenizer import _SPLIT, BPETokenizer
    from exprgrad_tpu.utils.native import have_native

    text = ("the quick brown fox — naïve café über 123 !!! \n" * 20
            + "tokenizers tokenize tokens repeatedly " * 10)
    tok = BPETokenizer.train(text, vocab_size=400)
    fast = tok.encode(text, dtype=np.int64)
    slow = []
    for c in _SPLIT.findall(text):
        slow.extend(tok._encode_chunk(c.encode("utf-8")))
    assert np.array_equal(fast, np.asarray(slow))
    assert tok.decode(fast) == text
    assert tok.encode("").size == 0
    if not have_native():  # toolchain-less host: fallback exercised above
        import pytest

        pytest.skip("native library unavailable (fallback verified)")
