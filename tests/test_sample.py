"""models/_sample.py: the static picker (FlashLMServer.generate) and
the traced row picker (per-request scheduler knobs) must be the SAME
sampler — identical filtered logits, hence identical draws under one
key."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exprgrad_tpu.models._sample import make_picker, make_row_picker

VOCAB = 16


@pytest.mark.parametrize("temperature", [0.0, 0.7, 1.3])
@pytest.mark.parametrize("top_k", [None, 1, 4])
@pytest.mark.parametrize("top_p", [None, 0.6, 0.95])
def test_row_picker_equals_static_picker(temperature, top_k, top_p):
    rng = np.random.default_rng(hash((temperature, top_k, top_p)) % 2**31)
    b = 5
    logits = jnp.asarray(rng.standard_normal((b, VOCAB)) * 3,
                         jnp.float32)
    key = jax.random.PRNGKey(7)

    static = make_picker(VOCAB, temperature, top_k, top_p)(logits, key)
    row = make_row_picker(VOCAB)(
        logits, key,
        jnp.full((b,), temperature, jnp.float32),
        jnp.full((b,), VOCAB if top_k is None else top_k, jnp.int32),
        jnp.full((b,), 1.0 if top_p is None else top_p, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(static), np.asarray(row))


def test_row_picker_mixed_rows():
    """Different configs per row in ONE call match per-row static
    pickers under the same key."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, VOCAB)) * 2, jnp.float32)
    key = jax.random.PRNGKey(3)
    configs = [(0.0, None, None), (0.9, 1, None), (1.1, None, 0.7),
               (0.5, 6, 0.9)]
    got = make_row_picker(VOCAB)(
        logits, key,
        jnp.asarray([c[0] for c in configs], jnp.float32),
        jnp.asarray([VOCAB if c[1] is None else c[1] for c in configs],
                    jnp.int32),
        jnp.asarray([1.0 if c[2] is None else c[2] for c in configs],
                    jnp.float32),
    )
    # row-wise reference: the static picker on the full batch with that
    # row's config (the categorical draw for row i depends only on row
    # i's filtered logits and the shared key)
    for i, cfg in enumerate(configs):
        want = make_picker(VOCAB, *cfg)(logits, key)
        assert int(got[i]) == int(np.asarray(want)[i]), (i, cfg)
