"""Stateful serving for trained tiny_recurrent_lm models.

Recurrent models are the cheapest thing a serving stack can host: the
entire decode state is the carried hidden (and cell) vector — O(hidden)
per sequence, no KV cache, no position bookkeeping, every step the same
thin fused matmuls.  This bridge pulls the trained parameters out of a
compiled :func:`tiny_recurrent_lm` model (matched by name like
FlashLMServer) and reproduces the scan extern's math exactly
(ops/recurrent.py): prefill runs one ``lax.scan`` over the prompt,
generation runs a second scan that feeds each argmax/sample back in —
the whole loop is one XLA program.

Greedy parity with the compiled model's "predict" target is
token-exact (tests/test_rnn_serve.py): recomputing from scratch and
carrying state are the same recurrence.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..errors import ModelRuntimeError

_CELL_GATES = {"lstm": 4, "gru": 3, "rnn_tanh": 1}


class _RLayer(NamedTuple):
    cell: str
    wx: object  # [in, gates*H]
    wh: object  # [H, gates*H]
    b: object   # [gates*H]


class RecurrentServer:
    """Incremental decoder over a trained tiny_recurrent_lm's weights.

    Parameters are matched by their (name, shape) sequence — ``embed``,
    per layer ``l{i}.<cell>.wx/.wh/.b``, then ``head.weights`` /
    ``head.bias`` — and validated; a mismatch raises instead of serving
    garbage."""

    def __init__(self, model):
        import jax.numpy as jnp

        self._jnp = jnp
        seq = [
            (model.program.tensors[tid].name,
             jnp.asarray(np.asarray(model.params[tid])))
            for tid in model.program.params
        ]

        def take(expected: str):
            if not seq or seq[0][0] != expected:
                got = seq[0][0] if seq else "<end>"
                raise ModelRuntimeError(
                    f"unexpected parameter {got!r} (wanted {expected!r}); "
                    "RecurrentServer serves models built by "
                    "tiny_recurrent_lm")
            return seq.pop(0)[1]

        self.embed = take("embed")           # [vocab, dim]
        self.vocab, self.dim = self.embed.shape
        self.layers: list[_RLayer] = []
        li = 0
        while seq and seq[0][0].startswith(f"l{li}."):
            cell = seq[0][0].split(".")[1]
            if cell not in _CELL_GATES:
                raise ModelRuntimeError(
                    f"unknown recurrent cell {cell!r} in parameter "
                    f"{seq[0][0]!r}")
            self.layers.append(_RLayer(
                cell=cell,
                wx=take(f"l{li}.{cell}.wx").astype(jnp.float32),
                wh=take(f"l{li}.{cell}.wh").astype(jnp.float32),
                b=take(f"l{li}.{cell}.b").astype(jnp.float32),
            ))
            li += 1
        if not self.layers:
            raise ModelRuntimeError(
                "no recurrent layers found; RecurrentServer serves "
                "models built by tiny_recurrent_lm")
        self.w_head = take("head.weights")
        self.b_head = take("head.bias")
        if seq:
            raise ModelRuntimeError(
                f"{len(seq)} unconsumed parameters (first: {seq[0][0]!r});"
                " RecurrentServer serves models built by tiny_recurrent_lm"
            )
        self.hidden = self.layers[0].wh.shape[0]
        self._jit_cache: dict = {}

    # -- state ----------------------------------------------------------
    def init_state(self, batch: int):
        """Per-layer carried state: (h, c) for lstm, h otherwise."""
        jnp = self._jnp
        state = []
        for lay in self.layers:
            h = jnp.zeros((batch, lay.wh.shape[0]), jnp.float32)
            state.append((h, jnp.zeros_like(h)) if lay.cell == "lstm"
                         else h)
        return state

    def _cell_step(self, lay: _RLayer, state, x):
        """One time step of one layer; mirrors ops/recurrent.py bit for
        bit (f32, same gate order)."""
        import jax
        jnp = self._jnp

        a_x = x @ lay.wx + lay.b
        if lay.cell == "lstm":
            h, c = state
            a = a_x + h @ lay.wh
            i, f, g, o = jnp.split(a, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2
        if lay.cell == "gru":
            h = state
            az, ar, an = jnp.split(a_x, 3, axis=-1)
            hz, hr, hn = jnp.split(h @ lay.wh, 3, axis=-1)
            z = jax.nn.sigmoid(az + hz)
            r = jax.nn.sigmoid(ar + hr)
            n = jnp.tanh(an + r * hn)
            h2 = (1.0 - z) * n + z * h
            return h2, h2
        h = state
        h2 = jnp.tanh(a_x + h @ lay.wh)
        return h2, h2

    def _step(self, state, tokens):
        """Advance all layers one token; returns (state, logits [b, V])."""
        jnp = self._jnp
        x = self.embed[tokens.astype(jnp.int32)].astype(jnp.float32)
        new_state = []
        for lay, st in zip(self.layers, state):
            st2, x = self._cell_step(lay, st, x)
            new_state.append(st2)
        logits = x @ self.w_head.astype(jnp.float32) + self.b_head.astype(
            jnp.float32)
        return new_state, logits

    # -- serving ----------------------------------------------------------
    def generate(self, prompt, n_new: int, temperature: float = 0.0,
                 seed: int = 0):
        """Greedy (or temperature-sampled) continuation.  ``prompt``
        [batch, t] token ids; returns [batch, n_new] int32.  One jitted
        prefill-scan + decode-scan program per (t, n_new) signature."""
        import jax

        jnp = self._jnp
        prompt = jnp.asarray(np.asarray(prompt, np.int32))
        if prompt.ndim != 2 or prompt.shape[1] < 1:
            raise ModelRuntimeError(
                f"prompt must be [batch, t>=1], got {prompt.shape}")
        if n_new < 1:
            raise ModelRuntimeError(f"n_new must be >= 1 (got {n_new})")
        b, t = prompt.shape
        key = (b, t, int(n_new), float(temperature))
        if key not in self._jit_cache:
            def run(prompt, rng):
                state = self.init_state(prompt.shape[0])

                def pre(state, tok):
                    state, logits = self._step(state, tok)
                    return state, logits

                state, logits = jax.lax.scan(
                    pre, state, jnp.swapaxes(prompt, 0, 1))
                last = logits[-1]

                def dec(carry, k):
                    state, last = carry
                    if temperature > 0.0:
                        nxt = jax.random.categorical(
                            k, last.astype(jnp.float32) / temperature,
                            axis=-1)
                    else:
                        nxt = jnp.argmax(last, axis=-1)
                    nxt = nxt.astype(jnp.int32)
                    state, last = self._step(state, nxt)
                    return (state, last), nxt

                _, toks = jax.lax.scan(
                    dec, (state, last), jax.random.split(rng, n_new))
                return jnp.swapaxes(toks, 0, 1)

            self._jit_cache[key] = jax.jit(run)
        import jax as _jax

        return self._jit_cache[key](prompt, _jax.random.PRNGKey(seed))
