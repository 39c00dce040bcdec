"""Shared speculative-decoding loop for the serving bridges.

One implementation of the propose/verify/accept/rewind round — greedy
acceptance (exact target-greedy output) and temperature rejection
sampling (exact target distribution, Leviathan et al.) — consumed by
FlashLMServer and Seq2SeqServer through step closures:

    draft_step(tokens [1, 1], dstate)  -> (logits [1, t, V], dstate)
    target_step(tokens [1, k], tstate) -> (logits [1, k, V], tstate)
    rewind(state, new_len)             -> state  (KV length rewind)
    length_of(state)                   -> traced int32 cache length
"""

from __future__ import annotations

from typing import Callable, Optional


def speculative_loop(
    draft_step: Callable,
    target_step: Callable,
    rewind: Callable,
    length_of: Callable,
    dstate,
    tstate,
    first,
    n_new: int,
    k: int,
    temperature: float,
    key0,
    propose_fn: Optional[Callable] = None,
):
    """Run speculative rounds until ``n_new`` tokens are emitted.

    ``first`` [1] int32 is the already-chosen first token (its K/V NOT
    yet appended to either state).  Returns ``(tokens [1, n_new] int32,
    target_steps int32)``.

    ``propose_fn(out, count, cur, key) -> props [k] int32`` replaces the
    draft-model scan with DRAFT-FREE proposals (prompt lookup etc.);
    ``draft_step`` / ``dstate`` are then unused (pass None) and greedy
    acceptance is required (deterministic proposals carry no draft
    distribution for the rejection scheme)."""
    import jax
    import jax.numpy as jnp

    sampled = temperature > 0.0
    if propose_fn is not None and sampled:
        raise ValueError("propose_fn requires greedy acceptance")
    if propose_fn is not None and dstate is None:
        dstate = jnp.int32(0)  # carry placeholder, never touched
    T = float(temperature) if sampled else 1.0
    buf_len = n_new + k

    out = jnp.zeros((buf_len,), jnp.int32)
    out = out.at[0].set(first[0])

    def cond(carry):
        _, count, *_ = carry
        return count < n_new

    def body(carry):
        out, count, cur, tstate, dstate, steps, key = carry
        key, kd, ka, kr = jax.random.split(key, 4)

        if propose_fn is not None:
            props = propose_fn(out, count, cur, kd)   # [k]
            qs = None
        else:
            def dstep(dcarry, dk):
                dst, tok = dcarry
                dlogits, dst = draft_step(tok[:, None], dst)
                row = dlogits[:, -1].astype(jnp.float32) / T
                if sampled:
                    nxt = jax.random.categorical(dk, row, axis=-1).astype(
                        jnp.int32
                    )
                else:
                    nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
                return (dst, nxt), (nxt, jax.nn.softmax(row, -1)[0])

            (dstate, _), (props, qs) = jax.lax.scan(
                dstep, (dstate, cur), jax.random.split(kd, k)
            )
            props = props[:, 0]                   # [k]

        len0 = length_of(tstate)
        seq_in = jnp.concatenate(
            [cur, props[: k - 1]]
        )[None, :].astype(jnp.float32)            # [1, k]
        vlogits, tstate = target_step(seq_in, tstate)

        if sampled:
            p = jax.nn.softmax(
                vlogits[0].astype(jnp.float32) / T, axis=-1
            )                                     # [k, V]
            j = jnp.arange(k)
            ratio = p[j, props] / jnp.maximum(qs[j, props], 1e-30)
            acc = jax.random.uniform(ka, (k,)) < ratio
            m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32))).astype(
                jnp.int32
            )
            row = jnp.minimum(m, k - 1)
            resid = jnp.maximum(p[row] - qs[row], 0.0)
            rs = jnp.sum(resid)
            resid = jnp.where(rs > 1e-30, resid / rs, p[row])
            last = jax.random.categorical(
                kr, jnp.log(jnp.maximum(resid, 1e-38))
            ).astype(jnp.int32)
        else:
            targets = jnp.argmax(vlogits[0], axis=-1).astype(jnp.int32)
            eq = props == targets
            m = jnp.sum(jnp.cumprod(eq.astype(jnp.int32))).astype(
                jnp.int32
            )
            last = targets[jnp.minimum(m, k - 1)]  # bonus

        n_emit = jnp.minimum(m + 1, k).astype(jnp.int32)
        cur_next = jnp.where(m == k, props[k - 1], last)[None]
        emit = props.at[jnp.minimum(m, k - 1)].set(
            jnp.where(m == k, props[k - 1], last)
        )
        out = jax.lax.dynamic_update_slice(out, emit, (count,))
        new_len = (len0 + n_emit).astype(jnp.int32)
        tstate = rewind(tstate, new_len)
        if propose_fn is None:
            dstate = rewind(dstate, new_len)
        return (out, (count + n_emit).astype(jnp.int32), cur_next,
                tstate, dstate, steps + jnp.int32(1), key)

    out, count, _, _, _, steps, _ = jax.lax.while_loop(
        cond, body,
        (out, jnp.int32(1), first, tstate, dstate, jnp.int32(0), key0),
    )
    return out[:n_new][None, :], steps


def check_spec_args(batch: int, target_vocab: int, draft_vocab: int,
                    k: int, n_new: int, error_cls):
    if batch != 1:
        raise error_cls(
            "speculative decoding serves one sequence at a time "
            f"(got batch {batch}); per-row acceptance lengths would "
            "make the batch ragged"
        )
    if draft_vocab != target_vocab:
        raise error_cls(
            f"draft vocab {draft_vocab} != target vocab {target_vocab}"
        )
    if k < 1:
        raise error_cls(f"k must be >= 1 (got {k})")
    if n_new < 1:
        raise error_cls(f"n_new must be >= 1 (got {n_new})")


__all__ = ["speculative_loop", "check_spec_args", "Optional"]
