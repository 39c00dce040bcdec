"""Built-in extern ops: fused attention (forward + backward).

Registers the "attention" / "attention_grad" extern pair used by
``layers.attention`` — the bridge between the kernel DSL and the Pallas
flash-attention kernels (ops/attention.py), spliced into user models
through the symbolic-autodiff custom_grad seam (the TPU whole-op analog
of the reference's customGrad, parser.nim:568-589).

Both ops carry two implementations behind an ``impl`` attribute:

* ``"flash"`` — the Pallas kernels (never materialize the [sq, skv]
  weight matrix in HBM; interpret mode off-TPU).
* ``"xla"``   — plain XLA einsum attention (materializes the weights;
  XLA fuses it with neighbors inside the one-jit target).
* ``"auto"``  — routed per shape by the measured cost model
  (backend.policy.SchedulePolicy.attention), falling back to "xla" when
  the sequence lengths don't satisfy the flash kernels' block
  divisibility.

The numpy implementations keep the oracle interpreter fully independent
of jax.  Both backends return the same (out, logsumexp) pair so forward
impl and backward impl may be chosen independently.
"""

from __future__ import annotations

import numpy as np

from ..registry import register_extern

_NEG_INF = -1e30


def _scale(attrs: dict, d: int) -> float:
    scale = float(attrs.get("scale", 0.0))
    return scale if scale > 0.0 else 1.0 / float(np.sqrt(d))


def _window(attrs: dict):
    """Sliding-window size; attr 0 (the serializable encoding) = None."""
    w = int(attrs.get("window", 0))
    return w if w > 0 else None


def _flash_ok(sq: int, skv: int) -> bool:
    """Do the shapes satisfy the flash kernels' block divisibility?"""
    return sq % min(128, sq) == 0 and skv % min(128, skv) == 0


def _pick_impl(attrs: dict, shapes, ctx) -> str:
    impl = attrs.get("impl", "auto")
    if impl != "auto":
        return impl
    b, h, sq, d = shapes[0]
    skv = shapes[1][2]
    if not _flash_ok(sq, skv):
        return "xla"
    policy = getattr(ctx, "policy", None)
    if policy is None:
        from ..backend.policy import SchedulePolicy

        policy = SchedulePolicy("auto")
    return "flash" if policy.attention(b, h, sq, skv, d).use_pallas else "xla"


# --------------------------------------------------------------------------
# jax implementations
# --------------------------------------------------------------------------

def _jax_xla_forward(q, k, v, scale, causal, window=None):
    """Plain-XLA attention returning (out, lse[b*h, sq]); GQA-aware."""
    import jax
    import jax.numpy as jnp

    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=1)
        v = jnp.repeat(v, h // hkv, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal or window is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        keep = rows >= cols if causal else (rows == rows)
        if window is not None:
            keep = jnp.logical_and(keep, cols > rows - window)
        s = jnp.where(keep, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p / l, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    lse = (m + jnp.log(l))[..., 0].reshape(b * h, sq)
    return out.astype(q.dtype), lse


def _jax_attention(args, attrs, ctx):
    q, k, v = args
    scale = _scale(attrs, q.shape[-1])
    causal = bool(attrs.get("causal", False))
    window = _window(attrs)
    impl = _pick_impl(attrs, [a.shape for a in args], ctx)
    if ctx is not None:
        ctx.record(f"attention-impl:{impl}")
    if impl == "flash":
        from .attention import flash_attention_forward

        return flash_attention_forward(q, k, v, scale, causal,
                                       window=window)
    return _jax_xla_forward(q, k, v, scale, causal, window)


def _jax_attention_grad(args, attrs, ctx):
    q, k, v, out, lse, g = args
    scale = _scale(attrs, q.shape[-1])
    causal = bool(attrs.get("causal", False))
    window = _window(attrs)
    impl = _pick_impl(attrs, [a.shape for a in args[:3]], ctx)
    if ctx is not None:
        ctx.record(f"attention-grad-impl:{impl}")
    if impl == "flash":
        from .attention import flash_attention_backward

        return flash_attention_backward(q, k, v, out, lse, g, scale, causal,
                                        window=window)

    import jax.numpy as jnp

    from .attention import xla_attention_vjp

    h, hkv = q.shape[1], k.shape[1]
    if hkv != h:  # GQA: expand, differentiate, reduce over the group
        group = h // hkv
        ke = jnp.repeat(k, group, axis=1)
        ve = jnp.repeat(v, group, axis=1)
        dq, dke, dve = xla_attention_vjp(q, ke, ve, g, scale, causal,
                                         window)
        b, _, skv, d = k.shape
        dk = dke.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv = dve.reshape(b, hkv, group, skv, d).sum(axis=2)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)
    return xla_attention_vjp(q, k, v, g, scale, causal, window)


# --------------------------------------------------------------------------
# numpy oracle implementations
# --------------------------------------------------------------------------

def _np_weights(q, k, scale, causal, window=None):
    """(p, lse): softmax weights and logsumexp, f64 for oracle accuracy."""
    s = np.einsum("bhqd,bhkd->bhqk", q, k, dtype=np.float64) * scale
    if causal or window is not None:
        sq, skv = s.shape[-2], s.shape[-1]
        rows = np.arange(sq)[:, None]
        cols = np.arange(skv)[None, :]
        mask = rows >= cols if causal else np.ones((sq, skv), bool)
        if window is not None:
            mask = mask & (cols > rows - window)
        s = np.where(mask, s, _NEG_INF)
    m = np.max(s, axis=-1, keepdims=True)
    p = np.exp(s - m)
    l = np.sum(p, axis=-1, keepdims=True)
    return p / l, (m + np.log(l))[..., 0]


def _np_expand(q, k, v):
    h, hkv = q.shape[1], k.shape[1]
    if hkv != h:
        k = np.repeat(k, h // hkv, axis=1)
        v = np.repeat(v, h // hkv, axis=1)
    return k, v


def _np_attention(args, attrs):
    q, k, v = args
    scale = _scale(attrs, q.shape[-1])
    causal = bool(attrs.get("causal", False))
    ke, ve = _np_expand(q, k, v)
    p, lse = _np_weights(q, ke, scale, causal, _window(attrs))
    out = np.einsum("bhqk,bhkd->bhqd", p, ve, dtype=np.float64)
    b, h, sq, _ = q.shape
    return out.astype(q.dtype), lse.reshape(b * h, sq).astype(np.float32)


def _np_attention_grad(args, attrs):
    q, k, v, out, lse, g = args
    scale = _scale(attrs, q.shape[-1])
    causal = bool(attrs.get("causal", False))
    ke, ve = _np_expand(q, k, v)
    p, _ = _np_weights(q, ke, scale, causal, _window(attrs))
    g64 = g.astype(np.float64)
    dv = np.einsum("bhqk,bhqd->bhkd", p, g64)
    dp = np.einsum("bhqd,bhkd->bhqk", g64, ve.astype(np.float64))
    row = np.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale
    dq = np.einsum("bhqk,bhkd->bhqd", ds, ke.astype(np.float64))
    dk = np.einsum("bhqk,bhqd->bhkd", ds, q.astype(np.float64))
    h, hkv = q.shape[1], k.shape[1]
    if hkv != h:
        group = h // hkv
        b, _, skv, d = k.shape
        dk = dk.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, skv, d).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


register_extern("attention", 2, _jax_attention, _np_attention)
register_extern("attention_grad", 3, _jax_attention_grad, _np_attention_grad)

from . import moe as _moe  # noqa: E402,F401  (registers moe/moe_grad)
from . import recurrent as _recurrent  # noqa: E402,F401  (lstm/gru/rnn)
