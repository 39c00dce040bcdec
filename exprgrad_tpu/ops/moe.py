"""Mixture-of-experts FFN as an extern op (forward + backward).

The DSL-level MoE: ``layers.moe_ffn`` splices this op into user models
through the extern seam, so top-k routed expert FFNs get *symbolic
autodiff* gradients exactly like fused attention (the reference's layer
library has nothing comparable; its customGrad seam, parser.nim:568-589,
is the concept this generalizes).

Routing semantics (Mixtral-style top-k):

    probs   = softmax(x @ gate)                  # [n, t, E]
    idx     = top-k experts per token            # ties -> lowest index
    weight  = probs[idx] / sum_k probs[idx]      # renormalized
    out     = sum_j weight_j * FFN_{idx_j}(x)    # FFN = relu(x W1+b1) W2+b2

This single-device lowering computes all experts densely and combines
with the sparse routing mask — exact semantics, MXU-friendly einsums,
and XLA fuses the mask combine.  The *expert-parallel dispatch* layout
(tokens routed over a mesh axis) lives in parallel/moe.py and consumes
the same parameter shapes.

The numpy implementations keep the oracle interpreter jax-independent;
the numpy backward is a hand-derived vjp (checked against the jax one in
tests/test_moe_layer.py through both backends' training steps).
"""

from __future__ import annotations

import numpy as np

from ..registry import register_extern


def _k_of(attrs: dict) -> int:
    k = int(attrs.get("k", 1))
    if k < 1:
        raise ValueError(f"moe k must be >= 1, got {k}")
    return k


# --------------------------------------------------------------------------
# jax implementations
# --------------------------------------------------------------------------

def _jax_moe_fwd(x, gate, w1, b1, w2, b2, k: int):
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    logits = jnp.einsum("ntc,ce->nte", xf, gate.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, k)               # [n, t, k]
    weight = vals / jnp.sum(vals, axis=-1, keepdims=True)
    mask = jnp.zeros_like(probs).at[
        jnp.arange(x.shape[0])[:, None, None],
        jnp.arange(x.shape[1])[None, :, None],
        idx,
    ].add(weight)                                      # [n, t, E]
    h = jnp.maximum(
        jnp.einsum("ntc,ech->nteh", xf, w1.astype(jnp.float32))
        + b1.astype(jnp.float32),
        0.0,
    )                                                  # [n, t, E, H]
    y = jnp.einsum("nteh,ehd->nted", h, w2.astype(jnp.float32)) \
        + b2.astype(jnp.float32)                       # [n, t, E, d]
    out = jnp.einsum("nte,nted->ntd", mask, y)
    return out.astype(x.dtype)


def _jax_moe(args, attrs, ctx):
    x, gate, w1, b1, w2, b2 = args
    return _jax_moe_fwd(x, gate, w1, b1, w2, b2, _k_of(attrs))


def _jax_moe_grad(args, attrs, ctx):
    import jax

    x, gate, w1, b1, w2, b2, g = args
    k = _k_of(attrs)

    def f(x, gate, w1, b1, w2, b2):
        return _jax_moe_fwd(x, gate, w1, b1, w2, b2, k)

    _, vjp = jax.vjp(f, x, gate, w1, b1, w2, b2)
    return tuple(vjp(g.astype(x.dtype)))


# --------------------------------------------------------------------------
# numpy oracle implementations
# --------------------------------------------------------------------------

def _np_routing(x, gate, k: int):
    """(probs, idx, weight, mask) in f64; ties resolve to the lowest
    expert index (matches jax.lax.top_k)."""
    logits = np.einsum("ntc,ce->nte", x, gate, dtype=np.float64)
    m = logits.max(axis=-1, keepdims=True)
    p = np.exp(logits - m)
    probs = p / p.sum(axis=-1, keepdims=True)
    order = np.argsort(-probs, axis=-1, kind="stable")
    idx = order[..., :k]
    vals = np.take_along_axis(probs, idx, axis=-1)
    weight = vals / vals.sum(axis=-1, keepdims=True)
    mask = np.zeros_like(probs)
    np.put_along_axis(mask, idx, weight, axis=-1)
    return probs, idx, weight, mask


def _np_expert_forward(x, w1, b1, w2, b2):
    h_pre = np.einsum("ntc,ech->nteh", x, w1, dtype=np.float64) + b1
    h = np.maximum(h_pre, 0.0)
    y = np.einsum("nteh,ehd->nted", h, w2, dtype=np.float64) + b2
    return h_pre, h, y


def _np_moe(args, attrs):
    x, gate, w1, b1, w2, b2 = args
    k = _k_of(attrs)
    x64 = x.astype(np.float64)
    _, _, _, mask = _np_routing(x64, gate.astype(np.float64), k)
    _, _, y = _np_expert_forward(
        x64, w1.astype(np.float64), b1.astype(np.float64),
        w2.astype(np.float64), b2.astype(np.float64),
    )
    out = np.einsum("nte,nted->ntd", mask, y)
    return out.astype(x.dtype)


def _np_moe_grad(args, attrs):
    x, gate, w1, b1, w2, b2, g = args
    k = _k_of(attrs)
    x64 = x.astype(np.float64)
    gate64 = gate.astype(np.float64)
    w1_64, b1_64 = w1.astype(np.float64), b1.astype(np.float64)
    w2_64, b2_64 = w2.astype(np.float64), b2.astype(np.float64)
    g64 = g.astype(np.float64)

    probs, idx, weight, mask = _np_routing(x64, gate64, k)
    h_pre, h, y = _np_expert_forward(x64, w1_64, b1_64, w2_64, b2_64)

    # expert path: out = mask . y
    dmask = np.einsum("ntd,nted->nte", g64, y)
    dy = mask[..., None] * g64[:, :, None, :]          # [n, t, E, d]
    dw2 = np.einsum("nteh,nted->ehd", h, dy)
    db2 = dy.sum(axis=(0, 1))
    dh = np.einsum("nted,ehd->nteh", dy, w2_64) * (h_pre > 0)
    dw1 = np.einsum("ntc,nteh->ech", x64, dh)
    db1 = dh.sum(axis=(0, 1))
    dx = np.einsum("nteh,ech->ntc", dh, w1_64)

    # routing path: weight = vals / sum(vals); probs = softmax(logits)
    dweight = np.take_along_axis(dmask, idx, axis=-1)  # [n, t, k]
    s = np.take_along_axis(probs, idx, axis=-1).sum(axis=-1, keepdims=True)
    dvals = (dweight - (dweight * weight).sum(axis=-1, keepdims=True)) / s
    dprobs = np.zeros_like(probs)
    np.put_along_axis(dprobs, idx, dvals, axis=-1)
    dlogits = probs * (
        dprobs - (dprobs * probs).sum(axis=-1, keepdims=True)
    )
    dgate = np.einsum("ntc,nte->ce", x64, dlogits)
    dx = dx + np.einsum("nte,ce->ntc", dlogits, gate64)

    return (
        dx.astype(x.dtype),
        dgate.astype(gate.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


register_extern("moe", 1, _jax_moe, _np_moe)
register_extern("moe_grad", 6, _jax_moe_grad, _np_moe_grad)
