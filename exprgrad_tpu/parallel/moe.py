"""Expert parallelism: a Switch-style mixture-of-experts layer.

The TPU-native MoE shape (reference has nothing comparable; this extends
the parallel story to ep alongside dp/tp/sp): top-1 routing with a fixed
per-expert capacity and DENSE dispatch/combine einsums — static shapes,
no data-dependent control flow, so XLA tiles everything onto the MXU and
inserts the cross-device collectives when the expert dimension of the
weights is sharded over a mesh axis (`shard_moe_params`).

Routing is differentiable Switch-style: the chosen expert's output is
scaled by its router probability, so the router learns through the gate;
dropped tokens (capacity overflow) pass through as zeros plus the
auxiliary load-balancing loss pushes the router toward uniform load.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEParams(NamedTuple):
    router: jax.Array   # [d, E]
    w1: jax.Array       # [E, d, hidden]
    b1: jax.Array       # [E, hidden]
    w2: jax.Array       # [E, hidden, d]
    b2: jax.Array       # [E, d]


def init_moe(rng: np.random.Generator, d: int, hidden: int, experts: int,
             scale: float = 0.1, dtype=jnp.float32) -> MoEParams:
    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale,
                           dtype)

    return MoEParams(
        router=mk(d, experts),
        w1=mk(experts, d, hidden),
        b1=jnp.zeros((experts, hidden), dtype),
        w2=mk(experts, hidden, d),
        b2=jnp.zeros((experts, d), dtype),
    )


def shard_moe_params(params: MoEParams, mesh: Mesh,
                     axis: str = "expert") -> MoEParams:
    """Place the expert-indexed tensors with their leading dim sharded
    over ``mesh[axis]``; the router replicates."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return MoEParams(
        router=put(params.router, P()),
        w1=put(params.w1, P(axis, None, None)),
        b1=put(params.b1, P(axis, None)),
        w2=put(params.w2, P(axis, None, None)),
        b2=put(params.b2, P(axis, None)),
    )


def moe_layer(x: jax.Array, params: MoEParams,
              capacity_factor: float = 1.25, top_k: int = 1):
    """x [n_tokens, d] -> (y [n_tokens, d], aux_loss scalar).

    Dense dispatch: tokens one-hot into [n, E, C] (expert, slot) and the
    expert FFNs run as batched matmuls over [E, C, ·] — sharding E over a
    mesh axis makes this expert-parallel with XLA-inserted collectives.

    ``top_k=1`` is Switch routing (gate = the chosen expert's softmax
    probability); ``top_k>1`` is Mixtral-style: each token dispatches to
    its k best experts and combines them with the top-k probabilities
    renormalized to sum to 1.  Capacity scales with k
    (``ceil(k*n/E * capacity_factor)`` slots per expert); overflowing
    assignments drop individually (a token can keep one expert and lose
    another).
    """
    n, d = x.shape
    e = params.router.shape[1]
    if not 1 <= top_k <= e:
        raise ValueError(f"top_k must be in [1, {e}] (got {top_k})")
    capacity = int(np.ceil(top_k * n / e * capacity_factor))

    logits = jnp.einsum("nd,de->ne", x, params.router,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                    # [n, E]
    top_p, top_i = jax.lax.top_k(probs, top_k)                 # [n, k]
    choice = jax.nn.one_hot(top_i, e, dtype=jnp.float32)       # [n, k, E]
    onehot = choice.sum(1)                                     # [n, E]
    # gate weight per (token, chosen expert); 0 elsewhere.  Switch (k=1)
    # keeps the RAW router probability (the router's gradient path);
    # Mixtral (k>1) renormalizes the top-k probabilities to sum to 1.
    weights = top_p if top_k == 1 else (
        top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    )
    gates = jnp.einsum("nk,nke->ne", weights, choice)          # [n, E]

    # slot of each assignment within its expert's queue (arrival order)
    pos = jnp.cumsum(onehot, axis=0) * onehot - onehot         # [n, E]
    keep = (pos < capacity) * onehot                           # [n, E]
    dispatch = keep[:, :, None] * jax.nn.one_hot(
        pos.astype(jnp.int32), capacity, dtype=jnp.float32
    )                                                          # [n, E, C]

    xin = jnp.einsum("nec,nd->ecd", dispatch, x.astype(jnp.float32))
    h = jnp.einsum("ecd,edh->ech", xin, params.w1.astype(jnp.float32))
    h = jax.nn.relu(h + params.b1[:, None, :].astype(jnp.float32))
    out = jnp.einsum("ech,ehd->ecd", h, params.w2.astype(jnp.float32))
    out = out + params.b2[:, None, :].astype(jnp.float32)

    combine = dispatch * gates[:, :, None]                     # [n, E, C]
    y = jnp.einsum("nec,ecd->nd", combine, out).astype(x.dtype)

    # Switch load-balancing loss: E * sum_e fraction_routed_e * mean_prob_e
    frac = onehot.mean(axis=0) / top_k
    mean_prob = probs.mean(axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return y, aux
