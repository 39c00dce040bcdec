"""Shared paged-decode measurement harness (bench.py + scripts/flash_sweep.py).

HARNESS HONESTY (VERDICT r4 #6 root cause): the timing chain must be a
``fori_loop`` whose carry includes the KV POOL, with every step writing
one fresh token's K/V into it — exactly what real decode does.  Without
the loop-carried write XLA hoists/CSEs ``gather_view(pool, table)`` out
of the chain and the "gather baseline" gathers ONCE for the whole chain,
a regime no serving step ever sees.  This subtlety lived in two nearly
identical copies (bench.bench_paged_attention and flash_sweep's paged
section — r5 review finding); ONE copy lives here now.

``chain`` steps in one compiled program also shrink the tunnel-RTT floor
per step to ~rtt/chain, so the numbers resolve the kernel body.
"""

from __future__ import annotations

import time

import numpy as np


def paged_setup(b=8, hkv=8, group=1, d=128, page=128, pages_per_row=16,
                seed=0):
    """Pool/table/positions/query for the paged-decode bench shape.

    Every row attends one fresh query against ``pages_per_row * page``
    resident cache tokens (bf16 pool); page 0 is the never-referenced
    scratch page the chain writes into.  Returns
    (pool, table, key_pos, q_pos, q0, resident_tokens)."""
    import jax.numpy as jnp

    from exprgrad_tpu.ops.paged import init_pool

    h = hkv * group
    resident = pages_per_row * page
    rng = np.random.default_rng(seed)
    pool = init_pool(b * pages_per_row + 1, hkv, page, d,
                     dtype=jnp.bfloat16)
    pool = pool._replace(
        k=jnp.asarray(rng.normal(size=pool.k.shape) * 0.1, pool.k.dtype),
        v=jnp.asarray(rng.normal(size=pool.v.shape) * 0.1, pool.v.dtype),
    )
    table = jnp.asarray(
        1 + np.arange(b * pages_per_row, dtype=np.int32).reshape(
            b, pages_per_row))
    key_pos = jnp.asarray(np.broadcast_to(
        np.arange(resident, dtype=np.int32), (b, resident)))
    q_pos = jnp.full((b, 1), resident - 1, jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    return pool, table, key_pos, q_pos, q0, resident


def time_paged_step(step, q0, pool, *, hkv, page, chain=128, reps=2):
    """Per-decode-step seconds for ``step(q, pool_k, pool_v) -> out``
    through the loop-carried-pool fori_loop chain (see module doc).

    The data-dependent ``q0 + 1e-3 * out`` carry keeps the tunnel
    pipeline honest; the per-step cache write lands in scratch page 0 so
    outputs are unchanged but the pools are genuinely loop-carried."""
    import jax
    import jax.numpy as jnp

    def chained(q, pk, pv):
        def body(i, carry):
            cur, pk, pv = carry
            # one fresh token's K/V lands in the cache every step
            val = cur[:1, :hkv, :1, :].astype(pk.dtype)
            pk = jax.lax.dynamic_update_slice(
                pk, val, (0, 0, jnp.mod(i, page), 0))
            pv = jax.lax.dynamic_update_slice(
                pv, val, (0, 0, jnp.mod(i, page), 0))
            out = step(cur, pk, pv)
            return (q0 + 1e-3 * out, pk, pv)

        return jax.lax.fori_loop(0, chain, body, (q, pk, pv))

    jitted = jax.jit(chained)
    _ = float(jnp.sum(jitted(q0, pool.k, pool.v)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(
            jitted(q0, pool.k, pool.v)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / chain
