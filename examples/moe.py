"""Expert-parallel mixture-of-experts: route, train, shard.

A Switch/Mixtral-style MoE layer (parallel/moe.py) trained on a toy
piecewise task where different input clusters need different functions —
exactly what routing is for.  The expert weights shard over a device
mesh axis (run with XLA_FLAGS=--xla_force_host_platform_device_count=8
to see 8-way expert parallelism); XLA inserts the collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from exprgrad_tpu.parallel import init_moe, moe_layer, shard_moe_params

D, HIDDEN, EXPERTS, N, STEPS = 16, 32, 8, 512, 600


def make_task(rng):
    """Inputs cluster around EXPERTS distinct centers; the target applies
    a different random linear map per cluster."""
    centers = rng.normal(size=(EXPERTS, D)).astype(np.float32) * 3
    maps = rng.normal(size=(EXPERTS, D, D)).astype(np.float32)

    def batch(n=N):
        which = rng.integers(0, EXPERTS, n)
        x = centers[which] + rng.normal(size=(n, D)).astype(np.float32)
        y = np.einsum("nd,nde->ne", x, maps[which])
        return jnp.asarray(x), jnp.asarray(y)

    return batch


def main() -> None:
    rng = np.random.default_rng(0)
    batch = make_task(rng)
    params = init_moe(rng, D, HIDDEN, EXPERTS)

    devices = jax.devices()
    if len(devices) >= EXPERTS:
        mesh = Mesh(np.array(devices[:EXPERTS]).reshape(EXPERTS),
                    ("expert",))
        params = shard_moe_params(params, mesh, axis="expert")
        print(f"experts sharded over {EXPERTS} devices")

    @jax.jit
    def step(params, x, y, lr=0.05):
        def loss_fn(p):
            out, aux = moe_layer(x, p, top_k=2, capacity_factor=2.0)
            return jnp.mean((out - y) ** 2) + 0.01 * aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = type(params)(*[p - lr * g for p, g in zip(params, grads)])
        return new, loss

    x, y = batch()
    first = float(step(params, x, y)[1])
    for _ in range(STEPS):
        x, y = batch()
        params, loss = step(params, x, y)
    x, y = batch(128)
    out, aux = jax.jit(lambda x, p: moe_layer(x, p, top_k=2, capacity_factor=2.0))(x, params)
    final = float(jnp.mean((out - y) ** 2))
    print(f"loss: {first:.3f} -> {final:.3f} (aux balance {float(aux):.3f})")

    # routing actually specializes: a dense 1-expert baseline with the
    # SAME per-token FLOPs (top-2 runs two HIDDEN-wide FFNs per token, so
    # the baseline gets one 2*HIDDEN-wide FFN) cannot fit the piecewise
    # task as well
    dense = init_moe(rng, D, 2 * HIDDEN, 1)

    @jax.jit
    def dstep(params, x, y, lr=0.05):
        def loss_fn(p):
            out, _ = moe_layer(x, p)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = type(params)(*[p - lr * g for p, g in zip(params, grads)])
        return new, loss

    for _ in range(STEPS):
        xb, yb = batch()
        dense, _ = dstep(dense, xb, yb)
    dout, _ = jax.jit(lambda x, p: moe_layer(x, p))(x, dense)
    dfinal = float(jnp.mean((dout - y) ** 2))
    print(f"single-expert baseline: {dfinal:.3f} "
          f"(MoE wins by {dfinal / max(final, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
