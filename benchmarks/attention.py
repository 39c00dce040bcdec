"""Flash-attention benchmark: fused Pallas kernel vs naive XLA attention.

Usage: python benchmarks/attention.py [seq] [head_dim]
Note: through this environment's TPU tunnel, Pallas custom-calls carry high
per-launch overhead (see TODO.md); on directly-attached TPUs the fused
kernel avoids materializing the (seq, seq) score matrix entirely.
"""

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from exprgrad_tpu.ops import flash_attention

    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    b, h = 4, 8
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.normal(size=(b, h, seq, d)).astype(np.float32))
    k = jax.device_put(rng.normal(size=(b, h, seq, d)).astype(np.float32))
    v = jax.device_put(rng.normal(size=(b, h, seq, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    flops = 4 * b * h * seq * seq * d

    @jax.jit
    def naive(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def fused(q, k, v):
        return flash_attention(q, k, v)

    for name, fn in (("naive-xla", naive), ("flash-pallas", fused)):
        try:
            out = fn(q, k, v)
            float(jnp.sum(out))  # compile + fence
            t = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = fn(q, k, v)
            float(jnp.sum(out))
            per = (time.perf_counter() - t) / reps
            print(f"  {name:14s} {per*1e3:8.2f} ms  {flops/per/1e12:6.1f} TF/s")
        except Exception as err:
            print(f"  {name:14s} failed: {err}")


if __name__ == "__main__":
    main()
