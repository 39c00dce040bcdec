"""Shared weight-placement helper for the mesh-sharded serving runtimes.

One rule, used by both servers: device_put onto the mesh with one axis
name (or None) per dim, dropping a name wherever the dim doesn't divide
the mesh axis (GQA kv heads, size-1 quantization-scale dims, odd vocab).
QuantW pytrees shard codes and scales alike.
"""

from __future__ import annotations


def place(mesh, w, axis_names):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..quant import QuantW

    if w is None:
        return None
    if isinstance(w, QuantW):
        return QuantW(place(mesh, w.codes, axis_names),
                      place(mesh, w.scale, axis_names))
    spec = []
    for size, name in zip(w.shape, axis_names):
        n = mesh.shape.get(name, 1) if name else 1
        spec.append(name if name and n > 1 and size % n == 0
                    and size >= n else None)
    return jax.device_put(w, NamedSharding(mesh, P(*spec)))
