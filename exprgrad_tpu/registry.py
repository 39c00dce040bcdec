"""Registry of extern ops: opaque fused primitives callable from the DSL.

An extern op (see ``fun.extern`` / ``ir.Extern``) is the whole-op
generalization of the reference's customGrad seam (parser.nim:568-589):
a forward implemented as a fused backend primitive (typically a Pallas
kernel) with extern backward kernels attached through ``custom_grad``.

Every op registers TWO implementations so the numpy oracle stays
independent of the XLA backend (the architecture's core testing
invariant, interp.py:1-15):

* ``jax_fn(args, attrs, ctx)`` — jax arrays in, jax array (or tuple of
  arrays when ``nout > 1``) out; traced inside the target's single
  ``jax.jit``.  ``ctx`` is an :class:`ExternContext` carrying the
  executor's dtype/precision/policy for impl routing.
* ``numpy_fn(args, attrs)`` — the same computation in plain numpy.

This module is dependency-free; implementations importing jax must live
elsewhere (ops/externs.py) and are loaded lazily on first lookup.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from .errors import ModelRuntimeError


@dataclass
class ExternContext:
    """Backend context handed to jax implementations."""

    dtype: object = None          # numpy scalar type of the program
    precision: object = None      # jax.lax.Precision for contractions
    policy: object = None         # backend.policy.SchedulePolicy or None
    stats: object = None          # executor lowering-stats dict or None

    def record(self, key: str) -> None:
        """Count an attributable lowering decision (e.g. which attention
        impl actually traced) into the executor's lowering_stats."""
        if self.stats is not None:
            self.stats[key] = self.stats.get(key, 0) + 1


@dataclass
class ExternDef:
    name: str
    nout: int
    jax_fn: Callable
    numpy_fn: Callable


_REGISTRY: dict[str, ExternDef] = {}
_BUILTINS_LOADED = False


def register_extern(
    name: str,
    nout: int,
    jax_fn: Callable,
    numpy_fn: Callable,
) -> None:
    _REGISTRY[name] = ExternDef(name, nout, jax_fn, numpy_fn)


def get_extern(name: str) -> ExternDef:
    global _BUILTINS_LOADED
    if name not in _REGISTRY and not _BUILTINS_LOADED:
        _BUILTINS_LOADED = True
        from .ops import externs as _  # noqa: F401  (registers built-ins)
    if name not in _REGISTRY:
        raise ModelRuntimeError(
            f"extern op {name!r} is not registered; call "
            "exprgrad_tpu.registry.register_extern first"
        )
    return _REGISTRY[name]
