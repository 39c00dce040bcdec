"""Utilities: native library bindings, timing helpers."""

from .native import native_lib, have_native
from .timer import measure_time

__all__ = ["have_native", "measure_time", "native_lib"]
