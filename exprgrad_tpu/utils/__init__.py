"""Utilities: native library bindings, timing helpers."""

from .native import native_lib, have_native

__all__ = ["have_native", "native_lib"]
