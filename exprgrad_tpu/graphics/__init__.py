"""Visualization helpers (DOT graph export)."""

from .dotgraph import to_dot_graph

__all__ = ["to_dot_graph"]
