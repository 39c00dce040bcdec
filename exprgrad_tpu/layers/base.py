"""Elementwise ops, matmul, optimizers and losses.

Parity: reference exprgrad/layers/base.nim.  Also wires Python operators
onto ``Fun`` (+, -, * for matmul/scalar-scale, / for scalar division).
"""

from __future__ import annotations

from ..expr import epoch, iters, ln, maximum, minimum, pow_, sq, sqrt, to_scalar
from ..fun import Fun, cache, layer


@layer
def add(a: Fun, b: Fun) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = a.raw[it] + b.raw[it]
    return out


@layer
def sub(a: Fun, b: Fun) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = a.raw[it] - b.raw[it]
    return out


@layer
def minimum_elems(a: Fun, b: Fun) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = minimum(a.raw[it], b.raw[it])
    return out


@layer
def maximum_elems(a: Fun, b: Fun) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = maximum(a.raw[it], b.raw[it])
    return out


@layer
def mul_scalar(a: Fun, factor: float) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = a.raw[it] * factor
    return out


@layer
def div_scalar(a: Fun, factor: float) -> Fun:
    it = iters("it")
    out = Fun()
    out.raw[it] = a.raw[it] / factor
    return out


@layer
def matmul(a: Fun, b: Fun) -> Fun:
    y, x, it = iters("y", "x", "it")
    out = Fun()
    out[y, x] = a[y, it] * b[it, x]
    return out


@layer
def transpose(mat: Fun) -> Fun:
    y, x = iters("y", "x")
    out = Fun()
    out[y, x] = mat[x, y]
    return out


# --- optimizers -----------------------------------------------------------

def gradient_descent(param: Fun, grad: Fun, rate: float = 0.01) -> None:
    it = iters("it")
    param.raw[it] = -grad.raw[it] * rate


def decayed_gradient_descent(
    param: Fun,
    grad: Fun,
    rate: float = 0.01,
    decay: float = 0.5,
    every: int = 10,
) -> None:
    """SGD with step decay WRITTEN IN THE LANGUAGE: the learning rate is a
    kernel expression of ``epoch()`` (``rate * decay^(epoch // every)``),
    so the schedule compiles into the training program itself — no host
    callback per step.  Any schedule expressible with scalar ops works the
    same way (cosine via ``cos``, warmup via ``select``)."""
    it = iters("it")
    lr = rate * pow_(decay, to_scalar(epoch() // every))
    param.raw[it] = -grad.raw[it] * lr


def adam(
    param: Fun,
    grad: Fun,
    eta: float = 0.01,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> None:
    """Kingma & Ba, "Adam: A Method for Stochastic Optimization", 2014.

    Optimizer state lives in cache tensors; bias correction uses the
    ``epoch()`` instruction (reference layers/base.nim:40-53).
    """
    m = cache(param, "adam.m")
    v = cache(param, "adam.v")
    it = iters("it")
    m.raw[it] = m.raw[it] * (beta1 - 1.0) + (1.0 - beta1) * grad.raw[it]
    it = iters("it")
    v.raw[it] = v.raw[it] * (beta2 - 1.0) + (1.0 - beta2) * sq(grad.raw[it])
    it = iters("it")
    m_hat = m.raw[it] / (1.0 - pow_(beta1, to_scalar(epoch())))
    v_hat = v.raw[it] / (1.0 - pow_(beta2, to_scalar(epoch())))
    param.raw[it] = -eta * m_hat / (sqrt(v_hat) + eps)


# --- losses ---------------------------------------------------------------

@layer
def mse(a: Fun, b: Fun) -> Fun:
    it = iters("it")
    out = Fun()
    out[0] = sq(a.raw[it] - b.raw[it]) / to_scalar(a.shape[0])
    return out


@layer
def binary_cross_entropy(pred: Fun, labels: Fun) -> Fun:
    """BCE with probabilities clamped away from 0 (the reference's
    unclamped ln, base.nim:60-64, produces NaN once a confident model
    underflows a probability to exactly zero)."""
    it = iters("it")
    out = Fun()
    p = maximum(pred.raw[it], 1e-12)
    q = maximum(1.0 - pred.raw[it], 1e-12)
    out[0] = -(
        labels.raw[it] * ln(p) + (1.0 - labels.raw[it]) * ln(q)
    ) / to_scalar(pred.shape[0])
    return out


@layer
def cross_entropy(pred: Fun, labels: Fun) -> Fun:
    """Cross entropy with clamped ln (see binary_cross_entropy note;
    reference base.nim:66-67 NaNs at ~zero predicted probabilities)."""
    it = iters("it")
    out = Fun()
    out[0] = -(
        labels.raw[it] * ln(maximum(pred.raw[it], 1e-12))
    ) / to_scalar(pred.shape[0])
    return out


# --- Fun operator sugar ---------------------------------------------------

def _fun_add(self: Fun, other):
    if isinstance(other, Fun):
        return add(self, other)
    return NotImplemented


def _fun_sub(self: Fun, other):
    if isinstance(other, Fun):
        return sub(self, other)
    return NotImplemented


def _fun_mul(self: Fun, other):
    if isinstance(other, Fun):
        return matmul(self, other)
    if isinstance(other, (int, float)):
        return mul_scalar(self, float(other))
    return NotImplemented


def _fun_rmul(self: Fun, other):
    if isinstance(other, (int, float)):
        return mul_scalar(self, float(other))
    return NotImplemented


def _fun_div(self: Fun, other):
    if isinstance(other, (int, float)):
        return div_scalar(self, float(other))
    return NotImplemented


Fun.__add__ = _fun_add  # type: ignore[assignment]
Fun.__sub__ = _fun_sub  # type: ignore[assignment]
Fun.__mul__ = _fun_mul  # type: ignore[assignment]
Fun.__rmul__ = _fun_rmul  # type: ignore[assignment]
Fun.__truediv__ = _fun_div  # type: ignore[assignment]
