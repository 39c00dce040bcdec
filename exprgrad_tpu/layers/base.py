"""Elementwise ops, matmul, optimizers and losses.

Parity: reference exprgrad/layers/base.nim.  Also wires Python operators
onto ``Fun`` (+, -, * for matmul/scalar-scale, / for scalar division).
"""

from __future__ import annotations

from ..expr import (
    epoch,
    iters,
    ln,
    maximum,
    minimum,
    pow_,
    select,
    sq,
    sqrt,
    to_scalar,
)
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


def momentum(
    param: Fun,
    grad: Fun,
    eta: float = 0.01,
    mu: float = 0.9,
    nesterov: bool = False,
) -> None:
    """Polyak momentum SGD, optionally Nesterov.

    Velocity lives in a cache tensor (``v <- mu*v + g``; cache writes
    accumulate, so the statement adds ``v*(mu-1) + g``).  The update is
    ``-eta*v``, or ``-eta*(g + mu*v)`` with the Nesterov look-ahead.
    Beyond the reference's gd/adam pair (layers/base.nim:33-53) but built
    from the same cache + accumulate-write seam.
    """
    vel = cache(param, "momentum.v")
    it = iters("it")
    vel.raw[it] = vel.raw[it] * (mu - 1.0) + grad.raw[it]
    it = iters("it")
    if nesterov:
        param.raw[it] = -eta * (grad.raw[it] + mu * vel.raw[it])
    else:
        param.raw[it] = -eta * vel.raw[it]


def rmsprop(
    param: Fun,
    grad: Fun,
    eta: float = 0.001,
    rho: float = 0.9,
    eps: float = 1e-8,
) -> None:
    """Tieleman & Hinton RMSProp: leaky average of squared gradients in a
    cache tensor, update scaled by its root."""
    avg = cache(param, "rmsprop.sq")
    it = iters("it")
    avg.raw[it] = avg.raw[it] * (rho - 1.0) + (1.0 - rho) * sq(grad.raw[it])
    it = iters("it")
    param.raw[it] = -eta * grad.raw[it] / (sqrt(avg.raw[it]) + eps)


def adamw(
    param: Fun,
    grad: Fun,
    eta: float = 0.001,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> None:
    """Loshchilov & Hutter, "Decoupled Weight Decay Regularization", 2019.

    Adam moments + bias correction exactly as :func:`adam`, plus a decay
    term read from the pre-step parameter value in the same statement
    (reads see the old buffer; the write accumulates), i.e.
    ``p <- p - eta*(m_hat/(sqrt(v_hat)+eps) + wd*p)``.  Applied uniformly
    to every parameter ``make_opt`` hands it — exclude biases/norm gains
    by optimizing those targets with a separate optimizer if needed.
    """
    m = cache(param, "adamw.m")
    v = cache(param, "adamw.v")
    it = iters("it")
    m.raw[it] = m.raw[it] * (beta1 - 1.0) + (1.0 - beta1) * grad.raw[it]
    it = iters("it")
    v.raw[it] = v.raw[it] * (beta2 - 1.0) + (1.0 - beta2) * sq(grad.raw[it])
    it = iters("it")
    m_hat = m.raw[it] / (1.0 - pow_(beta1, to_scalar(epoch())))
    v_hat = v.raw[it] / (1.0 - pow_(beta2, to_scalar(epoch())))
    param.raw[it] = -eta * (
        m_hat / (sqrt(v_hat) + eps) + weight_decay * param.raw[it]
    )


def lion(
    param: Fun,
    grad: Fun,
    eta: float = 1e-4,
    beta1: float = 0.9,
    beta2: float = 0.99,
    weight_decay: float = 0.0,
) -> None:
    """Chen et al., "Symbolic Discovery of Optimization Algorithms"
    (Lion), 2023: ``u = sign(beta1*m + (1-beta1)*g); p -= eta*(u + wd*p);
    m <- beta2*m + (1-beta2)*g``.

    The lowering emits a cache's writer kernels before any reader kernel
    (statement source order does NOT survive), so a read of ``m`` in the
    update always sees the NEW momentum.  The paper's interpolation of
    the OLD momentum is therefore recovered algebraically:
    ``m_old = (m_new - (1-beta2)*g)/beta2``, giving
    ``u = (beta1/beta2)*m_new + ((1-beta1) - beta1*(1-beta2)/beta2)*g``
    (which is why ``beta2`` must be nonzero).
    """
    if not 0.0 < beta2 <= 1.0:
        raise ValueError(f"beta2 must be in (0, 1] (got {beta2})")
    m = cache(param, "lion.m")
    it = iters("it")
    m.raw[it] = m.raw[it] * (beta2 - 1.0) + (1.0 - beta2) * grad.raw[it]
    it = iters("it")
    c_m = beta1 / beta2
    c_g = (1.0 - beta1) - beta1 * (1.0 - beta2) / beta2
    u = c_m * m.raw[it] + c_g * grad.raw[it]
    s = select(u > 0.0, 1.0, select(u < 0.0, -1.0, 0.0))
    param.raw[it] = -eta * (s + weight_decay * param.raw[it])


def clip_gradients(opt, bound: float):
    """Wrap any bound optimizer with elementwise gradient clipping to
    ``[-bound, bound]``: the clipped gradient is an ordinary intermediate
    kernel the wrapped optimizer consumes.

    ``net.backprop(clip_gradients(make_opt(adam, eta=1e-3), 1.0))``
    """
    def wrapped(param: Fun, grad: Fun) -> None:
        it = iters("it")
        clipped = Fun()
        clipped.raw[it] = minimum(maximum(grad.raw[it], -bound), bound)
        opt(param, clipped)

    return wrapped


def clip_by_global_norm(opt, max_norm: float, eps: float = 1e-12):
    """Wrap any bound optimizer with GLOBAL-norm gradient clipping
    (the torch ``clip_grad_norm_`` / optax ``clip_by_global_norm``
    semantics): every gradient is scaled by
    ``min(1, max_norm / ||all grads||_2)``.

    Cross-tensor reductions fall out of the dataflow: each wrapped call
    adds one accumulation kernel ``total[0] ++= g_i^2`` to ONE shared
    scalar tensor, and every scaled-gradient kernel reads ``total[0]`` —
    the lowering orders all writers of a tensor before any reader, so the
    scale sees the full sum regardless of parameter order.  The whole
    thing stays inside the one-jit training program.

    The shared tensor is keyed per ``optimize()``/``backprop()`` call
    (by the backwards node the gradients hang off), so one recipe object
    is reusable across models and across multiple backprop targets
    without cross-contaminating their norms.
    """
    import weakref

    # weakrefs so a long-lived recipe doesn't pin every graph it was
    # ever compiled into (the total Fun references the whole loss graph)
    totals: dict[int, "weakref.ref[Fun]"] = {}

    def wrapped(param: Fun, grad: Fun) -> None:
        # grad is the GRADIENT node [backwards, param]; all grads of one
        # optimize() call share the backwards child
        key = id(grad.children[0]) if grad.children else id(grad)
        total = totals.get(key, lambda: None)()
        if total is None:
            for k in [k for k, r in totals.items() if r() is None]:
                del totals[k]  # drop entries whose graphs were collected
            total = Fun()
            totals[key] = weakref.ref(total)
        it = iters("it")
        total[0] = sq(grad.raw[it])
        it = iters("it")
        scaled = Fun()
        scale = minimum(1.0, max_norm / (sqrt(total.raw[0]) + eps))
        scaled.raw[it] = grad.raw[it] * scale
        opt(param, scaled)

    return wrapped


def with_ema(opt, decay: float = 0.999):
    """Wrap any bound optimizer with an exponential moving average of the
    parameters (Polyak averaging — the standard eval/serving smoother).

    The shadow lives in a cache tensor named ``"ema"`` updated from the
    POST-update parameter via the post-effects seam
    (``ema <- decay*ema + (1-decay)*p``); a companion ``"ema.w"`` cache
    follows the same recurrence toward 1, so the exact debias factor is
    tracked IN the program — :meth:`Model.ema_params` divides the two
    and is correct no matter how steps map to ``model.epoch`` (per-step
    ``apply`` and per-epoch ``fit`` both work).  Both caches ride
    checkpoints like any optimizer state.

    ``net.backprop(with_ema(make_opt(adam, eta=1e-3), 0.999))``
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1) (got {decay})")

    def wrapped(param: Fun, grad: Fun) -> None:
        opt(param, grad)
        e = cache(param, "ema")
        it = iters("it")
        e.raw[it] = e.raw[it] * (decay - 1.0) + (1.0 - decay) * param.raw[it]
        w = cache(param, "ema.w")
        it = iters("it")
        w.raw[it] = w.raw[it] * (decay - 1.0) + (1.0 - decay)
        param.post_effects.append(e)
        param.post_effects.append(w)

    return wrapped


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


@layer
def smoothed_cross_entropy(pred: Fun, labels: Fun, classes: int,
                           alpha: float = 0.1) -> Fun:
    """Label-smoothed cross entropy: targets become
    ``(1-alpha)*labels + alpha/classes``.  Standard LM/vision
    regularizer; beyond the reference's loss trio."""
    it = iters("it")
    out = Fun()
    target = (1.0 - alpha) * labels.raw[it] + alpha / float(classes)
    out[0] = -(target * ln(maximum(pred.raw[it], 1e-12))) / to_scalar(
        pred.shape[0]
    )
    return out


@layer
def l1_loss(a: Fun, b: Fun) -> Fun:
    """Mean absolute error (|d| as select on the sign: no abs op needed,
    and the subgradient at 0 is 0 via the false branch)."""
    it = iters("it")
    out = Fun()
    d = a.raw[it] - b.raw[it]
    out[0] = select(d < 0.0, -d, d) / to_scalar(a.shape[0])
    return out


@layer
def huber(a: Fun, b: Fun, delta: float = 1.0) -> Fun:
    """Huber loss: quadratic within ``delta``, linear outside —
    mse's robustness fix for outlier-heavy regression."""
    it = iters("it")
    out = Fun()
    d = a.raw[it] - b.raw[it]
    ad = select(d < 0.0, -d, d)
    quad = 0.5 * sq(d)
    lin = delta * (ad - 0.5 * delta)
    out[0] = select(ad < delta, quad, lin) / to_scalar(a.shape[0])
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
