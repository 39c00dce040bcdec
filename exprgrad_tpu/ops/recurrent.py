"""Recurrent cell externs: LSTM / GRU / tanh-RNN over time as scans.

Sequential recurrences cannot live inside one DSL kernel (reads of the
kernel's own output observe pre-kernel contents — see
passes/validate.py's shifted-self-read diagnostic), so the recurrent
family goes through the extern seam exactly like fused attention and
MoE (ops/moe.py): the forward is a whole-op primitive — ``lax.scan``
over time in the jax backend, the TPU-idiomatic shape of a recurrence
(static trip count, carried state in registers/VMEM, XLA unrolls and
pipelines the per-step matmuls) — and the backward is a registered
extern implementing truncated-nowhere BPTT.  Surrounding kernels
(embeddings, projections, losses) still lower through the regular
compiler, and training targets derive through symbolic autodiff.

The numpy oracle implements the SAME cells with explicit loops and a
hand-derived backward pass (no jax anywhere — the oracle independence
invariant, interp.py:1-15), so backend-vs-oracle training parity tests
the BPTT math, not one library against itself.

Weight layout (single-bias convention):

* lstm:  wx [in, 4H], wh [H, 4H], b [4H]; gate order (i, f, g, o);
  ``c' = sig(f) c + sig(i) tanh(g)``, ``h' = sig(o) tanh(c')``.
* gru:   wx [in, 3H], wh [H, 3H], b [3H]; gate order (z, r, n);
  ``n = tanh(an + r * hn)``, ``h' = (1 - z) n + z h``.
* rnn_tanh: wx [in, H], wh [H, H], b [H]; ``h' = tanh(a)``.

States start at zero (h0 = c0 = 0); the op returns the full hidden
sequence [n, T, H].
"""

from __future__ import annotations

import numpy as np

from ..registry import register_extern

__all__ = ["register"]


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


# --------------------------------------------------------------------------
# jax implementations (lax.scan forward; backward = jax.vjp of the scan)
# --------------------------------------------------------------------------

def _jax_cell_scan(cell: str):
    def fwd(x, wx, wh, b):
        import jax
        import jax.numpy as jnp

        xf = x.astype(jnp.float32)
        wxf, whf, bf = (w.astype(jnp.float32) for w in (wx, wh, b))
        n = x.shape[0]
        H = wh.shape[0]
        # hoist the input projection out of the scan: one big MXU matmul
        # over [n*T, in] instead of T thin ones
        ax = jnp.einsum("nti,ij->ntj", xf, wxf) + bf

        if cell == "lstm":
            def step(carry, a_t):
                h, c = carry
                a = a_t + h @ whf
                i, f, g, o = jnp.split(a, 4, axis=-1)
                c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
                return (h2, c2), h2

            init = (jnp.zeros((n, H), jnp.float32),
                    jnp.zeros((n, H), jnp.float32))
        elif cell == "gru":
            def step(h, a_t):
                az, ar, an = jnp.split(a_t, 3, axis=-1)
                hz, hr, hn = jnp.split(h @ whf, 3, axis=-1)
                z = jax.nn.sigmoid(az + hz)
                r = jax.nn.sigmoid(ar + hr)
                nn_ = jnp.tanh(an + r * hn)
                h2 = (1.0 - z) * nn_ + z * h
                return h2, h2

            init = jnp.zeros((n, H), jnp.float32)
        else:  # rnn_tanh
            def step(h, a_t):
                h2 = jnp.tanh(a_t + h @ whf)
                return h2, h2

            init = jnp.zeros((n, H), jnp.float32)

        _, hs = jax.lax.scan(step, init, jnp.swapaxes(ax, 0, 1))
        return jnp.swapaxes(hs, 0, 1).astype(x.dtype)  # [n, T, H]

    return fwd


def _make_jax(cell: str):
    fwd = _jax_cell_scan(cell)

    def jax_fwd(args, attrs, ctx):
        x, wx, wh, b = args
        return fwd(x, wx, wh, b)

    def jax_grad(args, attrs, ctx):
        import jax

        x, wx, wh, b, g = args
        _, vjp = jax.vjp(fwd, x, wx, wh, b)
        return tuple(vjp(g.astype(x.dtype)))

    return jax_fwd, jax_grad


# --------------------------------------------------------------------------
# numpy oracle (explicit loops, hand-derived BPTT)
# --------------------------------------------------------------------------

def _np_forward(cell: str, x, wx, wh, b):
    """Returns (hs [n, T, H], saved) with every per-step intermediate the
    backward needs, all in f64."""
    n, T, _ = x.shape
    H = wh.shape[0]
    ax = np.einsum("nti,ij->ntj", x, wx, dtype=np.float64) + b
    h = np.zeros((n, H))
    c = np.zeros((n, H))
    hs = np.zeros((n, T, H))
    saved = []
    for t in range(T):
        if cell == "lstm":
            a = ax[:, t] + h @ wh
            i, f, g, o = np.split(a, 4, axis=-1)
            i, f, o = _sig(i), _sig(f), _sig(o)
            g = np.tanh(g)
            c2 = f * c + i * g
            tc = np.tanh(c2)
            h2 = o * tc
            saved.append((h, c, i, f, g, o, tc))
            c = c2
        elif cell == "gru":
            az, ar, an = np.split(ax[:, t], 3, axis=-1)
            hz, hr, hn = np.split(h @ wh, 3, axis=-1)
            z = _sig(az + hz)
            r = _sig(ar + hr)
            nn_ = np.tanh(an + r * hn)
            h2 = (1.0 - z) * nn_ + z * h
            saved.append((h, z, r, nn_, hn))
        else:
            h2 = np.tanh(ax[:, t] + h @ wh)
            saved.append((h, h2))
        hs[:, t] = h2
        h = h2
    return hs, saved


def _np_backward(cell: str, x, wx, wh, b, g):
    """BPTT: gradients (dx, dwx, dwh, db) for d(sum g * hs)."""
    n, T, _ = x.shape
    H = wh.shape[0]
    hs, saved = _np_forward(cell, x, wx, wh, b)
    dwx = np.zeros_like(wx, dtype=np.float64)
    dwh = np.zeros_like(wh, dtype=np.float64)
    db = np.zeros(b.shape, dtype=np.float64)
    dax = np.zeros((n, T, b.shape[0]))
    dh_next = np.zeros((n, H))
    dc_next = np.zeros((n, H))
    for t in range(T - 1, -1, -1):
        dh = g[:, t] + dh_next
        if cell == "lstm":
            h_prev, c_prev, i, f, gg, o, tc = saved[t]
            do = dh * tc
            dc = dc_next + dh * o * (1.0 - tc * tc)
            di = dc * gg
            df = dc * c_prev
            dg = dc * i
            da = np.concatenate([
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - gg * gg),
                do * o * (1.0 - o),
            ], axis=-1)
            dax[:, t] = da
            dwh += h_prev.T @ da
            dh_next = da @ wh.T
            dc_next = dc * f
        elif cell == "gru":
            h_prev, z, r, nn_, hn = saved[t]
            dz = dh * (h_prev - nn_)
            dn = dh * (1.0 - z)
            dh_prev = dh * z
            dan = dn * (1.0 - nn_ * nn_)
            dr = dan * hn
            dhn = dan * r
            daz = dz * z * (1.0 - z)
            dar = dr * r * (1.0 - r)
            da_x = np.concatenate([daz, dar, dan], axis=-1)
            da_h = np.concatenate([daz, dar, dhn], axis=-1)
            dax[:, t] = da_x
            dwh += h_prev.T @ da_h
            dh_next = dh_prev + da_h @ wh.T
        else:
            h_prev, h2 = saved[t]
            da = dh * (1.0 - h2 * h2)
            dax[:, t] = da
            dwh += h_prev.T @ da
            dh_next = da @ wh.T
    dwx = np.einsum("nti,ntj->ij", x, dax)
    db = dax.sum(axis=(0, 1))
    dx = np.einsum("ntj,ij->nti", dax, wx)
    return dx, dwx, dwh, db


def _make_np(cell: str):
    def np_fwd(args, attrs):
        x, wx, wh, b = args
        hs, _ = _np_forward(cell, x.astype(np.float64),
                            wx.astype(np.float64), wh.astype(np.float64),
                            b.astype(np.float64))
        return hs.astype(x.dtype)

    def np_grad(args, attrs):
        x, wx, wh, b, g = args
        dx, dwx, dwh, db = _np_backward(
            cell, x.astype(np.float64), wx.astype(np.float64),
            wh.astype(np.float64), b.astype(np.float64),
            g.astype(np.float64))
        return (dx.astype(x.dtype), dwx.astype(wx.dtype),
                dwh.astype(wh.dtype), db.astype(b.dtype))

    return np_fwd, np_grad


def register() -> None:
    for cell in ("lstm", "gru", "rnn_tanh"):
        jf, jg = _make_jax(cell)
        nf, ng = _make_np(cell)
        register_extern(cell, 1, jf, nf)
        register_extern(cell + "_grad", 4, jg, ng)


register()
