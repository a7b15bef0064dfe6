"""Not-a-knot cubic-spline interpolation — TPU-native, O(T) per series.

Re-derivation of the reference's classical baseline
(3_test_cubic_interpolation.py:32-58, duplicated in A1_train.py:56-80):
per keypoint, per coordinate, zeros (masked frames and undetected
landmarks) become NaN knote-holes and a pandas ``cubicspline``
(= scipy CubicSpline, bc_type='not-a-knot', extrapolate=True) fills them,
with ``limit_direction='both'`` extrapolation at the ends and NaN->0 for
unfillable series.

The reference runs 108 pandas series per video on the CPU.  Here the whole
video (and batches of videos) is one fixed-shape array program:

  * valid knots are compacted to the front with a stable argsort;
  * the not-a-knot system is reduced to a strictly tridiagonal system over
    the interior second derivatives (the end conditions are substituted
    into the first/last interior equations, keeping pivots diagonally
    dominant), solved by a Thomas ``lax.scan`` vectorized across all 108
    series at once;
  * degenerate knot counts follow scipy: m == 3 -> parabola, m == 2 ->
    straight line, m == 0 -> zeros (NaN->0).  m == 1 is a constant fill
    (scipy raises there; divergence documented).

Everything is jit/vmap-compatible with dynamic knot counts under static
shapes, so the baseline runs on TPU at batch scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _solve_tridiagonal(a, b, c, d):
    """Thomas algorithm over the LAST axis; leading axes are batch.

    Rows must be scaled so b != 0 (identity rows for padding).
    """
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    T = a.shape[-1]

    def fwd(carry, row):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = row
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros(a.shape[:-1]), jnp.zeros(a.shape[:-1]))
    _, (cps, dps) = jax.lax.scan(
        fwd, init, (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0),
                    jnp.moveaxis(c, -1, 0), jnp.moveaxis(d, -1, 0)))

    def bwd(x_next, row):
        cp, dp = row
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros(a.shape[:-1]), (cps, dps),
                         reverse=True)
    return jnp.moveaxis(xs, 0, -1)


def _second_derivatives(xs, ys, m, T):
    """Not-a-knot second derivatives M_0..M_{m-1} (padded to T)."""
    i = jnp.arange(T)
    h = jnp.where(i < T - 1, jnp.diff(xs, append=xs[-1:] + 1.0), 1.0)
    h = jnp.where(h > 0, h, 1.0)
    slope = jnp.diff(ys, append=ys[-1:]) / h
    d_full = 6.0 * (slope - jnp.concatenate([slope[:1], slope[:-1]]))

    def g(arr, idx):
        return jnp.take(arr, jnp.clip(idx, 0, T - 1))

    h0, h1 = g(h, 0), g(h, 1)
    hm3, hm2 = g(h, m - 3), g(h, m - 2)

    # interior rows i in [1, m-2]: h_{i-1} M_{i-1} + 2(h_{i-1}+h_i) M_i
    #                              + h_i M_{i+1} = d_i
    h_prev = jnp.concatenate([jnp.ones(1), h[:-1]])
    a = h_prev
    b = 2.0 * (h_prev + h)
    c = h
    d = d_full

    # first reduced row (i == 1): substitute M_0 from the nak condition
    r = h0 / h1
    b1 = h0 * (1.0 + r) + 2.0 * (h0 + h1)
    c1 = h1 - h0 * r
    # last reduced row (i == m-2): substitute M_{m-1}
    q = hm2 / hm3
    am2 = hm3 - hm2 * q
    bm2 = 2.0 * (hm3 + hm2) + hm2 * (1.0 + q)

    is_first = i == 1
    is_last = i == m - 2
    inside = jnp.logical_and(i >= 1, i <= m - 2)

    a = jnp.where(is_first, 0.0, jnp.where(is_last, am2, a))
    b = jnp.where(is_first, b1, jnp.where(is_last, bm2, b))
    c = jnp.where(is_first, c1, jnp.where(is_last, 0.0, c))
    a = jnp.where(inside, a, 0.0)
    b = jnp.where(inside, b, 1.0)
    c = jnp.where(inside, c, 0.0)
    d = jnp.where(inside, d, 0.0)

    M = _solve_tridiagonal(a, b, c, d)

    # recover the end second derivatives from the nak conditions
    m1, m2 = g(M, 1), g(M, 2)
    mm2, mm3 = g(M, m - 2), g(M, m - 3)
    M = jnp.where(i == 0, (1.0 + r) * m1 - r * m2, M)
    M = jnp.where(i == m - 1, (1.0 + q) * mm2 - q * mm3, M)
    return M, h


def _eval_spline(t, xs, ys, M, h, m):
    """Evaluate the M-form cubic at positions t; end-polynomial
    extrapolation (scipy extrapolate=True)."""
    T = xs.shape[0]
    j = jnp.searchsorted(xs, t, side="right") - 1
    j = jnp.clip(j, 0, jnp.maximum(m - 2, 0))

    xj, xj1 = jnp.take(xs, j), jnp.take(xs, jnp.clip(j + 1, 0, T - 1))
    yj, yj1 = jnp.take(ys, j), jnp.take(ys, jnp.clip(j + 1, 0, T - 1))
    Mj, Mj1 = jnp.take(M, j), jnp.take(M, jnp.clip(j + 1, 0, T - 1))
    hj = jnp.take(h, j)

    u, w = xj1 - t, t - xj
    return (Mj * u ** 3 + Mj1 * w ** 3) / (6.0 * hj) + \
        (yj / hj - Mj * hj / 6.0) * u + (yj1 / hj - Mj1 * hj / 6.0) * w


def _parabola(t, x, y):
    """Lagrange parabola through 3 points (scipy nak, n == 3)."""
    l0 = (t - x[1]) * (t - x[2]) / ((x[0] - x[1]) * (x[0] - x[2]))
    l1 = (t - x[0]) * (t - x[2]) / ((x[1] - x[0]) * (x[1] - x[2]))
    l2 = (t - x[0]) * (t - x[1]) / ((x[2] - x[0]) * (x[2] - x[1]))
    return y[0] * l0 + y[1] * l1 + y[2] * l2


def interpolate_series(values: jnp.ndarray) -> jnp.ndarray:
    """Fill the zeros of one (T,) series by not-a-knot cubic spline.

    Matches ``Series.replace(0, nan).interpolate(method='cubicspline',
    limit_direction='both')`` followed by nan_to_num.
    """
    T = values.shape[0]
    valid = values != 0.0
    m = jnp.sum(valid.astype(jnp.int32))

    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    pos = jnp.arange(T, dtype=values.dtype)
    xs_raw = pos[order]
    ys_raw = values[order]
    last_x = jnp.take(xs_raw, jnp.clip(m - 1, 0, T - 1))
    last_y = jnp.take(ys_raw, jnp.clip(m - 1, 0, T - 1))
    i = jnp.arange(T)
    xs = jnp.where(i < m, xs_raw, last_x + (i - m + 1).astype(values.dtype))
    ys = jnp.where(i < m, ys_raw, last_y)

    M, h = _second_derivatives(xs, ys, m, T)
    cubic = _eval_spline(pos, xs, ys, M, h, m)

    x3, y3 = xs[:3], ys[:3]
    para = _parabola(pos, x3, y3)
    denom = jnp.where(xs[1] != xs[0], xs[1] - xs[0], 1.0)
    line = ys[0] + (pos - xs[0]) * (ys[1] - ys[0]) / denom
    const = jnp.full((T,), ys[0])

    filled = jnp.where(m >= 4, cubic,
                       jnp.where(m == 3, para,
                                 jnp.where(m == 2, line,
                                           jnp.where(m == 1, const, 0.0))))
    filled = jnp.nan_to_num(filled)
    return jnp.where(valid, values, filled)


def cubic_interpolation(video: jnp.ndarray, missing_mask: jnp.ndarray
                        ) -> jnp.ndarray:
    """The reference baseline on one (T, K, 2) video: zero masked frames,
    then spline-fill every zero, per keypoint per coordinate
    (3_test_cubic_interpolation.py:32-58)."""
    T = video.shape[0]
    v = jnp.where(missing_mask[:, None, None] > 0, 0.0, video)
    series = v.reshape(T, -1).T           # (K*2, T)
    out = jax.vmap(interpolate_series)(series)
    return out.T.reshape(video.shape)


cubic_interpolation_batch = jax.vmap(cubic_interpolation)
