# -*- coding: utf-8 -*-
"""
Rolling-kurtosis onset functions as jitted JAX programs.

The reference advertises kurtosis onsets as an extension point but ships
only STA/LTA (QuakeMigrate README.md:46); this module provides a working
implementation in the style of Baillard et al. (2014, BSSA): a trailing-
window kurtosis characteristic function, rectified to its positive
gradient and shifted so the output is a positive function with baseline
1 -- directly compatible with the geometric-mean coalescence stack.

All moments come from cumulative sums, so the computation is vectorised
and batched over channels (no per-sample host loops).

"""

from functools import partial

import jax
import jax.numpy as jnp

from .rolling import trailing_window_sums


def _rolling_moments(x, n):
    """Trailing-window sums of x, x^2, x^3, x^4 via cumulative sums."""

    return [trailing_window_sums(x**k, n) for k in range(1, 5)]


@partial(jax.jit, static_argnames=("nkurt",))
def rolling_kurtosis(signal, nkurt):
    """
    Trailing-window sample kurtosis (Fisher, i.e. normal -> 0) of a signal,
    batched over leading dimensions. The first nkurt-1 samples are 0.

    """

    signal = jnp.asarray(signal)
    s1, s2, s3, s4 = _rolling_moments(signal, nkurt)
    n = float(nkurt)

    mean = s1 / n
    m2 = s2 / n - mean**2
    m4 = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean**2 * (s2 / n)
        - 3 * mean**4
    )
    tiny = jnp.finfo(signal.dtype).tiny
    # Degenerate (near-constant) windows -- e.g. the sqrt(tiny) gap
    # fill -- make m4/m2**2 numerically meaningless: the two moments
    # underflow at different rates and the ratio can explode to ~1e180,
    # which then overflows the RMS combine and corrupts the scanmseed
    # output at every gap boundary. Kurtosis is scale-free, so gate on
    # the RELATIVE variance (m2 vs the window's mean square) and flatten
    # degenerate windows to 0 (no CF contribution).
    power = s2 / n
    m2f = jnp.maximum(m2, jnp.sqrt(tiny))
    raw = m4 / (m2f * m2f) - 3.0
    kurt = jnp.where(m2 > power * 1e-12, raw, 0.0)

    valid = jnp.arange(signal.shape[-1]) >= (nkurt - 1)
    return jnp.where(valid, kurt, 0.0)


@partial(jax.jit, static_argnames=("nkurt", "nsmooth"))
def kurtosis_onset(signal, nkurt, nsmooth=1):
    """
    Kurtosis characteristic function: positive gradient of the rolling
    kurtosis (optionally smoothed over ``nsmooth`` samples), shifted to
    baseline 1. Kurtosis is dimensionless, so the CF is scale-free across
    stations without further normalisation.

    Returns a positive array with baseline ~1 and sharp peaks at impulsive
    arrivals, suitable for geometric-mean coalescence stacking.

    """

    kurt = rolling_kurtosis(signal, nkurt)
    grad = jnp.diff(kurt, axis=-1, prepend=kurt[..., :1])
    cf = jnp.maximum(grad, 0.0)

    if nsmooth > 1:
        kernel = jnp.ones(nsmooth) / nsmooth
        cf = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="same"))(
            jnp.atleast_2d(cf)
        ).reshape(cf.shape)

    # Kurtosis is dimensionless (m4 / m2^2), so its gradient needs no
    # amplitude normalisation: baseline-1 plus the rectified gradient is
    # already scale-free across stations
    return 1.0 + cf


def kurtosis_cf_rows(signal, nkurt_rows, nsmooth):
    """
    Traceable batched kurtosis characteristic function with a PER-ROW
    window length (rows may belong to different phases), for the fused
    detect window. Semantics match :func:`kurtosis_onset` row-wise.

    """

    signal = jnp.asarray(signal)
    t = signal.shape[-1]
    idx = jnp.arange(t)
    n_col = nkurt_rows[:, None].astype(signal.dtype)

    s1 = trailing_window_sums(signal, nkurt_rows)
    s2 = trailing_window_sums(signal**2, nkurt_rows)
    s3 = trailing_window_sums(signal**3, nkurt_rows)
    s4 = trailing_window_sums(signal**4, nkurt_rows)

    mean = s1 / n_col
    m2 = s2 / n_col - mean**2
    m4 = (
        s4 / n_col
        - 4 * mean * (s3 / n_col)
        + 6 * mean**2 * (s2 / n_col)
        - 3 * mean**4
    )
    tiny = jnp.finfo(signal.dtype).tiny
    # Same degenerate-window gating as rolling_kurtosis (see there)
    power = s2 / n_col
    m2f = jnp.maximum(m2, jnp.sqrt(tiny))
    raw = m4 / (m2f * m2f) - 3.0
    kurt = jnp.where(m2 > power * 1e-12, raw, 0.0)
    valid = idx[None, :] >= (nkurt_rows[:, None] - 1)
    kurt = jnp.where(valid, kurt, 0.0)

    grad = jnp.diff(kurt, axis=-1, prepend=kurt[..., :1])
    cf = jnp.maximum(grad, 0.0)

    if nsmooth > 1:
        kernel = jnp.ones(nsmooth, dtype=cf.dtype) / nsmooth
        cf = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="same"))(cf)

    return 1.0 + cf
