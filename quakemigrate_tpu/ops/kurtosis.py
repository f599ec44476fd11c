# -*- coding: utf-8 -*-
"""
Rolling-kurtosis onset functions as jitted JAX programs.

The reference advertises kurtosis onsets as an extension point but ships
only STA/LTA (QuakeMigrate README.md:46); this module provides a working
implementation in the style of Baillard et al. (2014, BSSA): a trailing-
window kurtosis characteristic function, rectified to its positive
gradient and normalised so the output is a positive function with baseline
1 -- directly compatible with the geometric-mean coalescence stack.

All moments come from cumulative sums, so the computation is vectorised
and batched over channels (no per-sample host loops).

"""

from functools import partial

import jax
import jax.numpy as jnp


def _rolling_moments(x, n):
    """Trailing-window sums of x, x^2, x^3, x^4 via cumulative sums."""

    def window_sum(p):
        c = jnp.cumsum(p, axis=-1)
        padded = jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (1,), c.dtype), c], axis=-1
        )
        idx = jnp.arange(p.shape[-1])
        return padded[..., idx + 1] - padded[..., jnp.maximum(idx + 1 - n, 0)]

    return [window_sum(x**k) for k in range(1, 5)]


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
    kurt = m4 / jnp.maximum(m2**2, tiny) - 3.0

    valid = jnp.arange(signal.shape[-1]) >= (nkurt - 1)
    return jnp.where(valid, kurt, 0.0)


@partial(jax.jit, static_argnames=("nkurt", "nsmooth"))
def kurtosis_onset(signal, nkurt, nsmooth=1):
    """
    Kurtosis characteristic function: positive gradient of the rolling
    kurtosis (optionally smoothed over ``nsmooth`` samples), normalised by
    its own scaled median absolute deviation and shifted to baseline 1.

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

    # Robust scale from the non-zero CF values (MAD about zero)
    med = jnp.median(jnp.where(cf > 0, cf, jnp.nan), axis=-1, keepdims=True)
    med = jnp.nan_to_num(med, nan=1.0)
    scale = jnp.maximum(med, jnp.finfo(cf.dtype).tiny)

    return 1.0 + cf / scale
