# -*- coding: utf-8 -*-
"""
The one trailing-window rolling-sum primitive shared by every onset
function (STA/LTA windows, kurtosis moments, the fused detect window).

The indexing here is boundary-sensitive (the ``max(i+1-n, 0)`` clamp
makes early samples partial-window sums, matching the reference C rolling
sums, core/src/onsetlib.c:35-59); keeping a single implementation means a
boundary fix cannot silently miss a copy.

"""

import jax.numpy as jnp
import numpy as np


def padded_cumsum(x):
    """Cumulative sum along the last axis with a leading zero, so that
    ``out[..., j] - out[..., i]`` is ``sum(x[..., i:j])``."""

    c = jnp.cumsum(x, axis=-1)
    return jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), c.dtype), c], axis=-1
    )


def trailing_window_sums(x, n):
    """
    Trailing-window rolling sums: ``out[..., i] = sum(x[..., lo : i+1])``
    with ``lo = max(0, i + 1 - n)`` (partial windows at the start).

    ``n`` may be a static Python int (any batch shape for ``x``) or a
    1-D integer array of per-row window lengths (then ``x`` must be 2-D,
    ``(rows, t)``, as in the fused multi-phase detect window).

    """

    x = jnp.asarray(x)
    t = x.shape[-1]
    idx = jnp.arange(t)
    padded = padded_cumsum(x)
    hi = padded[..., idx + 1]
    if isinstance(n, (int, np.integer)):
        return hi - padded[..., jnp.maximum(idx + 1 - n, 0)]
    lo_idx = jnp.maximum(idx[None, :] + 1 - n[:, None], 0)
    return hi - jnp.take_along_axis(padded, lo_idx, axis=-1)
