# -*- coding: utf-8 -*-
"""
Conv formulation of the migrate kernel: coa[n, t] = sum_o row_o[base_o +
fine[o, n] + t] is a 1-D correlation of the per-onset windowed log-onset
rows with a per-node one-hot filter bank -- filter F[f, o, n] = (fine[o,
n] == f). The Hankel redundancy the Pallas kernel streams from HBM
(span x the useful bytes) is exploited implicitly by XLA's conv emitter,
which windows the input on-chip.

This micro-benchmark times lax.conv_general_dilated at the production
geometry (per-tile: input (1, sblk+span, 24) x filter (span, 24, tile))
against the Pallas MXU kernel's measured per-step cost, plus a full
tile-sweep via scan, to decide whether the conv path should replace or
complement the Pallas kernel.

Run: python -m experiments.exp_conv_migrate
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # compile+warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree.map(lambda x: np.asarray(x), fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


@partial(jax.jit, static_argnames=("span", "n_reps"))
def conv_tile_sweep(windows, filters, span, n_reps):
    """
    windows: (n_tiles, sblk + span, n_onsets) bf16 -- per-tile windowed
      onset rows (hi half).
    filters: (n_tiles, span, n_onsets, tile) bf16 -- one-hot filter bank.
    Returns per-tile (n_tiles, sblk) max over the conv output, scanning
    tiles sequentially (the Pallas kernel's grid dimension).

    """

    def body(carry, xs):
        w, f = xs
        out = jax.lax.conv_general_dilated(
            w[None], f,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )  # (1, sblk, tile)
        # emulate the post-work: exp + max/sum over nodes
        coa = jnp.exp(out[0] * 0.04)
        return carry, (coa.max(axis=1), coa.sum(axis=1))

    for _ in range(n_reps):
        _, (mx, sm) = jax.lax.scan(body, 0, (windows, filters))
    return mx.sum() + sm.sum()


def main():
    rng = np.random.default_rng(0)
    n_onsets, tile, span, sblk = 24, 512, 64, 2048
    n_tiles = 32  # subset; per-tile cost is what matters

    windows = rng.normal(size=(n_tiles, sblk + span, n_onsets)).astype(
        jnp.bfloat16
    )
    fine = rng.integers(0, span, size=(n_tiles, n_onsets, tile))
    filters = np.zeros((n_tiles, span, n_onsets, tile), np.float32)
    t_idx, o_idx, n_idx = np.meshgrid(
        np.arange(n_tiles), np.arange(n_onsets), np.arange(tile),
        indexing="ij",
    )
    filters[t_idx, fine, o_idx, n_idx] = 1.0
    filters = filters.astype(jnp.bfloat16)

    w_dev = jax.device_put(windows)
    f_dev = jax.device_put(filters)

    for n_reps in (1, 4):
        dt = time_fn(conv_tile_sweep, w_dev, f_dev, span, n_reps)
        per_tile = dt / (n_tiles * n_reps)
        flops = 2 * span * n_onsets * tile * sblk
        print(
            f"reps={n_reps}: {dt * 1e3:7.2f} ms total, "
            f"{per_tile * 1e6:6.1f} us/tile-conv, "
            f"{flops / per_tile / 1e12:5.1f} TF/s "
            f"(pallas step incl hi+lo+DMA: ~49.6 us/tile at sblk=2048)"
        )


if __name__ == "__main__":
    main()
