# -*- coding: utf-8 -*-
"""
Kernel experiment: can gather locality / grouping / tiling push the fused
detect kernel closer to HBM speed-of-light? Times variants of the
row-gather stack on the real TPU with the Icequake detect geometry.

Run: python experiments/exp_gather_variants.py

"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from quakemigrate_tpu.ops.migrate import (
    _build_shift_table,
    _prepare_onsets,
    migrate_detect,
)

# Icequake_Iceland detect geometry
NX, NY, NZ = 71, 64, 57
N = NX * NY * NZ
O = 24
S = 625
FSMP, LSMP = 475, 575
T = S + FSMP + LSMP
ITERS = 8


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    onsets = rng.gamma(2.0, 1.5, size=(O, T)).astype(np.float32)
    # Realistic moveout field (matches bench.py): smooth over nodes
    nx, ny, nz = 71, 64, 57
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.025, np.arange(ny) * 0.025, np.arange(nz) * 0.025,
        indexing="ij",
    )
    tts = []
    for i in range(O):
        sx, sy = rng.uniform(0, nx * 0.025), rng.uniform(0, ny * 0.025)
        v = 3.63 if i < O // 2 else 1.833
        dist = np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2)
        tts.append(np.rint(dist / v * 250).astype(np.int32))
    tt = np.clip(np.stack(tts, axis=-1).reshape(N, O), 0, LSMP)
    mask = np.ones(O, dtype=np.float32)
    return onsets, tt, mask


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    np.asarray(out[0])  # warm-up + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out[0])  # fetch forces completion under the relay
    dt = (time.perf_counter() - t0) / iters
    gps = N * O * S / dt / 1e9
    return dt, gps


def variant_kernel(group, tile, flat_gather):
    """Build a migrate_detect-like kernel with the given knobs."""

    @partial(jax.jit, static_argnames=())
    def run(onsets, tt, mask, available):
        onsets_log = _prepare_onsets(onsets, mask)
        shift_table, d_max = _build_shift_table(onsets_log, FSMP, S)

        n_tiles = -(-N // tile)
        pad = n_tiles * tile - N
        tt_tiles = jnp.pad(tt, ((0, pad), (0, 0))).reshape(n_tiles, tile, -1)

        g = group
        o_pad = -(-O // g) * g - O
        st = jnp.pad(shift_table, ((0, o_pad), (0, 0), (0, 0)))
        mk = jnp.pad(mask, (0, o_pad))
        n_groups = st.shape[0] // g
        d_len = st.shape[1]

        node_idx_base = jnp.arange(tile, dtype=jnp.int32)

        def stack_tile(tt_tile):
            def body(acc, inputs):
                windows, tt_g, m = inputs  # [g, D, S], [g, Nt], [g]
                if flat_gather:
                    flat = windows.reshape(g * d_len, S)
                    idx = (
                        jnp.arange(g, dtype=jnp.int32)[:, None] * d_len
                        + jnp.clip(tt_g, 0, d_max)
                    ).reshape(-1)
                    rows = jnp.take(flat, idx, axis=0).reshape(g, -1, S)
                    acc = acc + (m[:, None, None] * rows).sum(axis=0)
                else:
                    for j in range(g):
                        rows = jnp.take(
                            windows[j], jnp.clip(tt_g[j], 0, d_max), axis=0
                        )
                        acc = acc + m[j] * rows
                return acc, None

            acc0 = jnp.zeros((tt_tile.shape[0], S), dtype=st.dtype)
            acc, _ = jax.lax.scan(
                body,
                acc0,
                (
                    st.reshape(n_groups, g, d_len, S),
                    tt_tile.T.reshape(n_groups, g, -1),
                    mk.reshape(n_groups, g),
                ),
            )
            return jnp.exp(acc / available)

        def tile_body(carry, inputs):
            running_max, running_idx, running_sum = carry
            tt_tile, tile_i = inputs
            coa = stack_tile(tt_tile)
            global_idx = tile_i * tile + node_idx_base
            valid = (global_idx < N)[:, None]
            coa = jnp.where(valid, coa, 0.0)
            tile_max = jnp.max(coa, axis=0)
            tile_arg = jnp.take(
                global_idx, jnp.argmax(coa, axis=0).astype(jnp.int32)
            )
            return (
                jnp.where(tile_max > running_max, tile_max, running_max),
                jnp.where(tile_max > running_max, tile_arg, running_idx),
                running_sum + jnp.sum(coa, axis=0),
            ), None

        init = (
            jnp.full(S, -jnp.inf, dtype=st.dtype),
            jnp.zeros(S, dtype=jnp.int32),
            jnp.zeros(S, dtype=st.dtype),
        )
        (mx, idx, sm), _ = jax.lax.scan(
            tile_body, init, (tt_tiles, jnp.arange(n_tiles, dtype=jnp.int32))
        )
        return mx, idx, sm

    return run


def main():
    print("devices:", jax.devices())
    onsets, tt, mask = make_problem()
    avail = np.float32(mask.sum())
    onsets = jax.device_put(onsets)
    tt = jax.device_put(tt)
    mask = jax.device_put(mask)

    # Baseline: library migrate_detect as shipped
    fn = partial(migrate_detect, fsmp=FSMP, nsamples=S, n_nodes_real=N,
                 tile=4096)
    dt, gps = timed(fn, onsets, tt, mask, avail)
    print(f"baseline lib (g=4, tile=4096)       : {dt*1e3:7.1f} ms  {gps:6.1f} G/s")

    for group, tile, flat in [
        (4, 4096, True),
        (8, 4096, False),
        (2, 4096, False),
        (4, 8192, False),
        (4, 16384, False),
        (24, 4096, True),
    ]:
        k = variant_kernel(group, tile, flat)
        dt, gps = timed(k, onsets, tt, mask, avail)
        print(
            f"g={group:<2d} tile={tile:<5d} flat={int(flat)}           "
            f": {dt*1e3:7.1f} ms  {gps:6.1f} G/s"
        )


if __name__ == "__main__":
    main()
