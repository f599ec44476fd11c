# -*- coding: utf-8 -*-
"""
Node-ordering experiment on the REALISTIC moveout field (the bench
workload): does any permutation of the node axis beat the LUT's natural
C-order (z-fastest) for gather locality in the fused detect kernel?

Run: PYTHONPATH=. python experiments/exp_node_order.py

"""

import time
from functools import partial

import numpy as np

import jax

from quakemigrate_tpu.ops.migrate import migrate_detect

NX, NY, NZ = 71, 64, 57
N = NX * NY * NZ
O = 24
S = 625
FSMP, LSMP = 475, 575
T = S + FSMP + LSMP
RATE = 250
ITERS = 8


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    onsets = rng.gamma(2.0, 1.5, size=(O, T)).astype(np.float32)
    x, y, z = np.meshgrid(
        np.arange(NX) * 0.025, np.arange(NY) * 0.025, np.arange(NZ) * 0.025,
        indexing="ij",
    )
    tts = []
    for i in range(O):
        sx, sy = rng.uniform(0, NX * 0.025), rng.uniform(0, NY * 0.025)
        v = 3.63 if i < O // 2 else 1.833
        dist = np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2)
        tts.append(np.rint(dist / v * RATE).astype(np.int32))
    tt = np.stack(tts, axis=-1).reshape(N, O)
    return onsets, np.clip(tt, 0, LSMP)


def brick_order(bx=8, by=8, bz=8):
    """Flat node order that walks the grid in bx*by*bz bricks."""

    idx = np.arange(N).reshape(NX, NY, NZ)
    order = []
    for i0 in range(0, NX, bx):
        for j0 in range(0, NY, by):
            for k0 in range(0, NZ, bz):
                order.append(
                    idx[i0 : i0 + bx, j0 : j0 + by, k0 : k0 + bz].ravel()
                )
    return np.concatenate(order).astype(np.int32)


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        np.asarray(out[0])
    dt = (time.perf_counter() - t0) / ITERS
    return dt, N * O * S / dt / 1e9


def main():
    print("devices:", jax.devices())
    onsets, tt = make_workload()
    avail = np.float32(O)
    fn = partial(migrate_detect, fsmp=FSMP, nsamples=S, n_nodes_real=N,
                 tile=4096)

    onsets_d = jax.device_put(onsets)
    mask_d = jax.device_put(np.ones(O, np.float32))
    dt, gps = timed(fn, onsets_d, jax.device_put(tt), mask_d, avail)
    print(f"natural C-order (z fastest) : {dt*1e3:7.1f} ms  {gps:6.1f} G/s")

    for name, order in [
        ("brick 8x8x8", brick_order(8, 8, 8)),
        ("brick 16x16x16", brick_order(16, 16, 16)),
        ("brick 4x4x57 (z-columns)", brick_order(4, 4, 57)),
        ("sorted by mean tt", np.argsort(tt.mean(axis=1), kind="stable")),
        ("sorted by tt[:,0]", np.argsort(tt[:, 0], kind="stable")),
    ]:
        dt, gps = timed(fn, onsets_d, jax.device_put(tt[order]), mask_d,
                        avail)
        print(f"{name:<27s} : {dt*1e3:7.1f} ms  {gps:6.1f} G/s")


if __name__ == "__main__":
    main()
