# -*- coding: utf-8 -*-
"""
Timing-methodology check on the axon remote TPU: does block_until_ready
actually wait for remote execution, or must outputs be fetched? Compares
block_until_ready-based and np.asarray-based timings on the same day-scale
MXU kernel call.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_timing_check.py
"""

import time

import numpy as np


def main(nsamples=30_000):
    import jax

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    nx, ny, nz, n_onsets = 71, 64, 57, 24
    rate, fsmp = 250.0, 500
    rng = np.random.default_rng(0)
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.025, np.arange(ny) * 0.025, np.arange(nz) * 0.025,
        indexing="ij",
    )
    tts = []
    for o in range(n_onsets):
        sx, sy = rng.uniform(0, nx * 0.025), rng.uniform(0, ny * 0.025)
        v = 3.63 if o < n_onsets // 2 else 1.833
        tts.append(np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2) / v)
    tt = np.rint(np.stack(tts, -1).reshape(-1, n_onsets) * rate).astype(
        np.int32
    )
    lsmp = int(tt.max()) + 8
    onsets = rng.gamma(
        2.0, 1.5, size=(n_onsets, fsmp + nsamples + lsmp)
    ).astype(np.float32)
    mask = np.ones(n_onsets, dtype=np.float32)
    avail = float(n_onsets)
    units = nx * ny * nz * n_onsets * nsamples

    for tile, brick, sblk in ((1024, (16, 8, 8), 128), (512, (8, 8, 8), 512)):
        kernel = PallasDetectMXU(
            tt, (nx, ny, nz), fsmp, nsamples, tile=tile, brick_shape=brick,
            sblk=sblk,
        )
        t0 = time.perf_counter()
        out = kernel(onsets, mask, avail)
        jax.block_until_ready(out)
        print(f"tile={tile}: first call {time.perf_counter() - t0:.1f}s")

        # method A: block_until_ready after N queued calls
        t0 = time.perf_counter()
        for _ in range(3):
            out = kernel(onsets, mask, avail)
        jax.block_until_ready(out)
        ta = (time.perf_counter() - t0) / 3

        # method B: fetch one output to host each call
        t0 = time.perf_counter()
        for _ in range(3):
            out = kernel(onsets, mask, avail)
            np.asarray(out[0])
        tb = (time.perf_counter() - t0) / 3

        print(
            f"tile={tile} sblk={sblk}: block_until_ready {ta * 1e3:.1f} ms"
            f" ({units / ta / 1e9:.0f} G/s) | asarray {tb * 1e3:.1f} ms"
            f" ({units / tb / 1e9:.0f} G/s)"
        )


if __name__ == "__main__":
    main()
