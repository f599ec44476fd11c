# -*- coding: utf-8 -*-
"""
On-hardware validation + timing of the sample-axis-blocked MXU kernel at
the day-scale geometry (timestep=120 s at 250 Hz -> 30,000 scan samples,
Icequake-sized grid) that round 2's kernel rejected to XLA.

Run: python experiments/exp_sample_blocking.py [nsamples]
"""

import sys
import time

import numpy as np


def main(nsamples=30_000):
    import jax

    from quakemigrate_tpu.ops.migrate import migrate_detect
    from quakemigrate_tpu.ops.pallas_migrate import make_mxu_detect

    print(f"backend: {jax.default_backend()}  nsamples={nsamples}")

    # Icequake-like geometry: 71x64x57 grid, 24 onsets, 250 Hz
    nx, ny, nz, n_onsets = 71, 64, 57, 24
    rate = 250.0
    fsmp, max_tt_s = 500, 0.6
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
    t_samples = fsmp + nsamples + lsmp
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    avail = float(n_onsets)
    n_nodes = nx * ny * nz

    kernel = make_mxu_detect(tt, (nx, ny, nz), fsmp, nsamples)
    print(
        f"plan: tile={kernel.plan.tile} r_span={kernel.r_spans[0]} "
        f"sblk={kernel.sblk} n_sblocks={-(-nsamples // kernel.sblk)} "
        f"vmem={kernel.estimated_vmem_bytes() / 2**20:.1f} MiB "
        f"fits={kernel.fits_vmem()}"
    )
    assert kernel.fits_vmem(), "day-scale window must fit via blocking"

    # compile + parity vs the XLA path on the same device
    t0 = time.perf_counter()
    out = [np.asarray(v) for v in kernel(onsets, mask, avail)]
    print(f"mxu compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, avail, fsmp, nsamples)
    ]
    print(f"xla compile+run: {time.perf_counter() - t0:.1f} s")

    rel = np.abs(out[0] - ref[0]) / np.maximum(np.abs(ref[0]), 1e-30)
    agree = (out[2] == ref[2]).mean()
    print(f"parity: max rel err {rel.max():.2e}, argmax agree {agree:.4f}")

    def bench(fn, reps=5):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    units = n_nodes * n_onsets * nsamples
    t_mxu = bench(lambda: kernel(onsets, mask, avail))
    t_xla = bench(
        lambda: migrate_detect(onsets, tt, mask, avail, fsmp, nsamples)
    )
    print(
        f"mxu: {t_mxu * 1e3:.1f} ms = {units / t_mxu / 1e9:.1f} G/s | "
        f"xla: {t_xla * 1e3:.1f} ms = {units / t_xla / 1e9:.1f} G/s | "
        f"speedup {t_xla / t_mxu:.2f}x"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30_000)
