# -*- coding: utf-8 -*-
"""
Day-scale (tile, sblk) config sweep for the sample-blocked MXU kernel:
measures throughput AND compile time per MXU_CONFIGS entry at the
Icequake geometry with a 30,000-sample window.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_sblk_sweep.py
"""

import time

import numpy as np


def main(nsamples=30_000):
    import jax

    from quakemigrate_tpu.ops.pallas_migrate import (
        MXU_CONFIGS,
        PallasDetectMXU,
        _pick_sblk,
    )

    print(f"backend: {jax.default_backend()}  nsamples={nsamples}")

    nx, ny, nz, n_onsets = 71, 64, 57, 24
    rate = 250.0
    fsmp = 500
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
    units = n_nodes * n_onsets * nsamples

    for tile, brick in MXU_CONFIGS:
        kernel = PallasDetectMXU(
            tt, (nx, ny, nz), fsmp, nsamples, tile=tile, brick_shape=brick,
            sblk=128,  # placeholder; re-picked below from actual spans
        )
        sblk = _pick_sblk(tile, sum(kernel.r_spans), n_onsets, nsamples)
        if sblk is None:
            print(f"tile={tile}: no sblk fits")
            continue
        kernel.sblk = sblk
        t0 = time.perf_counter()
        out = kernel(onsets, mask, avail)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = kernel(onsets, mask, avail)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"tile={tile} span={kernel.r_spans[0]} sblk={sblk} "
            f"blocks={-(-nsamples // sblk)} "
            f"vmem={kernel.estimated_vmem_bytes() / 2**20:.1f}MiB | "
            f"compile {t_compile:.0f}s | {dt * 1e3:.0f} ms "
            f"= {units / dt / 1e9:.0f} G/s"
        )


if __name__ == "__main__":
    main()
