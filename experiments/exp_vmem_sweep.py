# -*- coding: utf-8 -*-
"""
(tile, sblk) throughput sweep on hardware with the raised scoped-VMEM
limit, at BOTH the short (625-sample) and day-scale (30,000-sample)
Icequake windows. Timing forces execution with a host fetch (the remote
relay makes block_until_ready unreliable -- see bench.py).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_vmem_sweep.py
"""

import time

import numpy as np


def workload(nsamples, n_onsets=24, rate=250.0, fsmp=500):
    rng = np.random.default_rng(0)
    nx, ny, nz = 71, 64, 57
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
    return (nx, ny, nz), tt, onsets


def main():
    import jax

    from quakemigrate_tpu.ops.pallas_migrate import (
        PallasDetectMXU,
        _mxu_vmem_bytes,
        _round_up,
    )

    n_onsets, fsmp = 24, 500
    mask = np.ones(n_onsets, dtype=np.float32)

    for nsamples in (625, 30_000):
        dims, tt, onsets = workload(nsamples)
        units = int(np.prod(dims)) * n_onsets * nsamples
        print(f"--- nsamples={nsamples} ---")
        for tile, brick in ((1024, (16, 8, 8)), (512, (8, 8, 8)),
                            (256, (8, 8, 4))):
            kernel0 = PallasDetectMXU(
                tt, dims, fsmp, nsamples, tile=tile, brick_shape=brick,
                sblk=128,
            )
            span = kernel0.r_spans[0]
            full = _round_up(nsamples, 128)
            for sblk in sorted({128, 512, 1024, 2048, 4096, full}):
                if sblk > full:
                    continue
                est = _mxu_vmem_bytes(tile, span * n_onsets, n_onsets, sblk)
                if est > 96 * 2**20:
                    continue
                kernel = PallasDetectMXU(
                    tt, dims, fsmp, nsamples, tile=tile, brick_shape=brick,
                    sblk=sblk,
                )
                try:
                    t0 = time.perf_counter()
                    np.asarray(kernel(onsets, mask, float(n_onsets))[0])
                    t_first = time.perf_counter() - t0
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(kernel(onsets, mask, float(n_onsets))[0])
                        times.append(time.perf_counter() - t0)
                    dt = min(times)
                    print(
                        f"tile={tile} span={span} sblk={sblk} "
                        f"est={est / 2**20:.0f}MiB | first {t_first:.1f}s | "
                        f"{dt * 1e3:.0f} ms = {units / dt / 1e9:.0f} G/s"
                    )
                except Exception as err:
                    print(
                        f"tile={tile} span={span} sblk={sblk} "
                        f"est={est / 2**20:.0f}MiB | FAIL "
                        f"{type(err).__name__}: {str(err)[:120]}"
                    )


if __name__ == "__main__":
    main()
