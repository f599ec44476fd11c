# -*- coding: utf-8 -*-
"""
Sweep the MXU detect kernel's (tile, brick_shape) on the real chip, on the
bench geometries. Motivation: a 512-node tile that is one 8x8x8 brick keeps
the residual span at 64 while halving both the grid-step count and the
total table-slice DMA bytes vs the (256, (8,8,4)) default.

Run: python experiments/exp_mxu_tile.py

"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU  # noqa: E402


def sweep(tt_flat, node_count, label, configs):
    import jax

    n_onsets = tt_flat.shape[1]
    mask = jax.device_put(np.ones(n_onsets, dtype=np.float32))
    rng = np.random.default_rng(3)
    t_samples = bench.T_SAMPLES
    blocks = [
        jax.device_put(
            rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(np.float32)
        )
        for _ in range(4)
    ]
    work = tt_flat.shape[0] * n_onsets * bench.NSAMPLES

    ref = None
    for tile, brick in configs:
        kernel = PallasDetectMXU(
            tt_flat, node_count, bench.FSMP, bench.NSAMPLES,
            tile=tile, brick_shape=brick,
        )
        vmem = kernel.estimated_vmem_bytes() / 2**20
        if not kernel.fits_vmem():
            print(f"{label} tile={tile} brick={brick}: skipped "
                  f"(est. VMEM {vmem:.1f} MB)")
            continue

        def run(block):
            # ONE host fetch forces execution (bench.py protocol); extra
            # fetches cost ~26 ms relay RTT each and mask the kernel time.
            return float(np.asarray(kernel(block, mask, float(n_onsets))[0]).sum())

        try:
            out = kernel(blocks[0], mask, float(n_onsets))  # warm-up/compile
            coa, idx = np.asarray(out[0]), np.asarray(out[2])
        except Exception as err:
            print(f"{label} tile={tile} brick={brick}: FAILED "
                  f"{type(err).__name__}: {str(err)[:120]}")
            continue
        if ref is None:
            ref = (coa, idx)
        agree = (np.allclose(coa, ref[0], rtol=1e-4)
                 and (idx == ref[1]).mean() > 0.99)
        times = []
        for block in blocks:
            t0 = time.perf_counter()
            run(block)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label} tile={tile} brick={brick}: {work / best / 1e9:7.1f} "
              f"G/s  {best * 1e3:6.1f} ms  r_span={kernel.r_span:3d} "
              f"tiles={kernel.plan.n_tiles:5d} vmem={vmem:4.1f} MB "
              f"agree={agree}")


def main():
    configs = [
        (256, (8, 8, 4)),   # shipped default
        (512, (8, 8, 8)),
        (512, (16, 8, 4)),
        (1024, (16, 8, 8)),
        (1024, (16, 16, 4)),
        (1024, (8, 8, 16)),
        (2048, (16, 16, 8)),
    ]

    onsets, tt4d = bench.make_workload()
    tt = np.ascontiguousarray(tt4d.reshape(-1, bench.N_ONSETS))
    sweep(tt, (bench.NX, bench.NY, bench.NZ), "icequake", configs)

    # Regional grid (bench_regional geometry)
    nx, ny, nz = 142, 128, 114
    rng = np.random.default_rng(11)
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.0125, np.arange(ny) * 0.0125,
        np.arange(nz) * 0.0125, indexing="ij",
    )
    tts = []
    for i in range(bench.N_ONSETS):
        v = 3.63 if i < bench.N_ONSETS // 2 else 1.833
        d = np.sqrt(
            (x - rng.uniform(0, nx * 0.0125)) ** 2
            + (y - rng.uniform(0, ny * 0.0125)) ** 2 + z**2
        )
        tts.append(np.rint(d / v * bench.RATE).astype(np.int32))
    tt = np.clip(
        np.stack(tts, -1).reshape(-1, bench.N_ONSETS), 0, bench.LSMP
    )
    sweep(tt, (nx, ny, nz), "regional", configs)


if __name__ == "__main__":
    main()
