# -*- coding: utf-8 -*-
"""
int8 3-word MXU kernel sweep vs the bf16 hi/lo pair, across the bench
workloads (short Icequake window, day-scale window, regional grid) and
(tile, sblk) configs.

Motivation (exp_dot_layout / /tmp int8 microbenches, v5e): the detect
step is matmul-bound, bf16 sustains ~160 TFLOP/s (~81% of the 197
peak), and int8 runs at ~2x -- so three int8 fixed-point words beat two
bf16 halves at ~0.75x the MXU time with ~13x tighter absolute error.
Int8 DMA row granularity was probed at 16 (same as bf16, despite the
(32, 128) memref tiling), so the int8 path keeps the same K.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_i8_sweep.py
"""

import time

import numpy as np


def regional_tt(n_onsets, rate, lsmp):
    nx, ny, nz = 142, 128, 114
    rng = np.random.default_rng(11)
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.0125, np.arange(ny) * 0.0125,
        np.arange(nz) * 0.0125, indexing="ij",
    )
    tts = []
    for i in range(n_onsets):
        v = 3.63 if i < n_onsets // 2 else 1.833
        d = np.sqrt(
            (x - rng.uniform(0, nx * 0.0125)) ** 2
            + (y - rng.uniform(0, ny * 0.0125)) ** 2 + z**2
        )
        tts.append(np.rint(d / v * rate).astype(np.int32))
    tt = np.clip(np.stack(tts, -1).reshape(-1, n_onsets), 0, lsmp)
    return tt, (nx, ny, nz)


def main():
    import jax

    import bench
    from quakemigrate_tpu.ops.pallas_migrate import (
        PallasDetectMXU, _round_up,
    )

    _, tt4d = bench.make_workload()
    tt_ice = np.ascontiguousarray(tt4d.reshape(-1, bench.N_ONSETS))
    tt_reg, reg_dims = regional_tt(bench.N_ONSETS, bench.RATE, bench.LSMP)

    mask = jax.device_put(np.ones(bench.N_ONSETS, dtype=np.float32))
    rng = np.random.default_rng(7)

    workloads = [
        ("short", tt_ice, (bench.NX, bench.NY, bench.NZ), 625),
        ("day", tt_ice, (bench.NX, bench.NY, bench.NZ), 30_000),
        ("regional", tt_reg, reg_dims, 625),
    ]
    for label, tt, dims, nsamples in workloads:
        t_samples = bench.FSMP + nsamples + bench.LSMP
        block = jax.device_put(
            rng.gamma(2.0, 1.5, size=(bench.N_ONSETS, t_samples)).astype(
                np.float32
            )
        )
        units = int(np.prod(dims)) * bench.N_ONSETS * nsamples
        ref_max = None
        for prec, tile, brick, sblk in (
            ("bf16hl", 512, (8, 8, 8), 2048),
            ("i8x3", 512, (8, 8, 8), 2048),
            ("i8x3", 512, (8, 8, 8), 4096),
            ("i8x3", 1024, (16, 8, 8), 2048),
            ("i8x2", 512, (8, 8, 8), 2048),
            ("i8x2", 1024, (16, 8, 8), 2048),
        ):
            sblk_eff = min(sblk, _round_up(nsamples, 128))
            try:
                k = PallasDetectMXU(
                    tt, dims, bench.FSMP, nsamples, tile=tile,
                    brick_shape=brick, sblk=sblk_eff, precision=prec,
                )
                out = np.asarray(k(block, mask, float(bench.N_ONSETS))[0])
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(k(block, mask, float(bench.N_ONSETS))[0])
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                line = (
                    f"{label:8s} {prec:7s} tile={tile:4d} sblk={sblk_eff:5d}"
                    f" K={sum(k.r_spans):4d}: {units / dt / 1e9:5.0f} G/s"
                    f"  {dt * 1e3:6.1f} ms"
                )
                if ref_max is None:
                    ref_max = out
                else:
                    rel = np.abs(out - ref_max) / np.maximum(
                        np.abs(ref_max), 1e-30
                    )
                    line += f"  rel={rel.max():.1e}"
                print(line)
            except Exception as err:
                print(f"{label:8s} {prec:7s} tile={tile} sblk={sblk_eff}: "
                      f"FAIL {type(err).__name__} {str(err)[:120]}")


if __name__ == "__main__":
    main()
