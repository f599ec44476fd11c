# -*- coding: utf-8 -*-
"""
Benchmark: coalescence-stack throughput (grid-node x samples x onsets per
second) of the fused detect kernel on an Icequake_Iceland-shaped workload
(2.6e5 grid nodes, 24 onsets, 625 scan samples per 2.5 s timestep at
250 Hz -- see BASELINE.md), versus the reference single-core C kernel
compiled from /root/reference at run time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

"""

import json
import os
import sys
import time

import numpy as np

# Icequake_Iceland detect geometry (BASELINE.md)
NX, NY, NZ = 71, 64, 57
N_ONSETS = 24
RATE = 250
TIMESTEP = 2.5
NSAMPLES = int(TIMESTEP * RATE)  # 625
FSMP = 475  # ~1.9 s pre-pad
LSMP = 575  # ~2.3 s post-pad
T_SAMPLES = NSAMPLES + FSMP + LSMP

# Reference C single-core throughput measured on this host (node*onset*samples/s
# for migrate+find_max_coa); used if the reference checkout is unavailable.
FALLBACK_BASELINE = None


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    onsets = rng.gamma(2.0, 1.5, size=(N_ONSETS, T_SAMPLES))
    # Realistic traveltime field: homogeneous moveout from 24 pseudo-sources
    x, y, z = np.meshgrid(
        np.arange(NX) * 0.025, np.arange(NY) * 0.025, np.arange(NZ) * 0.025,
        indexing="ij",
    )
    tts = []
    for i in range(N_ONSETS):
        sx, sy = rng.uniform(0, NX * 0.025), rng.uniform(0, NY * 0.025)
        v = 3.63 if i < N_ONSETS // 2 else 1.833
        dist = np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2)
        tts.append(np.rint(dist / v * RATE).astype(np.int32))
    tt4d = np.stack(tts, axis=-1)
    # Clip to the valid range for the scan geometry
    tt4d = np.clip(tt4d, 0, LSMP)
    return onsets, tt4d


def bench_tpu(onsets, tt4d, iters=5):
    import jax

    from quakemigrate_tpu.ops.migrate import migrate_detect

    tt_flat = np.ascontiguousarray(tt4d.reshape(-1, N_ONSETS))
    dtype = np.float32
    mask = np.ones(N_ONSETS, dtype=dtype)

    tt_dev = jax.device_put(tt_flat)
    mask_dev = jax.device_put(mask)
    # Distinct onset blocks per iteration so no layer can cache the result
    rng = np.random.default_rng(3)
    blocks = [
        jax.device_put(
            rng.gamma(2.0, 1.5, size=onsets.shape).astype(dtype)
        )
        for _ in range(iters)
    ]

    def run(block):
        out = migrate_detect(
            block, tt_dev, mask_dev, float(N_ONSETS), FSMP, NSAMPLES
        )
        # NOTE: fetch to host to force execution -- block_until_ready() does
        # not reliably block under the remote-TPU relay in this environment.
        return float(np.asarray(out[0]).sum())

    run(blocks[0])  # warm up (compile)

    times = []
    for block in blocks:
        t0 = time.perf_counter()
        run(block)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    work = tt_flat.shape[0] * N_ONSETS * NSAMPLES
    return work / elapsed, elapsed


def bench_reference_c(onsets, tt4d, max_seconds=120.0):
    """Single-core reference C kernels (migrate + find_max_coa)."""

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    try:
        from oracle import load_oracle, oracle_find_max_coa, oracle_migrate
    except ImportError:
        return None

    if load_oracle() is None:
        return None

    t0 = time.perf_counter()
    map4d = oracle_migrate(onsets, tt4d, FSMP, LSMP, N_ONSETS, threads=1)
    _ = oracle_find_max_coa(map4d, threads=1)
    elapsed = time.perf_counter() - t0

    work = np.prod(tt4d.shape[:3]) * N_ONSETS * NSAMPLES
    return work / elapsed


def main():
    onsets, tt4d = make_workload()

    throughput, elapsed = bench_tpu(onsets, tt4d)

    baseline = None
    if os.environ.get("QM_BENCH_SKIP_BASELINE") != "1":
        baseline = bench_reference_c(onsets, tt4d)
    if baseline is None:
        baseline = FALLBACK_BASELINE

    vs_baseline = throughput / baseline if baseline else None

    print(
        json.dumps(
            {
                "metric": "coalescence throughput (node*onset*samples/s), "
                "Icequake_Iceland detect geometry, fused migrate+reduce",
                "value": round(throughput / 1e9, 3),
                "unit": "Gsamples/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
