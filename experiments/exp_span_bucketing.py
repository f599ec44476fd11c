# -*- coding: utf-8 -*-
"""
Per-tile span bucketing: is it worth splitting the grid into node subsets
with tighter residual spans and running the MXU kernel per bucket?

The one-hot matmul does sum(r_spans) MACs per node*sample regardless of a
tile's ACTUAL span -- the plan pads every onset's rows to the global
per-onset maximum. If span varies strongly across the grid (near-station
tiles see small moveout ranges, far corners large), bucketing recovers
the difference in pure FLOPs, at the cost of extra kernel dispatches and
a cross-bucket combine.

This experiment measures the real thing with the existing API: the node
axis is split into k z-slabs (span correlates with depth/offset), one
PallasDetectMXU per slab, outputs combined on host; timed against the
single-kernel baseline on the regional geometry (where the span is
widest and the question matters most).

Run on TPU: PYTHONPATH=. python experiments/exp_span_bucketing.py
"""

import time

import numpy as np

from quakemigrate_tpu.ops.pallas_migrate import make_mxu_detect

NX, NY, NZ = 142, 128, 114
N_ONSETS = 24
FSMP, NSAMPLES = 200, 625
RATE = 250.0


def make_tt(nz0=0, nz1=NZ):
    x, y, z = np.meshgrid(
        np.arange(NX) * 0.0125, np.arange(NY) * 0.0125,
        (nz0 + np.arange(nz1 - nz0)) * 0.0125, indexing="ij",
    )
    rng = np.random.default_rng(0)
    tts = []
    for o in range(N_ONSETS):
        sx = rng.uniform(0, NX * 0.0125)
        sy = rng.uniform(0, NY * 0.0125)
        v = 5.0 if o < N_ONSETS // 2 else 2.88
        tts.append(np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2) / v)
    return np.rint(np.stack(tts, -1).reshape(-1, N_ONSETS) * RATE).astype(
        np.int32
    )


def bench_kernel(kernel, onsets, mask, n_iter=5):
    out = kernel(onsets, mask, float(N_ONSETS))
    np.asarray(out[0])
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = kernel(onsets, mask, float(N_ONSETS))
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    rng = np.random.default_rng(3)
    tt = make_tt()
    lsmp = int(tt.max())
    onsets = rng.gamma(
        2.0, 1.5, size=(N_ONSETS, FSMP + NSAMPLES + lsmp + 8)
    ).astype(np.float32)
    mask = np.ones(N_ONSETS, dtype=np.float32)

    single = make_mxu_detect(tt, (NX, NY, NZ), FSMP, NSAMPLES)
    t_single, _ = bench_kernel(single, onsets, mask)
    work = NX * NY * NZ * N_ONSETS * NSAMPLES
    print(
        f"single kernel: tile={single.plan.tile} spans="
        f"{sorted(set(single.r_spans))} sum={sum(single.r_spans)} "
        f"t={t_single * 1e3:.1f} ms  {work / t_single / 1e9:.0f} G/s"
    )

    for k in (2, 4):
        kernels, spans, t_total = [], [], 0.0
        edges = np.linspace(0, NZ, k + 1).astype(int)
        for z0, z1 in zip(edges[:-1], edges[1:]):
            tt_slab = make_tt(z0, z1)
            kern = make_mxu_detect(
                tt_slab, (NX, NY, int(z1 - z0)), FSMP, NSAMPLES
            )
            t_k, _ = bench_kernel(kern, onsets, mask)
            t_total += t_k
            kernels.append(kern)
            spans.append(sum(kern.r_spans))
        print(
            f"{k}-bucket z-slabs: span sums={spans} "
            f"t={t_total * 1e3:.1f} ms  {work / t_total / 1e9:.0f} G/s "
            f"({t_single / t_total:.2f}x vs single)"
        )


if __name__ == "__main__":
    main()
