# -*- coding: utf-8 -*-
"""Split the detect drain stage into its two phases -- device-compute
wait vs host fetch (relay transfer) -- to decide whether parallel fetch
workers (ordered append) would lift throughput beyond one-drain-worker
pipelining.

For each window the drain worker calls block_until_ready() (timed:
residual compute wait) then np.asarray(packed) (timed: relay transfer +
host copy). Steady-state cadence == drain duration when the drain worker
is the bottleneck; whichever phase dominates is the next lever.

Run: QM_WINDOWS=10 PYTHONPATH=/root/repo:$PYTHONPATH \
    python experiments/exp_drain_split.py
"""

import os
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import day_e2e  # noqa: E402

WORLD = day_e2e.WORLD
N = int(os.environ.get("QM_WINDOWS", 10))


def main():
    from quakemigrate_tpu import QuakeScan
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.signal.onsets import STALTAOnset

    lut, stations = day_e2e.build_lut()
    shutil.rmtree(WORLD / "runs_prof", ignore_errors=True)
    archive = Archive(
        archive_path=WORLD / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="classic", sampling_rate=day_e2e.SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 16, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(WORLD / "runs_prof"),
        run_name="prof", marginal_window=1.0, timestep=day_e2e.TIMESTEP,
        kernel="auto",
    )

    waits, fetches = [], []
    orig = scan._drain_detect_results

    def timed_drain(coalescence, availability, starttime, prepared, results):
        for i in results:
            r = results[i]
            if hasattr(r, "block_until_ready"):
                t0 = time.perf_counter()
                r.block_until_ready()
                t1 = time.perf_counter()
                arr = np.asarray(r)
                t2 = time.perf_counter()
                waits.append(t1 - t0)
                fetches.append(t2 - t1)
                results[i] = arr  # already host-side; drain reuses it
        return orig(coalescence, availability, starttime, prepared, results)

    scan._drain_detect_results = timed_drain

    t0 = time.perf_counter()
    end_s = 120 + N * 120
    scan.detect(
        f"{day_e2e.DAY}T00:02:00.0",
        f"{day_e2e.DAY}T{end_s // 3600:02d}:{end_s % 3600 // 60:02d}"
        f":{end_s % 60:02d}.0",
    )
    wall = time.perf_counter() - t0

    def stats(name, xs):
        xs = xs[2:] if len(xs) > 4 else xs  # drop warm-up
        print(
            f"{name:7s} warm_mean={np.mean(xs)*1e3:7.0f} ms  "
            f"p50={np.percentile(xs, 50)*1e3:7.0f}  "
            f"max={np.max(xs)*1e3:7.0f}"
        )

    stats("wait", waits)
    stats("fetch", fetches)
    print(f"wall {wall:.1f} s for {N} windows -> {wall/N*1e3:.0f} ms/window")


if __name__ == "__main__":
    main()
