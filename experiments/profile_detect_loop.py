# -*- coding: utf-8 -*-
"""Per-stage wall-time profile of the continuous-detect loop on the real
chip, over the reusable /tmp/qm_day_e2e synthetic archive (10 windows).

Wraps the four pipeline stages (archive read on the reader thread, host
onset prep, device dispatch, drain = device wait + relay fetch + append)
with timers and prints each call's duration and a steady-state summary.

Run: QM_WINDOWS=10 PYTHONPATH=/root/repo:$PYTHONPATH \
    python experiments/profile_detect_loop.py
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

    stamps = []  # (stage, start, dur)

    def wrap(obj, name, label):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            stamps.append((label, t0, time.perf_counter() - t0))
            return out

        setattr(obj, name, timed)

    wrap(archive, "read_waveform_data", "read")
    wrap(scan, "_prepare_window", "prep")
    wrap(scan, "_run_detect_batch", "dispatch")
    wrap(scan, "_drain_detect_results", "drain")

    t0 = time.perf_counter()
    end_s = 120 + N * 120
    scan.detect(
        f"{day_e2e.DAY}T00:02:00.0",
        f"{day_e2e.DAY}T{end_s // 3600:02d}:{end_s % 3600 // 60:02d}"
        f":{end_s % 60:02d}.0",
    )
    wall = time.perf_counter() - t0

    base = min(s for _, s, _ in stamps)
    print(f"\n{'stage':9s} {'start':>8s} {'dur_ms':>8s}")
    for label, start, dur in sorted(stamps, key=lambda s: s[1]):
        print(f"{label:9s} {start - base:8.2f} {dur * 1e3:8.0f}")
    for label in ("read", "prep", "dispatch", "drain"):
        durs = [d for lbl, _, d in stamps if lbl == label]
        skip = durs[2:] if len(durs) > 4 else durs
        print(
            f"{label:9s} n={len(durs):3d} warm_mean={np.mean(skip)*1e3:7.0f}"
            f" ms  max={np.max(durs)*1e3:7.0f} ms"
        )
    print(f"wall {wall:.1f} s for {N} windows -> {wall/N*1e3:.0f} ms/window")


if __name__ == "__main__":
    main()
