# -*- coding: utf-8 -*-
"""
Locate throughput on the day-scale world: run ``locate()`` over the
events triggered by tools/day_e2e.py (real synthetic waveforms, full
two-pass migration + spline refinement + Gaussian picks per event on the
TPU) and fold seconds-per-event into DAY_E2E.json.

Requires a completed day_e2e run (/tmp/qm_day_e2e). Run:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/day_locate.py [max_events]
"""

import json
import pathlib
import sys
import time

import pandas as pd

from day_e2e import SCAN_END, SCAN_START, SPS, WORLD, build_lut

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main(max_events=12):
    from quakemigrate_tpu import QuakeScan
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.signal.onsets import STALTAOnset
    from quakemigrate_tpu.signal.pickers import GaussianPicker

    ev_dir = WORLD / "runs" / "day" / "trigger" / "events"
    tables = sorted(ev_dir.glob("*.csv"))
    if not tables:
        sys.exit("no triggered events; run tools/day_e2e.py first")
    events = pd.concat([pd.read_csv(f) for f in tables])
    # A sampled subset: locate cost is per-event, so a dozen events give
    # a stable seconds/event figure.
    subset = events.iloc[:: max(1, len(events) // max_events)][:max_events]
    trig_file = WORLD / "runs" / "day" / "locate_subset.csv"
    subset.to_csv(trig_file, index=False)

    lut, stations = build_lut()
    archive = Archive(
        archive_path=WORLD / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="centred", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 16, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(WORLD / "runs"),
        run_name="day", marginal_window=1.0, timestep=120.0,
        kernel="auto", picker=GaussianPicker(onset=onset),
        plot_event_summary=False,
    )
    t0 = time.perf_counter()
    scan.locate(trigger_file=str(trig_file))
    wall = time.perf_counter() - t0

    located = 0
    ev_out = WORLD / "runs" / "day" / "locate" / "events"
    if ev_out.is_dir():
        located = len(list(ev_out.glob("*.event")))

    path = ROOT / "DAY_E2E.json"
    record = json.loads(path.read_text()) if path.is_file() else {}
    record.update(
        locate_events=located,
        locate_wall_seconds=round(wall, 1),
        locate_seconds_per_event=round(wall / max(located, 1), 2),
    )
    path.write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
