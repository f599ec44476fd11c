# -*- coding: utf-8 -*-
"""
Locate throughput at the regional grid scale: run the pipelined
``locate()`` over every event triggered by tools/regional_e2e.py
(915k-node grid, 16 stations at 50 Hz -- the locate windows migrate
the full grid and the two-pass marginalisation fetches O(n_nodes)
bytes per event) and fold seconds-per-event + planted-location
accuracy into REGIONAL_E2E.json.

Requires a completed regional_e2e run (/tmp/qm_regional_e2e). Run:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/regional_locate.py
"""

import json
import pathlib
import sys
import time

import numpy as np
import pandas as pd

from regional_e2e import MATCH_TOL_S, PLANTED_FILE, SPS, WORLD, build_lut

ROOT = pathlib.Path(__file__).resolve().parent.parent


def make_scan(lut, stations, run_name="regional", **kwargs):
    from quakemigrate_tpu import QuakeScan
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.signal.onsets import STALTAOnset
    from quakemigrate_tpu.signal.pickers import GaussianPicker

    archive = Archive(
        archive_path=WORLD / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="centred", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 10, 2], "S": [1, 10, 2]}
    onset.sta_lta_windows = {"P": [0.4, 4.0], "S": [0.6, 4.0]}
    return QuakeScan(
        archive, lut, onset=onset, run_path=str(WORLD / "runs"),
        run_name=run_name, marginal_window=2.0, timestep=300.0,
        kernel="auto", picker=GaussianPicker(onset=onset),
        plot_event_summary=False, **kwargs,
    )


def location_accuracy(lut, events_dir):
    from day_locate import location_accuracy as shared

    return shared(
        lut, events_dir, planted_file=PLANTED_FILE, day="2015-03-10",
        latitude=64.0, tol_s=MATCH_TOL_S,
    )


def main():
    ev_dir = WORLD / "runs" / "regional" / "trigger" / "events"
    tables = sorted(ev_dir.glob("*.csv"))
    if not tables:
        sys.exit("no triggered events; run tools/regional_e2e.py first")
    events = pd.concat([pd.read_csv(f) for f in tables])
    trig_file = WORLD / "runs" / "regional" / "locate_all.csv"
    events.to_csv(trig_file, index=False)

    lut, stations = build_lut()

    # Warm-up (backend init + table/plan upload; see day_locate.py)
    warm_file = WORLD / "runs" / "regional" / "locate_warmup.csv"
    events.iloc[:1].to_csv(warm_file, index=False)
    make_scan(lut, stations, run_name="regional_warmup").locate(
        trigger_file=str(warm_file)
    )

    scan = make_scan(lut, stations)
    t0 = time.perf_counter()
    scan.locate(trigger_file=str(trig_file))
    wall = time.perf_counter() - t0

    marks = np.asarray(getattr(scan, "locate_event_marks", []) or [wall])
    loc_p50, loc_p90 = np.percentile(marks, [50, 90])

    ev_out = WORLD / "runs" / "regional" / "locate" / "events"
    located = len(list(ev_out.glob("*.event"))) if ev_out.is_dir() else 0

    path = ROOT / "REGIONAL_E2E.json"
    record = json.loads(path.read_text()) if path.is_file() else {}
    record.update(
        locate_events=located,
        locate_candidates=int(len(events)),
        locate_wall_seconds=round(wall, 1),
        locate_seconds_per_event=round(wall / max(located, 1), 2),
        locate_seconds_per_event_p50=round(float(loc_p50), 2),
        locate_seconds_per_event_p90=round(float(loc_p90), 2),
        locate_workers=scan.locate_workers,
        **location_accuracy(lut, ev_out),
    )
    path.write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
