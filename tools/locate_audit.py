# -*- coding: utf-8 -*-
"""
Locate-accuracy audit: TPU locate vs the REFERENCE C pipeline on the same
synthetic day-harness events (round-4 verdict item 2: the ~3-node
synthetic-truth error had never been attributed to either the TPU engine
or the harness physics).

Both sides consume identical inputs (same mSEED archive, same host onset
path -- which is parity-tested against the reference C STA/LTA kernels at
rtol 1e-12 in tests/test_ops.py). The sides then diverge:

- TPU side: ``QuakeScan.locate()`` itself -- the production path
  (Pallas int8 MXU or XLA migrate, f32, two-pass on-device
  marginalisation).
- Reference side: the reference C ``migrate`` + ``find_max_coa``
  (float64, compiled at run time from the reference checkout via
  tests/oracle.py), the reference's marginalisation semantics (otime =
  peak coalescence, trim to otime ± marginal_window with the
  end-exclusive slice quirk, sum over time -- reference
  signal/scan.py:472-591, io/event.py:433-435), and the same location
  estimators that tests/test_benchmark_parity.py pins digit-level to the
  reference's golden .event files.

Any TPU-vs-reference disagreement therefore isolates the TPU engine
(int8x3 table encoding, f32 marginalisation); agreement bounds the
engine's contribution and attributes the remaining truth error to the
harness physics (finite onset width at the network geometry).

Writes LOCATE_AUDIT.json: per-event spline/gaussian deltas in node
spacings plus each side's error vs the planted truth.

Requires a completed day_e2e run. Run:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/locate_audit.py [n_events]
"""

import json
import os
import pathlib
import sys
import time

import numpy as np
import pandas as pd

from day_e2e import PLANTED_FILE, SPS, WORLD, build_lut
from day_locate import make_scan

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tests"))

MARGINAL_WINDOW = 1.0
N_EVENTS = 16


def reference_locate(scan, lut, tt4d, event_row):
    """
    One event through the reference C pipeline (float64 end to end):
    returns {"spline": [lon, lat, z], "gaussian": [...]} or None when the
    trigger falls outside the marginal window of the f64 peak.

    """

    import oracle

    from quakemigrate_tpu import util
    from quakemigrate_tpu.seis import UTCDateTime

    mw = MARGINAL_WINDOW
    trigger_time = UTCDateTime(event_row["CoaTime"])
    pre_pad, post_pad = scan.onset.pad(4 * mw)
    w_beg = trigger_time - 2 * mw - pre_pad
    w_end = trigger_time + 2 * mw + post_pad

    data = scan.archive.read_waveform_data(w_beg, w_end)
    onsets, onset_data = scan.onset.calculate_onsets(data)
    block, mask, available = scan._device_inputs(onsets, onset_data)

    fsmp = util.time2sample(pre_pad, SPS)
    lsmp = util.time2sample(post_pad, SPS)

    # Reference C migrate sums log(onset) over ALL rows; dead slots carry
    # onset == 1 (log 0), identical to excluding them, with ``available``
    # the live count -- the exact masking semantics of the scan engine.
    map4d = oracle.oracle_migrate(
        block.astype(np.float64), tt4d, fsmp, lsmp, int(available),
        threads=min(8, os.cpu_count() or 1),
    )
    max_coa, _, _ = oracle.oracle_find_max_coa(
        map4d, threads=min(8, os.cpu_count() or 1)
    )

    nsamples = map4d.shape[-1]
    first = trigger_time - 2 * mw
    times = np.array(
        [first + i / SPS for i in range(nsamples)], dtype=object
    )
    otime = times[int(np.argmax(max_coa))]
    if abs(trigger_time - otime) >= mw:
        return None

    # Trim to otime ± mw; end-exclusive map slice (reference quirk,
    # ref io/event.py:433-435) -- the last retained coa row's map sample
    # is excluded from the marginalisation.
    keep = np.array([otime - mw <= t <= otime + mw for t in times])
    idx = np.flatnonzero(keep)
    i0, i1 = int(idx[0]), int(idx[-1])
    coa_map = map4d[..., i0:i1].sum(axis=-1)
    coa_map = coa_map / np.nanmax(coa_map)

    spline = scan._splineloc(np.copy(coa_map))
    gaussian, _ = scan._gaufit3d(scan._gaufilt3d(np.copy(coa_map)))
    return {"spline": list(map(float, spline)),
            "gaussian": list(map(float, gaussian))}


def delta_nodes(lut, a, b):
    """Worst-axis |a-b| in node spacings (lon/lat/z -> grid km)."""

    xyz_a = np.asarray(lut.coord2grid([a]))[0]
    xyz_b = np.asarray(lut.coord2grid([b]))[0]
    return float(np.max(np.abs(xyz_a - xyz_b) / lut.node_spacing))


def main(n_events=N_EVENTS):
    import oracle

    if oracle.load_oracle() is None:
        sys.exit("reference oracle unavailable (no checkout or compiler)")

    ev_dir = WORLD / "runs" / "day" / "trigger" / "events"
    tables = sorted(ev_dir.glob("*.csv"))
    if not tables:
        sys.exit("no triggered events; run tools/day_e2e.py first")
    events = pd.concat([pd.read_csv(f) for f in tables])
    # Spread the audit subset across the whole day
    step = max(1, len(events) // n_events)
    events = events.iloc[::step].iloc[:n_events]

    lut, stations = build_lut()
    planted = json.loads(PLANTED_FILE.read_text())

    # --- TPU side: the production locate on the audit subset ---
    trig_file = WORLD / "runs" / "day" / "locate_audit.csv"
    events.to_csv(trig_file, index=False)
    scan = make_scan(lut, stations, run_name="day_audit")  # mw = 1.0
    t0 = time.perf_counter()
    scan.locate(trigger_file=str(trig_file))
    tpu_wall = time.perf_counter() - t0
    ev_out = WORLD / "runs" / "day_audit" / "locate" / "events"
    tpu_rows = {
        f.stem: pd.read_csv(f).iloc[0] for f in sorted(ev_out.glob("*.event"))
    }

    # --- reference side: C float64 pipeline on the same events ---
    # Full phase-major canonical slot table, like the scan's device state.
    slots = [(ph, st) for ph in scan.onset.phases
             for st in scan.archive.stations]
    tt4d = np.rint(
        np.stack([lut[st][ph] for ph, st in slots], axis=-1) * SPS
    ).astype(np.int32)

    from quakemigrate_tpu.seis import UTCDateTime

    day0 = UTCDateTime("2014-06-29T00:00:00.0")
    rows, skipped = [], 0
    for _, event_row in events.iterrows():
        uid = str(event_row["EventID"])
        tpu = tpu_rows.get(uid)
        if tpu is None:
            skipped += 1
            continue
        t0 = time.perf_counter()
        ref = reference_locate(scan, lut, tt4d, event_row)
        ref_secs = time.perf_counter() - t0
        if ref is None:
            skipped += 1
            continue

        t_ev = float(UTCDateTime(event_row["CoaTime"]) - day0)
        near = min(planted, key=lambda rec: abs(rec["t"] - t_ev))
        truth = near["coords"]

        tpu_spline = [float(tpu["X"]), float(tpu["Y"]), float(tpu["Z"])]
        tpu_gau = [float(tpu["GAU_X"]), float(tpu["GAU_Y"]),
                   float(tpu["GAU_Z"])]
        rows.append({
            "uid": uid,
            "delta_spline_nodes": round(
                delta_nodes(lut, tpu_spline, ref["spline"]), 3
            ),
            "delta_gaussian_nodes": round(
                delta_nodes(lut, tpu_gau, ref["gaussian"]), 3
            ),
            "tpu_err_truth_nodes": round(
                delta_nodes(lut, tpu_spline, truth), 3
            ),
            "ref_err_truth_nodes": round(
                delta_nodes(lut, ref["spline"], truth), 3
            ),
            "ref_seconds": round(ref_secs, 1),
        })
        print(json.dumps(rows[-1]))

    if not rows:
        sys.exit("no events audited")

    d_spline = [r["delta_spline_nodes"] for r in rows]
    d_gau = [r["delta_gaussian_nodes"] for r in rows]
    tpu_err = [r["tpu_err_truth_nodes"] for r in rows]
    ref_err = [r["ref_err_truth_nodes"] for r in rows]
    record = {
        "events_audited": len(rows),
        "events_skipped": skipped,
        "marginal_window_s": MARGINAL_WINDOW,
        "delta_spline_nodes_median": round(float(np.median(d_spline)), 3),
        "delta_spline_nodes_max": round(float(np.max(d_spline)), 3),
        "delta_gaussian_nodes_median": round(float(np.median(d_gau)), 3),
        "delta_gaussian_nodes_max": round(float(np.max(d_gau)), 3),
        "tpu_err_truth_nodes_median": round(float(np.median(tpu_err)), 2),
        "tpu_err_truth_nodes_max": round(float(np.max(tpu_err)), 2),
        "ref_err_truth_nodes_median": round(float(np.median(ref_err)), 2),
        "ref_err_truth_nodes_max": round(float(np.max(ref_err)), 2),
        "tpu_locate_wall_seconds": round(tpu_wall, 1),
        "events": rows,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (ROOT / "LOCATE_AUDIT.json").write_text(json.dumps(record, indent=1))
    print(json.dumps({k: v for k, v in record.items() if k != "events"},
                     indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else N_EVENTS)
