# -*- coding: utf-8 -*-
"""
Day-scale end-to-end detect benchmark on real TPU hardware.

Generates a 24 h synthetic miniSEED archive at the Icequake geometry
(250 Hz, 8 stations x ZNE, hourly planted events over background noise),
runs a full ``detect()`` over the day at the documented day-scale
configuration (timestep=120 s -> 30,000-sample windows, kernel="auto",
fused window), then ``trigger()``, and records the sustained realtime
factor in DAY_E2E.json at the repo root (bench.py folds it into the
round's BENCH json).

This is the reference's actual workload shape -- day-long continuous
scans (reference signal/scan.py:407-470, examples/Icequake_Iceland) --
and exercises the sample-axis-blocked MXU path end to end: at 30,000
samples the kernel must block (round 2 silently fell back to XLA here).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/day_e2e.py
"""

import json
import pathlib
import shutil
import time

import numpy as np
import pandas as pd

ROOT = pathlib.Path(__file__).resolve().parent.parent
WORLD = pathlib.Path("/tmp/qm_day_e2e")

SPS = 250
DAY = "2014-06-29"
JULDAY = "180"
N_STATIONS = 8
TIMESTEP = 120.0
# Scan pads inside the generated day (onset LTA pre-pad + max traveltime
# post-pad must stay within data).
SCAN_START = f"{DAY}T00:02:00.0"
SCAN_END = f"{DAY}T23:58:00.0"


def build_lut():
    from quakemigrate_tpu import compute_traveltimes
    from quakemigrate_tpu.coords import Proj

    angles = np.linspace(0, 2 * np.pi, N_STATIONS, endpoint=False)
    stations = pd.DataFrame({
        "Name": [f"SK{i:02d}" for i in range(N_STATIONS)],
        "Longitude": -17.222 + 0.010 * np.cos(angles),
        "Latitude": 64.329 + 0.005 * np.sin(angles),
        "Elevation": np.zeros(N_STATIONS),
    })
    gproj = Proj(proj="lcc", units="km", lon_0=-17.222, lat_0=64.329,
                 lat_1=64.323, lat_2=64.335, datum="WGS84", ellps="WGS84",
                 no_defs=True)
    cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)
    lut = compute_traveltimes(
        dict(ll_corner=[-17.24, 64.322, -1.4],
             ur_corner=[-17.204, 64.336, 0.0],
             node_spacing=[0.025] * 3, grid_proj=gproj, coord_proj=cproj),
        stations, method="homogeneous", phases=["P", "S"],
        vp=3.630, vs=1.833,
    )
    return lut, stations


def build_archive(lut, stations, rng):
    """24 h of Gaussian background noise per channel with one planted
    event per hour, written as day-long STEIM miniSEED files."""

    from quakemigrate_tpu.seis import Trace, UTCDateTime
    from quakemigrate_tpu.synthetics import (
        GaussianDerivativeWavelet,
        simulate_waveforms,
    )

    shutil.rmtree(WORLD, ignore_errors=True)
    day_dir = WORLD / "mSEED" / "2014" / JULDAY
    day_dir.mkdir(parents=True)

    day_start = UTCDateTime(f"{DAY}T00:00:00.0")
    n_day = int(86400 * SPS)

    # One event per hour, jittered within the hour, at varied locations.
    wavelet = GaussianDerivativeWavelet(4.0, SPS, 8.0)
    events = []
    for hour in range(24):
        t_ev = hour * 3600.0 + float(rng.uniform(300, 3300))
        coords = [
            -17.222 + float(rng.uniform(-0.008, 0.008)),
            64.329 + float(rng.uniform(-0.004, 0.004)),
            float(rng.uniform(0.2, 1.2)),
        ]
        stream = simulate_waveforms(
            wavelet, coords, lut, magnitude=1.2,
            starttime=str(day_start + t_ev), rng=rng,
        )
        events.append((t_ev, coords, stream))

    t0 = time.time()
    for name in stations["Name"]:
        for comp in "ZNE":
            data = rng.normal(scale=0.1, size=n_day).astype(np.float32)
            for t_ev, _, stream in events:
                tr = stream.select(station=name, channel=f"CH{comp}")[0]
                i0 = int(round((tr.stats.starttime - day_start) * SPS))
                seg = tr.data.astype(np.float32)
                i1 = min(i0 + len(seg), n_day)
                if i0 < n_day:
                    data[i0:i1] += seg[: i1 - i0]
            Trace(
                np.round(data * 1000.0).astype(np.int32),
                {"station": name, "network": "SC", "channel": f"BH{comp}",
                 "sampling_rate": float(SPS), "starttime": day_start},
            ).write(str(day_dir / f"{name}_{comp}.m"), format="MSEED")
    print(f"archive written in {time.time() - t0:.1f} s")
    return [(t, c) for t, c, _ in events]


def main():
    from quakemigrate_tpu import QuakeScan, Trigger
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.signal.onsets import STALTAOnset

    import os

    rng = np.random.default_rng(42)
    # Quick-iteration mode: QM_DAY_E2E_HOURS=N scans only the first N
    # hours (with QM_DAY_E2E_REUSE=1 this gives a fast pipeline-change
    # A/B); the full-day default is what DAY_E2E.json should record.
    global SCAN_END
    hours = float(os.environ.get("QM_DAY_E2E_HOURS", 0) or 0)
    if hours > 0:
        end_s = 120 + int(hours * 3600)
        SCAN_END = f"{DAY}T{end_s // 3600:02d}:{end_s % 3600 // 60:02d}:00.0"
    lut, stations = build_lut()
    day_dir = WORLD / "mSEED" / "2014" / JULDAY
    if (
        os.environ.get("QM_DAY_E2E_REUSE") == "1"
        and len(list(day_dir.glob("*.m"))) == 3 * N_STATIONS
    ):
        # Archive generation takes ~15 min on one core; reuse it when
        # only the scan side changed. The seeded rng makes the planted
        # catalogue deterministic, so the count is still correct.
        shutil.rmtree(WORLD / "runs", ignore_errors=True)
        planted = [(None, None)] * 24
    else:
        planted = build_archive(lut, stations, rng)

    archive = Archive(
        archive_path=WORLD / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 16, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(WORLD / "runs"),
        run_name="day", marginal_window=1.0, timestep=TIMESTEP,
        kernel="auto",
    )

    t0 = time.perf_counter()
    scan.detect(SCAN_START, SCAN_END)
    wall = time.perf_counter() - t0

    # Which migration kernel actually ran? (must be the blocked MXU)
    kernel = scan._mxu if scan._mxu not in (None, False) else None
    kernel_desc = (
        f"pallas_mxu tile={kernel.plan.tile} sblk={kernel.sblk}"
        if kernel is not None else "xla"
    )

    from quakemigrate_tpu.seis import UTCDateTime

    scanned_s = float(UTCDateTime(SCAN_END) - UTCDateTime(SCAN_START))
    n_windows = int(np.ceil(scanned_s / TIMESTEP))

    # Trigger over the day: the planted hourly events must be recovered.
    trig = Trigger(
        lut, run_path=str(WORLD / "runs"), run_name="day",
        marginal_window=1.0, min_event_interval=6.0,
        normalise_coalescence=True, threshold_method="static",
        static_threshold=1.6, plot_trigger_summary=False,
    )
    trig.trigger(SCAN_START, SCAN_END)
    found = None
    for f in (WORLD / "runs" / "day" / "trigger" / "events").glob("*.csv"):
        tab = pd.read_csv(f)
        found = len(tab)
    record = {
        "hours": round(scanned_s / 3600.0, 2),
        "timestep_s": TIMESTEP,
        "sps": SPS,
        "n_windows": n_windows,
        "n_stations": N_STATIONS,
        "n_nodes": int(np.prod(lut.node_count)),
        "kernel": kernel_desc,
        "wall_seconds": round(wall, 1),
        "ms_per_window": round(wall / n_windows * 1e3, 1),
        "realtime_factor": round(scanned_s / wall, 1),
        "events_planted": len(planted),
        "events_triggered": found,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if hours <= 0:  # partial (quick-iteration) runs never clobber the
        (ROOT / "DAY_E2E.json").write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
