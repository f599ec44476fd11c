# -*- coding: utf-8 -*-
"""
Day-scale end-to-end detect benchmark on real TPU hardware.

Generates a 24 h synthetic miniSEED archive at the Icequake geometry
(250 Hz, 8 stations x ZNE, planted events every 10 minutes over
background noise), runs a full ``detect()`` over the day at the
documented day-scale configuration (timestep=120 s -> 30,000-sample
windows, kernel="auto", fused window), then ``trigger()``, and records
the sustained realtime factor PLUS asserted event recovery in
DAY_E2E.json at the repo root (bench.py folds it into the round's
BENCH json).

Recovery is *matched*, not counted: every trigger is associated to the
nearest planted origin time within MATCH_TOL_S; the harness records
recall (must be 100%), precision, and the per-event trigger COA, and
exits nonzero on any missed event. (Round 3 counted trigger rows only,
which hid both a threshold with no noise margin and an argmax-packing
bug that zeroed every X/Y/Z.) The 10-minute cadence (144 events/day)
also supplies the >=100-event locate workload for tools/day_locate.py.

This is the reference's actual workload shape -- day-long continuous
scans (reference signal/scan.py:407-470, examples/Icequake_Iceland) --
and exercises the sample-axis-blocked MXU path end to end: at 30,000
samples the kernel must block (round 2 silently fell back to XLA here).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/day_e2e.py
"""

import json
import pathlib
import shutil
import sys
import time

import numpy as np
import pandas as pd

ROOT = pathlib.Path(__file__).resolve().parent.parent
WORLD = pathlib.Path("/tmp/qm_day_e2e")
PLANTED_FILE = WORLD / "planted.json"

SPS = 250
DAY = "2014-06-29"
JULDAY = "180"
N_STATIONS = 8
TIMESTEP = 120.0
EVENT_INTERVAL_S = 600.0  # one planted event per 10 min -> 144/day
# Scan pads inside the generated day (onset LTA pre-pad + max traveltime
# post-pad must stay within data).
SCAN_START = f"{DAY}T00:02:00.0"
SCAN_END = f"{DAY}T23:58:00.0"
# Trigger on RAW coalescence. On this workload the planted events lift
# the whole instantaneous field (8 stations, compact grid), so the
# normalised max/mean peak barely rises above its noise tail (events
# ~1.80-1.85 vs noise max 1.72 -- round 3's threshold 1.6 sat INSIDE
# that tail: ~90 noise exceedances/day = the unexplained 91-vs-24).
# Raw COA separates cleanly: noise max 1.93 (P99.99 = 1.75), weakest
# planted-event peak 4.64 -- threshold 3.0 has ~1 unit of margin on
# both sides (measured over the full-day scanmseed, events masked).
NORMALISE_COA = False
STATIC_THRESHOLD = 3.0
MATCH_TOL_S = 3.0  # |CoaTime - planted origin| tolerance for a match


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
    event per EVENT_INTERVAL_S, written as day-long STEIM miniSEED files.
    The planted catalogue (origin seconds-of-day + coordinates) persists
    to planted.json so reuse runs can still compute recall."""

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

    # One event per interval, jittered within it, at varied locations.
    wavelet = GaussianDerivativeWavelet(4.0, SPS, 8.0)
    # The wavelet's zero (origin) time sits half_timespan + roll after
    # the simulated stream's starttime -- planted ORIGIN times must
    # include it or every trigger "misses" by ~8.1 s.
    origin_offset = 8.0 + (int(SPS * 0.5 / 4.0) + 3) / SPS
    events = []
    n_events = int(86400 / EVENT_INTERVAL_S)
    for k in range(n_events):
        # Jitter keeps events clear of the interval edges so matching is
        # unambiguous and every origin stays inside the scanned span.
        t_ev = k * EVENT_INTERVAL_S + float(
            rng.uniform(0.2 * EVENT_INTERVAL_S, 0.8 * EVENT_INTERVAL_S)
        )
        # z in the LUT's grid convention (grid spans -1.4..0 km): the
        # round-3 harness planted +0.2..+1.2, i.e. OUTSIDE the grid
        # volume -- events still coalesced (clamped) but their true
        # location was unrepresentable.
        coords = [
            -17.222 + float(rng.uniform(-0.008, 0.008)),
            64.329 + float(rng.uniform(-0.004, 0.004)),
            float(rng.uniform(-1.2, -0.2)),
        ]
        # magnitude 1.5: at 1.2 the deepest planted events peaked at
        # COA_N ~1.80, a hair above the noise ceiling (1.73) -- no
        # honest threshold margin. 1.5 lifts the weakest peak clear.
        # angle_of_incidence=80 (steep ray; the simulator mirrors the
        # reference's inclination = 90 - angle convention, reference
        # examples/synthetic/simulate/core.py:106): the old default 0
        # made the ray HORIZONTAL, i.e. the P wavelet landed on the
        # horizontals and S on the vertical -- swapped channels, which
        # silently destroyed the depth constraint in locate.
        stream = simulate_waveforms(
            wavelet, coords, lut, magnitude=1.5, angle_of_incidence=80,
            starttime=str(day_start + t_ev), rng=rng,
        )
        events.append((t_ev + origin_offset, coords, stream))

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

    planted = [(t, c) for t, c, _ in events]
    PLANTED_FILE.write_text(json.dumps(
        [{"t": t, "coords": c} for t, c in planted]
    ))
    return planted


def match_triggers(planted, trig_table, scan_start, scan_end, day=None,
                   tol_s=MATCH_TOL_S):
    """
    Associate triggers to planted origins: recall, precision, per-event
    trigger COA. ``planted`` is [(seconds_of_day, coords)]; only plants
    whose origin lies inside the scanned span count toward recall.
    (Also used by tools/regional_e2e.py with its own ``day``/``tol_s``.)

    """

    from quakemigrate_tpu.seis import UTCDateTime

    day0 = UTCDateTime(f"{day or DAY}T00:00:00.0")
    t0, t1 = UTCDateTime(scan_start), UTCDateTime(scan_end)
    in_span = [
        (t, c) for t, c in planted if t0 <= day0 + t <= t1 - tol_s
    ]
    trig_s = np.array([
        float(UTCDateTime(row) - day0) for row in trig_table["CoaTime"]
    ])
    matched = np.zeros(len(trig_s), dtype=bool)

    recovered, missed = [], []
    for t_ev, coords in in_span:
        near = np.where(np.abs(trig_s - t_ev) <= tol_s)[0]
        if near.size:
            matched[near] = True
            best = near[np.argmax(trig_table["TRIG_COA"].values[near])]
            recovered.append({
                "t": t_ev,
                "trig_coa": float(trig_table["TRIG_COA"].values[best]),
                "dt": float(trig_s[best] - t_ev),
            })
        else:
            missed.append(t_ev)

    n_false = int((~matched).sum())
    n_plant = len(in_span)
    stats = {
        "events_planted": n_plant,
        "events_recovered": len(recovered),
        "recall": round(len(recovered) / max(n_plant, 1), 4),
        "false_triggers": n_false,
        "precision": round(
            matched.sum() / max(len(trig_s), 1), 4
        ),
        "match_tol_s": tol_s,
        "recovered_trig_coa_min": (
            round(min(r["trig_coa"] for r in recovered), 3)
            if recovered else None
        ),
        "recovered_trig_coa_median": (
            round(float(np.median([r["trig_coa"] for r in recovered])), 3)
            if recovered else None
        ),
        "missed_origin_seconds": [round(t, 1) for t in missed[:20]],
        "false_trigger_coa_max": (
            round(float(trig_table["TRIG_COA"].values[~matched].max()), 3)
            if n_false else None
        ),
    }
    return stats


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
        and PLANTED_FILE.is_file()
    ):
        # Archive generation takes minutes; reuse it when only the scan
        # side changed. planted.json carries the catalogue for matching.
        shutil.rmtree(WORLD / "runs", ignore_errors=True)
        planted = [
            (rec["t"], rec["coords"])
            for rec in json.loads(PLANTED_FILE.read_text())
        ]
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

    # Percentile throughput from the per-batch loop marks: the relay
    # tunnel to the TPU has transient slow episodes that can halve a
    # whole-day mean while the median batch is healthy (observed
    # 2026-08-18: 98.7x mean vs ~267x in an adjacent run), so the
    # artifact records the distribution, not just the mean.
    marks = getattr(scan, "detect_batch_marks", []) or []
    per_window = np.concatenate(
        [np.full(n, secs / n) for n, secs in marks if n > 0]
    ) if marks else np.array([wall])
    p10, p50, p90 = np.percentile(per_window, [10, 50, 90])

    # Per-batch stage attribution (round-4 review: the 3.5x mean-vs-median
    # straggler tail was blamed on the relay without evidence). Main-thread
    # seconds split into read_wait (archive read), prepare (host onsets),
    # dispatch (device call + H2D under the relay) and drain_wait
    # (backpressure on the fetch worker); "other" is loop overhead. The
    # drain worker's own fetch/append seconds run overlapped and are
    # reported for reference. Straggler shares say where the tail
    # (batches > 2x median) spends its time.
    attribution = {}
    attrib = getattr(scan, "detect_batch_attrib", []) or []
    if attrib:
        totals = np.array([a["total"] for a in attrib])
        stages = ("read_wait", "prepare", "dispatch", "drain_wait")
        sums = {s: float(sum(a[s] for a in attrib)) for s in stages}
        sums["other"] = float(totals.sum() - sum(sums.values()))
        attribution = {
            f"attrib_{s}_s": round(v, 1) for s, v in sums.items()
        }
        straggler = totals > 2 * np.median(totals)
        if straggler.any():
            tail_total = totals[straggler].sum()
            attribution["straggler_batches"] = int(straggler.sum())
            attribution["straggler_seconds"] = round(float(tail_total), 1)
            for s in stages:
                part = sum(a[s] for a, t in zip(attrib, straggler) if t)
                attribution[f"straggler_{s}_share"] = round(
                    float(part / tail_total), 3
                )
    drain = getattr(scan, "detect_drain_marks", []) or []
    if drain:
        attribution["drain_fetch_s"] = round(
            sum(d["fetch"] for d in drain), 1
        )
        attribution["drain_append_s"] = round(
            sum(d["append"] for d in drain), 1
        )

    # Which migration kernel actually ran? (must be the blocked MXU)
    kernel = scan._mxu if scan._mxu not in (None, False) else None
    kernel_desc = (
        f"pallas_mxu tile={kernel.plan.tile} sblk={kernel.sblk}"
        if kernel is not None else "xla"
    )

    from quakemigrate_tpu.seis import UTCDateTime

    scanned_s = float(UTCDateTime(SCAN_END) - UTCDateTime(SCAN_START))
    n_windows = int(np.ceil(scanned_s / TIMESTEP))

    # Trigger over the day, then MATCH triggers to the planted catalogue.
    trig = Trigger(
        lut, run_path=str(WORLD / "runs"), run_name="day",
        marginal_window=1.0, min_event_interval=6.0,
        normalise_coalescence=NORMALISE_COA, threshold_method="static",
        static_threshold=STATIC_THRESHOLD, plot_trigger_summary=False,
    )
    trig.trigger(SCAN_START, SCAN_END)
    tables = sorted(
        (WORLD / "runs" / "day" / "trigger" / "events").glob("*.csv")
    )
    trig_table = (
        pd.concat([pd.read_csv(f) for f in tables])
        if tables else pd.DataFrame(columns=["CoaTime", "TRIG_COA"])
    )
    recovery = match_triggers(planted, trig_table, SCAN_START, SCAN_END)

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
        "ms_per_window_p10": round(p10 * 1e3, 1),
        "ms_per_window_p50": round(p50 * 1e3, 1),
        "ms_per_window_p90": round(p90 * 1e3, 1),
        "realtime_factor": round(scanned_s / wall, 1),
        "realtime_factor_p50": round(TIMESTEP / p50, 1),
        "static_threshold": STATIC_THRESHOLD,
        "events_triggered": int(len(trig_table)),
        **attribution,
        **recovery,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if hours <= 0:  # partial (quick-iteration) runs never clobber the
        (ROOT / "DAY_E2E.json").write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))

    if recovery["recall"] < 1.0:
        sys.exit(
            f"RECALL FAILURE: {recovery['events_recovered']}/"
            f"{recovery['events_planted']} planted events recovered"
        )


if __name__ == "__main__":
    main()
