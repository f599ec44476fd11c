# -*- coding: utf-8 -*-
"""
End-to-end detect profile on real Icequake data (the reference's
benchmark cut waveforms): where does each millisecond of a window go?

Run: PYTHONPATH=.:$PYTHONPATH python experiments/exp_detect_profile.py

"""

import os
import shutil
import time
from pathlib import Path

import numpy as np

REFERENCE_PATH = Path(os.environ.get("REFERENCE_PATH", "/root/reference"))
BENCH = REFERENCE_PATH / "examples" / "benchmarks" / "Icequake_Iceland"
STATION_FILE = (
    REFERENCE_PATH / "examples" / "Icequake_Iceland" / "inputs"
    / "iceland_stations.txt"
)


def main():
    import jax

    from quakemigrate_tpu import QuakeScan, compute_traveltimes
    from quakemigrate_tpu.coords import Proj
    from quakemigrate_tpu.io import Archive, read_stations
    from quakemigrate_tpu.signal.onsets import STALTAOnset

    root = Path("/tmp/qm_profile")
    shutil.rmtree(root, ignore_errors=True)
    day_dir = root / "mSEED" / "2014" / "180"
    day_dir.mkdir(parents=True)

    stations = read_stations(STATION_FILE)

    # Synthetic 60 s noise archive with the real Icequake geometry (the
    # benchmark waveforms only span ~8 s -- too short for a timing run)
    from quakemigrate_tpu.seis import Trace
    rng = np.random.default_rng(0)
    n = 60 * 250
    for name in stations["Name"]:
        for comp in "ZNE":
            Trace(rng.integers(-30000, 30000, n).astype(np.int32),
                  {"station": name, "channel": f"BH{comp}",
                   "sampling_rate": 250.0,
                   "starttime": "2014-06-29T18:41:30.0"}
                  ).write(str(day_dir / f"{name}_{comp}.m"), format="MSEED")
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

    def make_scan(name):
        onset = STALTAOnset(position="classic", sampling_rate=250)
        onset.phases = ["P", "S"]
        onset.bandpass_filters = {"P": [10, 124, 4], "S": [10, 124, 4]}
        onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}
        return QuakeScan(
            archive, lut, onset=onset, run_path=str(root / "runs"),
            run_name=name, marginal_window=1.0, timestep=2.5,
        )

    archive = Archive(archive_path=root / "mSEED", stations=stations,
                      archive_format="YEAR/JD/STATION")

    start, end = "2014-06-29T18:41:35.0", "2014-06-29T18:42:25.0"
    n_windows = 20

    scan = make_scan("profile")
    t0 = time.perf_counter()
    scan.detect(start, end)
    total = time.perf_counter() - t0
    print(f"\nTOTAL detect (cold): {total:.2f}s for {n_windows} windows "
          f"-> {total / n_windows * 1e3:.0f} ms/window")

    scan_w = make_scan("profile_warm")
    t0 = time.perf_counter()
    scan_w.detect(start, end)
    total = time.perf_counter() - t0
    print(f"TOTAL detect (warm): {total:.2f}s for {n_windows} windows "
          f"-> {total / n_windows * 1e3:.0f} ms/window")

    # --- Stage micro-timing on one window ---
    scan2 = make_scan("profile2")
    scan2._build_device_state()
    from quakemigrate_tpu import util
    fsmp = util.time2sample(scan2.pre_pad, scan2.scan_rate)
    lsmp = util.time2sample(scan2.post_pad, scan2.scan_rate)
    from quakemigrate_tpu.seis import UTCDateTime
    w_beg = (UTCDateTime("2014-06-29T18:42:07.5")
             - scan2.pre_pad)
    w_end = UTCDateTime("2014-06-29T18:42:10.0") + scan2.post_pad

    t0 = time.perf_counter()
    data = archive.read_waveform_data(w_beg, w_end)
    t_read = time.perf_counter() - t0

    t0 = time.perf_counter()
    prepared = scan2._prepare_window(data)
    t_prep = time.perf_counter() - t0

    from quakemigrate_tpu.ops.scan_window import detect_window_fused
    channels, chan_mask, slot_mask, nsta, nlta = prepared["fused"]
    nsamples = channels.shape[-1] - fsmp - lsmp

    def dispatch():
        return detect_window_fused(
            channels, chan_mask, slot_mask, nsta, nlta,
            scan2._device_tt, scan2.onset.position,
            scan2.onset.signal_transform,
            float(scan2.onset.min_onset_value), fsmp, nsamples,
            n_nodes_real=scan2._n_nodes, tile=scan2.tile,
        )

    out = dispatch()
    [np.asarray(o) for o in out]  # compile

    t0 = time.perf_counter()
    out = dispatch()
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = [np.asarray(o) for o in out]
    t_fetch = time.perf_counter() - t0

    # back-to-back full device roundtrips (dispatch+fetch), amortised
    t0 = time.perf_counter()
    for _ in range(8):
        out = dispatch()
        [np.asarray(o) for o in out]
    t_roundtrip = (time.perf_counter() - t0) / 8

    print(f"archive read   : {t_read * 1e3:7.1f} ms")
    print(f"prepare window : {t_prep * 1e3:7.1f} ms (host, on prefetch thread)")
    print(f"dispatch       : {t_dispatch * 1e3:7.1f} ms")
    print(f"fetch          : {t_fetch * 1e3:7.1f} ms")
    print(f"device roundtrip (amortised): {t_roundtrip * 1e3:7.1f} ms")
    print(f"windows span   : channels {channels.shape}, "
          f"{channels.nbytes / 1e6:.2f} MB upload/window")


if __name__ == "__main__":
    main()
