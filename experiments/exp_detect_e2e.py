# -*- coding: utf-8 -*-
"""
End-to-end detect throughput (windows/sec) on real TPU hardware for the
candidate dispatch strategies:

1. fused window + Pallas MXU kernel   (production default, kernel="auto")
2. fused window + XLA shift-table     (kernel="xla")
3. standard path, sequential windows  (fused_detect=False, detect_batch=1)
4. standard path, vmapped batch of 4  (fused_detect=False, detect_batch=4)

Each configuration runs the same 20-window Icequake-geometry scan twice
(cold = includes compiles; warm = steady state). The warm number is the
production figure.

Run: PYTHONPATH=. python experiments/exp_detect_e2e.py

"""

import shutil
import time
from pathlib import Path

import numpy as np

from quakemigrate_tpu import QuakeScan, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive
from quakemigrate_tpu.seis import Trace
from quakemigrate_tpu.signal.onsets import STALTAOnset

import pandas as pd

ROOT = Path("/tmp/qm_e2e")
START, END = "2014-06-29T18:41:35.0", "2014-06-29T18:42:25.0"
N_WINDOWS = 20


def build_world():
    shutil.rmtree(ROOT, ignore_errors=True)
    day_dir = ROOT / "mSEED" / "2014" / "180"
    day_dir.mkdir(parents=True)

    angles = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    stations = pd.DataFrame({
        "Name": [f"SK{i:02d}" for i in range(12)],
        "Longitude": -17.222 + 0.008 * np.cos(angles),
        "Latitude": 64.329 + 0.004 * np.sin(angles),
        "Elevation": np.zeros(12),
    })

    rng = np.random.default_rng(0)
    n = 60 * 250
    for name in stations["Name"]:
        for comp in "ZNE":
            Trace(
                rng.integers(-30000, 30000, n).astype(np.int32),
                {"station": name, "channel": f"BH{comp}",
                 "sampling_rate": 250.0,
                 "starttime": "2014-06-29T18:41:30.0"},
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
    archive = Archive(archive_path=ROOT / "mSEED", stations=stations,
                      archive_format="YEAR/JD/STATION")
    return archive, lut, stations


def run_config(archive, lut, name, **kwargs):
    def make():
        onset = STALTAOnset(position="classic", sampling_rate=250)
        onset.phases = ["P", "S"]
        onset.bandpass_filters = {"P": [10, 124, 4], "S": [10, 124, 4]}
        onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}
        return QuakeScan(
            archive, lut, onset=onset, run_path=str(ROOT / "runs"),
            run_name=name, marginal_window=1.0, timestep=2.5, **kwargs,
        )

    for phase in ("cold", "warm"):
        scan = make()
        t0 = time.perf_counter()
        scan.detect(START, END)
        total = time.perf_counter() - t0
        if phase == "warm":
            print(
                f"{name:28s} warm: {total:6.2f} s / {N_WINDOWS} windows = "
                f"{total / N_WINDOWS * 1e3:6.0f} ms/window "
                f"({N_WINDOWS / total:4.1f} win/s)"
            )


def main():
    archive, lut, stations = build_world()
    run_config(archive, lut, "fused_mxu", kernel="auto")
    run_config(archive, lut, "fused_xla", kernel="xla")
    run_config(archive, lut, "standard_seq", kernel="xla",
               fused_detect=False, detect_batch=1)
    run_config(archive, lut, "standard_batch4", kernel="xla",
               fused_detect=False, detect_batch=4)
    run_config(archive, lut, "standard_mxu", kernel="auto",
               fused_detect=False, detect_batch=1)


if __name__ == "__main__":
    main()
