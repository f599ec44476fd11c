# -*- coding: utf-8 -*-
"""
Real-data golden-file parity ON HARDWARE, in the production
configuration: the reference's committed Icequake_Iceland benchmark
events re-located with QuakeScan defaults (float32, kernel="auto" ->
Pallas MXU, mxu_encoding="i8x2") on the attached TPU, compared against
the reference's published .event files (ref tests/test_benchmarks.py).

The CPU twin (tests/test_benchmark_parity.py) runs precision="double"
through the XLA kernel; this tier proves the same within-one-node
acceptance holds for the compiled int8 MXU chain on real waveforms.

"""

import pathlib
import shutil
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
from oracle import REFERENCE_PATH  # noqa: E402

BENCH = REFERENCE_PATH / "examples" / "benchmarks" / "Icequake_Iceland"
STATION_FILE = (
    REFERENCE_PATH / "examples" / "Icequake_Iceland" / "inputs"
    / "iceland_stations.txt"
)
NODE_SPACING = 0.025  # km

pytestmark = pytest.mark.skipif(
    not BENCH.exists(), reason="reference benchmark files unavailable"
)


@pytest.fixture(scope="module")
def located_run(tmp_path_factory):
    from quakemigrate_tpu import QuakeScan, compute_traveltimes
    from quakemigrate_tpu.coords import Proj
    from quakemigrate_tpu.io import Archive, read_stations
    from quakemigrate_tpu.signal.onsets import STALTAOnset

    root = tmp_path_factory.mktemp("iceland_parity_tpu")
    stations = read_stations(STATION_FILE)

    gproj = Proj(
        proj="lcc", units="km", lon_0=-17.222, lat_0=64.329, lat_1=64.323,
        lat_2=64.335, datum="WGS84", ellps="WGS84", no_defs=True,
    )
    cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)
    grid_spec = dict(
        ll_corner=[-17.24, 64.322, -1.4],
        ur_corner=[-17.204, 64.336, 0.0],
        node_spacing=[NODE_SPACING] * 3,
        grid_proj=gproj,
        coord_proj=cproj,
    )
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=3.630, vs=1.833,
    )

    day_dir = root / "mSEED" / "2014" / "180"
    day_dir.mkdir(parents=True)
    for m_file in BENCH.glob("*.m"):
        shutil.copy(m_file, day_dir / m_file.name)

    archive = Archive(
        archive_path=root / "mSEED", stations=stations,
        format="{year}/{jday:03d}/*",
    )

    onset = STALTAOnset(position="centred", sampling_rate=250)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [10, 124, 4], "S": [10, 124, 4]}
    onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}

    # Production defaults: float32, kernel="auto" (-> MXU on TPU),
    # mxu_encoding="i8x2".
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(root / "runs"),
        run_name="parity", marginal_window=0.06,
    )
    scan.locate(
        trigger_file=str(BENCH / "example_run_2014_180_TriggeredEvents.csv")
    )
    return root / "runs" / "parity" / "locate"


def test_event_parity_on_hardware(located_run):
    from quakemigrate_tpu.seis import UTCDateTime

    golden_events = sorted(BENCH.glob("*.event"))
    assert golden_events

    deg_per_km_lat = 1 / 111.2
    deg_per_km_lon = 1 / (111.2 * np.cos(np.deg2rad(64.33)))
    tol_x = 1.2 * NODE_SPACING * deg_per_km_lon
    tol_y = 1.2 * NODE_SPACING * deg_per_km_lat
    tol_z = 1.2 * NODE_SPACING  # km

    for golden_file in golden_events:
        ours_file = located_run / "events" / golden_file.name
        assert ours_file.exists(), f"event {golden_file.name} not located"
        golden = pd.read_csv(golden_file).iloc[0]
        ours = pd.read_csv(ours_file).iloc[0]

        dt = abs(UTCDateTime(ours["DT"]) - UTCDateTime(golden["DT"]))
        assert dt <= 1 / 250 + 1e-9, f"{golden_file.name}: otime off by {dt}"

        assert abs(ours["X"] - golden["X"]) < tol_x, golden_file.name
        assert abs(ours["Y"] - golden["Y"]) < tol_y, golden_file.name
        assert abs(ours["Z"] - golden["Z"]) < tol_z, golden_file.name

        assert abs(ours["COA"] - golden["COA"]) / golden["COA"] < 0.02
        assert (
            abs(ours["COA_NORM"] - golden["COA_NORM"]) / golden["COA_NORM"]
            < 0.02
        )
