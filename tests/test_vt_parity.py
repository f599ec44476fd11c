# -*- coding: utf-8 -*-
"""
Volcanotectonic_Iceland locate parity on real data: the reference built
its traveltime tables with the external NonLinLoc Grid2Time solver; here
the native "1dsweep" fast-marching builder replaces it, so this test
checks that locations agree with the golden outputs to within the velocity
-model-equivalence tolerance (~1-2 grid nodes) rather than exactly.
Magnitudes are skipped (the response inventory is not bundled with the
reference benchmark).

"""

import shutil

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import QuakeScan, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive, read_stations, read_vmodel
from quakemigrate_tpu.seis import UTCDateTime
from quakemigrate_tpu.signal.onsets import STALTAOnset

from oracle import REFERENCE_PATH

BENCH = REFERENCE_PATH / "examples" / "benchmarks" / "Volcanotectonic_Iceland"
INPUTS = REFERENCE_PATH / "examples" / "Volcanotectonic_Iceland" / "inputs"

pytestmark = pytest.mark.skipif(
    not BENCH.exists(), reason="reference benchmark files unavailable"
)

NODE_SPACING = 0.5  # km


@pytest.fixture(scope="module")
def located_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("vt_parity")

    stations = read_stations(INPUTS / "iceland_stations.txt")
    vmodel = read_vmodel(INPUTS / "iceland_vmodel.txt")

    gproj = Proj(
        proj="lcc", units="km", lon_0=-16.9, lat_0=64.8, lat_1=64.7,
        lat_2=64.9, datum="WGS84", ellps="WGS84", no_defs=True,
    )
    cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)
    grid_spec = dict(
        ll_corner=[-17.2, 64.7, -2.0],
        ur_corner=[-16.6, 64.95, 16.0],
        node_spacing=[NODE_SPACING] * 3,
        grid_proj=gproj,
        coord_proj=cproj,
    )
    # Native eikonal sweep instead of the reference's NonLinLoc subprocess
    lut = compute_traveltimes(
        grid_spec, stations, method="1dsweep", phases=["P", "S"],
        vmod=vmodel, sweep_dx=0.1,
    )

    day_dir = root / "mSEED" / "2014" / "236"
    day_dir.mkdir(parents=True)
    for m_file in BENCH.glob("*.m"):
        shutil.copy(m_file, day_dir / m_file.name)

    archive = Archive(
        archive_path=root / "mSEED", stations=stations,
        format="{year}/{jday:03d}/*",
    )

    onset = STALTAOnset(
        position="centred", sampling_rate=50, signal_transform="env_squared"
    )
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 16, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(root / "runs"),
        run_name="vt_parity", marginal_window=1.0, precision="double",
        plot_event_summary=False,
    )
    scan.locate(
        trigger_file=str(BENCH / "example_run_2014_236_TriggeredEvents.csv")
    )

    return root / "runs" / "vt_parity" / "locate"


def test_vt_event_parity(located_run):
    golden_events = sorted(BENCH.glob("*.event"))
    assert golden_events

    deg_per_km_lat = 1 / 111.2
    deg_per_km_lon = 1 / (111.2 * np.cos(np.deg2rad(64.8)))
    # Velocity-model equivalence tolerance: 2 node spacings
    tol_x = 2 * NODE_SPACING * deg_per_km_lon
    tol_y = 2 * NODE_SPACING * deg_per_km_lat
    tol_z = 2 * NODE_SPACING

    located = 0
    for golden_file in golden_events:
        ours_file = located_run / "events" / golden_file.name
        if not ours_file.exists():
            continue
        located += 1
        golden = pd.read_csv(golden_file).iloc[0]
        ours = pd.read_csv(ours_file).iloc[0]

        dt = abs(UTCDateTime(ours["DT"]) - UTCDateTime(golden["DT"]))
        assert dt <= 0.5, f"{golden_file.name}: otime off by {dt}"

        assert abs(ours["X"] - golden["X"]) < tol_x, golden_file.name
        assert abs(ours["Y"] - golden["Y"]) < tol_y, golden_file.name
        assert abs(ours["Z"] - golden["Z"]) < tol_z, golden_file.name

    assert located == len(golden_events), (
        f"only {located}/{len(golden_events)} golden events located"
    )


def test_vt_picks_agree(located_run):
    total, matched = 0, 0
    for golden_file in sorted(BENCH.glob("*.picks")):
        ours_file = located_run / "picks" / golden_file.name
        if not ours_file.exists():
            continue
        golden = pd.read_csv(golden_file)
        ours = pd.read_csv(ours_file)
        merged = golden.merge(
            ours, on=["Station", "Phase"], suffixes=("_ref", "_tpu")
        )
        for _, row in merged.iterrows():
            if str(row["PickTime_ref"]) == "-1":
                continue
            total += 1
            if str(row["PickTime_tpu"]) == "-1":
                continue
            diff = abs(
                UTCDateTime(str(row["PickTime_tpu"]))
                - UTCDateTime(str(row["PickTime_ref"]))
            )
            if diff <= 0.1:  # 5 samples at 50 Hz
                matched += 1

    assert total > 0
    assert matched / total > 0.75, f"only {matched}/{total} picks agree"
