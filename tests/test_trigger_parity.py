# -*- coding: utf-8 -*-
"""
Trigger golden-file parity: run Trigger on the reference benchmarks' real
.scanmseed files with the published trigger parameters and compare the
TriggeredEvents tables with the committed golden ones. Covers both
bundled examples (Icequake_Iceland: 250 Hz icequakes; Volcanotectonic_
Iceland: 50 Hz VT events with a geographic region filter).

"""

import shutil

import pandas as pd
import pytest

from quakemigrate_tpu import Trigger
from quakemigrate_tpu.seis import UTCDateTime

from oracle import REFERENCE_PATH

BENCHMARKS = REFERENCE_PATH / "examples" / "benchmarks"

pytestmark = pytest.mark.skipif(
    not BENCHMARKS.exists(), reason="reference benchmark files unavailable"
)


class _FakeLUT:
    """Trigger only touches the LUT's unit conversion factor."""

    unit_conversion_factor = 1000.0  # km grids in both examples


def _run_trigger(tmp_path, bench_dir, scanmseed_name, run_name, settings,
                 window, region=None):
    run_dir = tmp_path / "runs" / run_name
    scan_dir = run_dir / "detect" / "scanmseed"
    scan_dir.mkdir(parents=True)
    shutil.copy(bench_dir / scanmseed_name, scan_dir / scanmseed_name)

    trig = Trigger(
        _FakeLUT(), run_path=str(tmp_path / "runs"), run_name=run_name,
        plot_trigger_summary=False, **settings,
    )
    trig.trigger(*window, region=region)

    out_files = list((run_dir / "trigger" / "events").glob("*.csv"))
    assert len(out_files) == 1
    return pd.read_csv(out_files[0])


def _assert_triggers_match(ours, golden_file, sampling_rate):
    golden = pd.read_csv(golden_file)
    assert len(ours) == len(golden), (
        f"{len(ours)} events triggered vs {len(golden)} golden"
    )
    for (_, g), (_, o) in zip(golden.iterrows(), ours.iterrows()):
        assert g["EventID"] == o["EventID"]
        dt = abs(UTCDateTime(o["CoaTime"]) - UTCDateTime(g["CoaTime"]))
        assert dt <= 1 / sampling_rate + 1e-9
        assert abs(o["TRIG_COA"] - g["TRIG_COA"]) < 1e-4
        assert abs(o["COA_X"] - g["COA_X"]) < 1e-5
        assert abs(o["COA_Y"] - g["COA_Y"]) < 1e-5
        assert abs(o["COA_Z"] - g["COA_Z"]) < 1e-2
        assert abs(o["COA"] - g["COA"]) < 1e-4
        assert abs(o["COA_NORM"] - g["COA_NORM"]) < 1e-4


def test_icequake_trigger_parity(tmp_path):
    bench = BENCHMARKS / "Icequake_Iceland"
    ours = _run_trigger(
        tmp_path, bench, "2014_180.scanmseed", "example_run",
        dict(
            marginal_window=0.06, min_event_interval=0.12,
            normalise_coalescence=True, threshold_method="static",
            static_threshold=2.15,
        ),
        ("2014-06-29T18:42:05.0", "2014-06-29T18:42:15.0"),
    )
    _assert_triggers_match(
        ours, bench / "example_run_2014_180_TriggeredEvents.csv", 250
    )


def test_volcanotectonic_trigger_parity(tmp_path):
    bench = BENCHMARKS / "Volcanotectonic_Iceland"
    golden_file = bench / "example_run_2014_236_TriggeredEvents.csv"
    if not golden_file.exists():
        pytest.skip("VT golden trigger file not bundled")
    ours = _run_trigger(
        tmp_path, bench, "2014_236.scanmseed", "example_run",
        dict(
            marginal_window=0.75, min_event_interval=1.5,
            normalise_coalescence=True, threshold_method="static",
            static_threshold=1.85,
        ),
        ("2014-08-24T00:01:00.0", "2014-08-24T00:11:00.0"),
        region=[-17.15, 64.72, 0.0, -16.65, 64.93, 14.0],
    )
    _assert_triggers_match(ours, golden_file, 50)
