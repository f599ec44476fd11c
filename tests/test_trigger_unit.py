# -*- coding: utf-8 -*-
"""
Trigger-internals unit tests on tiny analytic traces, mirroring the
reference's tests/test_trigger.py (MAD / median-ratio thresholds with the
scale factor nulled; Gaussian smoothing). Uses the fake-LUT trick: a
Trigger can be built with a placeholder LUT for unit testing because the
LUT is only touched inside trigger().

"""

import numpy as np
import pandas as pd
import pytest

import quakemigrate_tpu.util as util
from quakemigrate_tpu.signal.trigger import Trigger, chunks2trace


@pytest.fixture()
def trigger(tmp_path):
    return Trigger("not_a_lut", str(tmp_path), "test")


def test_mad_threshold(trigger):
    trigger.threshold_method = "mad"
    trigger.mad_window_length = 4.0
    trigger.mad_multiplier = 1.0

    scandata = pd.Series([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    threshold = trigger._get_threshold(scandata, 1)

    # window of 4 samples: medians [1.5, 5.5]; MAD (scaled 1.4826) of
    # [0,1,2,3] is 1.4826; threshold = median + mad*multiplier
    expected_mad = util.calculate_mad(np.array([0.0, 1.0, 2.0, 3.0]))
    expected = np.array(
        [1.5 + expected_mad] * 4 + [5.5 + expected_mad] * 4
    )
    np.testing.assert_allclose(threshold, expected)


def test_median_ratio_threshold(trigger):
    trigger.threshold_method = "median_ratio"
    trigger.median_window_length = 4.0
    trigger.median_multiplier = 2.0

    scandata = pd.Series([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    threshold = trigger._get_threshold(scandata, 1)

    expected = np.array([3.0] * 4 + [11.0] * 4)
    np.testing.assert_allclose(threshold, expected)


def test_static_threshold(trigger):
    trigger.threshold_method = "static"
    trigger.static_threshold = 1.75
    threshold = trigger._get_threshold(pd.Series(np.zeros(5)), 1)
    np.testing.assert_allclose(threshold, np.full(5, 1.75))


def test_invalid_threshold_method(trigger):
    with pytest.raises(util.InvalidTriggerThresholdMethodException):
        trigger.threshold_method = "bogus"


def test_min_event_interval_validation(tmp_path):
    with pytest.raises(ValueError):
        Trigger(
            "not_a_lut", str(tmp_path), "test", marginal_window=2.0,
            min_event_interval=3.0,
        )


def test_smoothing(trigger):
    trigger.smooth_coa = True
    trigger.smoothing_kernel_sigma = 1.0
    trigger.smoothing_kernel_width = 4.0

    data = pd.DataFrame(
        {
            "COA": np.array([0, 0, 0, 0, 10, 0, 0, 0, 0], dtype=float),
            "COA_N": np.array([0, 0, 0, 0, 10, 0, 0, 0, 0], dtype=float),
        }
    )
    smoothed = trigger._smooth_coa(data, 1)
    # Gaussian smoothing preserves the integral and reduces the peak
    assert smoothed["COA"].iloc[4] < 10
    np.testing.assert_allclose(smoothed["COA"].sum(), 10.0, rtol=1e-6)
    assert np.argmax(smoothed["COA"].values) == 4


def test_chunks2trace():
    out = chunks2trace(np.array([1.0, 2.0]), (2, 3))
    np.testing.assert_array_equal(out, [1, 1, 1, 2, 2, 2])


def test_trigger_validated_properties():
    """min_event_interval >= 2*mw; 'dynamic' threshold renames to 'mad'."""

    import pytest

    import quakemigrate_tpu.util as util
    from quakemigrate_tpu.signal.trigger import Trigger

    trig = Trigger("not_a_lut", run_path="/tmp/qmtrig", run_name="t",
                   marginal_window=2.0, min_event_interval=4.0)
    with pytest.raises(ValueError):
        trig.min_event_interval = 3.0  # < 2 * marginal_window

    trig.threshold_method = "dynamic"  # deprecated name
    assert trig.threshold_method == "mad"
    with pytest.raises(util.InvalidTriggerThresholdMethodException):
        trig.threshold_method = "bogus"

    # deprecated 'minimum_repeat' kwarg maps through with validation
    trig2 = Trigger("not_a_lut", run_path="/tmp/qmtrig", run_name="t2",
                    marginal_window=2.0, minimum_repeat=5.0)
    assert trig2.min_event_interval == 5.0
    with pytest.raises(ValueError):
        Trigger("not_a_lut", run_path="/tmp/qmtrig", run_name="t3",
                marginal_window=2.0, minimum_repeat=1.0)


def test_lut_deprecated_cell_names():
    import numpy as np

    from quakemigrate_tpu.coords import Proj
    from quakemigrate_tpu.lut.lut import Grid3D

    grid = Grid3D(
        [-0.05, -0.05, 0.0], [0.05, 0.05, 10.0], [2.0, 2.0, 2.0],
        Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0),
        Proj(proj="longlat"),
    )
    np.testing.assert_array_equal(grid.cell_count, grid.node_count)
    np.testing.assert_array_equal(grid.cell_size, grid.node_spacing)
    grid.cell_size = [1.0, 1.0, 1.0]
    np.testing.assert_array_equal(grid.node_spacing, [1.0, 1.0, 1.0])


def test_refine_candidates_matches_reference_loop():
    """
    The vectorised overlap-merge must group candidates exactly like the
    reference's row-by-row algorithm (ref signal/trigger.py:569-638) on
    randomised catalogues, including chained merges.

    """

    from quakemigrate_tpu.seis import UTCDateTime

    rng = np.random.default_rng(99)
    trig = Trigger("not_a_lut", "t", "t", marginal_window=2.0,
                   min_event_interval=4.0, plot_trigger_summary=False)

    for case in range(20):
        n = int(rng.integers(1, 40))
        t0 = UTCDateTime("2020-01-01T00:00:00")
        peaks = np.sort(rng.uniform(0, 600, n))
        rows = []
        for k, p in enumerate(peaks):
            lead = rng.uniform(0.5, 8.0)
            lag = rng.uniform(0.5, 8.0)
            rows.append({
                "EventNum": k,
                "CoaTime": t0 + p,
                "TRIG_COA": rng.uniform(1, 10),
                "COA_X": 0.0, "COA_Y": 0.0, "COA_Z": 0.0,
                "MinTime": t0 + p - lead,
                "MaxTime": t0 + p + lag,
                "COA": rng.uniform(1, 10),
                "COA_NORM": rng.uniform(1, 10),
            })
        candidates = pd.DataFrame(
            rows,
            columns=["EventNum", "CoaTime", "TRIG_COA", "COA_X", "COA_Y",
                     "COA_Z", "MinTime", "MaxTime", "COA", "COA_NORM"],
        )

        # Reference algorithm: walk consecutive rows, split only when BOTH
        # separation conditions hold.
        mw = trig.marginal_window
        group = np.zeros(n, dtype=int)
        for i in range(n - 1):
            a, b = candidates.iloc[i], candidates.iloc[i + 1]
            separate = (a["MaxTime"] < b["CoaTime"] - mw) and (
                b["MinTime"] > a["CoaTime"] + mw
            )
            group[i + 1] = group[i] + (1 if separate else 0)

        expected = []
        for _, g in candidates.groupby(group):
            best = g.loc[g["TRIG_COA"].idxmax()]
            expected.append(
                (best["CoaTime"], g["MinTime"].min(), g["MaxTime"].max())
            )

        refined = trig._refine_candidates(candidates.copy())
        assert len(refined) == len(expected), f"case {case}"
        for row, (coa_t, lo, hi) in zip(refined.itertuples(), expected):
            assert row.CoaTime == coa_t, f"case {case}"
            assert row.MinTime == lo and row.MaxTime == hi, f"case {case}"


def test_single_event_scatter_colour_range_not_degenerate():
    """
    One triggered event means c.min() == c.max(); the colour range must
    be padded (reference plot/trigger.py pads by *0.999/*1.001) so the
    event gets a consistent in-range colour and the colorbar spans a
    non-zero interval.

    """

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from quakemigrate_tpu.plot.trigger import _event_scatter

    events = pd.DataFrame(
        {"COA_X": [1.0], "COA_Y": [2.0], "COA_Z": [3.0], "TRIG_COA": [5.0]}
    )
    fig = plt.figure(figsize=(30, 15))
    axes = [fig.add_subplot(1, 3, i + 1) for i in range(3)]
    try:
        _event_scatter(fig, axes, events)
        sc = axes[0].collections[0]
        norm = sc.norm
        assert norm.vmin < 5.0 < norm.vmax
    finally:
        plt.close(fig)
