# -*- coding: utf-8 -*-
"""
.amps file output: per-trace P/S amplitude measurements and the individual
local magnitude estimates derived from them (reference schema:
io/amplitudes.py:14-69).

"""


def write_amplitudes(run, amplitudes, event):
    """Write amplitude measurements + per-trace magnitudes to .amps CSV."""

    fpath = run.path / "locate" / run.subname / "amplitudes"
    fpath.mkdir(exist_ok=True, parents=True)

    amplitudes = amplitudes.copy()

    for col in [
        "epi_dist",
        "z_dist",
        "P_amp",
        "P_avg_amp",
        "S_amp",
        "S_avg_amp",
        "Noise_amp",
    ]:
        amplitudes[col] = amplitudes[col].map(
            lambda x: f"{x:.5g}", na_action="ignore"
        )
    for col in ["P_freq", "S_freq"]:
        amplitudes[col] = amplitudes[col].map(
            lambda x: f"{x:.2g}", na_action="ignore"
        )
    for col in ["P_filter_gain", "S_filter_gain"]:
        amplitudes[col] = amplitudes[col].map(
            lambda x: f"{x:.3g}", na_action="ignore"
        )
    if "ML" in amplitudes.columns:
        for col in ["ML", "ML_Err"]:
            amplitudes[col] = amplitudes[col].map(
                lambda x: f"{x:.3g}", na_action="ignore"
            )

    file = (fpath / f"{event.uid}").with_suffix(".amps")
    amplitudes.to_csv(file, index=True)
