# -*- coding: utf-8 -*-
"""
The .amps file: per-trace P/S amplitude observations plus individual local
magnitude estimates, with the reference's per-column significant-figure
formatting (io/amplitudes.py:14-69).

"""

# Significant figures per column group in the written file.
_COLUMN_FORMATS = {
    ".5g": ("epi_dist", "z_dist", "P_amp", "P_avg_amp", "S_amp", "S_avg_amp",
            "Noise_amp"),
    ".2g": ("P_freq", "S_freq"),
    ".3g": ("P_filter_gain", "S_filter_gain", "ML", "ML_Err"),
}


def write_amplitudes(run, amplitudes, event):
    """Format and write one event's amplitude table to ``<uid>.amps``."""

    outdir = run.path / "locate" / run.subname / "amplitudes"
    outdir.mkdir(exist_ok=True, parents=True)

    formatted = amplitudes.copy()
    for spec, columns in _COLUMN_FORMATS.items():
        for column in columns:
            if column not in formatted.columns:
                continue
            formatted[column] = formatted[column].map(
                lambda x, s=spec: format(x, s), na_action="ignore"
            )

    formatted.to_csv(outdir / f"{event.uid}.amps", index=True)
