# -*- coding: utf-8 -*-
"""
NonLinLoc phase (OBS) file export, including the weighting term
(reference: export/to_nlloc.py:26-108).

"""

import warnings

from quakemigrate_tpu.seis import UTCDateTime


def nlloc_obs(event, filename, autopick=True):
    """
    Write a NonLinLoc Phase file for one
    :class:`~quakemigrate_tpu.export.catalog.EventRecord`.

    Parameters
    ----------
    event : EventRecord
        Event with a picks DataFrame.
    filename : str
        Output phase file path.
    autopick : bool, optional
        Use the autopicked times (True) or the modelled arrival times.

    """

    info = []

    fmt = (
        "{:s} {:s} {:s} {:s} {:s} {:s} {:s} {:s} "
        "{:7.4f} GAU {:9.2e} {:9.2e} {:9.2e} {:9.2e} {:9.2e}"
    )

    picks = event.picks if event.picks is not None else []
    if event.picks is not None:
        for _, pick in event.picks.iterrows():
            time_str = str(pick["PickTime"] if autopick else pick["ModelledTime"])
            if time_str == "-1":
                continue
            time = UTCDateTime(time_str)
            station = str(pick["Station"]) or "?"
            phase_type = str(pick["Phase"]) or "?"
            try:
                time_error = float(pick["PickError"])
            except (KeyError, ValueError):
                time_error = -1
            if not autopick:
                time_error = -1

            info.append(
                fmt.format(
                    station.ljust(6),
                    "?".ljust(4),
                    "?".ljust(4),
                    "?".ljust(1),
                    phase_type.ljust(6),
                    "?".ljust(1),
                    time.strftime("%Y%m%d"),
                    time.strftime("%H%M"),
                    time.second + time.microsecond * 1e-6,
                    time_error,
                    -1,
                    -1,
                    -1,
                    1,
                )
            )

    if info:
        info = "\n".join(sorted(info) + [""])
    else:
        warnings.warn("No pick information, writing empty NLLOC OBS file.")
    with open(filename, "w") as fh:
        for line in info:
            fh.write(line)
