# -*- coding: utf-8 -*-
"""
StationAvailability.csv I/O: per-timestep 0/1 availability of each
station/phase onset, day-keyed (reference: io/availability.py:21-150).

"""

import logging

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import UTCDateTime


def read_availability(run, starttime, endtime):
    """Read day-split station availability tables into one DataFrame."""

    fpath = run.path / "detect" / "availability"

    availability = None
    logging.debug("\t    Reading in .StationAvailability...")
    readstart = UTCDateTime(starttime.date)
    while readstart <= endtime:
        fstem = f"{readstart.year}_{readstart.julday:03d}"
        file = (fpath / f"{fstem}_StationAvailability").with_suffix(".csv")
        try:
            chunk = _handle_old_structure(file)
            if availability is None:
                availability = chunk
            else:
                availability = pd.concat([availability, chunk])
        except FileNotFoundError:
            logging.info(
                "\tNo .StationAvailability file found for "
                f"{readstart.year} - {readstart.julday:03d}"
            )
        readstart = readstart + 86400

    if availability is None:
        raise util.NoStationAvailabilityDataException

    return availability


def _handle_old_structure(file, permanent_conversion=False):
    """
    Read an availability table, converting old-format files (one column
    per station) to the current per-station/phase layout on the fly: an
    old-style '1' meant all phases for that station were available
    (reference: io/availability.py:73-120).

    """

    table = pd.read_csv(file, index_col=0)

    cols = [name.split("_") for name in table.columns]
    if cols and len(cols[0]) == 2:
        return table

    logging.info(
        "\t\tWarning: an availability file is in the old format - "
        "converting..."
    )
    converted = pd.DataFrame(index=table.index)
    for phase in "PS":
        for col in cols:
            converted[f"{col[0]}_{phase}"] = table[col[0]].values

    if permanent_conversion:
        converted.to_csv(file)

    return converted


def write_availability(run, availability):
    """Write per-timestep availability, split by Julian day."""

    fpath = run.path / "detect" / "availability"
    fpath.mkdir(exist_ok=True, parents=True)

    times = [UTCDateTime(idx) for idx in availability.index]
    dates = sorted(set(t.date for t in times))

    for date in dates:
        in_day = [i for i, t in enumerate(times) if t.date == date]
        to_write = availability.iloc[in_day]
        date = UTCDateTime(date)

        fstem = f"{date.year}_{date.julday:03d}_StationAvailability"
        file = (fpath / fstem).with_suffix(".csv")
        to_write.to_csv(file)
