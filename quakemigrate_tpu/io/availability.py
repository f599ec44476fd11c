# -*- coding: utf-8 -*-
"""
StationAvailability.csv I/O — per-timestep 0/1 flags for each
station/phase onset, written per Julian day by detect and read back for
the trigger summary (reference: io/availability.py:21-150). Old-format
files (one column per station, implying all phases) are converted on read.

"""

import logging

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import UTCDateTime


def _day_file(run, when):
    stem = f"{when.year}_{when.julday:03d}_StationAvailability.csv"
    return run.path / "detect" / "availability" / stem


def read_availability(run, starttime, endtime):
    """Concatenate the day-split availability tables covering the span."""

    logging.debug("\t    Reading in .StationAvailability...")

    day_tables = []
    day = UTCDateTime(starttime.date)
    while day <= endtime:
        try:
            day_tables.append(_read_one_day(_day_file(run, day)))
        except FileNotFoundError:
            logging.info(
                "\tNo .StationAvailability file found for "
                f"{day.year} - {day.julday:03d}"
            )
        day = day + 86400

    if not day_tables:
        raise util.NoStationAvailabilityDataException
    return pd.concat(day_tables)


def _read_one_day(path, permanent_conversion=False):
    """
    Read one availability csv. Old-format columns are plain station names;
    a '1' there meant every phase of that station was available, so the
    table is expanded to {station}_{phase} columns (ref availability.py:
    73-120). Set ``permanent_conversion`` to rewrite the file in place.

    """

    table = pd.read_csv(path, index_col=0)

    # Files written by this package carry an explicit new-format marker
    # (the index column is named "DT"), so they are never misclassified
    # regardless of station naming or exotic phase labels.
    if table.index.name == "DT":
        return table

    # Unmarked files (reference-written, or written by older versions of
    # this package): new-format columns are {station}_{phase} where the
    # suffix after the LAST underscore is a SINGLE uppercase phase letter
    # (the set this package and the reference converter actually write,
    # e.g. P/S -- reference availability.py:112 hardcodes "PS"). Station
    # names may themselves contain underscores (e.g. "ST_01"), and a
    # looser <=2-letter test misreads old-format files whose stations all
    # end in a two-letter suffix (e.g. "ST_NE"/"ST_SW").
    def _phase_suffix(name):
        parts = str(name).rsplit("_", 1)
        return (
            parts[1]
            if len(parts) == 2 and len(parts[1]) == 1
            and parts[1].isalpha() and parts[1].isupper()
            else None
        )

    if len(table.columns) and all(
        _phase_suffix(c) is not None for c in table.columns
    ):
        return table

    logging.info(
        "\t\tWarning: an availability file is in the old format - "
        "converting..."
    )
    expanded = pd.DataFrame(index=table.index)
    for phase in "PS":
        for station in table.columns:
            expanded[f"{station}_{phase}"] = table[station].values

    if permanent_conversion:
        expanded.to_csv(path)
    return expanded


# Old name kept for callers of the converter utility.
_handle_old_structure = _read_one_day


def write_availability(run, availability):
    """
    Write the availability table, split by Julian day. Days that already
    have a table on disk (e.g. a resumed detect run) are merged, with the
    new rows winning on duplicate timestamps.

    """

    times = pd.Series([UTCDateTime(stamp) for stamp in availability.index])
    for date, members in times.groupby(times.map(lambda t: t.date)).groups.items():
        target = _day_file(run, UTCDateTime(date))
        target.parent.mkdir(exist_ok=True, parents=True)
        day_rows = availability.iloc[list(members)]
        if target.is_file():
            # Normalise through the old-format converter so a resumed
            # run merging over an old-format file does not produce a
            # union of old and new columns
            prior = _read_one_day(target)
            keep = prior[~prior.index.isin(day_rows.index)]
            if len(keep):
                day_rows = pd.concat([keep, day_rows]).sort_index()
        # "DT" index name = explicit new-format marker (see _read_one_day)
        day_rows.rename_axis("DT").to_csv(target)
