# -*- coding: utf-8 -*-
"""
TriggeredEvents.csv I/O — the day-keyed candidate tables handed from
trigger to locate. An endtime falling exactly at midnight belongs to the
next day and is excluded (reference: io/triggered_events.py:34-138).

"""

import logging
from datetime import time

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import UTCDateTime

OUTPUT_COLS = [
    "EventID", "CoaTime", "TRIG_COA",
    "COA_X", "COA_Y", "COA_Z",
    "COA", "COA_NORM",
]


def _day_file(run, when):
    """Path of the TriggeredEvents csv for the day containing ``when``."""

    stem = f"{run.name}_{when.year}_{when.julday:03d}_TriggeredEvents.csv"
    return run.path / "trigger" / run.subname / "events" / stem


def read_triggered_events(run, **kwargs):
    """
    Load candidate events for a time span (``starttime``/``endtime``) or
    from one explicit ``trigger_file``. CoaTime is parsed to UTCDateTime and
    the table is span-filtered.

    """

    starttime, endtime = kwargs.get("starttime"), kwargs.get("endtime")
    trigger_file = kwargs.get("trigger_file")

    if trigger_file is not None:
        events = pd.read_csv(trigger_file)
    else:
        day_tables = []
        day = UTCDateTime(starttime.date)
        while day <= endtime:
            source = _day_file(run, day)
            if source.is_file():
                day_tables.append(pd.read_csv(source))
            else:
                logging.info(f"\n\t    Cannot find file: {source.stem[:-16]}")
            day = day + 86400
        if not day_tables:
            raise util.NoTriggerFilesFound
        events = pd.concat(day_tables, ignore_index=True)

    events["CoaTime"] = events["CoaTime"].apply(UTCDateTime)

    if starttime is not None and endtime is not None:
        # Midnight endtime: the boundary sample belongs to the next day.
        end_exclusive = endtime.time == time(0, 0)
        keep = events["CoaTime"].map(
            lambda t: starttime <= t and (t < endtime if end_exclusive
                                          else t <= endtime)
        )
        events = events[keep]

    if events.empty:
        logging.info(
            "\n\t    No triggered events found! Check your trigger output "
            "files.\n"
        )
    return events.reset_index()


@util.timeit("info")
def write_triggered_events(run, events, starttime, write_event_time_windows):
    """Write one day's triggered events table."""

    target = _day_file(run, starttime)
    target.parent.mkdir(exist_ok=True, parents=True)

    columns = OUTPUT_COLS + (
        ["MinTime", "MaxTime"] if write_event_time_windows else []
    )
    events[columns].to_csv(target, index=False)
