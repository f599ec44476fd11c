# -*- coding: utf-8 -*-
"""
TriggeredEvents.csv I/O: day-keyed candidate-event tables produced by the
trigger stage and consumed by locate. Midnight boundaries are treated as
belonging to the next day (reference: io/triggered_events.py:34-138).

"""

import logging
from datetime import time

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import UTCDateTime


OUTPUT_COLS = [
    "EventID",
    "CoaTime",
    "TRIG_COA",
    "COA_X",
    "COA_Y",
    "COA_Z",
    "COA",
    "COA_NORM",
]


def read_triggered_events(run, **kwargs):
    """
    Read triggered events between two timestamps (or from an explicit
    trigger file).

    """

    starttime = kwargs.get("starttime")
    endtime = kwargs.get("endtime")
    trigger_file = kwargs.get("trigger_file")

    fpath = run.path / "trigger" / run.subname / "events"

    if trigger_file is not None:
        events = pd.read_csv(trigger_file)
    else:
        trigger_files = []
        readstart = UTCDateTime(starttime.date)
        while readstart <= endtime:
            fstem = f"{run.name}_{readstart.year}_{readstart.julday:03d}"
            file = (fpath / f"{fstem}_TriggeredEvents").with_suffix(".csv")
            if file.is_file():
                trigger_files.append(file)
            else:
                logging.info(f"\n\t    Cannot find file: {fstem}")
            readstart = readstart + 86400
        if len(trigger_files) == 0:
            raise util.NoTriggerFilesFound
        events = pd.concat(
            (pd.read_csv(f) for f in trigger_files), ignore_index=True
        )

    events["CoaTime"] = events["CoaTime"].apply(UTCDateTime)

    if starttime is not None and endtime is not None:
        if endtime.time == time(0, 0):
            events = events[
                (events["CoaTime"] >= starttime) & (events["CoaTime"] < endtime)
            ]
        else:
            events = events[
                (events["CoaTime"] >= starttime)
                & (events["CoaTime"] <= endtime)
            ]

    if len(events) == 0:
        logging.info(
            "\n\t    No triggered events found! Check your trigger output "
            "files.\n"
        )

    return events.reset_index()


@util.timeit("info")
def write_triggered_events(run, events, starttime, write_event_time_windows):
    """Write triggered events to a day-keyed .csv file."""

    fpath = run.path / "trigger" / run.subname / "events"
    fpath.mkdir(exist_ok=True, parents=True)

    output_cols = list(OUTPUT_COLS)
    if write_event_time_windows:
        output_cols.extend(["MinTime", "MaxTime"])

    events = events.copy()
    events = events.loc[:, output_cols]

    fstem = f"{run.name}_{starttime.year}_{starttime.julday:03d}"
    file = (fpath / f"{fstem}_TriggeredEvents").with_suffix(".csv")
    events.to_csv(file, index=False)
