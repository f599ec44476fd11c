# -*- coding: utf-8 -*-
"""
Trigger summary figure: the (normalised) coalescence and threshold traces
with candidate-event windows, station availability, and a map-view scatter
of triggered locations (the same panels as the reference's
plot/trigger.py:24-585).

"""

import logging

import matplotlib.pyplot as plt
import numpy as np

import quakemigrate_tpu.util as util
from quakemigrate_tpu.io import read_availability


@util.timeit()
def trigger_summary(
    trigger,
    events,
    data,
    detection_threshold,
    starttime,
    endtime,
    region,
    discarded_events,
    interactive=False,
):
    """
    Create and save the trigger summary figure. ``trigger`` is the Trigger
    object itself — run, LUT, threshold description, normalisation choice
    and overlay files are read from it.

    """

    run, lut = trigger.run, trigger.lut
    normalise_coalescence = trigger.normalise_coalescence
    threshold_string = trigger._threshold_method_string()
    xy_files = trigger.xy_files

    # Time panels share the x-axis; the map panel must NOT (it is in
    # lon/lat coordinates and would clobber the shared time limits).
    fig = plt.figure(figsize=(18, 14))
    gs = fig.add_gridspec(4, 1, height_ratios=[2, 2, 1, 3], hspace=0.15)
    ax_coa = fig.add_subplot(gs[0])
    ax_coan = fig.add_subplot(gs[1], sharex=ax_coa)
    ax_avail = fig.add_subplot(gs[2], sharex=ax_coa)
    ax_map = fig.add_subplot(gs[3])

    # DT is datetime64[ns] (vectorised scanmseed read); date2num handles
    # the whole array at once.
    import matplotlib.dates as mdates

    times = mdates.date2num(data["DT"].to_numpy())

    # --- Coalescence traces ---
    # Sub-second tick labels for short trigger windows (ref
    # plot/trigger.py:294); the x-axis is shared across panels
    ax_coa.xaxis.set_major_formatter(util.DateFormatter("%H:%M:%S.{ms}", 2))
    ax_coa.plot(times, data["COA"], c="k", lw=0.5, label="Max coalescence")
    ax_coan.plot(
        times, data["COA_N"], c="k", lw=0.5,
        label="Normalised max coalescence",
    )
    threshold_ax = ax_coan if normalise_coalescence else ax_coa
    threshold_ax.plot(
        times, detection_threshold, c="g", lw=1.0,
        label=f"Threshold: {threshold_string}",
    )

    # --- Candidate event windows ---
    for df, colour in ((events, "r"), (discarded_events, "grey")):
        if df is None or len(df) == 0:
            continue
        for _, event in df.iterrows():
            for ax in (ax_coa, ax_coan):
                ax.axvspan(
                    event["MinTime"].matplotlib_date
                    if "MinTime" in event
                    else event["CoaTime"].matplotlib_date,
                    event["MaxTime"].matplotlib_date
                    if "MaxTime" in event
                    else event["CoaTime"].matplotlib_date,
                    alpha=0.2, color=colour,
                )
                ax.axvline(
                    event["CoaTime"].matplotlib_date, c=colour, lw=1.0
                )

    for ax, label in ((ax_coa, "Coalescence"), (ax_coan, "Normalised")):
        ax.set_ylabel(label)
        ax.legend(loc="upper right", fontsize=9)

    # --- Station availability panel ---
    try:
        availability = read_availability(run, starttime, endtime)
        frac = availability.sum(axis=1) / availability.shape[1]
        from quakemigrate_tpu.seis import UTCDateTime

        avail_times = [UTCDateTime(t).matplotlib_date for t in
                       availability.index]
        ax_avail.step(avail_times, frac * 100, where="post", c="k", lw=0.8)
        ax_avail.set_ylabel("Availability (%)")
        ax_avail.set_ylim(-5, 105)
    except Exception as e:
        logging.debug(f"No station availability to plot: {e}")
        ax_avail.set_axis_off()

    # --- Map scatter of triggered events ---
    extent = lut.get_grid_extent(cells=True)
    ax_map.set_xlim(extent[0][0], extent[1][0])
    ax_map.set_ylim(extent[0][1], extent[1][1])
    ax_map.set_xlabel("Longitude (deg)")
    ax_map.set_ylabel("Latitude (deg)")
    station_data = lut.station_data
    ax_map.scatter(
        station_data.Longitude.values, station_data.Latitude.values,
        s=20, marker="^", c="k",
    )
    if events is not None and len(events):
        sc = ax_map.scatter(
            events["COA_X"].astype(float),
            events["COA_Y"].astype(float),
            s=40,
            c=events["TRIG_COA"].astype(float),
            cmap="viridis",
            zorder=10,
            label="Triggered events",
        )
        fig.colorbar(sc, ax=ax_map, label="Trigger coalescence value")
    if xy_files is not None:
        from .xy import plot_xy_files

        plot_xy_files(xy_files, ax_map)
    if region is not None:
        from matplotlib.patches import Rectangle

        ax_map.add_patch(
            Rectangle(
                (region[0], region[1]),
                region[3] - region[0],
                region[4] - region[1],
                fill=False, edgecolor="b", ls="--",
            )
        )
    ax_map.set_aspect("auto")

    fig.suptitle(
        f"Trigger summary: {run.name} | {starttime} - {endtime}", fontsize=14
    )

    fpath = run.path / "trigger" / run.subname / "summaries"
    fpath.mkdir(exist_ok=True, parents=True)
    fstem = f"{run.name}_{starttime.year}_{starttime.julday:03d}_Trigger"
    file = (fpath / fstem).with_suffix(".pdf")
    plt.savefig(file, dpi=400)
    if interactive:
        plt.show()
    plt.close(fig)
