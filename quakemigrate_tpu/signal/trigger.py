# -*- coding: utf-8 -*-
"""
Trigger: threshold the continuous maximum-coalescence stream output by
detect() to identify candidate events for locate().

Host-side pandas/numpy, mirroring the reference behaviour exactly
(quakemigrate/signal/trigger.py:77-737): day-batched processing; static /
MAD / median-ratio thresholds computed over fixed-length chunks; optional
Gaussian smoothing of the coalescence traces; candidate identification on
above-threshold runs with the peak always taken from the raw COA trace;
overlapping marginal windows merged; events filtered by pad and optional
geographic region; 17-character event IDs minted from the coalescence time.

"""

import logging
from datetime import time

import numpy as np
import pandas as pd
from scipy.ndimage import gaussian_filter1d

import quakemigrate_tpu.util as util
from quakemigrate_tpu.io import Run, read_scanmseed, write_triggered_events
from quakemigrate_tpu.seis import UTCDateTime


def chunks2trace(a, new_shape):
    """Expand an array of per-chunk values into a sample-by-sample trace."""

    b = np.broadcast_to(a[:, None], new_shape)
    b = np.reshape(b, np.prod(new_shape))

    return b


CANDIDATES_COLS = [
    "EventNum",
    "CoaTime",
    "TRIG_COA",
    "COA_X",
    "COA_Y",
    "COA_Z",
    "MinTime",
    "MaxTime",
    "COA",
    "COA_NORM",
]

REFINED_EVENTS_COLS = [
    "EventID",
    "CoaTime",
    "TRIG_COA",
    "COA_X",
    "COA_Y",
    "COA_Z",
    "MinTime",
    "MaxTime",
    "COA",
    "COA_NORM",
]


class Trigger:
    """
    Candidate-event triggering from the detect-stage coalescence stream.

    Attributes follow the reference API: threshold_method ("static" /
    "mad" / "median_ratio") and its parameters, marginal_window,
    min_event_interval (>= 2x marginal window), normalise_coalescence,
    pad, smoothing options, plotting toggles.

    """

    def __init__(self, lut, run_path, run_name, **kwargs):
        self.lut = lut

        self.run = Run(
            run_path,
            run_name,
            kwargs.get("trigger_name", ""),
            "trigger",
            loglevel=kwargs.get("loglevel", "info"),
        )
        self.run.logger(kwargs.get("log", False))

        self.threshold_method = kwargs.get("threshold_method", "static")
        self.static_threshold = kwargs.get("static_threshold", 1.5)
        self.mad_window_length = kwargs.get("mad_window_length", 3600.0)
        self.mad_multiplier = kwargs.get("mad_multiplier", 8.0)
        self.median_window_length = kwargs.get("median_window_length", 3600.0)
        self.median_multiplier = kwargs.get("median_multiplier", 1.2)

        self.marginal_window = kwargs.get("marginal_window", 2.0)
        self.min_event_interval = kwargs.get("min_event_interval", 4.0)
        if kwargs.get("minimum_repeat"):
            self.minimum_repeat = kwargs.get("minimum_repeat")
        self.normalise_coalescence = kwargs.get("normalise_coalescence", False)
        self.pad = kwargs.get("pad", 120.0)
        self.smooth_coa = kwargs.get("smooth_coa", False)
        self.smoothing_kernel_sigma = kwargs.get("smoothing_kernel_sigma", 0.2)
        self.smoothing_kernel_width = kwargs.get("smoothing_kernel_width", 4.0)

        self.plot_trigger_summary = kwargs.get("plot_trigger_summary", True)
        self.xy_files = kwargs.get("xy_files")
        self.plot_all_stns = kwargs.get("plot_all_stns", True)

        self.write_event_time_windows = kwargs.get(
            "write_event_time_windows", False
        )

    def __str__(self):
        out = (
            "\tTrigger parameters:\n"
            f"\t\tPre/post pad = {self.pad} s\n"
            f"\t\tMarginal window = {self.marginal_window} s\n"
            f"\t\tMinimum event interval  = {self.min_event_interval} s\n\n"
            f"\t\tTriggering from the "
        )
        out += "normalised " if self.normalise_coalescence else ""
        out += "maximum coalescence trace.\n\n"
        out += f"\t\tTrigger threshold method: {self.threshold_method}\n"
        if self.threshold_method == "static":
            out += f"\t\tStatic threshold = {self.static_threshold}\n\n"
        elif self.threshold_method == "mad":
            out += (
                f"\t\tMAD Window     = {self.mad_window_length}\n"
                f"\t\tMAD Multiplier = {self.mad_multiplier}\n\n"
            )
        elif self.threshold_method == "median_ratio":
            out += (
                f"\t\tMedian Window     = {self.median_window_length}\n"
                f"\t\tMedian Multiplier = {self.median_multiplier}\n\n"
            )
        if self.smooth_coa:
            out += (
                "\t\tApplying gaussian smoothing to the coalescence trace.\n"
                f"\t\tGaussian kernel sigma = {self.smoothing_kernel_sigma} s\n"
                f"\t\tGaussian kernel truncated at "
                f"{self.smoothing_kernel_width} standard deviations.\n"
            )

        return out

    def trigger(self, starttime, endtime, region=None, interactive_plot=False):
        """Trigger candidate events between two timestamps, day by day."""

        starttime, endtime = UTCDateTime(starttime), UTCDateTime(endtime)
        if starttime > endtime:
            raise util.TimeSpanException

        logging.info(util.log_spacer)
        logging.info("\tTRIGGER - Triggering events from .scanmseed")
        logging.info(util.log_spacer)
        logging.info(f"\n\tTriggering events from {starttime} to {endtime}\n")
        logging.info(str(self))
        logging.info(util.log_spacer)

        batchstart = starttime
        while batchstart < endtime:
            next_day = UTCDateTime(batchstart.date) + 86400
            batchend = next_day if next_day <= endtime else endtime
            self._trigger_batch(batchstart, batchend, region, interactive_plot)
            batchstart = next_day

        logging.info(util.log_spacer)

    def _trigger_batch(self, batchstart, batchend, region, interactive_plot):
        """Trigger one (up to day-length) batch."""

        logging.info("\tReading in .scanmseed...")
        data, stats = read_scanmseed(
            self.run, batchstart, batchend, self.pad,
            self.lut.unit_conversion_factor,
        )

        if batchend.time == time(0, 0):
            batchend = batchend - stats.delta

        if self.smooth_coa:
            data = self._smooth_coa(data, stats.sampling_rate)

        logging.info("\n\tTriggering events...")
        trigger_on = "COA_N" if self.normalise_coalescence else "COA"
        threshold = self._get_threshold(data[trigger_on], stats.sampling_rate)
        candidate_events = self._identify_candidates(data, trigger_on, threshold)

        if candidate_events.empty:
            logging.info(
                "\tNo events triggered at this threshold - try a lower "
                "detection threshold."
            )
            events = candidate_events
            discarded = candidate_events
        else:
            refined_events = self._refine_candidates(candidate_events)
            logging.debug(refined_events)
            events = self._filter_events(
                refined_events, batchstart, batchend, region
            )
            discarded = refined_events[
                ~refined_events.index.isin(events.index)
            ].dropna()
            logging.info(
                f"\n\t\t{len(events)} event(s) triggered within the "
                f"specified region between {batchstart} \n\t\tand {batchend}"
            )
            logging.info("\n\tWriting triggered events to file...")
            write_triggered_events(
                self.run, events, batchstart, self.write_event_time_windows
            )

        if self.plot_trigger_summary:
            logging.info("\n\tPlotting trigger summary...")
            from quakemigrate_tpu.plot.trigger import trigger_summary

            trigger_summary(
                events,
                batchstart,
                batchend,
                self.run,
                self.marginal_window,
                self.min_event_interval,
                threshold,
                self._threshold_method_string(),
                self.normalise_coalescence,
                self.lut,
                data,
                region,
                discarded,
                interactive=interactive_plot,
                xy_files=self.xy_files,
                plot_all_stns=self.plot_all_stns,
            )

    def _threshold_method_string(self):
        if self.threshold_method == "static":
            return f"{self.static_threshold} (static)"
        if self.threshold_method == "mad":
            return f"MAD ({self.mad_window_length} s / {self.mad_multiplier}x)"
        return (
            f"Median Ratio ({self.median_window_length} s / "
            f"{self.median_multiplier}x)"
        )

    def _smooth_coa(self, data, sampling_rate):
        """Gaussian-smooth the COA and COA_N traces."""

        st_dev = self.smoothing_kernel_sigma * sampling_rate
        logging.info("\n\tApplying smoothing...")
        for column in ("COA", "COA_N"):
            data.loc[:, column] = gaussian_filter1d(
                data[column].to_numpy(dtype=float), st_dev,
                truncate=self.smoothing_kernel_width,
            )

        return data

    @util.timeit()
    def _get_threshold(self, scandata, sampling_rate):
        """Per-sample trigger threshold (static or dynamic)."""

        if self.threshold_method in ("mad", "median_ratio"):
            breaks = np.arange(len(scandata))
            if self.threshold_method == "mad":
                window_length = self.mad_window_length
            else:
                window_length = self.median_window_length
            breaks = breaks[breaks % int(window_length * sampling_rate) == 0][1:]
            chunks = np.split(scandata.to_numpy(dtype=float), breaks)

            median_values = np.asarray([np.median(chunk) for chunk in chunks])
            median_trace = chunks2trace(
                median_values, (len(chunks), len(chunks[0]))
            )
            median_trace = median_trace[: len(scandata)]

            if self.threshold_method == "mad":
                mad_values = np.asarray(
                    [util.calculate_mad(chunk) for chunk in chunks]
                )
                mad_trace = chunks2trace(
                    mad_values, (len(chunks), len(chunks[0]))
                )
                mad_trace = mad_trace[: len(scandata)]
                threshold = median_trace + (mad_trace * self.mad_multiplier)
            else:
                threshold = median_trace * self.median_multiplier
        else:
            threshold = (
                np.zeros(len(scandata), dtype=float) + self.static_threshold
            )

        return threshold

    @util.timeit()
    def _identify_candidates(self, scandata, trigger_on, threshold):
        """Group above-threshold runs into candidate events."""

        min_event_interval = self.min_event_interval - self.marginal_window

        above = scandata[trigger_on].to_numpy(dtype=float) >= threshold
        thresholded = scandata[above]
        r = np.arange(len(thresholded))
        candidates = [
            d for _, d in thresholded.groupby(thresholded.index - r)
        ]

        rows = []
        for i, candidate in enumerate(candidates):
            # Peak always from the raw COA trace for consistency with the
            # origin-time determination in locate
            peak = candidate.loc[candidate["COA"].idxmax()]

            if (peak["DT"] - candidate["DT"].iloc[0]) < self.marginal_window:
                min_dt = peak["DT"] - self.min_event_interval
            else:
                min_dt = candidate["DT"].iloc[0] - min_event_interval

            if (candidate["DT"].iloc[-1] - peak["DT"]) < self.marginal_window:
                max_dt = peak["DT"] + self.min_event_interval
            else:
                max_dt = candidate["DT"].iloc[-1] + min_event_interval

            rows.append(
                [
                    i,
                    peak["DT"],
                    peak[trigger_on],
                    peak["X"],
                    peak["Y"],
                    peak["Z"],
                    min_dt,
                    max_dt,
                    peak["COA"],
                    peak["COA_N"],
                ]
            )

        return pd.DataFrame(rows, columns=CANDIDATES_COLS)

    @util.timeit()
    def _refine_candidates(self, candidate_events):
        """Merge candidates whose marginal windows overlap."""

        event_count = 1
        for i, event1 in candidate_events.iterrows():
            candidate_events.loc[i, "EventNum"] = event_count
            if i + 1 == len(candidate_events):
                continue
            event2 = candidate_events.iloc[i + 1]
            if all(
                [
                    event1["MaxTime"]
                    < event2["CoaTime"] - self.marginal_window,
                    event2["MinTime"]
                    > event1["CoaTime"] + self.marginal_window,
                ]
            ):
                event_count += 1

        merged_candidates = [
            d for _, d in candidate_events.groupby(candidate_events["EventNum"])
        ]

        rows = []
        for i, candidate in enumerate(merged_candidates):
            logging.debug(
                f"\t    Triggered event {i + 1} of {len(merged_candidates)}"
            )
            event = candidate.loc[candidate["TRIG_COA"].idxmax()].copy()
            event["MinTime"] = candidate["MinTime"].min()
            event["MaxTime"] = candidate["MaxTime"].max()

            event_uid = str(event["CoaTime"])
            for char_ in ["-", ":", ".", " ", "Z", "T"]:
                event_uid = event_uid.replace(char_, "")
            event_uid = event_uid[:17].ljust(17, "0")

            rows.append(
                [
                    event_uid,
                    event["CoaTime"],
                    event["TRIG_COA"],
                    event["COA_X"],
                    event["COA_Y"],
                    event["COA_Z"],
                    event["MinTime"],
                    event["MaxTime"],
                    event["COA"],
                    event["COA_NORM"],
                ]
            )

        return pd.DataFrame(rows, columns=REFINED_EVENTS_COLS)

    @util.timeit()
    def _filter_events(self, events, starttime, endtime, region):
        """Drop events in the pads and outside the geographic region."""

        events = events.loc[
            (events["CoaTime"] >= starttime) & (events["CoaTime"] <= endtime), :
        ].copy()

        if region is not None:
            events = events.loc[
                (events["COA_X"] >= region[0])
                & (events["COA_Y"] >= region[1])
                & (events["COA_Z"] >= region[2])
                & (events["COA_X"] <= region[3])
                & (events["COA_Y"] <= region[4])
                & (events["COA_Z"] <= region[5]),
                :,
            ].copy()

        return events

    @property
    def min_event_interval(self):
        return self._min_event_interval

    @min_event_interval.setter
    def min_event_interval(self, value):
        if value < 2 * self.marginal_window:
            raise ValueError(
                "\tMinimum event interval must be >= 2 * marginal window."
            )
        self._min_event_interval = value

    @property
    def threshold_method(self):
        return self._threshold_method

    @threshold_method.setter
    def threshold_method(self, value):
        if value in ("static", "mad", "median_ratio"):
            self._threshold_method = value
        elif value == "dynamic":
            # Deprecated name from older reference scripts
            # (reference: signal/trigger.py:710-719)
            print(
                "FutureWarning: This threshold method has been renamed - "
                "continuing.\nTo remove this message, change:\n"
                "\t'dynamic' -> 'mad'"
            )
            self._threshold_method = "mad"
        else:
            raise util.InvalidTriggerThresholdMethodException

    @property
    def minimum_repeat(self):
        """Deprecated name for min_event_interval (reference:
        signal/trigger.py:721-737)."""

        return self._min_event_interval

    @minimum_repeat.setter
    def minimum_repeat(self, value):
        if value < 2 * self.marginal_window:
            raise ValueError(
                "\tMinimum repeat must be >= 2 * marginal window."
            )
        print(
            "FutureWarning: Parameter name has changed - continuing.\n"
            "To remove this message, change:\n"
            "\t'minimum_repeat' -> 'min_event_interval'"
        )
        self._min_event_interval = value
