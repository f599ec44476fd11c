# -*- coding: utf-8 -*-
"""
Event: accumulates everything known about a single located earthquake --
waveform data, coalescence time series, the 4-D coalescence map, origin
time, the three location estimates (spline/gaussian/covariance), phase
picks and local magnitude -- and writes the 20-column .event file with the
reference's precision contract (quakemigrate/io/event.py:23-44,441-508).

"""

import logging

import numpy as np
import pandas as pd

import quakemigrate_tpu.util as util


EVENT_FILE_COLS = [
    "EventID",
    "DT",
    "X",
    "Y",
    "Z",
    "COA",
    "COA_NORM",
    "GAU_X",
    "GAU_Y",
    "GAU_Z",
    "GAU_ErrX",
    "GAU_ErrY",
    "GAU_ErrZ",
    "COV_ErrX",
    "COV_ErrY",
    "COV_ErrZ",
    "COV_Err_XYZ",
    "TRIG_COA",
    "DEC_COA",
    "DEC_COA_NORM",
]

XYZ, ERR_XYZ = ["X", "Y", "Z"], ["ErrX", "ErrY", "ErrZ"]


class Event:
    """Everything known about one candidate/located event."""

    def __init__(self, marginal_window, triggered_event=None):
        self.marginal_window = marginal_window

        if triggered_event is not None:
            self.uid = triggered_event["EventID"]
            self.trigger_time = triggered_event["CoaTime"]
            self.trigger_info = self._parse_triggered_event(triggered_event)

        self.data = None
        self.coa_data = None
        self.map4d = None
        self.trim_bounds = None
        self._marginalise_inputs = None
        self.onset_data = None
        self.otime = None
        self.locations = {}
        self.picks = {}
        self.localmag = {}

    def add_waveform_data(self, data):
        self.data = data

    def add_compute_output(self, times, max_coa, max_coa_n, coord, map4d,
                           onset_data):
        """
        Store the outputs of the locate-stage migration: the coalescence
        time series, the 4-D map (flattened-node [N, S] or (nx,ny,nz,S))
        and the onset data.

        """

        self.coa_data = pd.DataFrame(
            {
                "DT": times,
                "COA": np.asarray(max_coa, dtype=np.float64),
                "COA_NORM": np.asarray(max_coa_n, dtype=np.float64),
                "X": coord[:, 0],
                "Y": coord[:, 1],
                "Z": coord[:, 2],
            }
        )
        self.map4d = map4d
        idxmax = self.coa_data["COA"].astype(float).idxmax()
        self.otime = self.coa_data.iloc[idxmax]["DT"]
        self.onset_data = onset_data

    def add_covariance_location(self, xyz, xyz_unc):
        cov_err_xyz = np.power(xyz_unc[0] * xyz_unc[1] * xyz_unc[2], 1 / 3)
        self.locations["covariance"] = {
            "X": xyz[0],
            "Y": xyz[1],
            "Z": xyz[2],
            "ErrX": xyz_unc[0],
            "ErrY": xyz_unc[1],
            "ErrZ": xyz_unc[2],
            "Err_XYZ": cov_err_xyz,
        }

    def add_gaussian_location(self, xyz, xyz_unc):
        self.locations["gaussian"] = {
            "X": xyz[0],
            "Y": xyz[1],
            "Z": xyz[2],
            "ErrX": xyz_unc[0],
            "ErrY": xyz_unc[1],
            "ErrZ": xyz_unc[2],
        }

    def add_spline_location(self, xyz):
        self.locations["spline"] = dict(zip(XYZ, xyz))

    def add_picks(self, pick_df, **kwargs):
        self.picks["df"] = pick_df
        for key, value in kwargs.items():
            self.picks[key] = value

    def add_local_magnitude(self, mag, mag_err, mag_r2):
        self.localmag["ML"] = mag
        self.localmag["ML_Err"] = mag_err
        self.localmag["ML_r2"] = mag_r2

    def in_marginal_window(self):
        """Is the trigger time within the marginal window of the otime?"""

        window_start = self.otime - self.marginal_window
        window_end = self.otime + self.marginal_window
        cond = window_start < self.trigger_time < window_end
        if not cond:
            logging.info(f"\tEvent {self.uid} is outside marginal window.")
            logging.info(
                "\tDefine more realistic error - the marginal window should "
                "be an estimate of overall uncertainty."
            )
            logging.info(util.log_spacer)

        return cond

    def mw_times(self, sampling_rate):
        """Timestamps for trigger_time +/- 2 * marginal_window."""

        npts = int(4 * self.marginal_window * sampling_rate) + 1
        start = self.trigger_time - 2 * self.marginal_window
        return np.array(
            [start + i / sampling_rate for i in range(npts)], dtype=object
        )

    def trim2window(self):
        """
        Trim coa_data (and map4d, if retained) to otime +/- marginal_window.
        The trimmed sample bounds within the original scan window are kept
        in ``trim_bounds`` for two-pass (map-free) marginalisation.

        """

        window_start = self.otime - self.marginal_window
        window_end = self.otime + self.marginal_window

        self.coa_data = self.coa_data[
            (self.coa_data["DT"] >= window_start)
            & (self.coa_data["DT"] <= window_end)
        ]
        self.trim_bounds = (self.coa_data.index[0], self.coa_data.index[-1])
        if self.map4d is not None:
            self.map4d = self.map4d[
                ..., self.trim_bounds[0] : self.trim_bounds[1]
            ]
        self.coa_data = self.coa_data.reset_index(drop=True)

        idxmax = self.coa_data["COA"].astype(float).idxmax()
        self.otime = self.coa_data.iloc[idxmax]["DT"]

    def write(self, run, lut):
        """Write the .event CSV with LUT-precision-aware rounding."""

        fpath = run.path / "locate" / run.subname / "events"
        fpath.mkdir(exist_ok=True, parents=True)

        out = {"EventID": self.uid, **self.trigger_info, **self.localmag}
        out = {**out, **self.max_coalescence}

        loc = self.locations["spline"]
        gau = {
            f"GAU_{key}": value
            for key, value in self.locations["gaussian"].items()
        }
        cov = {
            f"COV_{key}": value
            for key, value in list(self.locations["covariance"].items())[3:]
        }
        out = {**out, **loc, **gau, **cov}

        if self.localmag.get("ML") is not None:
            event_file_cols = EVENT_FILE_COLS + ["ML", "ML_Err", "ML_r2"]
        else:
            event_file_cols = EVENT_FILE_COLS

        event_df = pd.DataFrame([out])[event_file_cols]

        for col in event_df.filter(like="COA").columns:
            event_df[col] = event_df[col].map(
                lambda x: f"{x:.4g}", na_action="ignore"
            )

        for axis_precision, axis in zip(lut.precision, XYZ):
            cols = [axis, f"GAU_{axis}"]
            if axis == "Z":
                unit_correction = 3 if lut.unit_name == "km" else 0
                decimals = max((axis_precision + 2), 0 + unit_correction)
                cols.extend(event_df.filter(regex="Err[X,Y,Z]"))
                cols.extend(["COV_Err_XYZ"])
            else:
                decimals = max((axis_precision + 2), 6)
            for col in cols:
                event_df[col] = event_df.loc[:, col].round(decimals=decimals)
                if decimals <= 0:
                    event_df[col] = event_df.loc[:, col].astype(int)

        if self.localmag.get("ML") is not None:
            for col in ["ML", "ML_Err", "ML_r2"]:
                event_df[col] = event_df[col].map(
                    lambda x: f"{x:.3g}", na_action="ignore"
                )

        file = (fpath / f"{self.uid}").with_suffix(".event")
        event_df.to_csv(file, index=False)

    def get_hypocentre(self, method="spline"):
        """[X, Y, Z] of the event hypocentre in geographic coordinates."""

        hypocentre = self.locations[method]
        return np.array([hypocentre[k] for k in XYZ])

    hypocentre = property(get_hypocentre)

    def get_loc_uncertainty(self, method="gaussian"):
        loc = self.locations[method]
        return np.array([loc[k] for k in ERR_XYZ])

    loc_uncertainty = property(get_loc_uncertainty)

    @property
    def local_magnitude(self):
        if len(self.localmag) == 0:
            return None
        return (value for _, value in self.localmag.items())

    @property
    def max_coalescence(self):
        idxmax = self.coa_data["COA"].astype("float").idxmax()
        max_coa = self.coa_data.iloc[idxmax]
        keys = ["DT", "COA", "COA_NORM"]
        return dict(zip(keys, max_coa[keys].values))

    @staticmethod
    def _parse_triggered_event(event_data):
        try:
            trigger_info = {
                "TRIG_COA": event_data["TRIG_COA"],
                "DEC_COA": event_data["COA"],
                "DEC_COA_NORM": event_data["COA_NORM"],
            }
        except KeyError:
            trigger_info = {
                "TRIG_COA": np.nan,
                "DEC_COA": np.nan,
                "DEC_COA_NORM": np.nan,
            }
        return trigger_info
