# -*- coding: utf-8 -*-
"""
GaussianPicker: phase picking by fitting a 1-D Gaussian to the onset
function around the modelled arrival time.

Follows the reference algorithm (signal/pickers/gaussian.py:114-560):
onsets are recomputed over the event window; pick windows are the modelled
arrival +/- (traveltime * fraction_tt + marginal_window), with overlapping
P/S windows split at the midpoint; the pick threshold is derived from the
onset noise outside the windows (MAD or percentile); a Gaussian is fitted
to the peak that contains the window maximum; failures yield -1 sentinels.

"""

import logging

import numpy as np
import pandas as pd
from scipy.optimize import curve_fit

import quakemigrate_tpu.util as util
from .base import PhasePicker


class GaussianPicker(PhasePicker):
    """Gaussian-fit phase picker."""

    DEFAULT_GAUSSIAN_FIT = {"popt": 0, "xdata": 0, "xdata_dt": 0,
                            "PickValue": -1}

    def __init__(self, onset=None, **kwargs):
        super().__init__(**kwargs)

        self.onset = onset

        self.threshold_method = kwargs.get("threshold_method", "MAD")
        if self.threshold_method == "percentile":
            self.percentile_pick_threshold = kwargs.get(
                "percentile_pick_threshold", 1.0
            )
        elif self.threshold_method == "MAD":
            self.mad_pick_threshold = kwargs.get("mad_pick_threshold", 8.0)
        else:
            raise util.InvalidPickThresholdMethodException

        self.plot_picks = kwargs.get("plot_picks", False)
        self.write_seed_ids = kwargs.get("write_seed_ids", False)
        self._fraction_tt = kwargs.get("fraction_tt")

    def __str__(self):
        str_ = "\tPhase picking by fitting a 1-D Gaussian to onsets\n"
        if self.threshold_method == "percentile":
            str_ += (
                f"\t\tPercentile threshold  = "
                f"{self.percentile_pick_threshold}\n"
            )
        elif self.threshold_method == "MAD":
            str_ += f"\t\tMAD multiplier  = {self.mad_pick_threshold}\n"
        if self._fraction_tt is not None:
            str_ += (
                f"\t\tSearch window   = {self._fraction_tt * 100}% of "
                "traveltime\n"
            )

        return str_

    @util.timeit("info")
    def pick_phases(self, event, lut, run):
        """Pick phase arrival times for a located event."""

        _, onset_data = self.onset.calculate_onsets(
            event.data, timespan=4 * event.marginal_window
        )

        fraction_tt = (
            lut.fraction_tt if self._fraction_tt is None else self._fraction_tt
        )

        e_ijk = lut.index2coord(event.hypocentre, inverse=True)[0]

        p_idx = np.arange(sum(len(v) for v in onset_data.onsets.values()))
        columns = [
            "Station",
            "Phase",
            "ModelledTime",
            "PickTime",
            "PickError",
            "SNR",
            "Residual",
        ]
        if self.write_seed_ids:
            columns = [columns[0], "SEED_ids", *columns[1:]]
        pick_rows = [None] * len(p_idx)
        gaussfits = {}
        pick_windows = {}
        idx = 0

        for station, onsets in onset_data.onsets.items():
            for phase, onset in onsets.items():
                traveltime = float(np.ravel(lut.traveltime_to(phase, e_ijk, station))[0])
                pick_windows.setdefault(station, {}).update(
                    {
                        phase: self._determine_window(
                            event, onset_data, traveltime, fraction_tt
                        )
                    }
                )
                n_samples = len(onset)

            self._distinguish_windows(
                pick_windows[station], list(onsets.keys()), n_samples
            )

            for phase, onset in onsets.items():
                pick_threshold = self._find_pick_threshold(
                    onset, pick_windows[station], self.threshold_method
                )

                logging.debug(f"\t\tPicking {phase} at {station}...")
                fit, *pick = self._fit_gaussian(
                    onset,
                    onset_data.sampling_rate,
                    self.onset.gaussian_halfwidth(phase),
                    onset_data.starttime,
                    pick_threshold,
                    pick_windows[station][phase],
                )

                gaussfits.setdefault(station, {}).update({phase: fit})

                traveltime = float(np.ravel(lut.traveltime_to(phase, e_ijk, station))[0])
                model_time = event.otime + traveltime
                if pick[0] == -1:
                    residual = -1
                else:
                    residual = pick[0] - model_time

                if self.write_seed_ids:
                    stream = onset_data.filtered_waveforms.select(
                        station=station,
                        channel=self.onset.channel_maps[phase],
                    )
                    seed_ids = sorted(set(tr.id for tr in stream))
                    pick_rows[idx] = [
                        station, seed_ids, phase, model_time, *pick, residual,
                    ]
                else:
                    pick_rows[idx] = [station, phase, model_time, *pick,
                                      residual]
                idx += 1

        picks = pd.DataFrame(pick_rows, columns=columns)

        event.add_picks(picks, gaussfits=gaussfits, pick_windows=pick_windows)

        self.write(run, event.uid, picks)

        if self.plot_picks:
            logging.info("\t\tPlotting picks...")
            for station, onsets in onset_data.onsets.items():
                traveltimes = [
                    float(np.ravel(lut.traveltime_to(phase, e_ijk, station))[0])
                    for phase in onsets.keys()
                ]
                self.plot(event, station, onset_data, picks, traveltimes, run)

        return event, picks

    def _determine_window(self, event, onset_data, tt, fraction_tt):
        """[lower, modelled arrival, upper] indices of the pick window."""

        arrival_idx = util.time2sample(
            event.otime + tt - onset_data.starttime, onset_data.sampling_rate
        )
        samples = util.time2sample(
            tt * fraction_tt + event.marginal_window, onset_data.sampling_rate
        )

        return [arrival_idx - samples, arrival_idx, arrival_idx + samples]

    @staticmethod
    def _distinguish_windows(windows, phases, samples):
        """Split overlapping pick windows at the arrival-time midpoint."""

        first_idx = windows[phases[0]][0]
        windows[phases[0]][0] = max(0, first_idx)

        for p1, p2 in util.pairwise(phases):
            p1_window, p2_window = windows[p1], windows[p2]
            mid_idx = int((p1_window[1] + p2_window[1]) / 2)
            windows[p1][2] = min(mid_idx, p1_window[2])
            windows[p2][0] = max(mid_idx, p2_window[0])

        last_idx = windows[phases[-1]][2]
        windows[phases[-1]][2] = min(samples, last_idx)

    def _find_pick_threshold(self, onset, windows, method):
        """Pick threshold from onset data outside the pick windows."""

        onset_noise = onset.copy()
        for _, window in windows.items():
            onset_noise[window[0]: window[2]] = -1
        onset_noise = onset_noise[onset_noise > 1]

        if len(onset_noise) == 0:
            return np.inf

        if method == "percentile":
            pick_threshold = np.percentile(
                onset_noise, self.percentile_pick_threshold * 100
            )
        elif method == "MAD":
            med = np.median(onset_noise)
            mad = util.calculate_mad(onset_noise)
            pick_threshold = med + (mad * self.mad_pick_threshold)

        return pick_threshold

    def _fit_gaussian(
        self, onset, sampling_rate, halfwidth, starttime, pick_threshold,
        window,
    ):
        """Fit a 1-D Gaussian to the windowed onset; -1 sentinels on failure."""

        onset_signal = onset[window[0]: window[2]]

        try:
            peak_idxs = self._find_peak(onset_signal, pick_threshold)
            padded_peak_idxs = [
                window[0] + peak_idxs[0] - 1,
                window[0] + peak_idxs[1] + 1,
            ]
            x_data = np.arange(*padded_peak_idxs) / sampling_rate
            y_data = onset[padded_peak_idxs[0]: padded_peak_idxs[1]]
        except util.NoOnsetPeak as e:
            logging.debug(e.msg)
            return self._pick_failure(pick_threshold)

        p0 = [
            max(y_data),
            (padded_peak_idxs[0] + np.argmax(y_data)) / sampling_rate,
            halfwidth / sampling_rate,
        ]
        try:
            popt, _ = curve_fit(util.gaussian_1d, x_data, y_data, p0)
        except (ValueError, RuntimeError) as e:
            logging.debug(f"\t\t    Failed curve_fit:\n{e}\n\t\t    Continuing...")
            return self._pick_failure(pick_threshold)
        except TypeError as e:
            logging.debug(
                f"\t\t    Failed curve_fit - too few input data? {e}"
            )
            return self._pick_failure(pick_threshold)

        max_onset = popt[0]
        mean = starttime + float(popt[1])
        sigma = np.absolute(popt[2])

        if not window[0] < popt[1] * sampling_rate < window[2]:
            logging.debug("\t\t    Pick mean out of bounds - continuing.")
            return self._pick_failure(pick_threshold)

        gaussian_fit = {
            "popt": popt,
            "xdata": x_data,
            "xdata_dt": np.array([starttime + x for x in x_data]),
            "PickValue": max_onset,
            "PickThreshold": pick_threshold,
        }

        return gaussian_fit, mean, sigma, max_onset

    def _pick_failure(self, pick_threshold):
        gaussian_fit = self.DEFAULT_GAUSSIAN_FIT.copy()
        gaussian_fit["PickThreshold"] = pick_threshold
        return gaussian_fit, -1, -1, -1

    @staticmethod
    def _find_peak(windowed_onset, pick_threshold):
        """
        Start/end indices of the above-threshold peak containing the window
        maximum (the "true" peak); raises NoOnsetPeak if none.

        """

        exceedence = np.where(windowed_onset > pick_threshold)[0]
        if len(exceedence) == 0:
            raise util.NoOnsetPeak(pick_threshold)

        peaks = np.split(
            exceedence, np.where(np.diff(exceedence) != 1)[0] + 1
        )

        true_maximum = np.argmax(windowed_onset)
        for peak in peaks:
            if np.any(peak == true_maximum):
                break

        if len(peak) < 2:
            raise util.NoOnsetPeak(pick_threshold)

        return [peak[0], peak[-1] + 1]

    @util.timeit()
    def plot(self, event, station, onset_data, picks_df, traveltimes, run):
        """Per-station pick summary figure."""

        import matplotlib.pyplot as plt

        from quakemigrate_tpu.plot.phase_picks import pick_summary

        fpath = run.path / f"locate/{run.subname}/pick_plots/{event.uid}"
        fpath.mkdir(exist_ok=True, parents=True)

        onsets = onset_data.onsets[station]
        channel_maps = onset_data.channel_maps
        waveforms = onset_data.filtered_waveforms.select(station=station)
        if not bool(waveforms):
            return
        picks = picks_df[picks_df["Station"] == station].reset_index(drop=True)
        windows = event.picks["pick_windows"][station]

        fig = pick_summary(
            event, station, waveforms, picks, onsets, channel_maps,
            traveltimes, windows,
        )

        file = (fpath / f"{event.uid}_{station}").with_suffix(".pdf")
        plt.savefig(file)
        plt.close(fig)

    @property
    def fraction_tt(self):
        return self._fraction_tt

    @fraction_tt.setter
    def fraction_tt(self, value):
        self._fraction_tt = value
