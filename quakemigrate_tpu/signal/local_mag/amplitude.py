# -*- coding: utf-8 -*-
"""
Wood-Anderson corrected waveform amplitude measurement for local magnitude
calculation.

Follows the reference algorithm (signal/local_mag/amplitude.py:174-1051):
simulate Wood-Anderson displacement waveforms, measure the maximum half
peak-to-trough amplitude (in millimetres) in P and S windows derived from
picks-or-modelled arrival times +/- marginal window +/- traveltime
uncertainty, correct for optional filter gain via the filter's frequency
response, and measure noise amplitude in a pre-P window.

"""

import logging

import numpy as np
import pandas as pd
from scipy.signal import find_peaks, hilbert, iirfilter, sosfreqz

import quakemigrate_tpu.util as util
from quakemigrate_tpu.coords import gps2dist_azimuth
from quakemigrate_tpu.seis import UTCDateTime

AMPS_COLS = [
    "id",
    "epi_dist",
    "z_dist",
    "P_amp",
    "P_freq",
    "P_time",
    "P_avg_amp",
    "P_filter_gain",
    "S_amp",
    "S_freq",
    "S_time",
    "S_avg_amp",
    "S_filter_gain",
    "Noise_amp",
    "is_picked",
]


class Amplitude:
    """
    Measures Wood-Anderson corrected waveform amplitudes.

    Parameters (via the ``amplitude_params`` dict): signal_window,
    noise_window, noise_measure ("RMS"/"STD"/"ENV"), loc_method,
    highpass_filter/highpass_freq or bandpass_filter/bandpass_lowcut/
    bandpass_highcut, filter_corners, prominence_multiplier.

    """

    def __init__(self, amplitude_params=None):
        amplitude_params = amplitude_params or {}

        if "signal_window" not in amplitude_params:
            logging.warning(
                "Warning: 'signal_window' not specified. Set to default: 0"
            )
        self.signal_window = amplitude_params.get("signal_window", 0.0)

        self.noise_window = amplitude_params.get("noise_window", 5.0)
        self.noise_measure = amplitude_params.get("noise_measure", "RMS")

        self.prominence_multiplier = amplitude_params.get(
            "prominence_multiplier", 0.0
        )
        self.loc_method = amplitude_params.get("loc_method", "spline")

        self.highpass_filter = amplitude_params.get("highpass_filter", False)
        if self.highpass_filter:
            try:
                self.highpass_freq = amplitude_params["highpass_freq"]
            except KeyError as e:
                raise AttributeError(
                    f"Highpass filter frequency not specified! {e}"
                )

        self.bandpass_filter = amplitude_params.get("bandpass_filter", False)
        if self.bandpass_filter:
            self.bandpass_lowcut = amplitude_params.get("bandpass_lowcut")
            self.bandpass_highcut = amplitude_params.get("bandpass_highcut")
            if self.bandpass_lowcut is None or self.bandpass_highcut is None:
                raise AttributeError("Bandpass filter frequencies not specified!")
        self.filter_corners = amplitude_params.get("filter_corners", 4)

        if self.highpass_filter and self.bandpass_filter:
            raise AttributeError(
                "Both bandpass filter *and* highpass filter selected! "
                "Please choose one or the other."
            )

    def __str__(self):
        out = (
            "\t    Amplitude parameters:\n"
            f"\t\tSignal window    = {self.signal_window} s\n"
            f"\t\tNoise window     = {self.noise_window} s\n"
            f"\t\tNoise measure    = {self.noise_measure}\n"
            f"\t\tLocation used    = {self.loc_method}\n"
        )
        if self.prominence_multiplier != 0.0:
            out += f"\t\tProminence multiplier = {self.prominence_multiplier}\n"
        if self.highpass_filter:
            out += (
                "\t\tHighpass filter: \n"
                f"\t\t    Filter frequency = {self.highpass_freq} Hz\n"
                f"\t\t    Filter corners   = {self.filter_corners}\n"
            )
        elif self.bandpass_filter:
            out += (
                "\t\tBandpass filter: \n"
                f"\t\t    Lowcut frequency  = {self.bandpass_lowcut} Hz\n"
                f"\t\t    Highcut frequency = {self.bandpass_highcut} Hz\n"
                f"\t\t    Filter corners    = {self.filter_corners}\n"
            )

        return out

    @util.timeit()
    def get_amplitudes(self, event, lut):
        """
        Measure P/S amplitudes for each component of each station; returns
        a DataFrame indexed by trace id (see AMPS_COLS for schema).

        """

        ev_loc = event.get_hypocentre(self.loc_method)

        event_ijk = lut.index2coord(ev_loc, inverse=True)[0]
        try:
            p_ttimes = lut.traveltime_to("P", event_ijk)
            s_ttimes = lut.traveltime_to("S", event_ijk)
        except (KeyError, TypeError):
            raise util.LUTPhasesException(
                "Both P and S traveltimes are required to measure phase "
                "amplitudes for local magnitude calculation. Please create "
                "a new lookup table with phases=['P', 'S']"
            )

        max_tt = lut.max_traveltime
        pre_pad, post_pad = self.pad(
            event.marginal_window, max_tt, lut.fraction_tt
        )
        tr_start = event.otime - pre_pad
        tr_end = event.otime + post_pad

        rows = {}
        for i, station_data in lut.station_data.iterrows():
            station = station_data["Name"]

            epi_dist, z_dist = self._get_distances(
                ev_loc, station_data, lut.unit_conversion_factor
            )

            amps_template = [
                "", epi_dist, z_dist,
                np.nan, np.nan, np.nan, np.nan, np.nan,
                np.nan, np.nan, np.nan, np.nan, np.nan,
                np.nan, False,
            ]

            st = event.data.raw_waveforms.select(station=station).copy()
            st.trim(starttime=tr_start, endtime=tr_end)

            for j, comp in enumerate(["[E,2]", "[N,1]", "Z"]):
                amps = amps_template.copy()
                tr = st.select(component=comp)
                if (
                    bool(tr)
                    and len(tr) == 1
                    and tr[0].stats.starttime < (tr_start + tr[0].stats.delta)
                    and tr[0].stats.endtime > (tr_end - tr[0].stats.delta)
                ):
                    tr = tr[0]
                else:
                    amps[0] = f".{station}..{comp}"
                    rows[i * 3 + j] = amps
                    continue

                amps[0] = tr.id

                try:
                    tr = event.data.get_wa_waveform(tr, velocity=False)
                except (
                    util.ResponseNotFoundError,
                    util.ResponseRemovalError,
                ) as e:
                    logging.warning(str(e))
                    rows[i * 3 + j] = amps
                    continue

                if self.bandpass_filter or self.highpass_filter:
                    filter_sos = self._filter_trace(tr)
                else:
                    filter_sos = None

                try:
                    windows, picked = self._get_amplitude_windows(
                        station, i, event, p_ttimes, s_ttimes, lut.fraction_tt
                    )
                    amps[14] = picked
                except util.PickOrderException as e:
                    logging.warning(f"{e}")
                    rows[i * 3 + j] = amps
                    continue

                amps = self._measure_signal_amps(
                    amps, tr, windows, self.noise_measure, filter_sos
                )

                amps[13] = self._measure_noise_amp(tr, windows,
                                                   self.noise_measure)

                rows[i * 3 + j] = amps

        amplitudes = pd.DataFrame.from_dict(
            rows, orient="index", columns=AMPS_COLS
        )
        return amplitudes.set_index("id")

    @staticmethod
    def _get_distances(ev_loc, station_data, unit_conversion_factor):
        """Epicentral and vertical distances (km) from event to station."""

        stla, stlo, stel = station_data[
            ["Latitude", "Longitude", "Elevation"]
        ].values
        evlo, evla, evdp = ev_loc

        epi_dist = gps2dist_azimuth(evla, evlo, stla, stlo)[0] / 1000

        km_cf = 1000 / unit_conversion_factor
        z_dist = (evdp - stel) / km_cf  # stel is positive-down depth

        return epi_dist, z_dist

    def _filter_trace(self, tr):
        """Apply the requested high/bandpass filter; return its SOS."""

        if self.bandpass_filter:
            try:
                return self._bandpass_filter(tr)
            except util.NyquistException as e:
                logging.warning(f"\t{e} Applying a high-pass filter instead..")
                return self._highpass_filter(tr)
        return self._highpass_filter(tr)

    def _bandpass_filter(self, tr):
        freqmin = self.bandpass_lowcut
        freqmax = self.bandpass_highcut
        corners = self.filter_corners

        f_nyquist = 0.5 * tr.stats.sampling_rate
        high_f_crit = freqmax / f_nyquist
        if high_f_crit - 1.0 > -1e-6:
            raise util.NyquistException(freqmax, f_nyquist, tr.id)

        tr.detrend("linear")
        tr.taper(0.05, "cosine")
        tr.filter(
            "bandpass", freqmin=freqmin, freqmax=freqmax, corners=corners,
            zerophase=False,
        )

        return iirfilter(
            N=corners,
            Wn=[freqmin / f_nyquist, high_f_crit],
            btype="bandpass",
            ftype="butter",
            output="sos",
        )

    def _highpass_filter(self, tr):
        filt_freq = (
            self.bandpass_lowcut if self.bandpass_filter else self.highpass_freq
        )
        corners = self.filter_corners

        f_nyquist = 0.5 * tr.stats.sampling_rate

        tr.detrend("linear")
        tr.taper(0.05, "cosine")
        tr.filter("highpass", freq=filt_freq, corners=corners, zerophase=False)

        return iirfilter(
            N=corners, Wn=filt_freq / f_nyquist, btype="highpass",
            ftype="butter", output="sos",
        )

    def _get_amplitude_windows(self, station, i, event, p_ttimes, s_ttimes,
                               fraction_tt):
        """
        [[P_start, P_end], [S_start, S_end]] measurement windows around the
        picked-or-modelled arrival times, with overlap resolution.

        """

        p_pick, s_pick, picked = self._get_picks(station, event)

        for pick, phase in [[p_pick, "P"], [s_pick, "S"]]:
            if not isinstance(pick, UTCDateTime):
                if pick == "-1":
                    if phase == "P":
                        p_pick = event.otime + p_ttimes[i]
                    else:
                        s_pick = event.otime + s_ttimes[i]
                elif pick == f"No {phase} onset":
                    logging.debug(
                        f"No onset available when picking {phase} on "
                        f"{station}. Using modelled arrival times."
                    )
                    p_pick = event.otime + p_ttimes[i]
                    s_pick = event.otime + s_ttimes[i]
                    break

        if not p_pick < s_pick:
            raise util.PickOrderException(event.uid, station, p_pick, s_pick)

        p_start = p_pick - event.marginal_window - p_ttimes[i] * fraction_tt
        p_end = p_pick + event.marginal_window + p_ttimes[i] * fraction_tt
        s_start = s_pick - event.marginal_window - s_ttimes[i] * fraction_tt
        s_end = (
            s_pick
            + event.marginal_window
            + s_ttimes[i] * fraction_tt
            + self.signal_window
        )

        if s_start < p_end:
            mid_time = p_end + (s_start - p_end) / 2
            windows = [[p_start, mid_time], [mid_time, s_end]]
        elif s_start - p_end < self.signal_window:
            windows = [[p_start, s_start], [s_start, s_end]]
        else:
            windows = [[p_start, p_end + self.signal_window], [s_start, s_end]]

        return windows, picked

    @staticmethod
    def _get_picks(station, event):
        """Picked arrival times for a station, or sentinel strings."""

        picks = event.picks["df"]
        picks = picks.loc[picks["Station"] == station]
        picked = False

        if len(picks) > 0:
            try:
                p_pick = picks.loc[picks["Phase"] == "P"]["PickTime"].iloc[0]
                p_pick = UTCDateTime(str(p_pick))
                picked = True
            except IndexError:
                p_pick = "No P onset"
            except ValueError:
                p_pick = "-1"
            try:
                s_pick = picks.loc[picks["Phase"] == "S"]["PickTime"].iloc[0]
                s_pick = UTCDateTime(str(s_pick))
                picked = True
            except IndexError:
                s_pick = "No S onset"
            except ValueError:
                s_pick = "-1"
        else:
            p_pick = s_pick = "-1"

        return p_pick, s_pick, picked

    def _measure_signal_amps(self, amps, tr, windows, method="RMS",
                             filter_sos=None):
        """Measure max half p2t amplitude + freq + time in each window."""

        for k, (start_time, end_time) in enumerate(windows):
            window = tr.slice(start_time, end_time)
            phase = ["P", "S"][k]

            if not bool(window) or window.data.max() == window.data.min():
                logging.warning(
                    f"{phase} signal window doesn't contain any data for "
                    f"trace {window.id}"
                )
                continue
            window.detrend("linear")

            try:
                half_amp, approx_freq, p2t_time = (
                    self._peak_to_trough_amplitude(window)
                )
            except util.PeakToTroughError as e:
                logging.warning(
                    f"Amplitude measurement failed in {phase} signal window "
                    f"for trace {window.id}: {e.msg}"
                )
                continue

            average_amp = self._average_amplitude(window, method)

            filter_gain = None
            if self.bandpass_filter or self.highpass_filter:
                _, filter_gain = sosfreqz(
                    filter_sos, worN=[approx_freq], fs=tr.stats.sampling_rate
                )
                filter_gain = np.abs(filter_gain[0])
                if not filter_gain:
                    logging.info(
                        f"\t    Warning: Invalid frequency ({approx_freq:.5g}"
                        f" Hz) for {phase}_amp measurement on:\n\t\t{tr}"
                    )
                    continue
                half_amp /= filter_gain
                average_amp /= filter_gain

            amps[3 + k * 5 : 8 + k * 5] = (
                half_amp, approx_freq, p2t_time, average_amp, filter_gain,
            )

        return amps

    def _peak_to_trough_amplitude(self, trace):
        """
        Maximum half peak-to-trough amplitude (mm), its approximate
        frequency (from the p2t half-period) and observation time.

        """

        prominence = self.prominence_multiplier * np.max(np.abs(trace.data))
        peaks, _ = find_peaks(trace.data, prominence=prominence)
        troughs, _ = find_peaks(-trace.data, prominence=prominence)

        full_amp = None
        if len(peaks) == 0 or len(troughs) == 0:
            raise util.PeakToTroughError("No peaks or troughs found!")
        elif len(peaks) == 1 and len(troughs) == 1:
            full_amp = np.abs(trace.data[peaks] - trace.data[troughs])[0]
            pos = 0
        elif len(peaks) == len(troughs):
            if peaks[0] < troughs[0]:
                a, b, c, d = peaks, troughs, peaks[1:], troughs[:-1]
            else:
                a, b, c, d = peaks, troughs, peaks[:-1], troughs[1:]
        elif not np.abs(len(peaks) - len(troughs)) == 1:
            raise util.PeakToTroughError("Consecutive peaks/troughs!")
        elif len(peaks) > len(troughs):
            if not peaks[0] < troughs[0]:
                raise util.PeakToTroughError("Consecutive peaks/troughs!")
            a, b, c, d = peaks[:-1], troughs, peaks[1:], troughs
        else:
            if not peaks[0] > troughs[0]:
                raise util.PeakToTroughError("Consecutive peaks/troughs!")
            a, b, c, d = peaks, troughs[1:], peaks, troughs[:-1]

        if not full_amp:
            fp1 = np.abs(trace.data[a] - trace.data[b])
            fp2 = np.abs(trace.data[c] - trace.data[d])
            if np.max(fp1) >= np.max(fp2):
                pos = np.argmax(fp1)
                full_amp = np.max(fp1)
                peaks, troughs = a, b
            else:
                pos = np.argmax(fp2)
                full_amp = np.max(fp2)
                peaks, troughs = c, d

        peak_time = trace.times()[peaks[pos]]
        trough_time = trace.times()[troughs[pos]]
        p2t_time = (
            trace.stats.starttime + peak_time + (trough_time - peak_time) / 2
        )

        approx_freq = 1.0 / (np.abs(peak_time - trough_time) * 2.0)

        # Local magnitude is defined from zero-to-peak amplitude in mm
        half_amp = full_amp * 1000 / 2

        return half_amp, approx_freq, p2t_time

    def _measure_noise_amp(self, tr, windows, method="RMS"):
        """Average amplitude (mm) in the pre-P noise window."""

        p_start = windows[0][0]
        noise = tr.slice(p_start - self.noise_window, p_start)

        if not bool(noise) or noise.data.max() == noise.data.min():
            logging.warning(
                f"Noise window doesn't contain any data for trace {noise.id}"
            )
            return np.nan

        noise.detrend("linear")
        return self._average_amplitude(noise, method)

    @staticmethod
    def _average_amplitude(trace, method):
        """Average amplitude of a trace, in millimetres."""

        if method == "RMS":
            amp = np.sqrt(np.mean(np.square(trace.data)))
        elif method == "STD":
            amp = np.std(trace.data)
        elif method == "ENV":
            amp = np.mean(np.abs(hilbert(trace.data)))
        else:
            raise NotImplementedError(
                "Only 'RMS', 'STD' and 'ENV' are available currently."
            )

        return amp * 1000.0

    def pad(self, marginal_window, max_tt, fraction_tt):
        """Taper-aware pre/post pads for the amplitude windows."""

        pre_pad = self.noise_window + marginal_window
        post_pad = (
            self.signal_window + max_tt * (1 + fraction_tt) + marginal_window
        )

        timespan = pre_pad + post_pad
        pre_pad += np.ceil(timespan * 0.06)
        post_pad += np.ceil(timespan * 0.06)

        return pre_pad, post_pad
