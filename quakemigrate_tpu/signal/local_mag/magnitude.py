# -*- coding: utf-8 -*-
"""
Local magnitude calculation from Wood-Anderson corrected amplitude
measurements.

ML = log10(amp) + logA0(dist) + station_correction, with 8 built-in
attenuation curves (Hutton-Boore, keir2006, Danakil2017,
Greenfield2018_{askja,bardarbunga,comb}, Langston1998, UK) or a user
callable; noise/trace/station/distance/pick filters; (weighted) network
mean; and an r-squared goodness-of-fit of the predicted
amplitude-vs-distance curve (reference: signal/local_mag/magnitude.py).

"""

import logging

import numpy as np


class Magnitude:
    """
    Calculates local magnitudes from amplitude observations and combines
    them into a network-averaged mean.

    """

    def __init__(self, magnitude_params=None):
        magnitude_params = magnitude_params or {}

        self.A0 = magnitude_params.get("A0")
        if not self.A0:
            raise TypeError("A0 attenuation correction not specified in params!")
        self.use_hyp_dist = magnitude_params.get("use_hyp_dist", False)
        self.amp_feature = magnitude_params.get("amp_feature", "S_amp")
        self.station_corrections = magnitude_params.get(
            "station_corrections", {}
        )
        self.amp_multiplier = magnitude_params.get("amp_multiplier", 1.0)

        self.weighted_mean = magnitude_params.get("weighted_mean", False)
        self.trace_filter = magnitude_params.get("trace_filter")
        self.noise_filter = magnitude_params.get("noise_filter", 1.0)
        self.station_filter = magnitude_params.get("station_filter")
        self.dist_filter = magnitude_params.get("dist_filter", False)
        self.pick_filter = magnitude_params.get("pick_filter", False)
        self.r2_only_used = magnitude_params.get("r2_only_used", True)

    def __str__(self):
        out = (
            "\t    Magnitude parameters:\n"
            f"\t\tA0 attenuation function = {self.A0}\n"
            f"\t\tUse hyp distance        = {self.use_hyp_dist}\n"
            f"\t\tAmplitude feature       = {self.amp_feature}\n"
        )
        if self.station_corrections:
            out += "\t\tStation corrections supplied\n"
        out += (
            f"\t\tAmplitude multiplier    = {self.amp_multiplier}\n"
            f"\t\tUse weighted mean       = {self.weighted_mean}\n"
        )
        if self.trace_filter is not None:
            out += f"\t\tTrace filter            = {self.trace_filter}\n"
        out += f"\t\tNoise filter            = {self.noise_filter} x\n"
        if self.station_filter is not None:
            out += f"\t\tStation filter          = {self.station_filter}\n"
        if self.dist_filter:
            out += f"\t\tDistance filter         = {self.dist_filter} km\n"
        if self.pick_filter:
            out += "\t\tUsing picked observations only\n"

        return out

    def calculate_magnitudes(self, amplitudes):
        """
        Per-trace ML and ML_Err from the amplitude measurements; appended
        as columns to (a copy of) the input DataFrame.

        """

        trace_ids = amplitudes.index
        amps = amplitudes[self.amp_feature].values * self.amp_multiplier
        noise_amps = amplitudes["Noise_amp"].values * self.amp_multiplier
        filter_gains = amplitudes[f"{self.amp_feature[0]}_filter_gain"]
        if not filter_gains.isnull().values.all():
            noise_amps = noise_amps / filter_gains.values

        with np.errstate(invalid="ignore"):
            amps[amps < noise_amps] = np.nan
            amps[amps == 0.0] = np.nan

        edist, zdist = amplitudes["epi_dist"], amplitudes["z_dist"]
        if self.use_hyp_dist:
            dist = np.sqrt(edist.values**2 + zdist.values**2)
        else:
            dist = edist.values.copy()
        dist[dist == 0.0] = np.nan

        mags, mag_errs = self._calc_mags(trace_ids, amps, noise_amps, dist)

        magnitudes = amplitudes.copy()
        magnitudes["ML"] = mags
        magnitudes["ML_Err"] = mag_errs

        return magnitudes

    def mean_magnitude(self, magnitudes):
        """
        Network-averaged (optionally weighted) mean local magnitude, its
        standard deviation, and the amplitude-vs-distance r-squared.

        Returns (mean_mag, mean_mag_err, mag_r_squared, magnitudes) where
        ``magnitudes`` gains Station_Correction / filter flags / Dist /
        Used columns.

        """

        magnitudes = magnitudes.copy()
        corrs = [
            self.station_corrections.get(t, 0.0) for t in magnitudes.index
        ]
        magnitudes["Station_Correction"] = corrs

        filter_gains = magnitudes[f"{self.amp_feature[0]}_filter_gain"]
        if not filter_gains.isnull().values.all():
            magnitudes.loc[:, "Noise_amp"] /= filter_gains

        magnitudes = self._filter_mags(magnitudes)

        used_mags = magnitudes[magnitudes["Used"]]
        if len(used_mags) == 0:
            logging.warning(
                "\t    No magnitude observations match the filtering "
                "criteria! Skipping."
            )
            return np.nan, np.nan, np.nan, magnitudes

        mags = used_mags["ML"].values

        if self.weighted_mean:
            weights = (1 / used_mags["ML_Err"].values) ** 2
        else:
            weights = np.ones_like(mags)

        mean_mag = np.sum(mags * weights) / np.sum(weights)
        if len(mags) > 1:
            mean_mag_err = np.sqrt(
                np.sum(((mags - mean_mag) * weights) ** 2) / np.sum(weights)
            )
        else:
            mean_mag_err = used_mags["ML_Err"].values[0]

        mag_r_squared = self._mag_r_squared(
            magnitudes, mean_mag, only_used=self.r2_only_used
        )

        return mean_mag, mean_mag_err, mag_r_squared, magnitudes

    def plot_amplitudes(self, magnitudes, event, run, unit_conversion_factor,
                        noise_measure="RMS"):
        """Amplitude-vs-distance summary plot (see plot.amplitudes)."""

        from quakemigrate_tpu.plot.amplitudes import plot_amplitudes_vs_distance

        plot_amplitudes_vs_distance(
            self, magnitudes, event, run, unit_conversion_factor,
            noise_measure,
        )

    def _calc_mags(self, trace_ids, amps, noise_amps, dist):
        """ML = log10(amp) + logA0(dist) + station correction, + error."""

        corrs = np.array(
            [self.station_corrections.get(t, 0.0) for t in trace_ids]
        )

        att = self._get_attenuation(dist)

        with np.errstate(invalid="ignore", divide="ignore"):
            mags = np.log10(amps) + att + corrs
            upper_mags = np.log10(amps + noise_amps) + att + corrs
            lower_mags = np.log10(amps - noise_amps) + att + corrs
        mag_errs = upper_mags - lower_mags

        return mags, mag_errs

    def _get_attenuation(self, dist):
        """Attenuation from the chosen logA0 curve or user callable."""

        if callable(self.A0):
            return self.A0(dist)
        return self._logA0(dist)

    def _logA0(self, dist):
        """Built-in logA0 attenuation correction curves."""

        eqn = self.A0

        if eqn == "keir2006":
            att = 1.196997 * np.log10(dist / 17.0) + 0.001066 * (dist - 17.0) + 2.0
        elif eqn == "Danakil2017":
            att = 1.274336 * np.log10(dist / 17.0) - 0.000273 * (dist - 17.0) + 2.0
        elif eqn == "Greenfield2018_askja":
            att = 1.4406 * np.log10(dist / 17.0) + 0.003 * (dist - 17.0) + 2.0
        elif eqn == "Greenfield2018_bardarbunga":
            att = 1.2534 * np.log10(dist / 17.0) + 0.0032 * (dist - 17.0) + 2.0
        elif eqn == "Greenfield2018_comb":
            att = 1.1999 * np.log10(dist / 17.0) + 0.0016 * (dist - 17.0) + 2.0
        elif eqn == "Hutton-Boore":
            att = 1.11 * np.log10(dist / 100.0) + 0.00189 * (dist - 100.0) + 3.0
        elif eqn == "Langston1998":
            att = 0.776 * np.log10(dist / 17.0) + 0.000902 * (dist - 17) + 2.0
        elif eqn == "UK":
            att = (
                1.11 * np.log10(dist)
                + 0.00189 * dist
                - 1.16 * np.exp(-0.2 * dist)
                - 2.09
            )
        else:
            raise ValueError(f"{eqn} is not a valid A0 attenuation function.")

        return att

    def _filter_mags(self, magnitudes):
        """Apply noise/trace/station/distance/pick filters -> Used flag."""

        magnitudes = magnitudes.dropna(subset=[self.amp_feature, "Noise_amp"])
        magnitudes = magnitudes.copy()

        if self.noise_filter != 0.0:
            amps = magnitudes[self.amp_feature].values
            noise_amps = magnitudes["Noise_amp"].values
            magnitudes["Noise_Filter"] = False
            with np.errstate(invalid="ignore"):
                magnitudes.loc[
                    (amps > noise_amps * self.noise_filter), "Noise_Filter"
                ] = True

        if self.trace_filter is not None:
            magnitudes["Trace_Filter"] = False
            magnitudes.loc[
                magnitudes.index.str.contains(self.trace_filter), "Trace_Filter"
            ] = True

        if self.station_filter is not None:
            magnitudes["Station_Filter"] = True
            for stn in list(self.station_filter):
                magnitudes.loc[
                    magnitudes.index.str.contains(f".{stn}.", regex=False),
                    "Station_Filter",
                ] = False

        edist, zdist = magnitudes["epi_dist"], magnitudes["z_dist"]
        if self.use_hyp_dist:
            dist = np.sqrt(edist.values**2 + zdist.values**2)
        else:
            dist = edist.values.copy()

        if self.dist_filter:
            magnitudes["Dist_Filter"] = False
            magnitudes.loc[(dist <= self.dist_filter), "Dist_Filter"] = True

        dist[dist == 0.0] = np.nan
        magnitudes["Dist"] = dist

        magnitudes["Used"] = True
        if self.trace_filter is not None:
            magnitudes.loc[~magnitudes["Trace_Filter"], "Used"] = False
        if self.station_filter is not None:
            magnitudes.loc[~magnitudes["Station_Filter"], "Used"] = False
        if self.dist_filter:
            magnitudes.loc[~magnitudes["Dist_Filter"], "Used"] = False
        if self.pick_filter:
            magnitudes.loc[~magnitudes["is_picked"], "Used"] = False
        if self.noise_filter != 0.0:
            magnitudes.loc[~magnitudes["Noise_Filter"], "Used"] = False

        return magnitudes

    def _mag_r_squared(self, magnitudes, mean_mag, only_used=True):
        """
        r-squared of the fit between observed log amplitudes and the curve
        predicted by the mean magnitude + attenuation function.

        """

        if only_used:
            magnitudes = magnitudes[magnitudes["Used"]]
        else:
            if self.trace_filter is not None:
                magnitudes = magnitudes[magnitudes["Trace_Filter"]]
            if self.station_filter is not None:
                magnitudes = magnitudes[magnitudes["Station_Filter"]]
            if self.dist_filter:
                magnitudes = magnitudes[magnitudes["Dist_Filter"]]
            if self.noise_filter <= 0.0:
                raise AttributeError(
                    "Noise filter must be greater than 1 to use custom mag "
                    "r-squared filtering. Change 'only_used' to True, or set "
                    f"a noise filter (current = {self.noise_filter})"
                )
            for _, mag in magnitudes[~magnitudes["Noise_Filter"]].iterrows():
                noise_amp = (
                    mag["Noise_amp"]
                    * self.amp_multiplier
                    * np.power(10, mag["Station_Correction"])
                )
                att = self._get_attenuation(mag["Dist"])
                predicted_amp = np.power(10, (mean_mag - att))
                if predicted_amp / noise_amp < 5:
                    magnitudes = magnitudes.drop(labels=mag.name)

        amps = (
            magnitudes[self.amp_feature].values
            * self.amp_multiplier
            * np.power(10, magnitudes["Station_Correction"])
        )

        if len(amps) < 2 or amps.min() == amps.max():
            logging.info(
                "\t    Insufficient amplitude measurements to make an r2 "
                "estimate - skipping."
            )
            return np.nan

        dist = magnitudes["Dist"]
        att = self._get_attenuation(dist)

        log_amp_mean = np.log10(amps).mean()
        log_amp_variance = ((np.log10(amps) - log_amp_mean) ** 2).sum()

        mod_variance = ((np.log10(amps) - (mean_mag - att)) ** 2).sum()

        return (log_amp_variance - mod_variance) / log_amp_variance
