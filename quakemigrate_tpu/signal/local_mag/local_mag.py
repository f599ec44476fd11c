# -*- coding: utf-8 -*-
"""
LocalMag: facade combining Wood-Anderson amplitude measurement and local
magnitude calculation (reference: signal/local_mag/local_mag.py:141-208).

"""

import logging

import numpy as np

import quakemigrate_tpu.util as util
from quakemigrate_tpu.io import write_amplitudes
from .amplitude import Amplitude
from .magnitude import Magnitude


class LocalMag:
    """
    Measures Wood-Anderson corrected amplitudes and calculates a
    network-averaged local magnitude estimate for each located event.

    """

    def __init__(self, amp_params, mag_params, plot_amplitudes=True):
        self.amp = Amplitude(amp_params)
        self.mag = Magnitude(mag_params)
        self.plot = plot_amplitudes

    def __str__(self):
        out = (
            "\tCalculating local magnitudes from Wood-Anderson corrected "
            "amplitude observations\n"
        )
        out += str(self.amp)
        out += str(self.mag)

        return out

    @util.timeit("info")
    def calc_magnitude(self, event, lut, run):
        """
        Measure amplitudes, calculate per-trace magnitudes, write the .amps
        file, and attach the network-mean magnitude to the event.

        Returns (event, mean magnitude).

        """

        amps = self.amp.get_amplitudes(event, lut)

        if amps[self.mag.amp_feature].isnull().all():
            logging.warning(
                "\t\tNo amplitude measurements were made! Skipping magnitude "
                "calculation"
            )
            write_amplitudes(run, amps, event)
            event.add_local_magnitude(np.nan, np.nan, np.nan)

            return event, np.nan

        mags = self.mag.calculate_magnitudes(amps)

        write_amplitudes(run, mags, event)

        mag, mag_err, mag_r2, mags = self.mag.mean_magnitude(mags)

        event.add_local_magnitude(mag, mag_err, mag_r2)

        if self.plot and mag is not np.nan and not np.isnan(mag):
            self.mag.plot_amplitudes(
                mags, event, run, lut.unit_conversion_factor,
                self.amp.noise_measure,
            )

        return event, mag
