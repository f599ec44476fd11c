# -*- coding: utf-8 -*-
"""
Onset function base class and the OnsetData container.

The pad logic (taper-aware pre/post padding of each scan window) follows
the reference exactly (quakemigrate/signal/onsets/base.py:64-93) since it
sets the scan-window geometry that output parity depends on.

"""

from abc import ABC, abstractmethod

import numpy as np

import quakemigrate_tpu.util as util


class Onset(ABC):
    """Abstract base for onset (characteristic) function generators."""

    def __init__(self, **kwargs):
        self.sampling_rate = kwargs.get("sampling_rate")
        if self.sampling_rate is None:
            raise ValueError("Must specify 'sampling_rate' for any Onset.")

        self._pre_pad = 0
        self._post_pad = 0

    def __str__(self):
        return "Base Onset object - add a __str__ method to your Onset class"

    def pad(self, timespan):
        """
        Pre/post pads for a scan window of length ``timespan``, including
        an extra ceil(6%) of the padded window for the cosine taper.

        """

        timespan += self.pre_pad + self.post_pad
        pre_pad = util.trim2sample(
            self.pre_pad + np.ceil(timespan * 0.06), self.sampling_rate
        )
        post_pad = util.trim2sample(
            self.post_pad + np.ceil(timespan * 0.06), self.sampling_rate
        )

        return pre_pad, post_pad

    def gaussian_halfwidth(self, phase):
        """Estimate of the Gaussian half-width for the phase picker."""

        raise AttributeError(
            "In order to use the GaussianPicker module with a custom Onset, "
            "you need to provide a 'gaussian_halfwidth' method."
        )

    @abstractmethod
    def calculate_onsets(self, data, timespan=None):
        """Calculate onset functions. Returns (onsets, OnsetData)."""

    @property
    @abstractmethod
    def pre_pad(self):
        return self._pre_pad

    @pre_pad.setter
    @abstractmethod
    def pre_pad(self, value):
        self._pre_pad = value

    @property
    @abstractmethod
    def post_pad(self):
        return self._post_pad

    @post_pad.setter
    @abstractmethod
    def post_pad(self, value):
        self._post_pad = value


class OnsetData:
    """
    Encapsulates the output of an onset calculation: onset functions per
    station/phase, pre-processed waveforms, and availability.

    """

    def __init__(
        self,
        onsets,
        phases,
        channel_maps,
        filtered_waveforms,
        availability,
        starttime,
        endtime,
        sampling_rate,
    ):
        self.onsets = onsets
        self.phases = phases
        self.channel_maps = channel_maps
        self.filtered_waveforms = filtered_waveforms
        self.availability = availability

        self.starttime = starttime
        self.endtime = endtime
        self.sampling_rate = sampling_rate
