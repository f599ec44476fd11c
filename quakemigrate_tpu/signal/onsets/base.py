# -*- coding: utf-8 -*-
"""
Abstract interface for onset (characteristic) function generators, plus the
OnsetData result container.

The window-padding arithmetic reproduces the reference semantics
(quakemigrate/signal/onsets/base.py:64-93) — pads set the scan-window
geometry that output parity depends on — with the taper allowance computed
once and shared by both pads.

"""

import abc
from dataclasses import dataclass
from math import ceil

from quakemigrate_tpu.util import trim2sample


class Onset(metaclass=abc.ABCMeta):
    """
    Base class for onset generators. Subclasses implement
    :meth:`calculate_onsets` and normally override the ``pre_pad`` /
    ``post_pad`` properties with values derived from their window lengths;
    the base exposes them as plain read/write views of ``_pre_pad`` /
    ``_post_pad``.

    """

    def __init__(self, **kwargs):
        try:
            self.sampling_rate = kwargs["sampling_rate"]
        except KeyError:
            raise ValueError("Must specify 'sampling_rate' for any Onset.")
        if self.sampling_rate is None:
            raise ValueError("Must specify 'sampling_rate' for any Onset.")
        self._pre_pad, self._post_pad = 0, 0

    def __str__(self):
        return f"{type(self).__name__} onset (no __str__ provided)"

    pre_pad = property(
        lambda self: self._pre_pad,
        lambda self, value: setattr(self, "_pre_pad", value),
    )
    post_pad = property(
        lambda self: self._post_pad,
        lambda self, value: setattr(self, "_post_pad", value),
    )

    def pad(self, timespan):
        """
        Taper-aware (pre, post) pads in seconds for a scan window of length
        ``timespan``: each pad is the onset's own requirement plus 6%
        (rounded up) of the fully padded window, trimmed onto the sample/ms
        grid.

        """

        taper_allowance = ceil((timespan + self.pre_pad + self.post_pad) * 0.06)
        return tuple(
            trim2sample(base + taper_allowance, self.sampling_rate)
            for base in (self.pre_pad, self.post_pad)
        )

    def gaussian_halfwidth(self, phase):
        """Gaussian half-width hint for the picker; custom onsets must provide it."""

        raise AttributeError(
            "GaussianPicker needs a 'gaussian_halfwidth' method on the Onset; "
            "custom Onset classes must implement one to be pickable."
        )

    @abc.abstractmethod
    def calculate_onsets(self, data, timespan=None):
        """Compute onset functions; returns ``(onsets, OnsetData)``."""


@dataclass
class OnsetData:
    """
    Result of one onset calculation: per-station/phase onset functions, the
    pre-processed waveforms they came from, and the availability record.

    """

    onsets: dict
    phases: list
    channel_maps: dict
    filtered_waveforms: object
    availability: dict
    starttime: object
    endtime: object
    sampling_rate: float
