# -*- coding: utf-8 -*-
"""
Abstract base class for phase pickers, plus the .picks file writer
(schema: Station, Phase, ModelledTime, PickTime, PickError, SNR, Residual;
-1 sentinels for failed picks -- reference: signal/pickers/base.py:56-89).

"""

from abc import ABC, abstractmethod

import quakemigrate_tpu.util as util


class PhasePicker(ABC):
    """Abstract base for phase-picking implementations."""

    def __init__(self, **kwargs):
        # Reference default (pickers/base.py:41); GaussianPicker
        # overrides it to False, as the reference subclass does.
        self.plot_picks = kwargs.get("plot_picks", True)

    def __str__(self):
        return (
            "Base PhasePicker object - add a __str__ method to your "
            "PhasePicker class"
        )

    @abstractmethod
    def pick_phases(self, event, lut, run):
        """Pick phase arrival times. Returns (event, picks DataFrame)."""

    @util.timeit()
    def write(self, run, event_uid, phase_picks):
        """Write the picks DataFrame to a .picks CSV."""

        fpath = run.path / "locate" / run.subname / "picks"
        fpath.mkdir(exist_ok=True, parents=True)

        file = (fpath / f"{event_uid}").with_suffix(".picks")
        phase_picks.to_csv(file, index=False)

    def plot(self, *args, **kwargs):
        """Optional plot hook; implemented by subclasses."""
