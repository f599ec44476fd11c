# -*- coding: utf-8 -*-
"""
Utility functions, helpers and the exception taxonomy for quakemigrate_tpu.

Semantics follow the reference implementation (quakemigrate/util.py in
QuakeMigrate/QuakeMigrate) where they are parity-critical: time <-> sample
conversions set window sizes that feed directly into the scan outputs
(reference: util.py:152-172, 248-269), MAD scaling (util.py:175-207), the
Wood-Anderson response definition (util.py:272-313) and the resampling chain
(util.py:404-604). The implementations here are original and operate on this
package's own Stream/Trace data model (obspy is not a dependency).

"""

import logging
import sys
import time as _time
import warnings
from datetime import datetime
from functools import wraps
from itertools import tee

import numpy as np

log_spacer = "=" * 110


class AttribDict(dict):
    """A dict subclass that also exposes keys as attributes."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def copy(self):
        return AttribDict(self)


def make_directories(run, subdir=None):
    """Make run directory, and optionally subdirectories within it."""

    run.mkdir(exist_ok=True)
    if subdir:
        (run / subdir).mkdir(exist_ok=True, parents=True)


def gaussian_1d(x, a, b, c):
    """1-D Gaussian with amplitude a, mean b, sigma c."""

    return a * np.exp(-1.0 * ((x - b) ** 2) / (2 * (c**2)))


def gaussian_3d(nx, ny, nz, sgm):
    """
    3-D Gaussian kernel on an (nx, ny, nz) grid centred at the grid centre,
    with per-axis (or scalar) sigma. Used for smoothing marginalised
    coalescence maps (reference: util.py:75-116).

    """

    half = [(n - 1) / 2 for n in (nx, ny, nz)]
    axes = [np.linspace(-h, h, n) for h, n in zip(half, (nx, ny, nz))]
    ix, iy, iz = np.meshgrid(*axes, indexing="ij")

    if np.isscalar(sgm):
        sgm = np.repeat(sgm, 3)
    sx, sy, sz = sgm

    return np.exp(
        -(ix * ix) / (2 * sx * sx)
        - (iy * iy) / (2 * sy * sy)
        - (iz * iz) / (2 * sz * sz)
    )


def logger(logstem, log, loglevel="info"):
    """
    Configure the root logger to emit message-only records to stdout and,
    optionally, to a timestamped logfile under ``logstem``.

    """

    level = logging.DEBUG if loglevel == "debug" else logging.INFO

    if log:
        now = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        logfile = logstem.parent / f"{logstem.name}_{now}"
        logfile.parent.mkdir(exist_ok=True, parents=True)
        handlers = [
            logging.FileHandler(str(logfile.with_suffix(".log"))),
            logging.StreamHandler(sys.stdout),
        ]
    else:
        handlers = [logging.StreamHandler(sys.stdout)]

    logging.basicConfig(
        level=level, format="%(message)s", handlers=handlers, force=True
    )


def time2sample(time, sampling_rate):
    """Convert a duration in seconds to an integer number of samples."""

    return int(round(time * int(sampling_rate)))


def trim2sample(time, sampling_rate):
    """
    Round a duration up to the nearest millisecond that corresponds to an
    integer number of samples at ``sampling_rate``.

    """

    return int(np.ceil(time * sampling_rate) / sampling_rate * 1000) / 1000


def calculate_mad(x, scale=1.4826):
    """
    Scaled Median Absolute Deviation of x; the default scale factor makes the
    MAD a consistent estimator of the standard deviation for a normal
    distribution.

    """

    x = np.asarray(x)

    if not x.size:
        return np.nan
    if np.isnan(np.sum(x)):
        return np.nan

    med = np.median(x, axis=0, keepdims=True)
    mad = np.median(np.abs(x - med), axis=0)

    return scale * mad


def wa_response(convert="DIS2DIS", obspy_def=True):
    """
    Wood-Anderson torsion seismograph response as a poles-and-zeros dict.

    Two published definitions are supported: the standard one (as used by
    ObsPy) and the IRIS/SAC one. ``convert`` controls the number of zeros so
    the response maps between displacement/velocity spaces correctly.

    """

    if obspy_def:
        woodanderson = {
            "poles": [-6.283185 - 4.712j, -6.283185 + 4.712j],
            "zeros": [0j],
            "sensitivity": 2080,
            "gain": 1.0,
        }
    else:
        woodanderson = {
            "poles": [-5.49779 + 5.60886j, -5.49779 - 5.60886j],
            "zeros": [0j],
            "sensitivity": 2080,
            "gain": 1.0,
        }

    if convert in ("DIS2DIS", "VEL2VEL"):
        woodanderson["zeros"].extend([0j])

    return woodanderson


def shift_to_sample(stream, interpolate=False):
    """
    Ensure all traces in a stream are timestamped "on-sample" (an integer
    number of samples after midnight). Off-sample traces are corrected either
    by adjusting their metadata (sub-sample timing shift) or by Lanczos
    interpolation onto the on-sample time grid.

    """

    stream = stream.copy()

    for tr in stream:
        sr = tr.stats.sampling_rate
        delta = tr.stats.starttime.microsecond % (1e6 / sr)
        if delta == 0:
            if sr < 1.0:
                logging.warning(
                    f"Trace\n\t{tr}\nhas a sampling rate less than 1 Hz, so "
                    "off-sample data might not be corrected!"
                )
            continue

        time_shift = round(delta / 1e6 * sr) / sr - delta / 1e6
        if not interpolate:
            logging.info(
                f"Trace\n\t{tr}\nhas off-sample data. Applying "
                f"{time_shift:+f} s shift to timing."
            )
            tr.stats.starttime = tr.stats.starttime + time_shift
        else:
            logging.info(
                f"Trace\n\t{tr}\nhas off-sample data. Interpolating to apply "
                f"a {time_shift:+f} s shift to timing."
            )
            new_starttime = tr.stats.starttime + time_shift
            if time_shift < 0.0:
                new_starttime = new_starttime + tr.stats.delta
            tr.interpolate(
                sampling_rate=sr, method="lanczos", a=20, starttime=new_starttime
            )
            if time_shift > 0.0:
                tr.data = np.append(tr.data, tr.data[-1])
            else:
                tr.data = np.append(tr.data[0], tr.data)
                tr.stats.starttime = tr.stats.starttime - tr.stats.delta

    return stream


def resample(stream, sampling_rate, resample, upfactor, starttime, endtime):
    """
    Resample all traces in a stream to ``sampling_rate``. By default only
    decimation is performed; with ``resample=True`` and an integer
    ``upfactor``, incompatible rates are linearly upsampled first, then
    decimated (reference behaviour: util.py:404-487).

    """

    stream = stream.copy()

    for trace in list(stream):
        trace_sampling_rate = trace.stats.sampling_rate
        if sampling_rate != trace_sampling_rate:
            if (trace_sampling_rate % sampling_rate) == 0:
                stream.remove(trace)
                trace = decimate(trace, sampling_rate)
                stream += trace
            elif resample and upfactor is not None:
                if int(trace_sampling_rate * upfactor) % sampling_rate != 0:
                    raise BadUpfactorException(trace)
                stream.remove(trace)
                trace = upsample(trace, upfactor, starttime, endtime)
                if trace.stats.sampling_rate != sampling_rate:
                    trace = decimate(trace, sampling_rate)
                stream += trace
            else:
                logging.info(
                    "Mismatched sampling rates - cannot decimate data from\n\t"
                    f"{trace}\n...to resample data, set resample = True and "
                    "choose a suitable upfactor"
                )

    stream.trim(
        starttime=starttime - 0.00001, endtime=endtime + 0.00001, nearest_sample=False
    )

    return stream


def decimate(trace, sampling_rate):
    """
    Decimate a trace to ``sampling_rate``: detrend, cosine taper, zero-phase
    Butterworth anti-alias lowpass at (just below) the new Nyquist, then
    integer decimation.

    """

    trace = trace.copy()

    trace.detrend("linear")
    trace.detrend("demean")
    trace.taper(type="cosine", max_percentage=0.05)
    trace.filter(
        "lowpass", freq=float(sampling_rate) / 2.000001, corners=2, zerophase=True
    )
    trace.decimate(
        factor=int(trace.stats.sampling_rate / sampling_rate), no_filter=True
    )

    return trace


def upsample(trace, upfactor, starttime, endtime):
    """
    Upsample a trace by an integer factor via linear interpolation
    (fencepost-preserving), padding to the requested window edges with
    constant values where the original trace starts late / ends early by less
    than one original sample interval.

    """

    data = trace.data
    dnew = np.zeros((len(data) - 1) * upfactor + 1)
    dnew[::upfactor] = data
    for i in range(1, upfactor):
        dnew[i::upfactor] = (
            float(i) / upfactor * data[1:] + float(upfactor - i) / upfactor * data[:-1]
        )

    new_starttime = trace.stats.starttime
    if 0.0 < trace.stats.starttime - starttime < trace.stats.delta:
        start_pad = np.round(
            (trace.stats.starttime - starttime) * trace.stats.sampling_rate * upfactor
        )
        start_fill = np.full(int(start_pad), trace.data[0], dtype=float)
        dnew = np.append(start_fill, dnew)
        new_starttime = trace.stats.starttime - start_pad / (
            trace.stats.sampling_rate * upfactor
        )

    if 0.0 < endtime - trace.stats.endtime < trace.stats.delta:
        end_pad = np.round(
            (endtime - trace.stats.endtime) * trace.stats.sampling_rate * upfactor
        )
        end_fill = np.full(int(end_pad), trace.data[-1], dtype=float)
        dnew = np.append(dnew, end_fill)

    out = trace.copy()
    out.data = dnew
    out.stats.sampling_rate = int(upfactor * trace.stats.sampling_rate)
    out.stats.starttime = new_starttime

    out.trim(
        starttime=starttime - 0.00001, endtime=endtime + 0.00001, nearest_sample=False
    )

    return out


def merge_stream(stream):
    """
    Merge all traces with contiguous data, or overlapping data which exactly
    matches (no-clobber merge). Applied channel by channel so an individual
    merge failure only drops that channel.

    """

    from quakemigrate_tpu.seis import Stream

    stream = stream.copy()

    seed_ids = sorted(set(trace.id for trace in stream))
    stream_merged = Stream()
    for seed_id in seed_ids:
        try:
            stream_merged += stream.select(id=seed_id).merge(method=-1)
        except MergeError as error_message:
            logging.info(f"\t\t{error_message}")
            logging.info(f"\t\t{stream.select(id=seed_id)}")
            logging.info("\t\tThis channel will not be used for onset calculation.")

    return stream_merged


def pairwise(iterable):
    """Iterate over an iterable pairwise: s -> (s0,s1), (s1,s2), ..."""

    a, b = tee(iterable)
    next(b, None)
    return zip(a, b)


def timeit(*args_, **kwargs_):
    """Function decorator that logs the wall time elapsed during execution."""

    def inner_function(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            ts = _time.time()
            result = func(*args, **kwargs)
            msg = " " * 21 + f"Elapsed time: {_time.time() - ts:6f} seconds."
            try:
                if args_[0] == "info":
                    logging.info(msg)
            except IndexError:
                logging.debug(msg)
            return result

        return wrapper

    return inner_function


def get_phase_component_strings(channel_maps):
    """
    Build regex-style component selector strings for the pick summary plot
    from the user's channel maps, splitting S components into (up to) two
    panels and pairing alphabetic with numeric labels.

    """

    p_comps = list(channel_maps["P"].strip("*").strip("[").strip("]"))[::2]
    s_comps = list(channel_maps["S"].strip("*").strip("[").strip("]"))[::2]
    p_str, s_str_1, s_str_2 = "", "", ""
    for p_comp in p_comps:
        p_str += f"{p_comp},"
    s_alpha = [c for c in s_comps if not c.isnumeric()]
    s_numeric = [c for c in s_comps if c.isnumeric()]
    if s_alpha and s_numeric:
        if len(s_alpha) > 2 or len(s_numeric) > 2:
            logging.info(
                "More than two pairs of S-phase components found in channel "
                "maps. Only using first two for plotting!"
            )
        for i, (a, n) in enumerate(zip(s_alpha, s_numeric)):
            if i == 0:
                s_str_1 += f"{a},{n},"
            elif i == 1:
                s_str_2 += f"{a},{n},"
    else:
        for comps in [s_alpha, s_numeric]:
            if comps:
                s_str_1 += f"{comps[0]},"
                if len(comps) > 1:
                    s_str_2 += f"{comps[1]},"
            if len(comps) > 2:
                logging.info(
                    "More than two alphabetical or numeric S-phase components"
                    " found in channel maps. Only using first two for plotting!"
                )

    p_str = f"[{p_str.rstrip(',')}]"
    s_str_1 = f"[{s_str_1.rstrip(',')}]"
    s_str_2 = f"[{s_str_2.rstrip(',')}]"

    return p_str, s_str_1, s_str_2


class DateFormatter:
    """
    Matplotlib tick formatter giving millisecond-precision datetime labels.
    Format string uses `{ms}` for the sub-second field, e.g.
    ``"%H:%M:%S.{ms}"`` with precision 3.

    """

    def __init__(self, fmt, precision=3):
        from matplotlib.dates import num2date

        self.num2date = num2date
        self.fmt = fmt
        self.precision = precision

    def __call__(self, x, pos=0):
        if x == 0:
            raise ValueError(
                "DateFormatter found a value of x=0, which is an illegal date; "
                "this usually occurs because you have not informed the axis "
                "that it is plotting dates."
            )

        dt = self.num2date(x)
        ms = dt.strftime("%f")[: self.precision]

        return dt.strftime(self.fmt).format(ms=ms)


# --- Exception taxonomy (mirrors the reference's recovery semantics) ---


class MergeError(Exception):
    """Raised when traces with conflicting data cannot be merged."""


class StationFileHeaderException(Exception):
    """Incorrect header columns in station file."""

    def __init__(self):
        super().__init__(
            "Incorrect station file header - use:\nLatitude, Longitude, Elevation, Name"
        )


class InvalidVelocityModelHeader(Exception):
    """Incorrect header columns in velocity model file."""

    def __init__(self, key):
        super().__init__(f"Must include at least '{key}' in header.")


class ArchiveFormatException(Exception):
    """Archive format has not been set."""

    def __init__(self):
        super().__init__(
            "Archive format has not been set. Set when making the Archive "
            "object with the kwarg 'archive_format=<path_structure>', or "
            "afterwards with the command "
            "'Archive.path_structure(<path_structure>)'."
        )


class ArchivePathStructureError(Exception):
    """An invalid Archive path structure was selected."""

    def __init__(self, archive_format):
        super().__init__(
            f"The archive path structure you have selected: '{archive_format}' "
            "is not a valid option! See the documentation for "
            "'Archive.path_structure' for a complete list, or specify a custom "
            "format."
        )


class ArchiveEmptyException(Exception):
    """No files in the archive for this time period."""

    def __init__(self):
        super().__init__("No data was available for this timestep.")
        self.msg = "\t\tNo files found in archive for this time period."


class NoScanMseedDataException(Exception):
    """No .scanmseed files found."""

    def __init__(self):
        super().__init__("No .scanmseed data found.")


class NoStationAvailabilityDataException(Exception):
    """No .StationAvailability files found."""

    def __init__(self):
        super().__init__("No .StationAvailability files found.")


class DataAvailabilityException(Exception):
    """All data failed the specified data quality criteria."""

    def __init__(self):
        super().__init__(
            "All data for this timestep did not pass the specified data "
            "quality criteria."
        )
        self.msg = (
            "\t\tAll data for this timestep failed to pass the"
            "\n\t\tspecified data quality criteria. This includes the"
            "\n\t\tpresence of gaps or overlaps, or the data not"
            "\n\t\tspanning the full time window."
        )


class DataGapException(Exception):
    """No data for the selected stations in this time window."""

    def __init__(self):
        super().__init__(
            "No data present in the archive for the selected stations for "
            "this time window."
        )
        self.msg = (
            "\t\tNo data for the selected stations was found in the"
            "\n\t\tarchive for this time window."
        )


class ChannelNameException(Exception):
    """Channel names do not conform to the SEED standard."""

    def __init__(self, trace):
        super().__init__(
            "Channel name header does not conform to\nthe IRIS SEED standard "
            "- 3 characters; ending in 'Z' for\nvertical and ending either "
            f"'E' & 'N' or '1' & '2' for\nhorizontal components.\n"
            f"    Working on trace: {trace}"
        )


class NoOnsetPeak(Exception):
    """No onset data exceeds the pick threshold."""

    def __init__(self, pick_threshold):
        self.msg = (
            "\t\t    No onset signal exceeding pick threshold "
            f"({pick_threshold:5.3f}) - continuing."
        )
        super().__init__(self.msg)


class BadUpfactorException(Exception):
    """Chosen upfactor cannot be decimated to the target sampling rate."""

    def __init__(self, trace):
        super().__init__(
            "Chosen upfactor cannot be decimated to\ntarget sampling rate."
            f"\n    Working on trace: {trace}"
        )


class OnsetTypeError(Exception):
    """The onset object does not inherit from the required base class."""

    def __init__(self):
        super().__init__(
            "The Onset object you have created does not inherit from the "
            "required base class - see manual."
        )


class PickerTypeError(Exception):
    """The picker object does not inherit from the required base class."""

    def __init__(self):
        super().__init__(
            "The PhasePicker object you have created does not inherit from "
            "the required base class - see manual."
        )


class LUTPhasesException(Exception):
    """The LUT does not contain traveltimes for the required phases."""

    def __init__(self, message):
        super().__init__(message)


class PickOrderException(Exception):
    """The P pick is later than the S pick."""

    def __init__(self, event_uid, station, p_pick, s_pick):
        super().__init__(
            "The P-phase arrival-time pick is later than the S-phase arrival "
            f"pick! Something has gone wrong.\nEvent: {event_uid}, station: "
            f"{station}, p_pick: {p_pick}, s_pick: {s_pick}."
        )


class MagsTypeError(Exception):
    """Unsupported object provided for magnitude calculation."""

    def __init__(self):
        super().__init__(
            "The Mags object you have specified is not supported: currently "
            "only `quakemigrate_tpu.signal.local_mag.LocalMag` - see manual."
        )


class NoTriggerFilesFound(Exception):
    """No trigger files were found during locate."""

    def __init__(self):
        super().__init__(
            "Double check you have supplied a valid run name and a time "
            "period for which you have run detect."
        )


class ResponseNotFoundError(Exception):
    """The response inventory doesn't contain a response for this trace."""

    def __init__(self, e, tr_id):
        super().__init__(f"{e} -- skipping {tr_id}")


class ResponseRemovalError(Exception):
    """The response removal was not successful."""

    def __init__(self, e, tr_id):
        super().__init__(f"{e} -- skipping {tr_id}")


class NyquistException(Exception):
    """The filter has a corner above the Nyquist frequency."""

    def __init__(self, freqmax, f_nyquist, tr_id):
        super().__init__(
            f"    Selected bandpass_highcut {freqmax} Hz is at or above the "
            f"Nyquist frequency ({f_nyquist} Hz) for trace {tr_id}. "
        )


class PeakToTroughError(Exception):
    """Anomalous set of peaks/troughs when measuring an amplitude."""

    def __init__(self, err):
        super().__init__(err)
        self.msg = err


class TimeSpanException(Exception):
    """The start time specified is after the end time."""

    def __init__(self):
        super().__init__("The start time specified is after the end time.")


class InvalidTriggerThresholdMethodException(Exception):
    """An invalid trigger threshold method was selected."""

    def __init__(self):
        super().__init__(
            "Only 'static', 'mad' or 'median_ratio' thresholds are supported."
        )


class InvalidPickThresholdMethodException(Exception):
    """An invalid pick threshold method was selected."""

    def __init__(self):
        super().__init__("Only 'percentile' or 'MAD' thresholds are supported.")
