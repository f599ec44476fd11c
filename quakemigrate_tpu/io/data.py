# -*- coding: utf-8 -*-
"""
Waveform archive access and data-quality checking.

Archive serves time windows of waveform data from a regular directory
structure (7 named formats + custom format strings, mirroring the
reference's quakemigrate/io/data.py:181-219); WaveformData encapsulates the
query result and provides availability checks, instrument response removal
and Wood-Anderson simulation -- all built on quakemigrate_tpu.seis instead
of ObsPy.

"""

from itertools import chain
import logging
import pathlib

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import Stream, UTCDateTime, read
from quakemigrate_tpu.seis.response import simulate_seismometer


class Archive:
    """
    Handles reading of archived waveform data between two timestamps.
    Returns a :class:`WaveformData` object.

    """

    def __init__(self, archive_path, stations, archive_format=None, **kwargs):
        self.archive_path = pathlib.Path(archive_path)
        self.stations = stations["Name"]
        if archive_format:
            channels = kwargs.get("channels", "*")
            self.path_structure(archive_format, channels)
        else:
            self.format = kwargs.get("format")

        self.read_all_stations = kwargs.get("read_all_stations", False)
        self.resample = kwargs.get("resample", False)
        self.upfactor = kwargs.get("upfactor")
        self.interpolate = kwargs.get("interpolate", False)
        self.response_inv = kwargs.get("response_inv")
        response_removal_params = kwargs.get("response_removal_params", {})
        if self.response_inv and "water_level" not in response_removal_params:
            print(
                "Warning: 'water level' for instrument correction not "
                "specified. Set to default: 60"
            )
        self.water_level = response_removal_params.get("water_level", 60.0)
        self.pre_filt = response_removal_params.get("pre_filt")
        self.remove_full_response = response_removal_params.get(
            "remove_full_response", False
        )

    def __str__(self, response_only=False):
        if self.response_inv:
            response_str = (
                "\tResponse removal parameters:\n"
                f"\t\tWater level  = {self.water_level}\n"
            )
            if self.pre_filt is not None:
                response_str += f"\t\tPre-filter   = {self.pre_filt} Hz\n"
            response_str += (
                "\t\tRemove full response (inc. FIR stages) = "
                f"{self.remove_full_response}\n"
            )
        else:
            response_str = "\tNo instrument response inventory provided!\n"

        if response_only:
            return response_str

        out = (
            "quakemigrate_tpu Archive object"
            f"\n\tArchive path\t:\t{self.archive_path}"
            f"\n\tPath structure\t:\t{self.format}"
            f"\n\tResampling\t:\t{self.resample}"
        )
        if self.upfactor:
            out += f"\n\tUpfactor\t:\t{self.upfactor}"
        out += "\n\tStations:"
        for station in self.stations:
            out += f"\n\t\t{station}"
        out += f"\n{response_str}"
        return out

    def path_structure(self, archive_format="YEAR/JD/STATION", channels="*"):
        """Set the directory structure / file naming format of the archive."""

        if archive_format == "SeisComp3":
            self.format = (
                "{year}/*/{station}/" + channels + "/*.{station}.*.*.D."
                "{year}.{jday:03d}"
            )
        elif archive_format == "YEAR/JD/*_STATION_*":
            self.format = "{year}/{jday:03d}/*_{station}_*"
        elif archive_format == "YEAR/JD/STATION":
            self.format = "{year}/{jday:03d}/{station}*"
        elif archive_format == "STATION.YEAR.JULIANDAY":
            self.format = "*{station}.*.{year}.{jday:03d}"
        elif archive_format == "/STATION/STATION.YearMonthDay":
            self.format = "{station}/{station}.{year}{month:02d}{day:02d}"
        elif archive_format == "YEAR_JD/STATION*":
            self.format = "{year}_{jday:03d}/{station}*"
        elif archive_format == "YEAR_JD/STATION_*":
            self.format = "{year}_{jday:03d}/{station}_*"
        else:
            raise util.ArchivePathStructureError(archive_format)

    def read_waveform_data(self, starttime, endtime, pre_pad=0.0, post_pad=0.0):
        """
        Read waveform data between two times (plus optional extra pads,
        which are retained only in ``raw_waveforms``).

        """

        pre_pad = max(0.0, pre_pad)
        post_pad = max(0.0, post_pad)

        data = WaveformData(
            starttime=starttime,
            endtime=endtime,
            stations=self.stations,
            read_all_stations=self.read_all_stations,
            resample=self.resample,
            upfactor=self.upfactor,
            response_inv=self.response_inv,
            water_level=self.water_level,
            pre_filt=self.pre_filt,
            remove_full_response=self.remove_full_response,
            pre_pad=pre_pad,
            post_pad=post_pad,
        )

        files = self._load_from_path(starttime - pre_pad, endtime + post_pad)

        st = Stream()
        try:
            first = next(files)
            files = chain([first], files)
            for file in files:
                file = str(file)
                try:
                    st += read(
                        file,
                        starttime=starttime - pre_pad,
                        endtime=endtime + post_pad,
                        nearest_sample=True,
                    )
                except TypeError:
                    logging.info(f"File not readable as waveform data - {file}")
                    continue

            st = util.merge_stream(st)
            data.raw_waveforms = st.copy()

            st = util.shift_to_sample(st, interpolate=self.interpolate)

            if self.read_all_stations:
                st_selected = Stream()
                for station in self.stations:
                    st_selected += st.select(station=station)
                st = st_selected.copy()

            if pre_pad != 0.0 or post_pad != 0.0:
                for tr in list(st):
                    tr.trim(starttime=starttime, endtime=endtime,
                            nearest_sample=True)
                    if not bool(tr):
                        st.remove(tr)

            if not bool(st):
                raise util.DataGapException

            data.waveforms = st

        except StopIteration:
            raise util.ArchiveEmptyException

        return data

    def _load_from_path(self, starttime, endtime):
        """Generator of files in the archive overlapping the time window."""

        if self.format is None:
            raise util.ArchiveFormatException

        files = iter([])
        loadstart = UTCDateTime(starttime.date)
        while loadstart <= endtime:
            temp_format = self.format.format(
                year=loadstart.year,
                month=loadstart.month,
                day=loadstart.day,
                jday=loadstart.julday,
                station="{station}",
                dtime=loadstart,
            )
            if self.read_all_stations is True:
                file_format = temp_format.format(station="*")
                file_format = file_format.replace("**", "*")
                files = chain(files, self.archive_path.glob(file_format))
            else:
                for station in self.stations:
                    file_format = temp_format.format(station=station)
                    files = chain(files, self.archive_path.glob(file_format))
            loadstart = UTCDateTime(loadstart.date) + 86400

        return files


class WaveformData:
    """
    Encapsulates waveform data returned by an Archive query, with data
    quality checks and response removal utilities.

    """

    def __init__(
        self,
        starttime,
        endtime,
        stations=None,
        response_inv=None,
        water_level=60.0,
        pre_filt=None,
        remove_full_response=False,
        read_all_stations=False,
        resample=False,
        upfactor=None,
        pre_pad=0.0,
        post_pad=0.0,
    ):
        self.starttime = starttime
        self.endtime = endtime
        self.stations = stations
        self.response_inv = response_inv
        self.water_level = water_level
        self.pre_filt = pre_filt
        self.remove_full_response = remove_full_response

        self.read_all_stations = read_all_stations
        self.resample = resample
        self.upfactor = upfactor
        self.pre_pad = pre_pad
        self.post_pad = post_pad

        self.raw_waveforms = None
        self.waveforms = Stream()
        self.wa_waveforms = None
        self.real_waveforms = None

    def check_availability(
        self,
        st,
        all_channels=False,
        n_channels=None,
        allow_gaps=False,
        full_timespan=True,
        check_sampling_rate=False,
        sampling_rate=None,
        check_start_end_times=False,
    ):
        """
        Check a stream against data-quality criteria: no flatlines, no
        overlaps, (optionally) no gaps / full timespan / exact sampling rate
        / exact start+end times. Returns (available, {tr_id: 0/1}).

        """

        availability = {}
        available = 0
        timespan = self.endtime - self.starttime

        if bool(st):
            for tr_id in sorted(set(tr.id for tr in st)):
                st_id = st.select(id=tr_id)
                availability[tr_id] = 0

                if any(
                    len(tr.data) and tr.data.max() == tr.data.min()
                    for tr in st_id
                ):
                    continue
                overlaps = st_id.get_gaps(max_gap=-0.000001)
                if len(overlaps) != 0:
                    continue
                if not allow_gaps:
                    gaps = st_id.get_gaps()
                    if len(gaps) != 0:
                        continue
                if check_sampling_rate:
                    if not sampling_rate:
                        raise TypeError(
                            "Please specify sampling_rate if you wish to "
                            "check all channels are at the correct sampling "
                            "rate."
                        )
                    if any(
                        tr.stats.sampling_rate != sampling_rate for tr in st_id
                    ):
                        continue
                if full_timespan:
                    n_samples = (
                        round(timespan * st_id[0].stats.sampling_rate) + 1
                    )
                    if len(st_id) > 1:
                        continue
                    elif st_id[0].stats.npts < n_samples:
                        logging.debug("Trace has too few samples.")
                        continue
                if check_start_end_times:
                    if len(st_id) > 1:
                        continue
                    elif (
                        st_id[0].stats.starttime != self.starttime
                        or st_id[0].stats.endtime != self.endtime
                    ):
                        continue

                availability[tr_id] = 1

            if all(ava == 1 for ava in availability.values()):
                if all_channels:
                    if not n_channels:
                        raise TypeError(
                            "Please specify n_channels if you wish to check "
                            "all channels meet the availability criteria."
                        )
                    elif len(availability) == n_channels:
                        available = 1
                else:
                    available = 1
            elif not all_channels and any(
                ava == 1 for ava in availability.values()
            ):
                available = 1

        return available, availability

    def get_real_waveform(self, tr, velocity=True):
        """Remove the instrument response from a trace."""

        if not self.response_inv:
            raise AttributeError("No response inventory provided!")

        tr = tr.copy()
        tr.detrend("linear")

        try:
            response = self.response_inv.get_response(tr.id, tr.stats.starttime)
        except Exception as e:
            raise util.ResponseNotFoundError(str(e), tr.id)

        from quakemigrate_tpu.seis.response import paz_for_output

        paz = paz_for_output(response, "VEL" if velocity else "DISP")

        try:
            tr.simulate(
                paz_remove=paz,
                pre_filt=self.pre_filt,
                water_level=self.water_level,
                taper=True,
                stages_remove=(
                    response.digital_stages
                    if self.remove_full_response
                    else None
                ),
            )
        except ValueError as e:
            raise util.ResponseRemovalError(e, tr.id)

        if self.real_waveforms is None:
            self.real_waveforms = Stream()
        self.real_waveforms.append(tr.copy())

        return tr

    def get_wa_waveform(self, tr, velocity=False):
        """Simulate a Wood-Anderson displacement waveform for a trace."""

        tr = self.get_real_waveform(tr.copy(), velocity)

        tr.data = simulate_seismometer(
            tr.data,
            tr.stats.sampling_rate,
            paz_simulate=util.wa_response(obspy_def=True),
            water_level=self.water_level,
            taper=True,
        )

        if self.wa_waveforms is None:
            self.wa_waveforms = Stream()
        self.wa_waveforms.append(tr.copy())

        return tr
