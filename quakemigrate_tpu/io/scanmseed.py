# -*- coding: utf-8 -*-
"""
.scanmseed output: the continuous detect-stage coalescence stream.

Channels COA, COA_N, X, Y, Z are scaled by {1e5, 1e5, 1e6, 1e6, 1e3*ucf},
rounded to int32 and written as day-split STEIM2 miniSEED (STEIM1 fallback
on 30-bit difference overflow) -- identical precision contract to the
reference (quakemigrate/io/scanmseed.py:79-130).

"""

import logging

import numpy as np
import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read


class ScanmSEED:
    """Accumulates and writes the detect-stage coalescence stream."""

    def __init__(self, run, continuous_write, sampling_rate):
        self.run = run
        self.continuous_write = continuous_write
        self.sampling_rate = sampling_rate

        self.written = False
        self.stream = Stream()

    def append(self, starttime, max_coa, max_coa_n, coord, ucf):
        """Append one timestep of detect output to the stream."""

        max_coa = np.asarray(max_coa, dtype=np.float64).copy()
        max_coa_n = np.asarray(max_coa_n, dtype=np.float64).copy()
        coord = np.asarray(coord, dtype=np.float64)

        # Clip to prevent int32 overflow at 1e5 scaling
        max_coa[max_coa > 21474.0] = 21474.0
        max_coa_n[max_coa_n > 21474.0] = 21474.0

        meta = {
            "network": "NW",
            "sampling_rate": self.sampling_rate,
            "starttime": starttime,
        }

        for station, values, factor in (
            ("COA", max_coa, 1e5),
            ("COA_N", max_coa_n, 1e5),
            ("X", coord[:, 0], 1e6),
            ("Y", coord[:, 1], 1e6),
            ("Z", coord[:, 2], 1e3 * ucf),
        ):
            self.stream += Trace(
                data=self._data2int(values, factor),
                header={**meta, "station": station},
            )
        self.stream.merge(method=-1)

        self.written = False
        stats = self.stream[0].stats
        if stats.endtime == UTCDateTime(stats.starttime.date) + 86400 - stats.delta:
            # Stream ends exactly at the end of a day: flush it
            self.write()
            self.stream = Stream()
        elif stats.starttime.julday != stats.endtime.julday:
            logging.debug("Timestep doesn't fall at midnight!")
            write_start = stats.starttime
            write_end = UTCDateTime(stats.endtime.date) - stats.delta
            self.write(write_start, write_end)
            self.stream.trim(starttime=write_end + stats.delta)
            self.written = False

        if self.continuous_write and not self.written:
            self.write()

    def empty(self, starttime, timestep, i, msg, ucf):
        """Append a zero-filled timestep (no data / failed QC)."""

        logging.info(msg)

        starttime = starttime + timestep * i
        n = util.time2sample(timestep, self.sampling_rate)
        max_coa = max_coa_n = np.zeros(n)
        coord = np.zeros((n, 3))

        self.append(starttime, max_coa, max_coa_n, coord, ucf)

    def write(self, write_start=None, write_end=None):
        """Write the (sliced) coalescence stream to a .scanmseed file."""

        fpath = self.run.path / "detect" / "scanmseed"
        fpath.mkdir(exist_ok=True, parents=True)

        if write_start is not None and write_end is not None:
            st = self.stream.slice(starttime=write_start, endtime=write_end)
        else:
            st = self.stream

        starttime = st[0].stats.starttime
        fstem = f"{starttime.year}_{starttime.julday:03d}"
        file = (fpath / fstem).with_suffix(".scanmseed")

        st.write(str(file), format="MSEED", encoding="STEIM2")
        self.written = True

    @staticmethod
    def _data2int(data, factor):
        return np.round(np.asarray(data) * factor).astype(np.int32)


@util.timeit()
def read_scanmseed(run, starttime, endtime, pad, ucf):
    """
    Read .scanmseed files between two timestamps (padded), returning a
    DataFrame [DT, COA, COA_N, X, Y, Z] (unscaled) and the COA trace stats.

    """

    fpath = run.path / "detect" / "scanmseed"

    readstart, readend = starttime - pad, endtime + pad
    startday = UTCDateTime(readstart.date)

    dy = 0
    scanmseed = Stream()
    while startday + (dy * 86400) <= readend:
        now = readstart + (dy * 86400)
        fstem = f"{now.year}_{now.julday:03d}"
        file = (fpath / fstem).with_suffix(".scanmseed")
        try:
            scanmseed += read(
                str(file), starttime=readstart, endtime=readend, format="MSEED"
            )
        except FileNotFoundError:
            logging.info(f"\n\t    No .scanmseed file found for day {fstem}!")
        dy += 1

    if not bool(scanmseed):
        raise util.NoScanMseedDataException

    scanmseed.merge(method=-1)
    stats = scanmseed.select(station="COA")[0].stats

    data = pd.DataFrame()
    data["DT"] = scanmseed.select(station="COA")[0].times(type="utcdatetime")
    data["COA"] = scanmseed.select(station="COA")[0].data / 1e5
    data["COA_N"] = scanmseed.select(station="COA_N")[0].data / 1e5
    data["X"] = scanmseed.select(station="X")[0].data / 1e6
    data["Y"] = scanmseed.select(station="Y")[0].data / 1e6
    data["Z"] = scanmseed.select(station="Z")[0].data / (1e3 * ucf)

    if stats.starttime > starttime:
        logging.info(
            "\n\t    Warning! .scanmseed starttime is later than trigger() "
            "starttime!"
        )
    elif stats.starttime > readstart:
        logging.info("\t    Warning! No .scanmseed data found for pre-pad!")
    if stats.endtime < endtime:
        logging.info(
            "\n\t    Warning! .scanmseed endtime is before trigger() endtime!"
        )
    elif stats.endtime < readend:
        logging.info("\t    Warning! No .scanmseed data found for post-pad!")
    logging.info(f"\t    ...from {stats.starttime} - {stats.endtime}.")

    return data, stats
