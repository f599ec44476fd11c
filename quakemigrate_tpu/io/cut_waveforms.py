# -*- coding: utf-8 -*-
"""
Cut-waveform output: write the raw / response-removed ("real") /
Wood-Anderson simulated waveforms for a located event (reference behaviour:
io/cut_waveforms.py:44-213). Supported formats: MSEED (default), SAC,
GSE2 (raw integer-count waveforms only, as in the reference), SEGY.

"""

import logging

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import Stream


@util.timeit("info")
def write_cut_waveforms(
    run,
    event,
    file_format,
    pre_cut=0.0,
    post_cut=0.0,
    waveform_type="raw",
    units="displacement",
):
    """Output cut waveform data for an event."""

    logging.info(f"\tSaving {waveform_type} cut waveforms...")

    fpath = run.path / "locate" / run.subname / f"{waveform_type}_cut_waveforms"
    fpath.mkdir(exist_ok=True, parents=True)
    fstem = f"{event.uid}"

    st = event.data.raw_waveforms

    if pre_cut:
        for tr in st.traces:
            tr.trim(starttime=event.otime - pre_cut)
    if post_cut:
        for tr in st.traces:
            tr.trim(endtime=event.otime + post_cut)

    for tr in list(st):
        if not bool(tr):
            st.remove(tr)

    if waveform_type in ("real", "wa"):
        cached = (
            event.data.real_waveforms
            if waveform_type == "real"
            else event.data.wa_waveforms
        )
        if isinstance(cached, Stream) and not pre_cut and not post_cut:
            st = cached
        else:
            try:
                st = get_waveforms(st, event, waveform_type, units)
            except AttributeError as e:
                raise AttributeError(
                    "To output real or Wood-Anderson cut waveforms you must "
                    "supply an instrument response inventory."
                ) from e

    if bool(st):
        write_waveforms(st, fpath, fstem, file_format)
    else:
        logging.info(
            f"\t\tNo {waveform_type} cut waveform data for event {event.uid}!"
        )


@util.timeit("debug")
def get_waveforms(st, event, waveform_type, units):
    """Response-correct a stream to real or Wood-Anderson waveforms."""

    st = st.copy()
    st_out = Stream()

    velocity = units == "velocity"

    for tr in st:
        if bool(tr) and tr.data.max() != tr.data.min():
            try:
                if waveform_type == "real":
                    tr = event.data.get_real_waveform(tr, velocity)
                else:
                    tr = event.data.get_wa_waveform(tr, velocity)
                st_out.append(tr)
            except (util.ResponseNotFoundError, util.ResponseRemovalError) as e:
                logging.warning(str(e))

    return st_out


@util.timeit("debug")
def write_waveforms(st, fpath, fstem, file_format):
    """Write a stream to file in the requested format."""

    suffix = {
        "MSEED": ".m", "SAC": ".sac", "GSE2": ".gse2", "SEGY": ".segy",
    }.get(file_format, ".waveforms")
    file = (fpath / fstem).with_suffix(suffix)
    st.write(str(file), format=file_format)
