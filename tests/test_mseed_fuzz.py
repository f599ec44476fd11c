# -*- coding: utf-8 -*-
"""
Malformed-input fuzzing of the miniSEED reader (seis/mseed.py) -- the
pipeline's front door, written from the SEED format spec. The record
header walk, blockette-chain parse and STEIM payload decode must survive
arbitrary corruption with a clean outcome: a (possibly empty / partial)
Stream or an MSEEDError/ValueError -- never a hang, crash, or unbounded
loop. Complements the STEIM round-trip fuzz in test_steim.py (which
covers well-formed payloads only).

Reference behaviour modelled: obspy's reader tolerates unknown/corrupt
records by resyncing (reference relies on obspy for all waveform I/O,
e.g. reference io/data.py read_waveform_data).

"""

import numpy as np
import pytest

from quakemigrate_tpu.core import steim_decode
from quakemigrate_tpu.seis import Trace, UTCDateTime
from quakemigrate_tpu.seis.mseed import MSEEDError, read_mseed


@pytest.fixture()
def real_file(tmp_path):
    """A healthy multi-record STEIM2 file to mutate."""

    rng = np.random.default_rng(0)
    path = tmp_path / "clean.m"
    Trace(
        np.cumsum(rng.integers(-500, 500, 5000)).astype(np.int32),
        {"station": "FZZ", "channel": "BHZ", "sampling_rate": 100.0,
         "starttime": UTCDateTime("2021-02-18T12:00:00.0")},
    ).write(str(path), format="MSEED")
    data = bytearray(path.read_bytes())
    assert len(data) >= 3 * 512, "fixture must span several records"
    return path, data


def _read_survives(tmp_path, blob, name):
    """Write the mutated blob and read it: any clean outcome passes."""

    target = tmp_path / name
    target.write_bytes(bytes(blob))
    try:
        st = read_mseed(str(target))
    except (MSEEDError, ValueError):
        return None
    for tr in st:
        assert np.isfinite(tr.stats.sampling_rate)
        assert tr.stats.sampling_rate > 0
        assert len(tr.data) == tr.stats.npts
    return st


def test_truncated_records(real_file, tmp_path):
    """Every truncation point: mid-header, mid-blockette, mid-payload."""

    _, data = real_file
    for cut in (0, 1, 20, 47, 48, 63, 64, 100, 511, 512, 513, 600,
                len(data) - 1):
        _read_survives(tmp_path, data[:cut], f"trunc_{cut}.m")


def test_lying_blockette_1000(real_file, tmp_path):
    """Corrupt the Blockette-1000 payload: absurd record-length powers,
    unknown encodings, reversed word order."""

    _, data = real_file
    # The writer places blockette 1000 at offset 48 (type/next at 48..51,
    # enc/word-order/reclen-power at 52..54).
    for reclen_power in (0, 1, 6, 7, 31, 255):
        blob = bytearray(data)
        blob[54] = reclen_power
        _read_survives(tmp_path, blob, f"rlp_{reclen_power}.m")
    for enc in (3, 5, 12, 99, 255):
        blob = bytearray(data)
        blob[52] = enc
        _read_survives(tmp_path, blob, f"enc_{enc}.m")
    blob = bytearray(data)
    blob[53] = 0  # claim little-endian frames over big-endian payload
    _read_survives(tmp_path, blob, "wo_0.m")


def test_blockette_chain_cycles(real_file, tmp_path):
    """A blockette whose next-offset points at itself (or earlier) must
    not loop forever (the walk is bounded by the blockette count)."""

    _, data = real_file
    for next_off in (48, 8, 46):
        blob = bytearray(data)
        blob[50:52] = int(next_off).to_bytes(2, "big")  # b1000 next ptr
        blob[39] = 255  # claim 255 blockettes
        _read_survives(tmp_path, blob, f"cycle_{next_off}.m")


def test_bad_time_fields(real_file, tmp_path):
    """Year/jday/subsecond fields outside their domains."""

    _, data = real_file
    cases = {
        "year_0": (20, b"\x00\x00"),
        "year_9999": (20, int(9999).to_bytes(2, "big")),
        "jday_0": (22, b"\x00\x00"),
        "jday_400": (22, int(400).to_bytes(2, "big")),
        "hour_99": (24, b"\x63"),
        "tmilli_max": (28, b"\xff\xff"),
    }
    for name, (off, val) in cases.items():
        blob = bytearray(data)
        blob[off : off + len(val)] = val
        _read_survives(tmp_path, blob, f"{name}.m")


def test_inconsistent_record_lengths(real_file, tmp_path):
    """Second record claims a different (larger/smaller) length than the
    first -- the walk must resync or stop cleanly, not misparse."""

    _, data = real_file
    for rlp in (7, 8, 12):
        blob = bytearray(data)
        blob[512 + 54] = rlp
        _read_survives(tmp_path, blob, f"mixed_{rlp}.m")


def test_sampling_rate_factor_corruption(real_file, tmp_path):
    """All sign combinations of (srfactor, srmult), including zeros --
    no division by zero, no zero/negative sampling rates downstream."""

    _, data = real_file
    for fac, mult in ((0, 0), (0, 5), (5, 0), (-1, 0), (0, -1),
                      (-100, -100), (32767, 32767), (-32768, -32768)):
        blob = bytearray(data)
        blob[32:34] = int(fac).to_bytes(2, "big", signed=True)
        blob[34:36] = int(mult).to_bytes(2, "big", signed=True)
        _read_survives(tmp_path, blob, f"sr_{fac}_{mult}.m")


def test_npts_lies(real_file, tmp_path):
    """npts larger than the payload can hold, and zero."""

    _, data = real_file
    for npts in (0, 1, 5000, 65535):
        blob = bytearray(data)
        blob[30:32] = int(npts).to_bytes(2, "big")
        _read_survives(tmp_path, blob, f"npts_{npts}.m")


def test_random_byte_flips(real_file, tmp_path):
    """200 random single/multi-byte corruptions over the whole file."""

    _, data = real_file
    rng = np.random.default_rng(7)
    for it in range(200):
        blob = bytearray(data)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(blob)))
            blob[pos] = int(rng.integers(0, 256))
        _read_survives(tmp_path, blob, f"flip_{it}.m")


def test_random_garbage_files(tmp_path):
    """Pure-noise files of various sizes: clean failure or empty stream."""

    rng = np.random.default_rng(11)
    for size in (0, 1, 47, 48, 64, 512, 4096, 65536):
        blob = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        _read_survives(tmp_path, blob, f"garbage_{size}.m")


def test_steim_decoder_direct_fuzz():
    """Random frame bytes straight into the C (or fallback) decoder:
    must return samples or raise ValueError, never crash/overrun."""

    rng = np.random.default_rng(13)
    for it in range(100):
        nframes = int(rng.integers(0, 8))
        frames = rng.integers(0, 256, nframes * 64, dtype=np.uint8).tobytes()
        nsamples = int(rng.integers(1, 200))
        for enc in (10, 11):
            try:
                out = steim_decode(frames, nsamples, enc,
                                   little_endian=bool(rng.integers(0, 2)))
                assert len(out) == nsamples
            except ValueError:
                pass
