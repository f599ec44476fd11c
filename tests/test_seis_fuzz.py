# -*- coding: utf-8 -*-
"""
Malformed-input fuzzing of the from-scratch seis parsers beyond the
miniSEED front door (test_mseed_fuzz.py): SAC, SEGY, GSE2, RESP, SAC_PZ
and StationXML. Each reader must survive truncation, byte/char
corruption, lying counts/byte orders and pure garbage with a CLEAN
outcome -- parsed objects or a typed exception (ValueError / TypeError /
NotImplementedError / ResponseNotFoundError) -- never an uncaught
IndexError/KeyError/struct.error, a hang, or an out-of-bounds read.

Role these replace: the reference hands all of this to ObsPy
(reference io/data.py:221-336 `read`, io/core.py:103-145 responses).

"""

import numpy as np
import pytest

from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime
from quakemigrate_tpu.seis.gse2 import read_gse2, write_gse2
from quakemigrate_tpu.seis.resp import read_resp
from quakemigrate_tpu.seis.response import read_inventory
from quakemigrate_tpu.seis.sac import read_sac, write_sac
from quakemigrate_tpu.seis.sacpz import read_sac_pz
from quakemigrate_tpu.seis.segy import read_segy, write_segy
from quakemigrate_tpu.util import ResponseNotFoundError

CLEAN = (ValueError, TypeError, NotImplementedError, ResponseNotFoundError)


def _stream(dtype=np.float32, npts=2000):
    rng = np.random.default_rng(0)
    return Stream(traces=[Trace(
        np.cumsum(rng.integers(-50, 50, npts)).astype(dtype),
        {"station": "FZZ", "channel": "BHZ", "network": "SC",
         "sampling_rate": 100.0,
         "starttime": UTCDateTime("2021-02-18T12:00:00.0")},
    )])


def _check_stream(st):
    for tr in st:
        assert np.isfinite(tr.stats.sampling_rate)
        assert tr.stats.sampling_rate > 0
        assert len(tr.data) == tr.stats.npts


def _fuzz_binary(tmp_path, clean_bytes, reader, tag, check=_check_stream):
    """Truncations, random byte flips and garbage through one reader."""

    rng = np.random.default_rng(3)
    n = len(clean_bytes)
    cuts = sorted({0, 1, 3, n // 4, n // 2, n - 1, *map(
        int, rng.integers(0, n, 10))})
    blobs = [clean_bytes[:c] for c in cuts]
    for it in range(150):
        blob = bytearray(clean_bytes)
        for _ in range(int(rng.integers(1, 8))):
            blob[int(rng.integers(0, n))] = int(rng.integers(0, 256))
        blobs.append(bytes(blob))
    for size in (0, 1, 64, 640, 4096):
        blobs.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())

    for i, blob in enumerate(blobs):
        target = tmp_path / f"{tag}_{i}"
        target.write_bytes(blob)
        try:
            out = reader(str(target))
        except CLEAN:
            continue
        if check is not None:
            check(out)


def _fuzz_text(tmp_path, clean_text, reader, tag, check=None):
    """Line deletions, field corruption and garbage through one text
    parser."""

    rng = np.random.default_rng(5)
    lines = clean_text.splitlines()
    variants = []
    # drop each third line, duplicated lines, reversed order
    for k in range(0, len(lines), max(1, len(lines) // 12)):
        variants.append("\n".join(lines[:k] + lines[k + 1:]))
    variants.append("\n".join(reversed(lines)))
    variants.append(clean_text + clean_text)
    # corrupt numeric fields into non-numbers / absurd values
    for token in ("1e99", "-1e99", "nan", "inf", "xyz", "", "1/0"):
        variants.append(clean_text.replace("100.0", token).replace(
            "100.000000", token))
    # random character noise
    for it in range(60):
        chars = list(clean_text)
        for _ in range(int(rng.integers(1, 12))):
            chars[int(rng.integers(0, len(chars)))] = chr(
                int(rng.integers(32, 127))
            )
        variants.append("".join(chars))
    variants += ["", "\x00\x01\x02", "<html>not a resp</html>",
                 "A" * 100_000]

    for i, text in enumerate(variants):
        target = tmp_path / f"{tag}_{i}"
        target.write_text(text)
        try:
            out = reader(str(target))
        except CLEAN:
            continue
        if check is not None:
            check(out)


# --------------------------------------------------------------- binary --


def test_sac_fuzz(tmp_path):
    clean = tmp_path / "clean.sac"
    write_sac(_stream(), str(clean))
    _fuzz_binary(tmp_path, clean.read_bytes(), read_sac, "sac")


def test_sac_lying_npts_and_byteorder(tmp_path):
    clean = tmp_path / "clean.sac"
    write_sac(_stream(), str(clean))
    data = bytearray(clean.read_bytes())
    # npts lives at header word 79 (offset 316), nvhdr at word 76 (304)
    for npts in (0, -1, 10**9, 2**31 - 1):
        blob = bytearray(data)
        blob[316:320] = int(npts).to_bytes(4, "little", signed=True)
        target = tmp_path / f"npts_{npts}.sac"
        target.write_bytes(bytes(blob))
        try:
            st = read_sac(str(target))
            _check_stream(st)
        except CLEAN:
            pass
    # delta (word 0) as nan/inf/zero/negative
    for bits in (b"\x00\x00\xc0\x7f", b"\x00\x00\x80\x7f",
                 b"\x00\x00\x00\x00", b"\x00\x00\x80\xbf"):
        blob = bytearray(data)
        blob[0:4] = bits
        target = tmp_path / "delta.sac"
        target.write_bytes(bytes(blob))
        try:
            st = read_sac(str(target))
            _check_stream(st)
        except CLEAN:
            pass


def test_segy_fuzz(tmp_path):
    clean = tmp_path / "clean.segy"
    write_segy(_stream(), str(clean))
    _fuzz_binary(tmp_path, clean.read_bytes(), read_segy, "segy")


def test_segy_lying_counts(tmp_path):
    clean = tmp_path / "clean.segy"
    write_segy(_stream(), str(clean))
    data = bytearray(clean.read_bytes())
    # binary header: samples/trace at 3220 (2 bytes), format code at 3224
    for off, vals in ((3220, (0, 1, 65535)), (3224, (0, 2, 3, 8, 255))):
        for v in vals:
            blob = bytearray(data)
            blob[off:off + 2] = int(v).to_bytes(2, "big")
            target = tmp_path / f"segy_{off}_{v}.segy"
            target.write_bytes(bytes(blob))
            try:
                st = read_segy(str(target))
                _check_stream(st)
            except CLEAN:
                pass


def test_gse2_fuzz(tmp_path):
    clean = tmp_path / "clean.gse2"
    write_gse2(_stream(dtype=np.int32), str(clean))
    blob = clean.read_bytes()
    _fuzz_binary(tmp_path, blob, read_gse2, "gse2")
    # text-level attacks on the WID2 header line and CM6 payload
    _fuzz_text(tmp_path, blob.decode("ascii", "replace"), read_gse2,
               "gse2t", check=_check_stream)


def test_gse2_delimiter_edge_cases(tmp_path):
    """Content that IS (or ends with) the 'WID2 ' block delimiter must
    fail typed, not with IndexError on the empty trailing block (found
    by review, not the random fuzz corpus)."""

    for i, text in enumerate(("WID2 ", "garbage\nWID2 ", "WID2 \nWID2 ")):
        target = tmp_path / f"wid2_{i}.gse2"
        target.write_text(text)
        with pytest.raises(CLEAN):
            read_gse2(str(target))


def test_gse2_lying_checksum_and_counts(tmp_path):
    clean = tmp_path / "clean.gse2"
    write_gse2(_stream(dtype=np.int32), str(clean))
    text = clean.read_text()
    # claim absurd sample counts in the WID2 line (field after datetime)
    for lie in ("0", "-5", "999999999"):
        lines = text.splitlines()
        wid = lines[0].split()
        wid[4] = lie  # samps field
        lines[0] = " ".join(wid)
        target = tmp_path / f"gse2_n_{lie}.gse2"
        target.write_text("\n".join(lines))
        try:
            st = read_gse2(str(target))
            _check_stream(st)
        except CLEAN:
            pass


# ----------------------------------------------------------------- text --


RESP_CHECK_SEED = ("SC", "FZZ", "", "BHZ")


def test_resp_fuzz(tmp_path):
    # A minimal healthy RESP is easiest to steal from our own writer-less
    # stack: synthesise one with the canonical Evalresp field tags.
    clean_text = """#
B050F03     Station:     FZZ
B050F16     Network:     SC
B052F03     Location:    ??
B052F04     Channel:     BHZ
B052F22     Start date:  2020,001,00:00:00
B052F23     End date:    No Ending Time
B053F03     Transfer function type:                A
B053F04     Stage sequence number:                 1
B053F05     Response in units lookup:              M/S - Velocity
B053F06     Response out units lookup:             V - Volts
B053F07     A0 normalization factor:               +1.00000E+00
B053F08     Normalization frequency:               +1.00000E+00
B053F09     Number of zeroes:                      2
B053F14     Number of poles:                       2
B053F10-13     0  +0.00000E+00  +0.00000E+00  0  0
B053F10-13     1  +0.00000E+00  +0.00000E+00  0  0
B053F15-18     0  -4.44000E+00  +4.44000E+00  0  0
B053F15-18     1  -4.44000E+00  -4.44000E+00  0  0
B058F03     Stage sequence number:                 1
B058F04     Sensitivity:                           +1.00000E+03
B058F05     Frequency of sensitivity:              +1.00000E+00
B058F03     Stage sequence number:                 0
B058F04     Sensitivity:                           +1.00000E+03
B058F05     Frequency of sensitivity:              +1.00000E+00
"""

    def reader(path):
        return read_resp(path)

    _fuzz_text(tmp_path, clean_text, reader, "resp")


def test_sacpz_fuzz(tmp_path):
    clean_text = """* **********************************
* NETWORK   (KNETWK): SC
* STATION    (KSTNM): FZZ
* LOCATION   (KHOLE):
* CHANNEL   (KCMPNM): BHZ
* START             : 2020-01-01T00:00:00
* END               : 2599-12-31T23:59:59
* LATITUDE          : 64.000000
* LONGITUDE         : -17.000000
* ELEVATION         : 100.0
* INPUT UNIT        : M
* OUTPUT UNIT       : COUNTS
* **********************************
ZEROS	3
	+0.000000e+00	+0.000000e+00
	+0.000000e+00	+0.000000e+00
	+0.000000e+00	+0.000000e+00
POLES	2
	-4.440000e+00	+4.440000e+00
	-4.440000e+00	-4.440000e+00
CONSTANT	+1.000000e+03
"""
    _fuzz_text(tmp_path, clean_text, read_sac_pz, "sacpz")


def test_stationxml_fuzz(tmp_path):
    clean_xml = """<?xml version='1.0' encoding='UTF-8'?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
 <Source>fuzz</Source><Created>2020-01-01T00:00:00</Created>
 <Network code="SC">
  <Station code="FZZ"><Latitude>64.0</Latitude><Longitude>-17.0</Longitude>
   <Elevation>100.0</Elevation>
   <Channel code="BHZ" locationCode="">
    <Latitude>64.0</Latitude><Longitude>-17.0</Longitude>
    <Elevation>100.0</Elevation><Depth>0.0</Depth>
    <SampleRate>100.0</SampleRate>
    <Response>
     <InstrumentSensitivity>
      <Value>1000.0</Value><Frequency>1.0</Frequency>
      <InputUnits><Name>M/S</Name></InputUnits>
      <OutputUnits><Name>COUNTS</Name></OutputUnits>
     </InstrumentSensitivity>
     <Stage number="1">
      <PolesZeros>
       <InputUnits><Name>M/S</Name></InputUnits>
       <OutputUnits><Name>V</Name></OutputUnits>
       <PzTransferFunctionType>LAPLACE (RADIANS/SECOND)</PzTransferFunctionType>
       <NormalizationFactor>1.0</NormalizationFactor>
       <NormalizationFrequency>1.0</NormalizationFrequency>
       <Zero number="0"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Pole number="0"><Real>-4.44</Real><Imaginary>4.44</Imaginary></Pole>
       <Pole number="1"><Real>-4.44</Real><Imaginary>-4.44</Imaginary></Pole>
      </PolesZeros>
      <StageGain><Value>1000.0</Value><Frequency>1.0</Frequency></StageGain>
     </Stage>
    </Response>
   </Channel>
  </Station>
 </Network>
</FDSNStationXML>
"""
    import xml.etree.ElementTree as ET

    def reader(path):
        try:
            return read_inventory(path)
        except ET.ParseError:
            # Malformed XML is a clean, typed refusal
            raise ValueError("malformed xml")

    _fuzz_text(tmp_path, clean_xml, reader, "sxml")


def test_readers_never_hang_on_huge_counts(tmp_path):
    """Absurd claimed sizes must not allocate/loop unboundedly: parse of
    each corrupted file must finish fast (covered implicitly by the
    suite's runtime) and never allocate from the lying header alone."""

    # SAC claiming 2^31-1 points with a 40-byte payload
    clean = tmp_path / "c.sac"
    write_sac(_stream(npts=10), str(clean))
    blob = bytearray(clean.read_bytes())
    blob[316:320] = int(2**31 - 1).to_bytes(4, "little", signed=True)
    f = tmp_path / "huge.sac"
    f.write_bytes(bytes(blob))
    try:
        st = read_sac(str(f))
        # If it parses, the data must be bounded by the actual payload
        assert sum(len(tr.data) for tr in st) <= 10
    except CLEAN:
        pass
