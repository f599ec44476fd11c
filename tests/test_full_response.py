# -*- coding: utf-8 -*-
"""
Full-response removal: FIR / Coefficients digital stages parsed from
StationXML and deconvolved along with the PAZ transfer function
(reference: io/data.py:648-740 remove_full_response branch).

"""

import numpy as np

from quakemigrate_tpu.seis import Trace
from quakemigrate_tpu.seis.response import (
    DigitalStage,
    read_inventory,
    remove_trace_response,
)

_XML = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
  <Source>tests</Source>
  <Created>2021-01-01T00:00:00</Created>
  <Network code="XX">
    <Station code="FIR1">
      <Latitude>0.0</Latitude>
      <Longitude>0.0</Longitude>
      <Elevation>0</Elevation>
      <Channel code="HHZ" locationCode="" startDate="2020-01-01T00:00:00">
        <Latitude>0.0</Latitude>
        <Longitude>0.0</Longitude>
        <Elevation>0</Elevation>
        <Depth>0</Depth>
        <SampleRate>100</SampleRate>
        <Response>
          <InstrumentSensitivity>
            <Value>1.5e9</Value>
            <Frequency>1.0</Frequency>
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
              <Zero number="0"><Real>0</Real><Imaginary>0</Imaginary></Zero>
              <Zero number="1"><Real>0</Real><Imaginary>0</Imaginary></Zero>
              <Pole number="0"><Real>-0.44</Real><Imaginary>0.44</Imaginary></Pole>
              <Pole number="1"><Real>-0.44</Real><Imaginary>-0.44</Imaginary></Pole>
            </PolesZeros>
          </Stage>
          <Stage number="2">
            <Coefficients>
              <InputUnits><Name>COUNTS</Name></InputUnits>
              <OutputUnits><Name>COUNTS</Name></OutputUnits>
              <CfTransferFunctionType>DIGITAL</CfTransferFunctionType>
              <Numerator>0.25</Numerator>
              <Numerator>0.5</Numerator>
              <Numerator>0.25</Numerator>
            </Coefficients>
            <Decimation>
              <InputSampleRate>400</InputSampleRate>
              <Factor>2</Factor>
              <Offset>0</Offset>
              <Delay>0.0025</Delay>
              <Correction>0.0025</Correction>
            </Decimation>
          </Stage>
          <Stage number="3">
            <FIR>
              <InputUnits><Name>COUNTS</Name></InputUnits>
              <OutputUnits><Name>COUNTS</Name></OutputUnits>
              <Symmetry>ODD</Symmetry>
              <NumeratorCoefficient i="0">0.05</NumeratorCoefficient>
              <NumeratorCoefficient i="1">0.15</NumeratorCoefficient>
              <NumeratorCoefficient i="2">0.2</NumeratorCoefficient>
              <NumeratorCoefficient i="3">0.25</NumeratorCoefficient>
              <NumeratorCoefficient i="4">0.3</NumeratorCoefficient>
            </FIR>
            <Decimation>
              <InputSampleRate>200</InputSampleRate>
              <Factor>2</Factor>
            </Decimation>
          </Stage>
        </Response>
      </Channel>
    </Station>
  </Network>
</FDSNStationXML>
"""


def _inventory(tmp_path):
    f = tmp_path / "fir.xml"
    f.write_text(_XML)
    return read_inventory(str(f))


def test_digital_stage_parsing(tmp_path):
    inv = _inventory(tmp_path)
    resp = inv.get_response("XX.FIR1..HHZ")

    assert len(resp.digital_stages) == 2
    co, fir = resp.digital_stages
    np.testing.assert_allclose(co.coefficients, [0.25, 0.5, 0.25])
    assert co.input_sample_rate == 400
    assert co.correction == 0.0025
    # ODD symmetry: 5 half-coefficients expand to 9 palindromic taps
    assert fir.coefficients.size == 9
    np.testing.assert_array_equal(fir.coefficients, fir.coefficients[::-1])
    assert fir.input_sample_rate == 200
    assert fir.correction is None


def test_digital_stage_freq_resp_properties():
    stage = DigitalStage(
        coefficients=np.array([0.25, 0.5, 0.25]), input_sample_rate=400,
        correction=0.0025,
    )
    freqs = np.array([0.0, 10.0, 50.0, 100.0])
    h = stage.freq_resp(freqs)
    # Unity at DC; symmetric + delay-corrected -> (near-)zero phase
    np.testing.assert_allclose(h[0], 1.0)
    np.testing.assert_allclose(np.imag(h), 0.0, atol=1e-12)
    # Boxcar-like rolloff: |H| = cos^2(pi f / 400)
    np.testing.assert_allclose(
        np.abs(h), np.cos(np.pi * freqs / 400) ** 2, rtol=1e-12
    )


def test_full_removal_deconvolves_fir_shape(tmp_path):
    """
    On a narrowband signal the two removals must differ by exactly the
    digital stages' gain at that frequency: paz-only leaves the FIR
    rolloff in the data; full removal deconvolves it.

    """

    inv = _inventory(tmp_path)
    resp = inv.get_response("XX.FIR1..HHZ")

    t = np.arange(8192) / 100.0
    header = {
        "network": "XX", "station": "FIR1", "channel": "HHZ",
        "sampling_rate": 100.0, "starttime": "2021-01-01T00:00:00.0",
    }
    for f0 in (10.0, 30.0, 45.0):
        data = np.sin(2 * np.pi * f0 * t)
        tr_paz = remove_trace_response(
            Trace(data.copy(), header), inv, output="VEL",
        )
        tr_full = remove_trace_response(
            Trace(data.copy(), header), inv, output="VEL", full=True,
        )
        core = slice(1000, -1000)  # away from taper/wrap edges
        measured = (
            np.sqrt(np.mean(tr_paz.data[core] ** 2))
            / np.sqrt(np.mean(tr_full.data[core] ** 2))
        )
        expected = np.abs(
            resp.digital_stages[0].freq_resp(np.array([f0]))
            * resp.digital_stages[1].freq_resp(np.array([f0]))
        )[0]
        np.testing.assert_allclose(measured, expected, rtol=5e-3,
                                   err_msg=f"{f0} Hz")

    # The FIR rolloff is a real, measurable in-band effect (>10% at 45 Hz)
    assert expected < 0.9


_SACPZ = """* **********************************
* NETWORK   (KNETWK): XX
* STATION    (KSTNM): PZ01
* LOCATION   (KHOLE):
* CHANNEL   (KCMPNM): HHZ
* START             : 2020-01-01T00:00:00
* END               : 2599-12-31T23:59:59
* LATITUDE          : 12.5
* LONGITUDE         : -4.25
* ELEVATION         : 100.0
* INPUT UNIT        : M
* OUTPUT UNIT       : COUNTS
* **********************************
ZEROS 3
POLES 2
        -4.400000e-01   +4.400000e-01
        -4.400000e-01   -4.400000e-01
CONSTANT +1.500000e+09
* **********************************
* NETWORK   (KNETWK): XX
* STATION    (KSTNM): PZ01
* CHANNEL   (KCMPNM): HHN
* INPUT UNIT        : M
* **********************************
ZEROS 3
        +0.000000e+00   +0.000000e+00
        +0.000000e+00   +0.000000e+00
        -1.000000e+00   +0.000000e+00
POLES 2
        -4.400000e-01   +4.400000e-01
        -4.400000e-01   -4.400000e-01
CONSTANT +2.000000e+09
"""


def test_sac_pz_parsing(tmp_path):
    """SAC_PZ files parse into the native Inventory (reference refuses
    them, io/core.py:132-135)."""

    from quakemigrate_tpu.io import read_response_inv

    f = tmp_path / "SAC_PZs_XX_PZ01_HHZ"
    f.write_text(_SACPZ)
    inv = read_response_inv(str(f), sac_pz_format=True)

    z = inv.get_response("XX.PZ01..HHZ")
    # ZEROS 3 with no listed values -> three zeros at the origin
    assert z.zeros == [0j, 0j, 0j]
    assert len(z.poles) == 2
    assert z.normalization_factor == 1.5e9
    assert z.input_units == "M"

    n = inv.get_response("XX.PZ01..HHN")
    assert n.zeros.count(0j) == 2 and complex(-1, 0) in n.zeros
    assert n.normalization_factor == 2.0e9

    assert inv.get_coordinates("XX.PZ01..HHZ")["latitude"] == 12.5


def test_sac_pz_removal_matches_stationxml(tmp_path):
    """The same PZ set via SAC_PZ and StationXML gives identical output."""

    from quakemigrate_tpu.io import read_response_inv
    from quakemigrate_tpu.seis import Trace

    # SAC_PZ is w.r.t. displacement (3 zeros, CONSTANT = A0*sens);
    # equivalent StationXML: velocity PZ (2 zeros), A0=1, sens=1.5e9
    pz = tmp_path / "SAC_PZs_XX_FIR1_HHZ"
    pz.write_text("""* STATION    (KSTNM): FIR1
* NETWORK   (KNETWK): XX
* CHANNEL   (KCMPNM): HHZ
* INPUT UNIT        : M
ZEROS 3
POLES 2
        -4.400000e-01   +4.400000e-01
        -4.400000e-01   -4.400000e-01
CONSTANT +1.500000e+09
""")
    inv_pz = read_response_inv(str(pz), sac_pz_format=True)

    xml = tmp_path / "resp.xml"
    xml.write_text(_XML)  # PZ stage: 2 origin zeros, same poles, sens 1.5e9
    inv_xml = read_response_inv(str(xml))

    rng = np.random.default_rng(2)
    data = rng.normal(size=4096)
    header = {"network": "XX", "station": "FIR1", "channel": "HHZ",
              "sampling_rate": 100.0, "starttime": "2021-01-01T00:00:00.0"}
    out_pz = remove_trace_response(
        Trace(data.copy(), header), inv_pz, output="VEL",
    )
    out_xml = remove_trace_response(
        Trace(data.copy(), header), inv_xml, output="VEL",
    )
    np.testing.assert_allclose(out_pz.data, out_xml.data, rtol=1e-10)


def test_get_real_waveform_honours_input_units(tmp_path):
    """
    WaveformData.get_real_waveform must produce velocity regardless of
    whether the response is recorded w.r.t. velocity (StationXML M/S) or
    displacement (SAC_PZ M). Regression: the PAZ dict used to be built
    assuming M/S, silently returning displacement for SAC_PZ responses.

    """

    import pandas as pd

    from quakemigrate_tpu.io import Archive, read_response_inv
    from quakemigrate_tpu.seis import UTCDateTime

    pz = tmp_path / "SAC_PZs_XX_PZ01_HHZ"
    pz.write_text("""* STATION    (KSTNM): PZ01
* NETWORK   (KNETWK): XX
* CHANNEL   (KCMPNM): HHZ
* INPUT UNIT        : M
ZEROS 3
POLES 2
        -4.400000e-01   +4.400000e-01
        -4.400000e-01   -4.400000e-01
CONSTANT +1.500000e+09
""")
    inv = read_response_inv(str(pz), sac_pz_format=True)

    day_dir = tmp_path / "mSEED/2021/049"
    day_dir.mkdir(parents=True)
    t = np.arange(6000) / 100.0
    counts = 1.5e9 * np.sin(2 * np.pi * 5.0 * t)
    Trace(counts, {"network": "XX", "station": "PZ01", "channel": "HHZ",
                   "sampling_rate": 100.0,
                   "starttime": "2021-02-18T12:00:00.0"}
          ).write(str(day_dir / "PZ01_Z.m"), format="MSEED")

    stations = pd.DataFrame({"Name": ["PZ01"], "Longitude": [0.0],
                             "Latitude": [0.0], "Elevation": [0.0]})
    archive = Archive(archive_path=tmp_path / "mSEED", stations=stations,
                      archive_format="YEAR/JD/STATION", response_inv=inv,
                      response_removal_params={"water_level": 60})
    wd = archive.read_waveform_data(UTCDateTime("2021-02-18T12:00:10.0"),
                                    UTCDateTime("2021-02-18T12:00:50.0"))
    vel = wd.get_real_waveform(wd.waveforms[0].copy())
    rms = np.sqrt(np.mean(vel.data[500:-500] ** 2))
    # 1.5e9-count 5 Hz sinusoid with CONSTANT 1.5e9 -> ~1 m/s amplitude
    np.testing.assert_allclose(rms, 1.0 / np.sqrt(2), rtol=0.02)

    disp = wd.get_real_waveform(wd.waveforms[0].copy(), velocity=False)
    rms_d = np.sqrt(np.mean(disp.data[500:-500] ** 2))
    np.testing.assert_allclose(rms_d, 1.0 / np.sqrt(2) / (2 * np.pi * 5.0),
                               rtol=0.06)


_RESP = """#
B050F03     Station:     FIR1
B050F16     Network:     XX
B052F03     Location:    ??
B052F04     Channel:     HHZ
B052F22     Start date:  2020,001,00:00:00
B052F23     End date:    No Ending Time
#
#                  +-----------------------------------+
#                  |    Response (Poles and Zeros)     |
#                  +-----------------------------------+
#
B053F03     Transfer function type:                A [Laplace Transform (Rad/sec)]
B053F04     Stage sequence number:                 1
B053F05     Response in units lookup:              M/S - Velocity in Meters Per Second
B053F06     Response out units lookup:             V - Volts
B053F07     A0 normalization factor:               1.0
B053F08     Normalization frequency:               1.0
B053F09     Number of zeroes:                      2
B053F14     Number of poles:                       2
#              Complex zeroes:
#              i  real          imag          real_error    imag_error
B053F10-13     0  0.000000E+00  0.000000E+00  0.000000E+00  0.000000E+00
B053F10-13     1  0.000000E+00  0.000000E+00  0.000000E+00  0.000000E+00
#              Complex poles:
B053F15-18     0 -4.400000E-01  4.400000E-01  0.000000E+00  0.000000E+00
B053F15-18     1 -4.400000E-01 -4.400000E-01  0.000000E+00  0.000000E+00
#
B058F03     Stage sequence number:                 1
B058F04     Sensitivity:                           1.000000E+00
B058F05     Frequency of sensitivity:              1.0
#
#                  +-----------------------------------+
#                  |      Response (Coefficients)      |
#                  +-----------------------------------+
#
B054F03     Transfer function type:                D
B054F04     Stage sequence number:                 2
B054F07     Number of numerators:                  3
B054F10     Number of denominators:                0
#              Numerator coefficients:
#              i, coefficient, error
B054F08-09     0  2.500000E-01  0.000000E+00
B054F08-09     1  5.000000E-01  0.000000E+00
B054F08-09     2  2.500000E-01  0.000000E+00
#
B057F03     Stage sequence number:                 2
B057F04     Input sample rate:                     4.000000E+02
B057F05     Decimation factor:                     2
B057F06     Decimation offset:                     0
B057F07     Estimated delay (seconds):             2.500000E-03
B057F08     Correction applied (seconds):          2.500000E-03
#
B058F03     Stage sequence number:                 2
B058F04     Sensitivity:                           1.000000E+00
#
#                  +-----------------------------------+
#                  |            FIR response           |
#                  +-----------------------------------+
#
B061F03     Stage sequence number:                 3
B061F04     Stage sequence number:                 3
B061F05     Symmetry type:                         B
B061F08-09     0  5.000000E-02
B061F08-09     1  1.500000E-01
B061F08-09     2  2.000000E-01
B061F08-09     3  2.500000E-01
B061F08-09     4  3.000000E-01
#
B057F03     Stage sequence number:                 3
B057F04     Input sample rate:                     2.000000E+02
B057F05     Decimation factor:                     2
#
B058F03     Stage sequence number:                 3
B058F04     Sensitivity:                           1.000000E+00
#
B058F03     Stage sequence number:                 0
B058F04     Sensitivity:                           1.500000E+09
B058F05     Frequency of sensitivity:              1.0
#
"""


def test_resp_matches_stationxml(tmp_path):
    """
    The same multi-stage response via RESP and StationXML gives identical
    full-response removal output (the reference reads RESP via ObsPy).

    """

    from quakemigrate_tpu.io import read_response_inv
    from quakemigrate_tpu.seis import Trace

    resp_file = tmp_path / "RESP.XX.FIR1..HHZ"
    resp_file.write_text(_RESP)
    inv_resp = read_response_inv(str(resp_file))  # format sniffed

    xml = tmp_path / "resp.xml"
    xml.write_text(_XML)
    inv_xml = read_response_inv(str(xml))

    r = inv_resp.get_response("XX.FIR1..HHZ")
    x = inv_xml.get_response("XX.FIR1..HHZ")
    assert r.poles == x.poles and r.zeros == x.zeros
    assert r.sensitivity == x.sensitivity
    assert len(r.digital_stages) == 2
    np.testing.assert_allclose(
        r.digital_stages[0].coefficients, x.digital_stages[0].coefficients
    )
    np.testing.assert_allclose(
        r.digital_stages[1].coefficients, x.digital_stages[1].coefficients
    )
    assert r.digital_stages[0].correction == 0.0025
    assert str(r.start) == "2020-01-01T00:00:00.000000Z"

    rng = np.random.default_rng(4)
    data = rng.normal(size=4096)
    header = {"network": "XX", "station": "FIR1", "channel": "HHZ",
              "sampling_rate": 100.0, "starttime": "2021-01-01T00:00:00.0"}
    for full in (False, True):
        out_resp = remove_trace_response(
            Trace(data.copy(), header), inv_resp, output="VEL", full=full,
        )
        out_xml = remove_trace_response(
            Trace(data.copy(), header), inv_xml, output="VEL", full=full,
        )
        np.testing.assert_allclose(out_resp.data, out_xml.data, rtol=1e-10,
                                   err_msg=f"full={full}")


def test_resp_directory_and_concatenation(tmp_path):
    from quakemigrate_tpu.io import read_response_inv

    d = tmp_path / "resp_dir"
    d.mkdir()
    (d / "RESP.XX.FIR1..HHZ").write_text(_RESP)
    (d / "RESP.XX.FIR1..HHN").write_text(_RESP.replace(
        "B052F04     Channel:     HHZ", "B052F04     Channel:     HHN"
    ))
    inv = read_response_inv(str(d))
    assert sorted(inv.responses) == ["XX.FIR1..HHN", "XX.FIR1..HHZ"]

    # one concatenated file with two epochs
    concat = tmp_path / "RESP.concat"
    concat.write_text(_RESP + _RESP.replace(
        "B052F04     Channel:     HHZ", "B052F04     Channel:     HHE"
    ))
    inv2 = read_response_inv(str(concat))
    assert sorted(inv2.responses) == ["XX.FIR1..HHE", "XX.FIR1..HHZ"]


def test_resp_hz_transfer_type(tmp_path):
    """RESP 'B' (analog, Hz) poles/zeros convert to rad/s like the
    StationXML HERTZ convention."""

    from quakemigrate_tpu.seis.resp import read_resp

    hz_resp = """B050F03     Station:     HZ01
B050F16     Network:     XX
B052F03     Location:    ??
B052F04     Channel:     HHZ
B053F03     Transfer function type:                B [Analog (Hz)]
B053F04     Stage sequence number:                 1
B053F05     Response in units lookup:              M/S - Velocity
B053F07     A0 normalization factor:               2.0
B053F09     Number of zeroes:                      1
B053F14     Number of poles:                       2
B053F10-13     0  0.000000E+00  0.000000E+00  0.0  0.0
B053F15-18     0 -7.000000E-02  7.000000E-02  0.0  0.0
B053F15-18     1 -7.000000E-02 -7.000000E-02  0.0  0.0
B058F03     Stage sequence number:                 0
B058F04     Sensitivity:                           5.000000E+08
"""
    f = tmp_path / "RESP.XX.HZ01..HHZ"
    f.write_text(hz_resp)
    r = read_resp(str(f)).get_response("XX.HZ01..HHZ")

    two_pi = 2 * np.pi
    np.testing.assert_allclose(
        sorted(r.poles, key=lambda p: p.imag),
        sorted([complex(-0.07, 0.07) * two_pi,
                complex(-0.07, -0.07) * two_pi], key=lambda p: p.imag),
    )
    assert r.zeros == [0j]
    # A0 scales by (2*pi)^(n_poles - n_zeros)
    np.testing.assert_allclose(r.normalization_factor, 2.0 * two_pi)
    assert r.sensitivity == 5.0e8
