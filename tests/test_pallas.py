# -*- coding: utf-8 -*-
"""
Pallas detect kernel vs the XLA reference implementation (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU).

"""

import numpy as np
import pytest

from quakemigrate_tpu.ops.migrate import migrate_detect
from quakemigrate_tpu.ops.pallas_migrate import PallasDetect, brick_permutation


def test_brick_permutation_covers_grid():
    perm, n_padded = brick_permutation((7, 6, 5), (4, 4, 4))
    live = perm[perm >= 0]
    assert len(live) == 7 * 6 * 5
    assert sorted(live) == list(range(7 * 6 * 5))


@pytest.mark.parametrize("seed", [0, 7])
def test_pallas_detect_matches_xla(seed):
    rng = np.random.default_rng(seed)
    node_count = (10, 9, 8)
    n_nodes = int(np.prod(node_count))
    n_onsets, fsmp, lsmp, nsamples = 6, 16, 40, 100
    t_samples = fsmp + nsamples + lsmp

    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(np.float32)
    tt = rng.integers(0, lsmp, size=(n_nodes, n_onsets)).astype(np.int32)
    mask = np.ones(n_onsets, dtype=np.float32)
    mask[-1] = 0.0
    available = float(mask.sum())

    ref = [
        np.asarray(x)
        for x in migrate_detect(onsets, tt, mask, available, fsmp, nsamples,
                                tile=64)
    ]

    pallas = PallasDetect(
        tt, node_count, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        interpret=True,
    )
    out = [np.asarray(x) for x in pallas(onsets, mask, available)]

    np.testing.assert_allclose(out[0], ref[0], rtol=2e-6)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-6)
    # argmax: identical where the max is attained at a unique node
    vals_at_ref = ref[0]
    map_equal = out[2] == ref[2]
    assert map_equal.mean() > 0.95  # ties may differ in brick order


def test_mxu_fused_window_matches_xla(small_workload=None):
    """
    The Pallas MXU fused detect window (one-hot matmul migration) matches
    the XLA shift-table fused window on the same inputs (interpret mode --
    real-hardware validation runs in bench.py's parity gate).

    """

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU
    from quakemigrate_tpu.ops.scan_window import (
        detect_window_fused,
        detect_window_fused_mxu,
    )

    rng = np.random.default_rng(42)
    nx, ny, nz, n_slots, c_max = 8, 6, 5, 8, 3
    fsmp, nsamples = 30, 40
    t_len = nsamples + fsmp + 41

    channels = rng.normal(size=(n_slots, c_max, t_len)).astype(np.float32)
    chan_mask = np.ones((n_slots, c_max), dtype=np.float32)
    chan_mask[1, 2] = 0.0
    slot_mask = np.ones(n_slots, dtype=np.float32)
    slot_mask[5] = 0.0
    nsta = np.full(n_slots, 3, dtype=np.int32)
    nlta = np.full(n_slots, 9, dtype=np.int32)

    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    tts = [
        np.rint(
            np.sqrt((x - rng.uniform(0, nx)) ** 2 + (y - rng.uniform(0, ny)) ** 2
                    + z**2) * 2
        ).astype(np.int32)
        for _ in range(n_slots)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, n_slots), 0, 40)

    n_nodes = nx * ny * nz
    ref = detect_window_fused(
        channels, chan_mask, slot_mask, nsta, nlta, tt,
        "classic", "energy", 0.4, fsmp, nsamples,
        n_nodes_real=n_nodes, tile=64,
    )
    ref = [np.asarray(r) for r in ref]

    plan = PallasDetectMXU(
        tt, (nx, ny, nz), fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
    )
    with pltpu.force_tpu_interpret_mode():
        got = detect_window_fused_mxu(
            channels, chan_mask, slot_mask, nsta, nlta,
            plan.fine_t, plan.plan.base, plan.plan.valid, plan.plan.perm,
            "classic", "energy", 0.4, fsmp, nsamples,
            plan.plan.tile, plan.r_spans, n_nodes,
        )
    got = [np.asarray(g) for g in got]

    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5)
    assert (got[2] == ref[2]).mean() > 0.99


def test_mxu_fused_kurtosis_window_matches_xla():
    """Kurtosis twin of the MXU fused-window parity check."""

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU
    from quakemigrate_tpu.ops.scan_window import (
        detect_window_fused_kurtosis,
        detect_window_fused_kurtosis_mxu,
    )

    rng = np.random.default_rng(7)
    nx, ny, nz, n_slots, c_max = 8, 6, 5, 6, 3
    fsmp, nsamples = 30, 40
    t_len = nsamples + fsmp + 41

    channels = rng.normal(size=(n_slots, c_max, t_len)).astype(np.float32)
    chan_mask = np.ones((n_slots, c_max), dtype=np.float32)
    slot_mask = np.ones(n_slots, dtype=np.float32)
    nkurt = np.full(n_slots, 10, dtype=np.int32)
    nsmooth, taper_pad, min_onset = 5, 4, 0.4

    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    tts = [
        np.rint(np.hypot(x - rng.uniform(0, nx), y - rng.uniform(0, ny)) * 2
                + z).astype(np.int32)
        for _ in range(n_slots)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, n_slots), 0, 40)
    n_nodes = nx * ny * nz

    ref = detect_window_fused_kurtosis(
        channels, chan_mask, slot_mask, nkurt, tt,
        nsmooth, taper_pad, min_onset, fsmp, nsamples,
        n_nodes_real=n_nodes, tile=64,
    )
    ref = [np.asarray(r) for r in ref]

    plan = PallasDetectMXU(
        tt, (nx, ny, nz), fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
    )
    with pltpu.force_tpu_interpret_mode():
        got = detect_window_fused_kurtosis_mxu(
            channels, chan_mask, slot_mask, nkurt,
            plan.fine_t, plan.plan.base, plan.plan.valid, plan.plan.perm,
            nsmooth, taper_pad, min_onset, fsmp, nsamples,
            plan.plan.tile, plan.r_spans, n_nodes,
        )
    got = [np.asarray(g) for g in got]

    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    assert (got[2] == ref[2]).mean() > 0.99


def test_mxu_per_onset_spans_match_uniform():
    """
    The MXU kernel supports per-onset residual spans (its K rows are laid
    out at per-onset offsets). The shipped plans use the uniform max span
    (mixed spans trip a Mosaic scoped-VMEM anomaly on hardware -- see
    PallasDetectMXU), but the capability is kept parity-tested here.

    """

    import numpy as np

    from quakemigrate_tpu.ops.migrate import migrate_detect
    from quakemigrate_tpu.ops.pallas_migrate import (
        PallasDetectMXU,
        _pallas_mxu_detect_core,
        _round_up,
    )

    rng = np.random.default_rng(5)
    nx, ny, nz, n_onsets = 8, 6, 5, 6
    fsmp, lsmp, nsamples = 20, 60, 80
    t_samples = fsmp + nsamples + lsmp
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(np.float32)
    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    # Half "P" (fast), half "S" (slow): genuinely different spans
    tts = [
        np.rint(
            np.sqrt((x - rng.uniform(0, nx)) ** 2
                    + (y - rng.uniform(0, ny)) ** 2 + z**2)
            * (2 if i < n_onsets // 2 else 5)
        ).astype(np.int32)
        for i in range(n_onsets)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, n_onsets), 0, lsmp)
    mask = np.ones(n_onsets, dtype=np.float32)

    ref = [
        np.asarray(r)
        for r in migrate_detect(onsets, tt, mask, float(n_onsets), fsmp,
                                nsamples, tile=64)
    ]

    kernel = PallasDetectMXU(
        tt, (nx, ny, nz), fsmp, nsamples, tile=64, brick_shape=(4, 4, 4)
    )
    per_onset = np.asarray(kernel._fine_host).max(axis=(0, 2)) + 1
    r_spans = tuple(
        int(max(16, _round_up(int(s), 16))) for s in per_onset
    )
    assert len(set(r_spans)) > 1, "geometry failed to produce mixed spans"

    p = kernel.plan
    out = [
        np.asarray(o)
        for o in _pallas_mxu_detect_core(
            onsets, mask, float(n_onsets), kernel.fine_t, p.base, p.valid,
            p.perm, fsmp, nsamples, p.tile, r_spans, p.n_nodes,
            interpret=True,
        )
    ]
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-5)
    assert (out[2] == ref[2]).mean() > 0.99


def test_mxu_vmem_budget_estimate():
    """
    The auto-kernel fallback triggers on geometries whose MXU scratch
    would exceed VMEM (e.g. long scan windows), and accepts the benchmark
    geometry that is known to compile on hardware.

    """

    import numpy as np

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    # Smooth moveout field (real LUTs are spatially smooth, so per-brick
    # residual spans stay small).
    x, y, z = np.meshgrid(*[np.arange(8)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i) ** 2 + y**2 + z**2) * 12).astype(np.int32)
        for i in range(8)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 8), 0, 500)

    ok = PallasDetectMXU(tt, (8, 8, 8), 100, 625)
    assert ok.fits_vmem(), ok.estimated_vmem_bytes()

    # A very long window (e.g. the synthetic example's ~15 s timestep)
    # inflates the per-tile scratch past the 16 MB VMEM.
    too_long = PallasDetectMXU(tt, (8, 8, 8), 100, 20_000)
    assert not too_long.fits_vmem()

    # Adversarial fully-random traveltimes blow the residual span too.
    random_tt = np.random.default_rng(0).integers(
        0, 500, size=(8 * 8 * 8, 8), dtype=np.int32
    )
    assert not PallasDetectMXU(random_tt, (8, 8, 8), 100, 625).fits_vmem()


def test_make_mxu_detect_picks_largest_fitting_tile():
    """
    The config factory walks MXU_CONFIGS largest-tile first and returns the
    first candidate whose scratch fits VMEM; when nothing fits it still
    returns a kernel (callers re-check fits_vmem to fall back to XLA).
    Candidate plans stay host-side until first use.

    """

    import numpy as np

    from quakemigrate_tpu.ops.pallas_migrate import (
        MXU_CONFIGS,
        make_mxu_detect,
    )

    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i) ** 2 + y**2 + z**2) * 10).astype(np.int32)
        for i in range(8)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 8), 0, 500)

    # Short window: the largest tile fits.
    kernel = make_mxu_detect(tt, (16, 16, 16), 100, 128)
    assert kernel.fits_vmem()
    assert kernel.plan.tile == MXU_CONFIGS[0][0]
    assert kernel._fine_dev is None  # no device transfer yet

    # Longer window: a smaller tile is chosen, still fitting.
    kernel = make_mxu_detect(tt, (16, 16, 16), 100, 1024)
    assert kernel.fits_vmem()
    assert kernel.plan.tile < MXU_CONFIGS[0][0]

    # Absurd window: nothing fits; the smallest config comes back so the
    # caller's fits_vmem() check routes to the XLA kernel.
    kernel = make_mxu_detect(tt, (16, 16, 16), 100, 40_000)
    assert not kernel.fits_vmem()
    assert kernel.plan.tile == MXU_CONFIGS[-1][0]


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_mxu_detect_random_geometry_fuzz(seed):
    """
    Randomised-geometry fuzz of the MXU kernel's plan/padding logic
    (interpret mode): prime/odd grid dims that don't divide the tile or
    brick, random onset counts, boundary traveltimes (0 and exactly
    lsmp), masked-out onsets, and small windows must all agree with the
    XLA reference kernel.

    """

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    rng = np.random.default_rng(seed)
    dims = tuple(int(d) for d in rng.integers(3, 14, size=3))
    n_nodes = int(np.prod(dims))
    n_onsets = int(rng.integers(1, 9))
    fsmp = int(rng.integers(0, 30))
    nsamples = int(rng.integers(8, 80))
    lsmp = int(rng.integers(10, 50))
    t_samples = fsmp + nsamples + lsmp

    # Smooth moveout (spatially coherent) so the plan's residual spans
    # stay realistic, then force boundary values onto a few nodes.
    x, y, z = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    tts = []
    for o in range(n_onsets):
        sx, sy = rng.uniform(0, dims[0]), rng.uniform(0, dims[1])
        field = np.sqrt((x - sx) ** 2 + (y - sy) ** 2 + z**2)
        scale = lsmp / max(field.max(), 1e-9)
        tts.append(np.rint(field * scale * rng.uniform(0.5, 1.0)))
    tt = np.clip(np.stack(tts, -1).reshape(n_nodes, n_onsets), 0,
                 lsmp).astype(np.int32)
    tt[0, :] = 0        # boundary: zero shift
    tt[-1, :] = lsmp    # boundary: maximum legal shift

    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    if n_onsets > 1:
        mask[int(rng.integers(0, n_onsets))] = 0.0
    available = float(max(mask.sum(), 1.0))

    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, available, fsmp,
                                nsamples, tile=64)
    ]
    kernel = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=256, brick_shape=(8, 8, 4),
        interpret=True,
    )
    got = [np.asarray(v) for v in kernel(onsets, mask, available)]

    np.testing.assert_allclose(got[0], ref[0], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=5e-3, atol=1e-5)
    # argmax agreement wherever the max is unique enough to be stable
    # under the bf16 hi/lo arithmetic
    agree = (got[2] == ref[2]).mean()
    assert agree > 0.9, agree


def test_detect_reduce_mid_grid_slab_padding():
    """
    Tile padding appended to a MID-grid node slab must not alias real
    global indices: rows beyond the slab's true length are invalid even
    when their global index is < n_nodes_real (regression).

    """

    from quakemigrate_tpu.ops.migrate import detect_reduce

    rng = np.random.default_rng(21)
    n_nodes, n_onsets = 200, 4
    fsmp, nsamples, lsmp = 8, 40, 20
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, fsmp + nsamples + lsmp))
    tt = rng.integers(0, lsmp, size=(n_nodes, n_onsets)).astype(np.int32)
    mask = np.ones(n_onsets, dtype=np.float64)

    # Whole grid in one call = ground truth
    full = [np.asarray(v) for v in detect_reduce(
        onsets, tt, mask, 4.0, fsmp, nsamples, n_nodes, tile=64,
        node_offset=0,
    )]

    # Two slabs of 100 rows (not a multiple of tile=64): combine manually
    parts = []
    for off in (0, 100):
        parts.append([np.asarray(v) for v in detect_reduce(
            onsets, tt[off:off + 100], mask, 4.0, fsmp, nsamples, n_nodes,
            tile=64, node_offset=off,
        )])
    (m0, i0, s0), (m1, i1, s1) = parts
    better = m1 > m0
    max_coa = np.where(better, m1, m0)
    max_idx = np.where(better, i1, i0)
    coa_sum = s0 + s1

    np.testing.assert_allclose(max_coa, full[0], rtol=1e-12)
    np.testing.assert_array_equal(max_idx, full[1])
    np.testing.assert_allclose(coa_sum, full[2], rtol=1e-12)


def test_pallas_kernels_reject_short_onset_blocks():
    """Calling a Pallas kernel with an onset block shorter than the
    plan's maximum shift raises instead of silently selecting padding
    (regression)."""

    from quakemigrate_tpu.ops.pallas_migrate import (
        PallasDetect,
        PallasDetectMXU,
    )

    rng = np.random.default_rng(22)
    dims = (8, 8, 8)
    n_onsets, fsmp, nsamples, lsmp = 4, 8, 40, 30
    tt = rng.integers(0, lsmp, size=(512, n_onsets)).astype(np.int32)
    mask = np.ones(n_onsets, dtype=np.float32)

    short = rng.gamma(
        2.0, 1.5, size=(n_onsets, fsmp + nsamples + int(tt.max()) - 5)
    ).astype(np.float32)

    for cls in (PallasDetect, PallasDetectMXU):
        kernel = cls(tt, dims, fsmp, nsamples, tile=64,
                     brick_shape=(4, 4, 4), interpret=True)
        with pytest.raises(ValueError, match="too short"):
            kernel(short, mask, float(mask.sum()))


def test_mxu_vmem_budget_rejects_hardware_overflow_shape():
    """The VMEM estimate accounts for Mosaic stack temporaries: the
    52-onset x 1000-sample tile=1024 shape that died at compile on
    hardware must be rejected (regression)."""

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i % 16) ** 2 + y**2 + z**2)).astype(np.int32)
        for i in range(52)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 52), 0, 500)
    k = PallasDetectMXU(tt, (16, 16, 16), 100, 1000, tile=1024,
                        brick_shape=(16, 8, 8))
    assert max(k.r_spans) <= 32  # smooth field, small spans
    assert not k.fits_vmem()
