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
    Direct (unblocked) kernel construction reports over-budget scratch
    for long windows / wide spans via fits_vmem(), and accepts the
    benchmark geometry that is known to compile on hardware. (The
    make_mxu_detect factory would instead block the sample axis --
    tested separately.)

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

    # A very long window (e.g. a day-scale timestep), UNBLOCKED, inflates
    # the per-tile scratch past the budget (make_mxu_detect would block).
    too_long = PallasDetectMXU(tt, (8, 8, 8), 100, 20_000)
    assert not too_long.fits_vmem()

    # Adversarial fully-random traveltimes blow the residual span too.
    random_tt = np.random.default_rng(0).integers(
        0, 2000, size=(8 * 8 * 8, 8), dtype=np.int32
    )
    assert not PallasDetectMXU(random_tt, (8, 8, 8), 100, 625).fits_vmem()


def test_make_mxu_detect_picks_largest_fitting_tile():
    """
    The config factory walks MXU_CONFIGS largest-tile first and blocks
    the sample axis so long windows keep the MXU path (the largest tile
    with a reduced sample-block width); only pathologically wide residual
    spans return a kernel whose fits_vmem() is False (callers then fall
    back to XLA). Candidate plans stay host-side until first use.

    """

    import numpy as np

    from quakemigrate_tpu.ops.pallas_migrate import (
        LANE,
        MXU_CONFIGS,
        make_mxu_detect,
    )

    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i) ** 2 + y**2 + z**2) * 10).astype(np.int32)
        for i in range(8)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 8), 0, 500)

    # Short window: a config fits with the whole window as one sample
    # block, and the plan stays host-side.
    kernel = make_mxu_detect(tt, (16, 16, 16), 100, 128)
    assert kernel.fits_vmem()
    assert kernel.sblk == 128  # single block
    assert kernel._fine_dev is None  # no device transfer yet

    # Day-scale window (timestep=120 s at 250 Hz): the sample axis blocks
    # instead of losing the MXU -- this is VERDICT r2 item 1.
    kernel = make_mxu_detect(tt, (16, 16, 16), 100, 30_000)
    assert kernel.fits_vmem()
    assert kernel.sblk < 30_000  # genuinely blocked
    assert kernel.sblk % LANE == 0

    # At EQUAL spans the cost model prefers the largest tile (DMA
    # amortisation; round-2 regional sweep): constant traveltimes give
    # every config the minimum span.
    flat = np.full((16 * 16 * 16, 8), 100, dtype=np.int32)
    kernel = make_mxu_detect(flat, (16, 16, 16), 100, 625)
    assert kernel.plan.tile == MXU_CONFIGS[0][0]

    # Pathologically wide residual spans (pure-noise traveltimes): nothing
    # fits at any block width; fits_vmem() False routes callers to XLA.
    wild = np.random.default_rng(0).integers(
        0, 5000, size=(16 * 16 * 16, 8), dtype=np.int32
    )
    kernel = make_mxu_detect(wild, (16, 16, 16), 100, 625)
    assert not kernel.fits_vmem()


@pytest.mark.parametrize("nsamples,sblk", [(300, 128), (640, 256), (130, 128)])
def test_mxu_sample_blocking_matches_xla(nsamples, sblk):
    """
    The sample-axis-blocked MXU kernel (n_sblocks > 1, including a
    partial final block) matches the XLA reference bit-for-contract:
    max/norm within bf16 hi/lo tolerance, argmax identical off ties.

    """

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    rng = np.random.default_rng(3)
    dims = (9, 7, 6)
    n_nodes = int(np.prod(dims))
    n_onsets, fsmp, lsmp = 5, 12, 45
    t_samples = fsmp + nsamples + lsmp

    x, y, z = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    tts = [
        np.rint(
            np.sqrt((x - rng.uniform(0, dims[0])) ** 2
                    + (y - rng.uniform(0, dims[1])) ** 2 + z**2) * 4
        ).astype(np.int32)
        for _ in range(n_onsets)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(n_nodes, n_onsets), 0, lsmp)
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    mask[2] = 0.0
    available = float(mask.sum())

    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, available, fsmp,
                                nsamples, tile=64)
    ]
    kernel = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        sblk=sblk, interpret=True,
    )
    assert kernel.sblk == sblk
    assert -(-nsamples // sblk) > 1  # genuinely multi-block
    got = [np.asarray(v) for v in kernel(onsets, mask, available)]

    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5)
    assert (got[2] == ref[2]).mean() > 0.99


def test_mxu_blocked_matches_unblocked():
    """Blocked and unblocked sweeps of the same plan produce identical
    outputs (the block split is pure re-tiling, not an approximation)."""

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectMXU

    rng = np.random.default_rng(9)
    dims = (8, 8, 4)
    n_onsets, fsmp, nsamples, lsmp = 4, 10, 384, 30
    tt = rng.integers(
        0, lsmp, size=(int(np.prod(dims)), n_onsets)
    ).astype(np.int32)
    onsets = rng.gamma(
        2.0, 1.5, size=(n_onsets, fsmp + nsamples + lsmp)
    ).astype(np.float32)
    mask = np.ones(n_onsets, dtype=np.float32)

    outs = []
    for sblk in (None, 128):
        kernel = PallasDetectMXU(
            tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
            sblk=sblk, interpret=True,
        )
        outs.append(
            [np.asarray(v) for v in kernel(onsets, mask, float(n_onsets))]
        )
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


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


def test_mxu_vmem_limit_is_raised_past_mosaic_default():
    """The 52-onset x 1000-sample tile=1024 shape died at Mosaic's
    default 16 MiB scoped-VMEM limit on hardware (commit abfafbd). The
    kernel now raises the limit per-call (CompilerParams.vmem_limit_bytes
    = estimate + 8 MiB), so shapes whose estimate exceeds the Mosaic
    default but sits within VMEM_BUDGET are accepted -- and the estimate
    itself must flag that the default would NOT have been enough (the
    reason the limit is passed at all). Compiled-mode proof lives in the
    hardware tier (tests_tpu/test_mxu_hardware.py)."""

    from quakemigrate_tpu.ops.pallas_migrate import (
        VMEM_BUDGET,
        PallasDetectMXU,
    )

    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    tts = [
        np.rint(np.sqrt((x - i % 16) ** 2 + y**2 + z**2)).astype(np.int32)
        for i in range(52)
    ]
    tt = np.clip(np.stack(tts, -1).reshape(-1, 52), 0, 500)
    k = PallasDetectMXU(tt, (16, 16, 16), 100, 1000, tile=1024,
                        brick_shape=(16, 8, 8))
    assert max(k.r_spans) <= 32  # smooth field, small spans
    est = k.estimated_vmem_bytes()
    assert est > 16 * 2**20  # would die at the Mosaic default limit
    assert est <= VMEM_BUDGET  # accepted under the raised budget
    assert k.fits_vmem()
