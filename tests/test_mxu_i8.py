# -*- coding: utf-8 -*-
"""
int8 3-word fixed-point table encoding for the MXU detect kernel.

The one-hot-matmul migration is matmul-bound on v5e (the bf16 pair
sustains ~81% of the 197 TFLOP/s bf16 peak -- docs/performance.md "step
anatomy"), and v5e runs int8 matmuls at 2x the bf16 rate: three int8
fixed-point words cost ~0.75x the bf16 hi/lo pair on the MXU while
carrying ~13x tighter absolute error (measured 566 vs 490 G/s at the
day-scale window, identical argmaxes off ties). These tests pin the
encoding's error bound and the kernel's contract against the XLA
reference (reference semantics: migratelib.c:40-65).

"""

import numpy as np
import pytest

from quakemigrate_tpu.ops.migrate import migrate_detect
from quakemigrate_tpu.ops.pallas_migrate import (
    I8_VMAX,
    I8_VMIN,
    PallasDetectMXU,
    _encode_i8,
    _i8_terms,
)


def _geometry(rng, dims=(9, 7, 6), n_onsets=5, lsmp=45):
    x, y, z = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    tts = [
        np.rint(
            np.sqrt((x - rng.uniform(0, dims[0])) ** 2
                    + (y - rng.uniform(0, dims[1])) ** 2 + z**2) * 4
        ).astype(np.int32)
        for _ in range(n_onsets)
    ]
    n_nodes = int(np.prod(dims))
    return np.clip(np.stack(tts, -1).reshape(n_nodes, n_onsets), 0, lsmp)


def test_i8_encoding_error_bound():
    """Decode error of the 3-word encoding stays within the documented
    worst case over the full representable range (incl. the clip
    saturation edges)."""

    import jax

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(I8_VMIN, I8_VMAX, 20000),
        np.array([I8_VMIN, I8_VMAX, 0.0]),
    ]).astype(np.float32).reshape(1, -1)

    w1, w2, w3 = [np.asarray(w, np.float32)
                  for w in jax.jit(_encode_i8)(vals)]
    (s1, s2, s3), _ = _i8_terms(1)
    c = 0.5 * (I8_VMIN + I8_VMAX)
    decoded = c + s1 * w1 + s2 * w2 + s3 * w3
    bound = (I8_VMAX - I8_VMIN) / (2 * 127 * 254 * 254)
    assert np.abs(decoded - vals).max() <= 2 * bound  # f32 arith slack
    for w in (w1, w2, w3):
        assert np.abs(w).max() <= 127


@pytest.mark.parametrize("nsamples,sblk", [(300, 128), (640, 640)])
def test_i8_kernel_matches_xla(nsamples, sblk):
    """i8x3 kernel vs the XLA f32 reference: tighter than the bf16 pair's
    documented tolerance, argmax identical off ties; masked-onset
    semantics preserved."""

    rng = np.random.default_rng(7)
    dims = (9, 7, 6)
    n_onsets, fsmp, lsmp = 5, 12, 45
    tt = _geometry(rng, dims, n_onsets, lsmp)
    t_samples = fsmp + nsamples + lsmp
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    mask[1] = 0.0
    available = float(mask.sum())

    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, available, fsmp,
                                nsamples, tile=64)
    ]
    kernel = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        sblk=sblk, interpret=True, precision="i8x3",
    )
    got = [np.asarray(v) for v in kernel(onsets, mask, available)]

    np.testing.assert_allclose(got[0], ref[0], rtol=5e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=5e-6)
    assert (got[2] == ref[2]).mean() > 0.99


def test_i8_and_bf16_precisions_agree():
    """The two table encodings of the same plan agree to their combined
    tolerance -- and both r_spans/K layouts are identical (int8 DMA row
    granularity is 16, same as bf16; probed on hardware)."""

    rng = np.random.default_rng(11)
    dims = (8, 8, 8)
    n_onsets, fsmp, nsamples, lsmp = 6, 20, 200, 60
    tt = _geometry(rng, dims, n_onsets, lsmp)
    onsets = rng.gamma(2.0, 1.5,
                       size=(n_onsets, fsmp + nsamples + lsmp)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)

    outs, spans = [], []
    for prec in ("bf16hl", "i8x3"):
        kernel = PallasDetectMXU(
            tt, dims, fsmp, nsamples, tile=128, brick_shape=(8, 4, 4),
            interpret=True, precision=prec,
        )
        outs.append([np.asarray(v)
                     for v in kernel(onsets, mask, float(n_onsets))])
        spans.append(kernel.r_spans)

    assert spans[0] == spans[1]
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=3e-5)


def test_i8_saturates_gracefully():
    """Onset values beyond the fixed-point cap (1e9) saturate like the
    existing 0.01 floor: finite outputs, equal to the capped input's."""

    rng = np.random.default_rng(3)
    dims = (4, 4, 4)
    n_onsets, fsmp, nsamples, lsmp = 3, 8, 64, 20
    tt = _geometry(rng, dims, n_onsets, lsmp)
    onsets = rng.gamma(2.0, 1.5,
                       size=(n_onsets, fsmp + nsamples + lsmp)).astype(
        np.float32
    )
    onsets[0, fsmp + 5] = 1e12  # beyond I8_VMAX
    capped = onsets.copy()
    capped[0, fsmp + 5] = np.exp(I8_VMAX)

    kernel = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        interpret=True, precision="i8x3",
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    hot = [np.asarray(v) for v in kernel(onsets, mask, float(n_onsets))]
    cap = [np.asarray(v) for v in kernel(capped, mask, float(n_onsets))]
    assert np.isfinite(hot[0]).all()
    np.testing.assert_allclose(hot[0], cap[0], rtol=1e-5)


def test_scan_rejects_unknown_encoding(tmp_path):
    from quakemigrate_tpu.signal.onsets import STALTAOnset
    from quakemigrate_tpu.signal.scan import QuakeScan

    from types import SimpleNamespace

    onset = STALTAOnset(phases=["P"], sampling_rate=50)
    lut = SimpleNamespace(max_traveltime=1.0)
    with pytest.raises(ValueError, match="mxu_encoding"):
        QuakeScan("not_an_archive", lut, onset=onset,
                  run_path=tmp_path, run_name="t",
                  mxu_encoding="fp4")


def test_i8x2_encoding_error_bound():
    """2-word decode error stays within s2/2 = R/(2*254^2) over the full
    representable range -- ~2e-4 in log domain, ~2e-4 relative on the
    coalescence: far below detect's physical noise floor (the bench
    parity gate is 5e-4) but looser than i8x3/bf16hl, so i8x2 is the
    opt-in detect encoding, never the locate default."""

    import jax

    from quakemigrate_tpu.ops.pallas_migrate import _i8_n_words

    rng = np.random.default_rng(5)
    vals = np.concatenate([
        rng.uniform(I8_VMIN, I8_VMAX, 20000),
        np.array([I8_VMIN, I8_VMAX, 0.0]),
    ]).astype(np.float32).reshape(1, -1)

    w1, w2 = [np.asarray(w, np.float32)
              for w in jax.jit(lambda v: _encode_i8(v, 2))(vals)]
    (s1, s2), _ = _i8_terms(1, 2)
    c = 0.5 * (I8_VMIN + I8_VMAX)
    decoded = c + s1 * w1 + s2 * w2
    bound = (I8_VMAX - I8_VMIN) / (2 * 254 * 254)
    assert np.abs(decoded - vals).max() <= 1.05 * bound
    for w in (w1, w2):
        assert np.abs(w).max() <= 127
    assert _i8_n_words("i8x2") == 2
    assert _i8_n_words("bf16hl") is None
    with pytest.raises(ValueError, match="word count"):
        _i8_n_words("i8x9")


def test_i8x2_kernel_matches_xla():
    """i8x2 kernel vs the XLA f32 reference: within the 2-word bound
    (coalescence rel err ~2e-4 < the 5e-4 bench parity gate), same
    masked-onset semantics and plan layout as i8x3."""

    rng = np.random.default_rng(17)
    dims = (9, 7, 6)
    n_onsets, fsmp, nsamples, lsmp = 5, 12, 300, 45
    tt = _geometry(rng, dims, n_onsets, lsmp)
    onsets = rng.gamma(2.0, 1.5,
                       size=(n_onsets, fsmp + nsamples + lsmp)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    mask[1] = 0.0
    available = float(mask.sum())

    ref = [
        np.asarray(v)
        for v in migrate_detect(onsets, tt, mask, available, fsmp,
                                nsamples, tile=64)
    ]
    k2 = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        sblk=128, interpret=True, precision="i8x2",
    )
    k3 = PallasDetectMXU(
        tt, dims, fsmp, nsamples, tile=64, brick_shape=(4, 4, 4),
        sblk=128, interpret=True, precision="i8x3",
    )
    assert k2.r_spans == k3.r_spans  # same plan/DMA layout, 1 fewer word
    got = [np.asarray(v) for v in k2(onsets, mask, available)]

    np.testing.assert_allclose(got[0], ref[0], rtol=5e-4)
    np.testing.assert_allclose(got[1], ref[1], rtol=5e-4)
    assert (got[2] == ref[2]).mean() > 0.95
