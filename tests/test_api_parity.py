# -*- coding: utf-8 -*-
"""
Reference API-surface parity: every public function, class, method,
property and accepted parameter in the reference package must exist in
this package (tools/api_parity.py; reference surface per SURVEY.md §2.3),
plus behavioural checks of the reference-shaped core bindings
(reference core/lib.py:52-285).

"""

import numpy as np
import pytest

from tools.api_parity import REF_ROOT, audit


@pytest.mark.skipif(not REF_ROOT.is_dir(), reason="reference not present")
def test_api_surface_complete():
    report = audit()
    assert report["reference_items_checked"] > 400
    assert report["missing_count"] == 0, report["missing"]
    assert report["defaults_checked"] > 100
    assert report["default_mismatch_count"] == 0, (
        report["default_mismatches"]
    )


def _brute_force_migrate(onsets, tt, fsmp, nsamples, available):
    """f64 geometric-mean stack, straight from the reference semantics
    (migratelib.c:40-65)."""

    logged = np.log(np.clip(onsets, 0.01, np.inf))
    *grid, n_onsets = tt.shape
    out = np.zeros(tuple(grid) + (nsamples,))
    for idx in np.ndindex(*grid):
        acc = np.zeros(nsamples)
        for o in range(n_onsets):
            shift = max(int(tt[idx + (o,)]), 0) + fsmp
            acc += logged[o, shift:shift + nsamples]
        out[idx] = np.exp(acc / available)
    return out


def test_core_migrate_matches_reference_semantics():
    from quakemigrate_tpu.core import find_max_coa, migrate

    rng = np.random.default_rng(7)
    n_onsets, fsmp, lsmp, nsamples = 6, 8, 12, 30
    t_samples = nsamples + fsmp + lsmp
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples))
    tt = rng.integers(0, lsmp, size=(4, 3, 2, n_onsets))

    map4d = migrate(onsets, tt, fsmp, lsmp, n_onsets, threads=2)
    expected = _brute_force_migrate(onsets, tt, fsmp, nsamples, n_onsets)
    assert map4d.shape == expected.shape
    np.testing.assert_allclose(map4d, expected, rtol=5e-5)

    max_coa, max_norm_coa, max_idx = find_max_coa(map4d, threads=2)
    flat = map4d.reshape(-1, nsamples)
    np.testing.assert_allclose(max_coa, flat.max(axis=0), rtol=1e-6)
    np.testing.assert_allclose(
        max_norm_coa,
        flat.max(axis=0) * flat.shape[0] / flat.sum(axis=0),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(max_idx, flat.argmax(axis=0))
    assert max_idx.dtype == np.int64


def test_core_migrate_validations():
    from quakemigrate_tpu.core import migrate

    onsets = np.ones((3, 50))
    tt_bad = np.zeros((2, 2, 2, 4), dtype=int)  # 4 LUTs vs 3 onsets
    with pytest.raises(ValueError, match="Mismatch"):
        migrate(onsets, tt_bad, 5, 5, 3, 1)


def test_core_stalta_bindings_match_ops():
    from quakemigrate_tpu import core
    from quakemigrate_tpu.ops import stalta as ops

    rng = np.random.default_rng(3)
    sig = rng.normal(size=200) ** 2
    for name in ("overlapping_sta_lta", "centred_sta_lta",
                 "recursive_sta_lta"):
        got = getattr(core, name)(sig, 5, 20)
        want = np.asarray(getattr(ops, name)(sig.astype(np.float32), 5, 20))
        assert got.dtype == np.float64
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stalta_py_backends_exported():
    from quakemigrate_tpu.signal.onsets.stalta import (
        centred_sta_lta_py,
        overlapping_sta_lta_py,
    )

    sig = np.random.default_rng(0).normal(size=64) ** 2
    for fn in (overlapping_sta_lta_py, centred_sta_lta_py):
        out = fn(sig, 4, 16)
        assert out.shape == sig.shape and out.dtype == np.float64


def test_deprecated_stalta_attributes(capsys):
    from quakemigrate_tpu.signal.onsets import STALTAOnset

    onset = STALTAOnset(position="classic", sampling_rate=50)
    onset.onset_centred = True
    assert onset.position == "centred"
    onset.p_bp_filter = [1.0, 8.0, 3]
    onset.s_onset_win = [0.4, 2.0]
    assert onset.bandpass_filters["P"] == [1.0, 8.0, 3]
    assert onset.sta_lta_windows["S"] == [0.4, 2.0]
    assert onset.p_bp_filter == [1.0, 8.0, 3]
    assert onset.s_bp_filter == onset.bandpass_filters["S"]
    assert onset.p_onset_win == onset.sta_lta_windows["P"]
    assert "FutureWarning" in capsys.readouterr().out

    kw = STALTAOnset(sampling_rate=50, onset_centred=False,
                     s_bp_filter=[2.0, 12.0, 2], p_onset_win=[0.1, 0.7])
    assert kw.position == "classic"
    assert kw.bandpass_filters["S"] == [2.0, 12.0, 2]
    assert kw.sta_lta_windows["P"] == [0.1, 0.7]


def test_deprecated_pick_threshold_raises():
    from quakemigrate_tpu.signal.pickers import GaussianPicker

    with pytest.raises(AttributeError, match="deprecated"):
        GaussianPicker(pick_threshold=1.5)
    picker = GaussianPicker()
    assert picker.pick_threshold is None
