# -*- coding: utf-8 -*-
"""
Kernel-level parity tests: the JAX STA/LTA and migration ops against (a)
hand-computed analytic expectations (mirroring the reference's own unit
tests, tests/test_onsets.py) and (b) the reference C kernels compiled as a
float64 oracle at test time.

"""

import numpy as np
import pytest

from quakemigrate_tpu.ops.stalta import (
    centred_sta_lta,
    overlapping_sta_lta,
    recursive_sta_lta,
)
from quakemigrate_tpu.ops.migrate import migrate_detect, migrate_map, find_max_coa

from oracle import (
    load_oracle,
    oracle_find_max_coa,
    oracle_migrate,
    oracle_sta_lta,
)

needs_oracle = pytest.mark.skipif(
    load_oracle() is None, reason="reference C oracle unavailable"
)


class TestSTALTAAnalytic:
    """Tiny analytic cases, same spirit as the reference unit tests."""

    signal = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])

    def test_overlapping_ramp(self):
        onset = np.asarray(overlapping_sta_lta(self.signal, 2, 4))
        # i < nlta-1 -> 1; i=3: sta=(2+3)/2, lta=(0+1+2+3)/4 -> 5/3
        expected = np.array([1.0, 1.0, 1.0, 5 / 3, 7 / 5, 9 / 7])
        np.testing.assert_allclose(onset, expected, rtol=1e-12)

    def test_centred_ramp(self):
        onset = np.asarray(centred_sta_lta(self.signal, 2, 3))
        # i=2: lta=(0+1+2)/3=1, sta=(3+4)/2=3.5 -> 3.5
        # i=3: lta=(1+2+3)/3=2, sta=(4+5)/2=4.5 -> 2.25; last nsta=2 -> 1
        expected = np.array([1.0, 1.0, 3.5, 2.25, 1.0, 1.0])
        np.testing.assert_allclose(onset, expected, rtol=1e-12)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(0)
        batch = rng.gamma(1.0, 1.0, size=(4, 100))
        stacked = np.asarray(overlapping_sta_lta(batch, 5, 20))
        for i in range(4):
            single = np.asarray(overlapping_sta_lta(batch[i], 5, 20))
            np.testing.assert_allclose(stacked[i], single, rtol=1e-12)


@needs_oracle
class TestSTALTAOracle:
    def _compare(self, fn, position, nsta, nlta, n=2000, rtol=1e-10):
        rng = np.random.default_rng(42)
        signal = rng.gamma(1.0, 2.0, size=n)  # positive, like energy traces
        ours = np.asarray(fn(signal, nsta, nlta), dtype=np.float64)
        ref = oracle_sta_lta(signal, nsta, nlta, position)
        np.testing.assert_allclose(ours, ref, rtol=rtol, atol=1e-12)

    def test_overlapping(self):
        self._compare(overlapping_sta_lta, "overlapping", 3, 63)

    def test_overlapping_long_windows(self):
        self._compare(overlapping_sta_lta, "overlapping", 50, 250)

    def test_centred(self):
        self._compare(centred_sta_lta, "centred", 5, 125)

    def test_recursive(self):
        self._compare(recursive_sta_lta, "recursive", 5, 125, rtol=1e-9)


def _random_problem(seed=7, nx=5, ny=4, nz=3, n_onsets=8, t_samples=120,
                    fsmp=10, lsmp=30, max_tt=28):
    # Contract (mirrors real scan geometry): tt + fsmp + nsamples <= T, i.e.
    # max_tt <= lsmp -- guaranteed in the pipeline by post_pad >= max
    # traveltime (reference stalta.py:626-635).
    rng = np.random.default_rng(seed)
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples))
    tt4d = rng.integers(0, max_tt, size=(nx, ny, nz, n_onsets)).astype(np.int32)
    return onsets, tt4d, fsmp, lsmp


class TestMigrateOracle:
    @needs_oracle
    def test_migrate_map_parity(self):
        onsets, tt4d, fsmp, lsmp = _random_problem()
        n_onsets = onsets.shape[0]
        ref = oracle_migrate(onsets, tt4d, fsmp, lsmp, n_onsets)
        nsamples = ref.shape[-1]

        tt_flat = tt4d.reshape(-1, n_onsets)
        mask = np.ones(n_onsets)
        ours = np.asarray(
            migrate_map(onsets, tt_flat, mask, float(n_onsets), fsmp,
                        nsamples, tile=16)
        )
        np.testing.assert_allclose(
            ours, ref.reshape(-1, nsamples), rtol=1e-12, atol=0
        )

    @needs_oracle
    def test_detect_parity(self):
        onsets, tt4d, fsmp, lsmp = _random_problem(seed=11)
        n_onsets = onsets.shape[0]
        ref_map = oracle_migrate(onsets, tt4d, fsmp, lsmp, n_onsets)
        ref_max, ref_norm, ref_idx = oracle_find_max_coa(ref_map)
        nsamples = ref_map.shape[-1]

        tt_flat = tt4d.reshape(-1, n_onsets)
        mask = np.ones(n_onsets)
        mx, norm, idx = migrate_detect(
            onsets, tt_flat, mask, float(n_onsets), fsmp, nsamples, tile=16
        )
        np.testing.assert_allclose(np.asarray(mx), ref_max, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(norm), ref_norm, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    @needs_oracle
    def test_negative_traveltimes_clamped(self):
        onsets, tt4d, fsmp, lsmp = _random_problem(seed=3)
        tt4d[0, 0, 0, :] = -5  # reference clamps to 0 (migratelib.c:55)
        n_onsets = onsets.shape[0]
        ref = oracle_migrate(onsets, tt4d, fsmp, lsmp, n_onsets)
        ours = np.asarray(
            migrate_map(
                onsets, tt4d.reshape(-1, n_onsets), np.ones(n_onsets),
                float(n_onsets), fsmp, ref.shape[-1], tile=16,
            )
        )
        np.testing.assert_allclose(ours, ref.reshape(ours.shape), rtol=1e-12)

    def test_masked_padding_equivalent_to_subset(self):
        """Padding onsets with mask=0 must match running on the subset."""

        onsets, tt4d, fsmp, lsmp = _random_problem(seed=5)
        n_onsets = onsets.shape[0]
        nsamples = onsets.shape[1] - fsmp - lsmp
        tt_flat = tt4d.reshape(-1, n_onsets)

        live = 5
        mask = np.zeros(n_onsets)
        mask[:live] = 1.0
        full = np.asarray(
            migrate_detect(onsets, tt_flat, mask, float(live), fsmp, nsamples, tile=16)
        )
        subset = np.asarray(
            migrate_detect(
                onsets[:live], tt_flat[:, :live], np.ones(live), float(live),
                fsmp, nsamples, tile=16,
            )
        )
        for a, b in zip(full, subset):
            np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_find_max_coa_first_index_ties(self):
        m = np.ones((10, 4))
        m[3, 2] = m[7, 2] = 5.0  # tie: first index (3) must win
        _, _, idx = find_max_coa(m)
        assert np.asarray(idx)[2] == 3

    def test_detect_matches_map_reduction(self):
        onsets, tt4d, fsmp, lsmp = _random_problem(seed=13)
        n_onsets = onsets.shape[0]
        nsamples = onsets.shape[1] - fsmp - lsmp
        tt_flat = tt4d.reshape(-1, n_onsets)
        mask = np.ones(n_onsets)
        mx, norm, idx = migrate_detect(
            onsets, tt_flat, mask, float(n_onsets), fsmp, nsamples, tile=16
        )
        mp = migrate_map(onsets, tt_flat, mask, float(n_onsets), fsmp, nsamples,
                         tile=16)
        mx2, norm2, idx2 = find_max_coa(mp)
        np.testing.assert_allclose(np.asarray(mx), np.asarray(mx2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(norm), np.asarray(norm2), rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


class TestKurtosis:
    def test_rolling_kurtosis_matches_scipy(self):
        from scipy.stats import kurtosis as sp_kurtosis

        from quakemigrate_tpu.ops.kurtosis import rolling_kurtosis

        rng = np.random.default_rng(0)
        x = rng.normal(size=300)
        n = 50
        ours = np.asarray(rolling_kurtosis(x, n))
        for i in (49, 150, 299):
            expected = sp_kurtosis(x[i - n + 1 : i + 1], fisher=True, bias=True)
            np.testing.assert_allclose(ours[i], expected, rtol=1e-9)

    def test_onset_peaks_at_impulsive_arrival(self):
        from quakemigrate_tpu.ops.kurtosis import kurtosis_onset

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1.0, 2000)
        x[1200:1260] += np.sin(np.arange(60)) * 20  # impulsive arrival
        onset = np.asarray(kurtosis_onset(x, 101, 5))
        assert onset.min() >= 1.0 - 1e-9
        peak_region = onset[1190:1270]
        noise_region = np.concatenate([onset[200:1100], onset[1400:1900]])
        assert peak_region.max() > 10 * np.median(noise_region)
        assert 1190 <= 1190 + np.argmax(peak_region) <= 1270


@needs_oracle
def test_dynamic_stalta_mixed_windows_oracle():
    """Per-row window lengths in one batch vs the reference C kernels."""

    from quakemigrate_tpu.ops.scan_window import _sta_lta_dynamic

    rng = np.random.default_rng(17)
    signal = rng.gamma(1.0, 2.0, size=(4, 800))
    nsta = np.array([3, 6, 11, 26], dtype=np.int32)
    nlta = np.array([63, 26, 51, 126], dtype=np.int32)

    for position in ("classic", "centred"):
        ours = np.asarray(
            _sta_lta_dynamic(signal, nsta, nlta, position), dtype=np.float64
        )
        oracle_name = "overlapping" if position == "classic" else "centred"
        for r in range(4):
            ref = oracle_sta_lta(
                signal[r], int(nsta[r]), int(nlta[r]), oracle_name
            )
            np.testing.assert_allclose(
                ours[r], ref, rtol=1e-9, atol=1e-12,
                err_msg=f"{position} row {r}",
            )


def test_pack_detect_window_roundtrip_large_indices():
    """Bitcast packing must be lossless for indices beyond 2^24 (where a
    value cast to float32 would corrupt node indices on large grids)."""

    from quakemigrate_tpu.ops.scan_window import (
        pack_detect_window,
        unpack_detect_window,
    )

    rng = np.random.default_rng(9)
    for dtype in (np.float32, np.float64):
        mx = rng.gamma(2.0, 1.5, 64).astype(dtype)
        norm = rng.gamma(2.0, 1.5, 64).astype(dtype)
        idx = np.concatenate([
            np.array([0, 1, 2**24 + 1, 2**30 - 3, 10**9], dtype=np.int32),
            rng.integers(0, 2**30, 59).astype(np.int32),
        ])[:64]
        packed = pack_detect_window(mx, norm, idx)
        mx2, norm2, idx2 = unpack_detect_window(packed)
        np.testing.assert_array_equal(np.asarray(mx2, dtype=dtype), mx)
        np.testing.assert_array_equal(np.asarray(norm2, dtype=dtype), norm)
        np.testing.assert_array_equal(idx2, idx)
