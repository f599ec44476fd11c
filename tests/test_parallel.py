# -*- coding: utf-8 -*-
"""
Sharded-execution tests on the virtual 8-device CPU mesh: the mesh-sharded
fused migrate+reduce must reproduce the single-device results exactly,
including first-index argmax tie-breaking across shard boundaries.

"""

import jax
import numpy as np
import pytest

from quakemigrate_tpu.ops.migrate import migrate_detect
from quakemigrate_tpu.parallel import (
    make_mesh,
    make_sharded_detect,
    pad_nodes_for_mesh,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    n_onsets, t_samples, fsmp, lsmp = 6, 150, 12, 40
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples))
    n_nodes = 1000  # deliberately not divisible by 8 shards
    tt = rng.integers(0, 35, size=(n_nodes, n_onsets)).astype(np.int32)
    nsamples = t_samples - fsmp - lsmp
    return onsets, tt, fsmp, nsamples


def test_sharded_matches_single_device(problem):
    onsets, tt, fsmp, nsamples = problem
    n_onsets = onsets.shape[0]
    mask = np.ones(n_onsets)

    ref = [
        np.asarray(x)
        for x in migrate_detect(
            onsets, tt, mask, float(n_onsets), fsmp, nsamples, tile=64
        )
    ]

    mesh = make_mesh(jax.devices())
    tt_padded, n_real = pad_nodes_for_mesh(tt, mesh.shape["grid"], tile=64)
    fn = make_sharded_detect(mesh, fsmp, nsamples, n_real, tile=64)
    out = [np.asarray(x) for x in fn(onsets, tt_padded, mask, float(n_onsets))]

    np.testing.assert_allclose(out[0], ref[0], rtol=1e-13)
    np.testing.assert_allclose(out[1], ref[1], rtol=1e-13)
    np.testing.assert_array_equal(out[2], ref[2])


def test_sharded_tie_breaking_across_shards(problem):
    """Duplicate traveltime rows force exact ties in different shards."""

    onsets, tt, fsmp, nsamples = problem
    n_onsets = onsets.shape[0]
    mask = np.ones(n_onsets)
    tt = tt.copy()
    tt[900] = tt[50]  # identical coalescence at nodes 50 and 900

    mesh = make_mesh(jax.devices())
    tt_padded, n_real = pad_nodes_for_mesh(tt, mesh.shape["grid"], tile=64)
    fn = make_sharded_detect(mesh, fsmp, nsamples, n_real, tile=64)
    out_idx = np.asarray(fn(onsets, tt_padded, mask, float(n_onsets))[2])

    ref_idx = np.asarray(
        migrate_detect(onsets, tt, mask, float(n_onsets), fsmp, nsamples,
                       tile=64)[2]
    )
    np.testing.assert_array_equal(out_idx, ref_idx)
    assert not np.any(out_idx == 900)  # ties must resolve to the first index


def test_batched_sharded(problem):
    """2-D mesh: batch of scan windows x grid shards."""

    onsets, tt, fsmp, nsamples = problem
    n_onsets = onsets.shape[0]
    rng = np.random.default_rng(5)
    batch = np.stack([onsets, rng.gamma(2.0, 1.5, onsets.shape)])
    masks = np.ones((2, n_onsets))
    masks[1, -1] = 0.0
    avail = masks.sum(axis=1)

    mesh = make_mesh(jax.devices(), axis_names=("batch", "grid"), shape=(2, 4))
    tt_padded, n_real = pad_nodes_for_mesh(tt, 4, tile=64)
    fn = make_sharded_detect(
        mesh, fsmp, nsamples, n_real, tile=64, batch_axis="batch"
    )
    out = [np.asarray(x) for x in fn(batch, tt_padded, masks, avail)]

    for b in range(2):
        ref = [
            np.asarray(x)
            for x in migrate_detect(
                batch[b], tt, masks[b], avail[b], fsmp, nsamples, tile=64
            )
        ]
        np.testing.assert_allclose(out[0][b], ref[0], rtol=1e-13)
        np.testing.assert_allclose(out[1][b], ref[1], rtol=1e-13)
        np.testing.assert_array_equal(out[2][b], ref[2])
