# -*- coding: utf-8 -*-
"""
Unit tests for the catalogue-scale harness's recovery accounting
(tools/catalogue_scale.py): planted-cluster construction and the
cluster-granular trigger association that explains any
triggered-vs-planted shortfall (reference signal/trigger.py
_refine_candidates / min_event_interval merge semantics).

"""

import sys
from pathlib import Path

import numpy as np

TOOLS = Path(__file__).resolve().parents[1] / "tools"
sys.path.insert(0, str(TOOLS))

import catalogue_scale as cs  # noqa: E402


def test_planted_clusters_separable_plants():
    planted = [(t, 2.0, 0.5) for t in (100.0, 400.0, 900.0)]
    clusters = cs.planted_clusters(planted)
    assert clusters == [(100.0, 100.0, 1), (400.0, 400.0, 1),
                        (900.0, 900.0, 1)]


def test_planted_clusters_interval_merge():
    # Two wide, high plants 3 s apart must be allowed to merge (their
    # above-threshold runs overlap within min_event_interval), while a
    # distant third stays separate.
    planted = [(100.0, 9.0, 2.0), (103.0, 9.0, 2.0), (600.0, 2.0, 0.5)]
    assert cs.planted_clusters(planted) == [
        (100.0, 103.0, 2), (600.0, 600.0, 1)
    ]


def test_planted_clusters_chain_is_transitive():
    # A chain a-b-c where consecutive gaps merge collapses to ONE
    # cluster even though a and c alone would not merge; pulling the
    # tail clear (~4.3 s half-width at amp 9 / sigma 2, so 20 s is
    # decisively separable) splits it.
    planted = [(100.0, 9.0, 2.0), (104.0, 9.0, 2.0), (108.0, 9.0, 2.0)]
    assert cs.planted_clusters(planted) == [(100.0, 108.0, 3)]
    assert cs.planted_clusters([planted[0], (120.0, 9.0, 2.0)]) == [
        (100.0, 100.0, 1), (120.0, 120.0, 1)
    ]


def test_match_full_recall_and_precision():
    planted = [(100.0, 3.0, 1.0), (500.0, 5.0, 1.5), (900.0, 2.0, 0.6)]
    trig_s = np.array([100.4, 499.0, 900.0])
    coa = np.array([3.1, 5.2, 2.1])
    stats = cs.match_triggers(planted, trig_s, coa)
    assert stats["recall"] == 1.0
    assert stats["plant_recall"] == 1.0
    assert stats["precision"] == 1.0
    assert stats["false_triggers"] == 0
    assert stats["missed_origin_seconds"] == []
    assert stats["false_trigger_coa_max"] is None


def test_match_misses_and_false_positives():
    planted = [(100.0, 3.0, 1.0), (500.0, 5.0, 1.5)]
    # One good match, one trigger nowhere near a plant, one plant unseen.
    trig_s = np.array([100.0, 300.0])
    coa = np.array([3.0, 9.9])
    stats = cs.match_triggers(planted, trig_s, coa)
    assert stats["clusters_recovered"] == 1
    assert stats["recall"] == 0.5
    assert stats["false_triggers"] == 1
    assert stats["precision"] == 0.5
    assert stats["missed_origin_seconds"] == [500.0]
    assert stats["false_trigger_coa_max"] == 9.9


def test_match_merged_pair_counts_once_at_strongest_peak():
    # Two plants 8 s apart whose runs bridge: ONE trigger at the
    # stronger plant's peak recovers the whole cluster — including the
    # weaker plant sitting outside the +-5 s point tolerance, the case
    # plant-level matching wrongly scored as a miss.
    planted = [(100.0, 9.0, 2.0), (108.0, 4.0, 2.0)]
    assert cs.planted_clusters(planted) == [(100.0, 108.0, 2)]
    stats = cs.match_triggers(planted, np.array([100.2]), np.array([9.1]))
    assert stats["recall"] == 1.0
    assert stats["plant_recall"] == 1.0
    assert stats["false_triggers"] == 0


def test_match_split_cluster_keeps_precision():
    # A cluster the bound allows to merge may still trigger twice; both
    # triggers lie inside the cluster span and neither counts false.
    planted = [(100.0, 9.0, 2.0), (108.0, 9.0, 2.0)]
    stats = cs.match_triggers(
        planted, np.array([100.0, 108.0]), np.array([9.0, 9.0])
    )
    assert stats["recall"] == 1.0
    assert stats["false_triggers"] == 0
    assert stats["precision"] == 1.0
