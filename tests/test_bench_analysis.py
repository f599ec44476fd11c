# -*- coding: utf-8 -*-
"""
Unit tests for bench.py's measurement arithmetic: the pipelined
marginal-cost timing (chains of N and 2N dispatches, differenced) and
the MFU/bound analysis fields, incl. the device-side variants added for
the pipelined regime. These test the protocol logic host-side -- the
on-hardware values are produced by running bench.py itself.

"""

import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_bench_pipelined_recovers_marginal_cost(monkeypatch):
    """A fixed fetch latency must not leak into the per-step estimate."""

    per_step = 0.004
    fixed = 0.040

    # Fake clock: real time.sleep on a loaded CI host overshoots by more
    # than the estimate tolerance (review finding) -- advance a virtual
    # monotonic clock deterministically instead.
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])

    def run_dispatch(_block):
        clock["t"] += per_step
        return "handle"

    def fetch(handle):
        assert handle == "handle"
        clock["t"] += fixed

    est = bench.bench_pipelined(run_dispatch, ["b"], fetch, steps=6, reps=1)
    # Naive total/steps over the short chain would give
    # per_step + fixed/6 ~ 0.0107; the differenced estimate must recover
    # the exact marginal cost under the deterministic clock.
    assert abs(est - per_step) < 1e-12


def test_bench_pipelined_returns_none_on_nonpositive_difference(monkeypatch):
    """Noise making chain(2N) <= chain(N) must yield None, not ~0 (which
    would fabricate absurd device throughput downstream)."""

    # Clock that makes every chain take the SAME total time regardless of
    # length: difference is exactly zero on both tries.
    times = iter([0.0, 1.0] * 8)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))

    est = bench.bench_pipelined(
        lambda b: b, ["x"], lambda h: None, steps=4, reps=1
    )
    assert est is None


def test_bench_pipelined_cycles_blocks_and_is_positive(monkeypatch):
    calls = []
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])

    def run_dispatch(block):
        calls.append(block)
        clock["t"] += 0.001
        return block

    est = bench.bench_pipelined(
        run_dispatch, ["a", "b", "c"], lambda h: None, steps=3, reps=1
    )
    # One chain of 3 and one of 6, cycling the block list.
    assert calls == ["a", "b", "c", "a", "b", "c", "a", "b", "c"]
    assert est > 0


def _fake_kernel(tile=256, n_tiles=4, r_spans=(8, 8, 8), sblk=128,
                 precision="i8x3"):
    plan = types.SimpleNamespace(
        tile=tile, base=np.zeros((n_tiles, len(r_spans)), dtype=np.int32)
    )
    return types.SimpleNamespace(
        precision=precision, plan=plan, r_spans=list(r_spans), sblk=sblk
    )


def test_mxu_analysis_fields_and_device_variant():
    k = _fake_kernel()
    n_nodes, n_onsets, nsamples = 1000, 3, 100

    base = bench.mxu_analysis(k, n_nodes, n_onsets, nsamples, elapsed=0.05)
    for field in ("precision", "k_rows", "useful_fraction", "mfu",
                  "useful_mfu", "dma_gb", "matmul_floor_seconds",
                  "dma_floor_seconds", "bound", "headroom_vs_floor"):
        assert field in base
    assert "device_seconds" not in base
    assert base["k_rows"] == 24
    assert base["bound"] in ("mxu", "dma")

    dev = bench.mxu_analysis(
        k, n_nodes, n_onsets, nsamples, elapsed=0.05, device_elapsed=0.01
    )
    assert dev["device_seconds"] == 0.01
    # Same MAC count over 5x less time -> 5x the MFU (to rounding).
    assert abs(dev["device_mfu"] - 5 * dev["mfu"]) < 0.01
    assert dev["device_headroom_vs_floor"] < dev["headroom_vs_floor"]


def test_mxu_analysis_floor_consistency():
    """headroom == elapsed / max(floor); bound names the larger floor."""

    k = _fake_kernel(tile=1024, n_tiles=64, r_spans=(64,) * 24,
                     sblk=2048, precision="bf16hl")
    out = bench.mxu_analysis(k, 500000, 24, 2048, elapsed=1.0)
    floor = max(out["matmul_floor_seconds"], out["dma_floor_seconds"])
    # Floors are rounded to 4 decimals in the report; compare ratios to
    # the matching precision.
    assert abs(out["headroom_vs_floor"] - 1.0 / floor) / (1.0 / floor) < 0.02
    expected = ("mxu" if out["matmul_floor_seconds"]
                >= out["dma_floor_seconds"] else "dma")
    assert out["bound"] == expected


def test_parity_gate_tie_consistency():
    """The argmax contract is tie-consistency, not node identity: a
    reduced-precision kernel may report a far-away node whose true f64
    coalescence is within tolerance of the max (near-ties on random
    onsets are not spatial neighbours), but a node whose true value is
    materially below the max must fail the gate."""

    n = 16
    ref_coa = np.full(n, 2.0)
    ref_idx = np.zeros(n, dtype=np.int64)

    got_idx = np.full(n, 5000, dtype=np.int32)  # far from node 0
    out = (ref_coa * (1 + 5e-5), np.ones(n), got_idx)

    def kernel_fn(_):
        return out

    # Chosen nodes are true ties (within 1e-4 of the max) -> pass
    gate = bench.parity_gate(
        kernel_fn, np.zeros((2, 4), np.float32), ref_coa, ref_idx,
        ref_value_at=lambda idx, t: ref_coa * (1 - 1e-4),
    )
    assert gate["parity_ok"]
    assert gate["parity_worst_argmax_node_dist"] > 1
    assert gate["parity_argmax_tie_rel_err"] < 5e-4

    # Chosen nodes sit 1% below the true max -> fail
    gate = bench.parity_gate(
        kernel_fn, np.zeros((2, 4), np.float32), ref_coa, ref_idx,
        ref_value_at=lambda idx, t: ref_coa * 0.99,
    )
    assert not gate["parity_ok"]

    # Without ref_value_at the strict <=1-node rule applies -> fail here
    gate = bench.parity_gate(
        kernel_fn, np.zeros((2, 4), np.float32), ref_coa, ref_idx,
    )
    assert not gate["parity_ok"]
