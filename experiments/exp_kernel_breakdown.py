# -*- coding: utf-8 -*-
"""
Ablation cost breakdown of the MXU detect kernel on hardware.

Times kernel variants with pieces removed (exp, argmax, the whole
post-matmul reduce, the matmul itself) at the day-scale Icequake window
(tile=512 / sblk=2048, the production config) to attribute the measured
~56 us/grid-step. Also times a candidate optimisation: fusing the hi/lo
bf16 half matmuls into ONE K=2*span contraction (fills the MXU's K=128
systolic depth in a single pass instead of two half-depth passes).

Each variant keeps the DMAs and every earlier stage live (outputs depend
on the last remaining stage) so Mosaic cannot dead-code the work away.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_kernel_breakdown.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quakemigrate_tpu.ops.migrate import _build_shift_table, _prepare_onsets
from quakemigrate_tpu.ops.pallas_migrate import (
    LANE,
    PallasDetectMXU,
    _round_up,
)
from experiments.exp_vmem_sweep import workload


def _kernel(base_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref, lo_ref,
            max_ref, arg_ref, sum_ref, a_slots, onehot, sems, *, r_spans,
            n_onsets, tile, n_tiles, sblk, n_sblocks, ablate):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * n_sblocks + j
    slot = jax.lax.rem(step, jnp.int32(2))

    k_off = [0]
    for r in r_spans:
        k_off.append(k_off[-1] + r)

    def slice_dmas(local_row, col0, into_slot):
        for o in range(n_onsets):
            row0 = pl.multiple_of(base_ref[0, local_row, o], 16)
            for half, table in enumerate((hi_ref, lo_ref)):
                yield pltpu.make_async_copy(
                    table.at[o, pl.ds(row0, r_spans[o]), pl.ds(col0, sblk)],
                    a_slots.at[
                        into_slot, half, pl.ds(k_off[o], r_spans[o]), :
                    ],
                    sems.at[into_slot, half, o],
                )

    @pl.when(step == 0)
    def _():
        for dma in slice_dmas(0, 0, 0):
            dma.start()

    last_j = j == n_sblocks - 1
    next_row = jnp.where(last_j, 1, 0)
    next_col = pl.multiple_of(jnp.where(last_j, 0, (j + 1) * sblk), LANE)

    @pl.when(jnp.logical_or(jnp.logical_not(last_j), i + 1 < n_tiles))
    def _():
        for dma in slice_dmas(next_row, next_col, 1 - slot):
            dma.start()

    runs = []
    for o, r in enumerate(r_spans):
        if runs and runs[-1][2] == r:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, r])

    dup = 2 if ablate == "k128" else 1

    @pl.when(j == 0)
    def _():
        K = sum(r_spans)
        for rep in range(dup):
            for o0, count, r in runs:
                residues = jax.lax.broadcasted_iota(
                    jnp.int32, (count, r, tile), 1
                )
                block = (
                    fine_ref[0, o0:o0 + count, :][:, None, :] == residues
                ).astype(jnp.bfloat16)
                onehot[
                    rep * K + k_off[o0]: rep * K + k_off[o0] + count * r, :
                ] = block.reshape(count * r, tile)

    cur_col = pl.multiple_of(j * sblk, LANE)
    for dma in slice_dmas(0, cur_col, slot):
        dma.wait()

    if ablate == "nomatmul":
        # DMA + onehot stay live through a cheap row copy; no MXU work.
        row = a_slots[slot, 0][0:1, :].astype(jnp.float32)
        max_ref[0] = row + onehot[0:1, 0:1]
        arg_ref[0] = jnp.zeros((1, sblk), jnp.int32)
        sum_ref[0] = row
        return

    contract_k = (((0,), (0,)), ((), ()))
    if ablate == "k128":
        a_full = a_slots[slot].reshape(2 * sum(r_spans), sblk)
        acc = jax.lax.dot_general(
            onehot[...], a_full, dimension_numbers=contract_k,
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.dot_general(
            onehot[...], a_slots[slot, 0],
            dimension_numbers=contract_k, preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            onehot[...], a_slots[slot, 1],
            dimension_numbers=contract_k, preferred_element_type=jnp.float32,
        )

    if ablate == "noreduce":
        # matmul stays live; skip exp/mask and all cross-node reductions.
        max_ref[0] = acc[0:1]
        arg_ref[0] = jnp.zeros((1, sblk), jnp.int32)
        sum_ref[0] = acc[1:2]
        return

    if ablate == "noexp":
        coa = (acc * inv_avail_ref[0]) * valid_ref[0]
    else:
        coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]

    if ablate == "noargmax":
        arg_ref[0] = jnp.zeros((1, sblk), jnp.int32)
    else:
        arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
    max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
    sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "ablate"))
def run_variant(onsets, mask, available, fine_t, base, valid, perm, fsmp,
                nsamples, tile, r_spans, sblk, ablate):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    padded = jnp.pad(base, ((0, 1), (0, 0)))
    base_pairs = jnp.stack([padded[:-1], padded[1:]], axis=1)
    table, d_max = _build_shift_table(onsets_log, fsmp, nsamples)
    d_pad = _round_up(d_max + 1 + max(r_spans), 16)
    table = jnp.pad(
        table,
        ((0, 0), (0, d_pad - (d_max + 1)), (0, s_pad - nsamples)),
    )
    hi_exact = jax.lax.reduce_precision(
        table, exponent_bits=8, mantissa_bits=7
    )
    hi = hi_exact.astype(jnp.bfloat16)
    lo = (table - hi_exact).astype(jnp.bfloat16)

    K = sum(r_spans) * (2 if ablate == "k128" else 1)
    kern = partial(
        _kernel, r_spans=r_spans, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, ablate=ablate,
    )
    tmax, targ, tsum = pl.pallas_call(
        kern,
        grid=(n_tiles, n_sblocks),
        in_specs=[
            pl.BlockSpec((1, 2, n_onsets), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_onsets, tile), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, sum(r_spans), sblk), jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2, n_onsets)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(
        base_pairs, jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    # Reduce on device: fetching the raw (n_tiles, s_pad) outputs over
    # the tunnel relay costs ~2 s and would swamp the ablation signal.
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main():
    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples

    k = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                        brick_shape=(8, 8, 8), sblk=2048)
    p = k.plan
    n_steps = p.base.shape[0] * (_round_up(nsamples, 2048) // 2048)
    print(f"tile=512 sblk=2048 span={k.r_spans[0]} n_steps={n_steps}")

    base = None
    for ablate in ("full", "k128", "noargmax", "noexp", "noreduce",
                   "nomatmul"):
        args = (onsets, mask, float(n_onsets), k.fine_t, p.base, p.valid,
            p.perm)
        kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                  r_spans=k.r_spans, sblk=2048, ablate=ablate)
        try:
            np.asarray(run_variant(*args, **kw))  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run_variant(*args, **kw))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            if ablate == "full":
                base = dt
            delta = "" if base is None or ablate == "full" else (
                f"  ({(base - dt) * 1e3:+.0f} ms vs full)"
            )
            print(
                f"{ablate:10s} {dt * 1e3:6.0f} ms  "
                f"{units / dt / 1e9:5.0f} G/s  "
                f"{dt / n_steps * 1e6:5.1f} us/step{delta}"
            )
        except Exception as err:
            print(f"{ablate:10s} FAIL {type(err).__name__}: {str(err)[:150]}")


# ---------------------------------------------------------------------------
# Resident-table prototype: sample-block OUTER, whole-D column block parked
# in VMEM once per sweep (~66 MB streamed per sweep vs ~12.6 MB PER STEP in
# the production kernel), node tiles slice it in VMEM. Two operand
# strategies: "stage" copies the span slices into one contiguous (K, C)
# scratch then runs 2 big matmuls; "direct" feeds 48 small K=span matmuls.
# ---------------------------------------------------------------------------


def _resident_kernel(base_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref,
                     lo_ref, max_ref, arg_ref, sum_ref, ablock, a_cur,
                     onehot, sems, *, r_spans, n_onsets, tile, n_tiles,
                     sblk, n_sblocks, strategy):
    j = pl.program_id(0)  # sample block (outer)
    i = pl.program_id(1)  # node tile (inner sweep)

    k_off = [0]
    for r in r_spans:
        k_off.append(k_off[-1] + r)

    col0 = pl.multiple_of(j * sblk, LANE)

    def block_dmas():
        for o in range(n_onsets):
            for half, table in enumerate((hi_ref, lo_ref)):
                yield pltpu.make_async_copy(
                    table.at[o, :, pl.ds(col0, sblk)],
                    ablock.at[o, half],
                    sems.at[half, o],
                )

    # Single-buffered whole-D column block: fetched at the start of each
    # sweep (i == 0). The serial grid guarantees no tile of sweep j-1
    # still reads the buffer. Stall is ~one 66 MB fetch per 576-step
    # sweep -- negligible.
    @pl.when(i == 0)
    def _():
        for dma in block_dmas():
            dma.start()
        for dma in block_dmas():
            dma.wait()

    runs = []
    for o, r in enumerate(r_spans):
        if runs and runs[-1][2] == r:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, r])

    # onehot depends on the tile -> rebuilt every step in this layout.
    for o0, count, r in runs:
        residues = jax.lax.broadcasted_iota(jnp.int32, (count, r, tile), 1)
        block = (
            fine_ref[0, o0:o0 + count, :][:, None, :] == residues
        ).astype(jnp.bfloat16)
        onehot[k_off[o0]:k_off[o0] + count * r, :] = block.reshape(
            count * r, tile
        )

    contract_k = (((0,), (0,)), ((), ()))
    if strategy == "stage":
        for half in range(2):
            for o in range(n_onsets):
                row0 = pl.multiple_of(base_ref[0, 0, o], 16)
                a_cur[half, k_off[o]:k_off[o] + r_spans[o], :] = ablock[
                    o, half, pl.ds(row0, r_spans[o]), :
                ]
        acc = jax.lax.dot_general(
            onehot[...], a_cur[0], dimension_numbers=contract_k,
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            onehot[...], a_cur[1], dimension_numbers=contract_k,
            preferred_element_type=jnp.float32,
        )
    else:  # direct: per-onset K=span matmuls accumulated
        acc = None
        for half in range(2):
            for o in range(n_onsets):
                row0 = pl.multiple_of(base_ref[0, 0, o], 16)
                part = jax.lax.dot_general(
                    onehot[k_off[o]:k_off[o] + r_spans[o], :],
                    ablock[o, half, pl.ds(row0, r_spans[o]), :],
                    dimension_numbers=contract_k,
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part

    coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
    max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
    arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
    sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "strategy"))
def run_resident(onsets, mask, available, fine_t, base, valid, perm, fsmp,
                 nsamples, tile, r_spans, sblk, strategy):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    table, d_max = _build_shift_table(onsets_log, fsmp, nsamples)
    d_pad = _round_up(d_max + 1 + max(r_spans), 16)
    table = jnp.pad(
        table,
        ((0, 0), (0, d_pad - (d_max + 1)), (0, s_pad - nsamples)),
    )
    hi_exact = jax.lax.reduce_precision(
        table, exponent_bits=8, mantissa_bits=7
    )
    hi = hi_exact.astype(jnp.bfloat16)
    lo = (table - hi_exact).astype(jnp.bfloat16)

    K = sum(r_spans)
    kern = partial(
        _resident_kernel, r_spans=r_spans, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, strategy=strategy,
    )
    tmax, targ, tsum = pl.pallas_call(
        kern,
        grid=(n_sblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_onsets), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda j, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_onsets, tile), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda j, i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sblk), lambda j, i: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda j, i: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda j, i: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_onsets, 2, d_pad, sblk), jnp.bfloat16),
            pltpu.VMEM((2, K, sblk), jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_onsets)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(
        base[:, None, :],
        jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main_resident():
    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples

    for tile, brick in ((512, (8, 8, 8)), (1024, (16, 8, 8))):
        k = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=tile,
                            brick_shape=brick, sblk=2048)
        p = k.plan
        for sblk in (1024, 512):
            n_steps = p.base.shape[0] * (_round_up(nsamples, sblk) // sblk)
            for strategy in ("stage", "direct"):
                args = (onsets, mask, float(n_onsets), k.fine_t, p.base,
                        p.valid, p.perm)
                kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                          r_spans=k.r_spans, sblk=sblk, strategy=strategy)
                try:
                    np.asarray(run_resident(*args, **kw))
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(run_resident(*args, **kw))
                        times.append(time.perf_counter() - t0)
                    dt = min(times)
                    print(
                        f"resident tile={tile} sblk={sblk} K={sum(k.r_spans)} "
                        f"{strategy:6s} {dt * 1e3:6.0f} ms "
                        f"{units / dt / 1e9:5.0f} G/s "
                        f"{dt / n_steps * 1e6:5.1f} us/step"
                    )
                except Exception as err:
                    print(
                        f"resident tile={tile} sblk={sblk} {strategy:6s} "
                        f"FAIL {type(err).__name__}: {str(err)[:140]}"
                    )





# ---------------------------------------------------------------------------
# Deep-prefetch variant: the production kernel single-buffers the NEXT
# step's table slices, and issues them only after the PREVIOUS wait
# completed -- so the DMA engine idles during every compute phase and the
# step period is DMA + compute (measured additive: 33.2 + 17.4 = 49.6
# us). With S slots and issue-depth S-1, batch T+S-1 is queued at step T
# and the engine never starves: period -> max(DMA, compute).
# ---------------------------------------------------------------------------


def _deep_kernel(base_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref,
                 lo_ref, max_ref, arg_ref, sum_ref, a_slots, onehot, sems,
                 *, r_spans, n_onsets, tile, n_tiles, sblk, n_sblocks,
                 n_slots, align=True):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * n_sblocks + j
    n_total = n_tiles * n_sblocks
    slot = jax.lax.rem(step, jnp.int32(n_slots))

    k_off = [0]
    for r in r_spans:
        k_off.append(k_off[-1] + r)

    def slice_dmas(local_row, col0, into_slot):
        for o in range(n_onsets):
            row0 = base_ref[0, local_row, o]
            if align:
                row0 = pl.multiple_of(row0, 16)
            for half, table in enumerate((hi_ref, lo_ref)):
                yield pltpu.make_async_copy(
                    table.at[o, pl.ds(row0, r_spans[o]), pl.ds(col0, sblk)],
                    a_slots.at[
                        into_slot, half, pl.ds(k_off[o], r_spans[o]), :
                    ],
                    sems.at[into_slot, half, o],
                )

    # Prologue: batches 0 .. n_slots-2 (batch n_slots-1 comes from the
    # steady-state rule below at step 0). Static indices.
    @pl.when(step == 0)
    def _():
        for b in range(min(n_slots - 1, n_total)):
            i2, j2 = b // n_sblocks, b % n_sblocks
            for dma in slice_dmas(i2, j2 * sblk, b % n_slots):
                dma.start()

    # Steady state: issue batch step + n_slots - 1 BEFORE waiting on the
    # current batch, so the engine queue always holds n_slots-1 batches.
    t2 = step + n_slots - 1
    i2 = jax.lax.div(t2, jnp.int32(n_sblocks))
    j2 = t2 - i2 * n_sblocks
    local_row = i2 - i
    col2 = pl.multiple_of(j2 * sblk, LANE)

    @pl.when(t2 < n_total)
    def _():
        for dma in slice_dmas(
            local_row, col2, jax.lax.rem(t2, jnp.int32(n_slots))
        ):
            dma.start()

    runs = []
    for o, r in enumerate(r_spans):
        if runs and runs[-1][2] == r:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, r])

    @pl.when(j == 0)
    def _():
        for o0, count, r in runs:
            residues = jax.lax.broadcasted_iota(
                jnp.int32, (count, r, tile), 1
            )
            block = (
                fine_ref[0, o0:o0 + count, :][:, None, :] == residues
            ).astype(jnp.bfloat16)
            onehot[k_off[o0]:k_off[o0] + count * r, :] = block.reshape(
                count * r, tile
            )

    for dma in slice_dmas(0, pl.multiple_of(j * sblk, LANE), slot):
        dma.wait()

    contract_k = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        onehot[...], a_slots[slot, 0],
        dimension_numbers=contract_k, preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        onehot[...], a_slots[slot, 1],
        dimension_numbers=contract_k, preferred_element_type=jnp.float32,
    )
    coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
    max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
    arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
    sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "n_slots", "align"))
def run_deep(onsets, mask, available, fine_t, base, valid, perm, fsmp,
             nsamples, tile, r_spans, sblk, n_slots, align=True):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    # Row windows [i .. i + n_slots - 1] per tile so any batch within the
    # issue depth can cross tile boundaries.
    depth = n_slots
    padded = jnp.pad(base, ((0, depth - 1), (0, 0)))
    base_rows = jnp.stack(
        [padded[d: d + n_tiles] for d in range(depth)], axis=1
    )  # (n_tiles, depth, O)
    table, d_max = _build_shift_table(onsets_log, fsmp, nsamples)
    d_pad = _round_up(d_max + 1 + max(r_spans), 16)
    table = jnp.pad(
        table,
        ((0, 0), (0, d_pad - (d_max + 1)), (0, s_pad - nsamples)),
    )
    hi_exact = jax.lax.reduce_precision(
        table, exponent_bits=8, mantissa_bits=7
    )
    hi = hi_exact.astype(jnp.bfloat16)
    lo = (table - hi_exact).astype(jnp.bfloat16)

    K = sum(r_spans)
    kern = partial(
        _deep_kernel, r_spans=r_spans, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, n_slots=n_slots,
        align=align,
    )
    tmax, targ, tsum = pl.pallas_call(
        kern,
        grid=(n_tiles, n_sblocks),
        in_specs=[
            pl.BlockSpec((1, depth, n_onsets), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_onsets, tile), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, sblk), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 2, K, sblk), jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((n_slots, 2, n_onsets)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(
        base_rows, jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main_deep():
    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples

    k = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                        brick_shape=(8, 8, 8), sblk=2048)
    p = k.plan
    for sblk in (2048, 1024):
        n_steps = p.base.shape[0] * (_round_up(nsamples, sblk) // sblk)
        for n_slots in (2, 3, 4, 5):
            args = (onsets, mask, float(n_onsets), k.fine_t, p.base,
                    p.valid, p.perm)
            kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                      r_spans=k.r_spans, sblk=sblk, n_slots=n_slots)
            try:
                np.asarray(run_deep(*args, **kw))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run_deep(*args, **kw))
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                print(
                    f"deep tile=512 sblk={sblk} slots={n_slots} "
                    f"{dt * 1e3:6.0f} ms {units / dt / 1e9:5.0f} G/s "
                    f"{dt / n_steps * 1e6:5.1f} us/step"
                )
            except Exception as err:
                print(
                    f"deep tile=512 sblk={sblk} slots={n_slots} FAIL "
                    f"{type(err).__name__}: {str(err)[:140]}"
                )





def main_pspan():
    """Per-onset spans (aligned + unaligned bases) vs the uniform span."""

    from quakemigrate_tpu.ops.pallas_migrate import PallasDetectPlan

    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples
    tile, sblk = 512, 2048

    plan = PallasDetectPlan(tt, dims, tile=tile, brick_shape=(8, 8, 8),
                            vpu_fine=False)
    fine = plan._fine_raw  # (n_tiles, tile, O)
    base_raw = plan.base.astype(np.int32)
    n_tiles = plan.n_tiles

    def spans_of(fine_t):
        return tuple(
            max(16, _round_up(int(fine_t[:, o, :].max()) + 1, 16))
            for o in range(n_onsets)
        )

    rem = base_raw % 16
    base_al = (base_raw - rem).astype(np.int32)
    fine_al = np.ascontiguousarray(
        fine.transpose(0, 2, 1) + rem[:, :, None]
    ).astype(np.int32)
    fine_un = np.ascontiguousarray(fine.transpose(0, 2, 1)).astype(np.int32)

    cases = [
        ("uniform-al", base_al, fine_al,
         (max(spans_of(fine_al)),) * n_onsets, True),
        ("per-onset-al", base_al, fine_al, spans_of(fine_al), True),
        ("per-onset-un", base_raw, fine_un, spans_of(fine_un), False),
    ]
    ref = None
    for name, base, fine_t, r_spans, align in cases:
        args = (onsets, mask, float(n_onsets), fine_t, base, plan.valid,
                plan.perm)
        kw = dict(fsmp=fsmp, nsamples=nsamples, tile=tile,
                  r_spans=r_spans, sblk=sblk, n_slots=3, align=align)
        n_steps = n_tiles * (_round_up(nsamples, sblk) // sblk)
        try:
            chk = float(np.asarray(run_deep(*args, **kw)))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run_deep(*args, **kw))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            if ref is None:
                ref = chk
            drift = abs(chk - ref) / abs(ref)
            print(
                f"{name:14s} K={sum(r_spans):4d} {dt * 1e3:6.0f} ms "
                f"{units / dt / 1e9:5.0f} G/s {dt / n_steps * 1e6:5.1f} "
                f"us/step  checksum-drift={drift:.2e}"
            )
        except Exception as err:
            print(f"{name:14s} K={sum(r_spans):4d} FAIL "
                  f"{type(err).__name__}: {str(err)[:140]}")


if __name__ == "__main__":
    import sys
    if "--resident" in sys.argv:
        main_resident()
    elif "--deep" in sys.argv:
        main_deep()
    elif "--pspan" in sys.argv:
        main_pspan()
    else:
        main()
