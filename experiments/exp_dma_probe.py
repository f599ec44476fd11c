# -*- coding: utf-8 -*-
"""
DMA-floor probes for the MXU detect kernel (day-scale Icequake window).

Background (exp_kernel_breakdown on hardware): the production step is
~46.5 us = 29 us DMA + 17.5 us matmul, EXACTLY additive, and neither
deeper prefetch queues (2..5 slots: no change) nor a VMEM-resident table
(stage: ~par) break the serialization. Three hypotheses, one probe each:

A. ``stream``  -- peak HBM->VMEM rate for big contiguous double-buffered
   copies with no compute. If this is ~380 GB/s (the rate the production
   slice pattern reaches with no compute), the engine itself is the cap
   and perfect overlap would still leave DMA-bound steps.
B. ``static2`` -- the production kernel with the double-buffer slot
   UNROLLED to static indices (two pl.when branches with python-level
   slot constants). If Mosaic fails to prove a_slots[slot] /
   a_slots[1-slot] disjoint for a traced ``slot``, it may serialize the
   in-flight DMA against the matmul; static indices remove the doubt.
C. ``packed``  -- per step ONE contiguous (2K, sblk) DMA instead of 48
   strided slice descriptors (same bytes; source content is junk -- this
   is a TIMING-ONLY probe). If this overlaps where the slices don't, the
   descriptor walk / strided source is what blocks overlap.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_dma_probe.py
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


# ---------------------------------------------------------------- stream --


def _stream_kernel(src_ref, out_ref, buf, sems, *, n_chunks, n_total):
    # The ~25 ms axon dispatch/fetch floor swamps any single-GiB copy, so
    # the grid loops the source many times: t indexes total steps, the
    # source chunk is t mod n_chunks (recomputed cheaply).
    t = pl.program_id(0)
    slot = jax.lax.rem(t, jnp.int32(2))

    def chunk(step):
        return step - jax.lax.div(
            step, jnp.int32(n_chunks)
        ) * jnp.int32(n_chunks)

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(src_ref.at[0], buf.at[0], sems.at[0]).start()

    @pl.when(t + 1 < n_total)
    def _():
        pltpu.make_async_copy(
            src_ref.at[chunk(t + 1)], buf.at[1 - slot], sems.at[1 - slot]
        ).start()

    pltpu.make_async_copy(
        src_ref.at[chunk(t)], buf.at[slot], sems.at[slot]
    ).wait()
    out_ref[0] = buf[slot, 0:8, 0:LANE].astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_chunks", "n_total"))
def run_stream(src, n_chunks, n_total):
    rows, sblk = src.shape[1], src.shape[2]
    out = pl.pallas_call(
        partial(_stream_kernel, n_chunks=n_chunks, n_total=n_total),
        grid=(n_total,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, LANE), lambda t: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 8, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, sblk), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(src)
    return out.sum()


def main_stream():
    for rows in (64, 256, 1024):
        sblk = 2048
        n_chunks = (2 ** 29) // (rows * sblk * 2)
        chunk_bytes = rows * sblk * 2
        n_total = (16 * 2 ** 30) // chunk_bytes
        src = jnp.zeros((n_chunks, rows, sblk), jnp.bfloat16)
        nbytes = n_total * chunk_bytes
        np.asarray(run_stream(src, n_chunks, n_total))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_stream(src, n_chunks, n_total))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"stream rows={rows:5d} {nbytes / 2**20:6.0f} MiB "
            f"{nbytes / dt / 1e9:6.0f} GB/s  {dt / n_total * 1e6:5.1f} us/step"
        )


# ------------------------------------------------------- static2 / packed --


def _probe_kernel(base_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref,
                  lo_ref, max_ref, arg_ref, sum_ref, a0, a1, onehot, sems,
                  *, r_spans, n_onsets, tile, n_tiles, sblk, n_sblocks,
                  mode):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * n_sblocks + j
    parity = jax.lax.rem(step, jnp.int32(2))
    slots = (a0, a1)

    k_off = [0]
    for r in r_spans:
        k_off.append(k_off[-1] + r)
    K = k_off[-1]

    def slice_dmas(local_row, col0, s):
        if mode == "packed":
            # ONE descriptor: contiguous rows of the packed junk table
            # (hi_ref is (2K + 16, S) here). Timing-only.
            row0 = pl.multiple_of(local_row * 16, 16)
            yield pltpu.make_async_copy(
                hi_ref.at[pl.ds(row0, 2 * K), pl.ds(col0, sblk)],
                slots[s].at[:],
                sems.at[s, 0, 0],
            )
            return
        for o in range(n_onsets):
            row0 = pl.multiple_of(base_ref[0, local_row, o], 16)
            for half, table in enumerate((hi_ref, lo_ref)):
                yield pltpu.make_async_copy(
                    table.at[o, pl.ds(row0, r_spans[o]), pl.ds(col0, sblk)],
                    slots[s].at[half, pl.ds(k_off[o], r_spans[o]), :],
                    sems.at[s, half, o],
                )

    @pl.when(step == 0)
    def _():
        for dma in slice_dmas(0, 0, 0):
            dma.start()

    last_j = j == n_sblocks - 1
    next_row = jnp.where(last_j, 1, 0)
    next_col = pl.multiple_of(jnp.where(last_j, 0, (j + 1) * sblk), LANE)
    more = jnp.logical_or(jnp.logical_not(last_j), i + 1 < n_tiles)

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

    cur_col = pl.multiple_of(j * sblk, LANE)
    contract_k = (((0,), (0,)), ((), ()))

    for s in range(2):  # static slot unroll
        @pl.when(parity == s)
        def _(s=s):
            @pl.when(more)
            def _():
                for dma in slice_dmas(next_row, next_col, 1 - s):
                    dma.start()

            for dma in slice_dmas(0, cur_col, s):
                dma.wait()

            if mode == "packed":
                op_hi = slots[s][0:K, :]
                op_lo = slots[s][K:2 * K, :]
            else:
                op_hi = slots[s][0]
                op_lo = slots[s][1]
            acc = jax.lax.dot_general(
                onehot[...], op_hi, dimension_numbers=contract_k,
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                onehot[...], op_lo, dimension_numbers=contract_k,
                preferred_element_type=jnp.float32,
            )
            coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
            max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
            arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(
                jnp.int32
            )
            sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "mode"))
def run_probe(onsets, mask, available, fine_t, base, valid, perm, fsmp,
              nsamples, tile, r_spans, sblk, mode):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    padded = jnp.pad(base, ((0, 1), (0, 0)))
    base_pairs = jnp.stack([padded[:-1], padded[1:]], axis=1)
    K = sum(r_spans)

    if mode == "packed":
        hi = jnp.zeros((2 * K + 16, s_pad), jnp.bfloat16)
        lo = jnp.zeros((1, 1), jnp.bfloat16)
        slot_shape = (2 * K, sblk)
        n_sem = 1
    else:
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
        slot_shape = (2, K, sblk)
        n_sem = n_onsets

    kern = partial(
        _probe_kernel, r_spans=r_spans, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, mode=mode,
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
            pltpu.VMEM(slot_shape, jnp.bfloat16),
            pltpu.VMEM(slot_shape, jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2, n_sem)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(
        base_pairs, jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main_probe():
    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples

    k = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                        brick_shape=(8, 8, 8), sblk=2048)
    p = k.plan
    n_steps = p.base.shape[0] * (_round_up(nsamples, 2048) // 2048)
    for mode in ("static2", "packed"):
        args = (onsets, mask, float(n_onsets), k.fine_t, p.base, p.valid,
                p.perm)
        kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                  r_spans=k.r_spans, sblk=2048, mode=mode)
        try:
            np.asarray(run_probe(*args, **kw))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run_probe(*args, **kw))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(
                f"{mode:8s} {dt * 1e3:6.0f} ms  {units / dt / 1e9:5.0f} G/s"
                f"  {dt / n_steps * 1e6:5.1f} us/step"
            )
        except Exception as err:
            print(f"{mode:8s} FAIL {type(err).__name__}: {str(err)[:150]}")


if __name__ == "__main__":
    import sys
    if "--stream" in sys.argv:
        main_stream()
    else:
        main_probe()
