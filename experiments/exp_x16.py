# -*- coding: utf-8 -*-
"""
Stride-16 ("X16") table prototype for the MXU detect kernel.

The production kernel is bytes-bound: it streams the (K, sblk) Hankel
operand from HBM at the measured ~360-410 GB/s DMA ceiling (11 MB/step,
~29 us) serialized with the ~17.5 us matmul, and the operand has 16x
internal redundancy (consecutive rows are 1-sample shifts). Since every
tile base is already 16-aligned, the unique content is the stride-16
table X16[o, a, u] = onsets_log[o, fsmp + 16 a + u]: 16x smaller in HBM,
and a per-step slice is only ~0.7 MB (rows a0..a0+A_o per onset, A_o =
r_o / 16). The full operand A'[k, t] is rebuilt in VMEM with STATIC
lane-offset copies (b in 0..15), which Mosaic vectorises on the VPU --
off the DMA engine entirely.

Two operand layouts:
- ``x16a``: rows ordered [(b), (o, a)] with each b-section padded to a
  16-row boundary (K' = 16 * round_up(sum A_o, 16)); 32 big static
  copies per step; matmul K grows ~14%.
- ``x16b``: rows ordered [(o), (b), (a)] (K' = K exactly, no matmul
  growth); 768 small static copies per step (compile-time risk).
- ``ref``:  the production slice-DMA kernel in the same harness, for a
  checksum cross-check (accumulation-order drift only).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_x16.py
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


def _x16_kernel(base16_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref,
                lo_ref, max_ref, arg_ref, sum_ref, stage, a_op, onehot,
                sems, *, a_counts, n_onsets, tile, n_tiles, sblk,
                n_sblocks, layout):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * n_sblocks + j
    slot = jax.lax.rem(step, jnp.int32(2))

    a_off = [0]
    for a in a_counts:
        a_off.append(a_off[-1] + a)
    a_sum = a_off[-1]                      # total X16 rows per slice
    a_sec = _round_up(a_sum, 16)           # x16a section stride

    if layout == "x16a":
        def k_row(o, b, a):
            return b * a_sec + a_off[o] + a
        K = 16 * a_sec
    else:
        k_off = [0]
        for a in a_counts:
            k_off.append(k_off[-1] + 16 * a)

        def k_row(o, b, a):
            return k_off[o] + b * a_counts[o] + a
        K = k_off[-1]

    # Per-step DMA: the per-onset stride-16 rows (a0..a0+A_o) of the
    # sample window [col0, col0 + sblk + 128) -- ~0.7 MB total.
    def slice_dmas(local_row, col0, into_slot):
        for o in range(n_onsets):
            row0 = base16_ref[0, local_row, o]
            for half, table in enumerate((hi_ref, lo_ref)):
                yield pltpu.make_async_copy(
                    table.at[o, pl.ds(row0, a_counts[o]),
                             pl.ds(col0, sblk + LANE)],
                    stage.at[into_slot, half,
                             pl.ds(a_off[o], a_counts[o]), :],
                    sems.at[into_slot, half, o],
                )

    @pl.when(step == 0)
    def _():
        # Dead operand rows (section padding) are never written again;
        # zero them once so onehot's zero entries multiply finite values.
        a_op[...] = jnp.zeros(a_op.shape, a_op.dtype)
        for dma in slice_dmas(0, 0, 0):
            dma.start()

    last_j = j == n_sblocks - 1
    next_row = jnp.where(last_j, 1, 0)
    next_col = pl.multiple_of(jnp.where(last_j, 0, (j + 1) * sblk), LANE)

    @pl.when(jnp.logical_or(jnp.logical_not(last_j), i + 1 < n_tiles))
    def _():
        for dma in slice_dmas(next_row, next_col, 1 - slot):
            dma.start()

    # One-hot selector, built once per tile (j == 0):
    # onehot[k_row(o, b, a), n] = (fine[o, n] == 16 a + b).
    runs = []  # (first_onset, count, A)
    for o, r in enumerate(a_counts):
        if runs and runs[-1][2] == r:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, r])

    @pl.when(j == 0)
    def _():
        for b in range(16):
            for o0, count, A in runs:
                residues = 16 * jax.lax.broadcasted_iota(
                    jnp.int32, (count, A, tile), 1
                ) + b
                block = (
                    fine_ref[0, o0:o0 + count, :][:, None, :] == residues
                ).astype(jnp.bfloat16)
                if layout == "x16a":
                    # rows k_row(o0..o0+count, b, 0..A) are contiguous
                    onehot[
                        b * a_sec + a_off[o0]:
                        b * a_sec + a_off[o0] + count * A, :
                    ] = block.reshape(count * A, tile)
                else:
                    for c in range(count):
                        onehot[
                            k_row(o0 + c, b, 0):k_row(o0 + c, b, A), :
                        ] = block[c]

    for dma in slice_dmas(0, pl.multiple_of(j * sblk, LANE), slot):
        dma.wait()

    # Rebuild the (K, sblk) operand from the staged stride-16 rows with
    # STATIC lane-offset slices: A'[k_row(o, b, a), t] = stage[row, b+t].
    for half in range(2):
        if layout == "x16a":
            for b in range(16):
                a_op[half, b * a_sec:b * a_sec + a_sum, :] = (
                    stage[slot, half, 0:a_sum, b:b + sblk]
                )
        else:
            for o in range(n_onsets):
                for b in range(16):
                    a_op[
                        half, k_row(o, b, 0):k_row(o, b, a_counts[o]), :
                    ] = stage[
                        slot, half, a_off[o]:a_off[o] + a_counts[o],
                        b:b + sblk,
                    ]

    contract_k = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        onehot[...], a_op[0],
        dimension_numbers=contract_k, preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        onehot[...], a_op[1],
        dimension_numbers=contract_k, preferred_element_type=jnp.float32,
    )
    coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
    max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
    arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
    sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "layout"))
def run_x16(onsets, mask, available, fine_t, base, valid, perm, fsmp,
            nsamples, tile, r_spans, sblk, layout):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    a_counts = tuple(r // 16 for r in r_spans)

    base16 = base // 16
    padded = jnp.pad(base16, ((0, 1), (0, 0)))
    base_pairs = jnp.stack([padded[:-1], padded[1:]], axis=1)

    # X16 table [O, A_glob, U]: X16[o, a, u] = onsets_log[o, fsmp+16a+u].
    table, d_max = _build_shift_table(onsets_log, fsmp, nsamples)
    del table  # only d_max is needed; the X16 gather replaces it
    d_pad = _round_up(d_max + 1 + max(r_spans), 16)
    a_glob = d_pad // 16
    U = s_pad + 2 * LANE
    t_need = fsmp + 16 * (a_glob - 1) + U
    x = jnp.pad(onsets_log, ((0, 0), (0, max(0, t_need - onsets_log.shape[-1]))))
    idx = (fsmp + 16 * jnp.arange(a_glob)[:, None]
           + jnp.arange(U)[None, :])
    x16 = x[:, idx]  # (O, a_glob, U)
    hi_exact = jax.lax.reduce_precision(x16, exponent_bits=8, mantissa_bits=7)
    hi = hi_exact.astype(jnp.bfloat16)
    lo = (x16 - hi_exact).astype(jnp.bfloat16)

    a_sum = sum(a_counts)
    if layout == "x16a":
        K = 16 * _round_up(a_sum, 16)
    else:
        K = 16 * a_sum

    kern = partial(
        _x16_kernel, a_counts=a_counts, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, layout=layout,
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
            pltpu.VMEM((2, 2, a_sum, sblk + LANE), jnp.bfloat16),
            pltpu.VMEM((2, K, sblk), jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2, n_onsets)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(
        base_pairs, jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main():
    from experiments.exp_dma_probe import run_probe

    n_onsets, fsmp, nsamples = 24, 500, 30_000
    dims, tt, onsets = workload(nsamples)
    mask = np.ones(n_onsets, dtype=np.float32)
    units = int(np.prod(dims)) * n_onsets * nsamples

    k = PallasDetectMXU(tt, dims, fsmp, nsamples, tile=512,
                        brick_shape=(8, 8, 8), sblk=2048)
    p = k.plan
    n_steps = p.base.shape[0] * (_round_up(nsamples, 2048) // 2048)
    args = (onsets, mask, float(n_onsets), k.fine_t, p.base, p.valid, p.perm)
    print(f"tile=512 sblk=2048 K={sum(k.r_spans)} n_steps={n_steps}")

    ref = None
    cases = [("ref", None)] + [("x16", lay) for lay in ("x16a", "x16b")]
    for name, layout in cases:
        kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                  r_spans=k.r_spans, sblk=2048)
        fn = run_probe if name == "ref" else run_x16
        if name == "ref":
            kw["mode"] = "static2"  # unused label; replaced below
        try:
            if name == "ref":
                # production-identical slice-DMA path via the deep probe
                from experiments.exp_kernel_breakdown import run_deep
                fn = run_deep
                kw.pop("mode")
                kw["n_slots"] = 2
            else:
                kw["layout"] = layout
            chk = float(np.asarray(fn(*args, **kw)))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(*args, **kw))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            if ref is None:
                ref = chk
            drift = abs(chk - ref) / abs(ref)
            label = layout or name
            print(
                f"{label:8s} {dt * 1e3:6.0f} ms  {units / dt / 1e9:5.0f} G/s"
                f"  {dt / n_steps * 1e6:5.1f} us/step  drift={drift:.2e}"
            )
        except Exception as err:
            print(f"{layout or name:8s} FAIL "
                  f"{type(err).__name__}: {str(err)[:200]}")


if __name__ == "__main__":
    main()
