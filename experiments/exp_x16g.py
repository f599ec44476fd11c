# -*- coding: utf-8 -*-
"""
Stride-16 table + G-select-matmul ("X16G") prototype for the MXU detect
kernel.

Probes established (exp_dma_probe / exp_x16 / performance.md):
- the production step is bytes-bound: ~29 us of table-slice DMA at the
  ~360 GB/s engine ceiling, serialized with a ~17.5 us matmul already
  at ~82% of bf16 peak;
- Mosaic DMA granularity on v5e: row offset/count/dst-offset must all
  be multiples of 16 (bf16), so per-onset sub-16-row copies of a
  stride-16 table are uncompilable;
- dynamic *sublane* offsets are uncompilable anywhere (VPU reads,
  rolls), but STATIC sublane/lane offsets of any value are legal.

Design that uses only proven-legal constructs:
- HBM holds the stride-16 table X16[(o, a), u] = log_onsets[o, fsmp +
  16 a + u] (hi/lo bf16 halves), 16x smaller than the full Hankel
  table. One (O*a_pad, W) DMA per sample block stages ALL coarse rows
  (offset 0 -- granularity-trivial).
- Grid is (n_sblocks, n_tiles) -- sample block OUTER -- so each staged
  block is reused by every tile and the DMA amortizes to ~nothing.
- Per step, a tiny one-hot "coarse select" matmul G = C @ stage picks
  each onset's A_o = r_o/16 coarse rows at its (dynamic) base16 row:
  the dynamic offset lives in C's one-hot columns, not in a slice.
- The Hankel operand is re-expanded from G with STATIC lane-offset
  copies (a_op[(b, m), t] = G[m, b + t]), or -- variant "x16gm" -- not
  materialized at all: 16 fused matmuls against lane-shifted G views.
- The main one-hot matmul / exp / reduce are unchanged from the
  production kernel (ops/pallas_migrate.py).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_x16g.py
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


def _x16g_kernel(want_ref, inv_avail_ref, fine_ref, valid_ref, hi_ref,
                 lo_ref, max_ref, arg_ref, sum_ref, stage, csel, g_buf,
                 a_op, onehot, sems, *, a_counts, a_pad, n_onsets, tile,
                 n_tiles, sblk, n_sblocks, fuse, aligned, ablate):
    j = pl.program_id(0)   # sample block (MAJOR: staged table reused by
    i = pl.program_id(1)   # every node tile before the block advances)
    slot = jax.lax.rem(j, jnp.int32(2))

    a_off = [0]
    for a in a_counts:
        a_off.append(a_off[-1] + a)
    a_sum = a_off[-1]
    m_pad = _round_up(a_sum, 16)
    R = n_onsets * a_pad
    W = sblk + 2 * LANE

    runs = []  # (first_onset, count, A)
    for o, a in enumerate(a_counts):
        if runs and runs[-1][2] == a:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, a])

    def block_dmas(jj, into_slot):
        col0 = pl.multiple_of(jj * sblk, LANE)
        for half, table in enumerate((hi_ref, lo_ref)):
            yield pltpu.make_async_copy(
                table.at[:, pl.ds(col0, W)],
                stage.at[into_slot, half],
                sems.at[into_slot, half],
            )

    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _():
        for dma in block_dmas(0, 0):
            dma.start()

    @pl.when(i == 0)
    def _():
        for dma in block_dmas(j, slot):
            dma.wait()

    @pl.when(jnp.logical_and(i == 0, j + 1 < n_sblocks))
    def _():
        for dma in block_dmas(j + 1, 1 - slot):
            dma.start()

    # Coarse selector C[m=(o, q), r=(o', a)] = (r == want[m]) where
    # want[m] = o*a_pad + base16[i, o] + q is precomputed per tile on
    # the XLA side (padding rows carry -1 so they build as all-zero and
    # G's padding rows read as zero). Built per step (i is minor).
    contract_k = (((0,), (0,)), ((), ()))
    contract_m = (((1,), (0,)), ((), ()))
    if ablate not in ("nosel", "onlymain"):
        cols = jax.lax.broadcasted_iota(jnp.int32, (m_pad, R), 1)
        csel[...] = (cols == want_ref[0]).astype(jnp.bfloat16)
        for half in range(2):
            g = jax.lax.dot_general(
                csel[...], stage[slot, half],
                dimension_numbers=contract_m,
                preferred_element_type=jnp.float32,
            )
            g_buf[half] = g.astype(jnp.bfloat16)

    # One-hot selector rows (b, m=(o, q)): onehot[b*sec + a_off[o] + q,
    # n] = (fine[o, n] == 16 q + b). With ``aligned``, each b-section is
    # padded to the 16-row sublane tile (zero rows zeroed once at step
    # 0) so every section write/copy is tiling-aligned.
    sec = m_pad if (fuse or aligned) else a_sum

    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _():
        if sec != a_sum:
            for b in range(16):
                onehot[b * sec + a_sum:(b + 1) * sec, :] = jnp.zeros(
                    (sec - a_sum, tile), jnp.bfloat16
                )
                if not fuse:
                    a_op[0, b * sec + a_sum:(b + 1) * sec, :] = jnp.zeros(
                        (sec - a_sum, sblk), jnp.bfloat16
                    )
                    a_op[1, b * sec + a_sum:(b + 1) * sec, :] = jnp.zeros(
                        (sec - a_sum, sblk), jnp.bfloat16
                    )

    if ablate not in ("noonehot", "onlymain"):
        for b in range(16):
            for o0, count, a_count in runs:
                residues = 16 * jax.lax.broadcasted_iota(
                    jnp.int32, (count, a_count, tile), 1
                ) + b
                block = (
                    fine_ref[0, o0:o0 + count, :][:, None, :] == residues
                ).astype(jnp.bfloat16)
                onehot[
                    b * sec + a_off[o0]:
                    b * sec + a_off[o0] + count * a_count, :
                ] = block.reshape(count * a_count, tile)

    if fuse:
        # No operand materialization: 16 K=m_pad matmuls against
        # lane-shifted G views (zero onehot rows x zero G rows for the
        # padding). K-work = 16*m_pad vs 16*a_sum (+~14%), minus the
        # 11 MB VPU expansion.
        acc = jnp.zeros((tile, sblk), jnp.float32)
        for b in range(16):
            for half in range(2):
                acc = acc + jax.lax.dot_general(
                    onehot[b * sec:(b + 1) * sec, :],
                    g_buf[half, :, b:b + sblk],
                    dimension_numbers=contract_k,
                    preferred_element_type=jnp.float32,
                )
    else:
        # Expand G -> (16*sec, sblk) Hankel operand with static
        # lane-offset copies, then the production-shaped main matmul.
        if ablate not in ("noexp", "onlymain"):
            for half in range(2):
                for b in range(16):
                    a_op[half, b * sec:b * sec + a_sum, :] = (
                        g_buf[half, 0:a_sum, b:b + sblk]
                    )
        if ablate == "nomain":
            acc = jnp.zeros((tile, sblk), jnp.float32) + a_op[
                0, 0:1, 0:sblk
            ].astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(
                onehot[...], a_op[0],
                dimension_numbers=contract_k,
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                onehot[...], a_op[1],
                dimension_numbers=contract_k,
                preferred_element_type=jnp.float32,
            )

    if ablate == "noreduce":
        max_ref[0] = acc[0:1, :]
        arg_ref[0] = acc[1:2, :].astype(jnp.int32)
        sum_ref[0] = acc[2:3, :]
    else:
        coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
        max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
        arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
        sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("fsmp", "nsamples", "tile", "r_spans",
                                   "sblk", "fuse", "aligned", "ablate"))
def run_x16g(onsets, mask, available, fine_t, base, valid, perm, fsmp,
             nsamples, tile, r_spans, sblk, fuse=False, aligned=False,
             ablate="full"):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    a_counts = tuple(r // 16 for r in r_spans)
    a_sum = sum(a_counts)
    m_pad = _round_up(a_sum, 16)
    K = 16 * (m_pad if (fuse or aligned) else a_sum)
    W = sblk + 2 * LANE
    U = s_pad + 2 * LANE

    # Coarse-row capacity: cover every base16 + A_o (same bound as the
    # production d_pad), rounded to the 16-row DMA granularity.
    table, d_max = _build_shift_table(onsets_log, fsmp, nsamples)
    del table
    d_pad = _round_up(d_max + 1 + max(r_spans), 16)
    a_pad = _round_up(d_pad // 16, 16)

    t_need = fsmp + 16 * (a_pad - 1) + U
    x = jnp.pad(
        onsets_log, ((0, 0), (0, max(0, t_need - onsets_log.shape[-1])))
    )
    idx = 16 * jnp.arange(a_pad)[:, None] + jnp.arange(U)[None, :]
    x16 = x[:, fsmp + idx].reshape(n_onsets * a_pad, U)
    hi_exact = jax.lax.reduce_precision(x16, exponent_bits=8,
                                        mantissa_bits=7)
    hi = hi_exact.astype(jnp.bfloat16)
    lo = (x16 - hi_exact).astype(jnp.bfloat16)

    # Per-tile C-selector targets: want[i, m=(o, q)] = o*a_pad +
    # base16[i, o] + q; -1 on the m_pad padding rows (matches nothing).
    o_of_m = np.repeat(np.arange(n_onsets), a_counts)
    q_of_m = np.concatenate([np.arange(a) for a in a_counts])
    want = jnp.full((n_tiles, m_pad, 1), -1, jnp.int32)
    want = want.at[:, :a_sum, 0].set(
        o_of_m[None, :] * a_pad + (base // 16)[:, o_of_m] + q_of_m[None, :]
    )

    kern = partial(
        _x16g_kernel, a_counts=a_counts, a_pad=a_pad, n_onsets=n_onsets,
        tile=tile, n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks,
        fuse=fuse, aligned=aligned, ablate=ablate,
    )
    R = n_onsets * a_pad
    tmax, targ, tsum = pl.pallas_call(
        kern,
        grid=(n_sblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, m_pad, 1), lambda j, i: (i, 0, 0)),
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
            pltpu.VMEM((2, 2, R, W), jnp.bfloat16),
            pltpu.VMEM((m_pad, R), jnp.bfloat16),
            pltpu.VMEM((2, m_pad, W), jnp.bfloat16),
            pltpu.VMEM((1, 1, 1) if fuse else (2, K, sblk), jnp.bfloat16),
            pltpu.VMEM((K, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
        ),
    )(
        want,
        jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t, valid, hi, lo,
    )
    return tmax.sum() + tsum.sum() + targ.sum().astype(jnp.float32)


def main():
    from experiments.exp_kernel_breakdown import run_deep

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
    cases = [
        ("onlymain", {"aligned": True, "ablate": "onlymain"}),
        ("nomain", {"aligned": True, "ablate": "nomain"}),
        ("noreduce", {"aligned": True, "ablate": "noreduce"}),
    ]
    for name, extra in cases:
        kw = dict(fsmp=fsmp, nsamples=nsamples, tile=p.tile,
                  r_spans=k.r_spans, sblk=2048, **extra)
        if name == "ref":
            fn = run_deep
            kw.pop("fuse", None)
            kw["n_slots"] = 2
        else:
            fn = run_x16g
        try:
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
            print(
                f"{name:8s} {dt * 1e3:6.0f} ms  {units / dt / 1e9:5.0f} G/s"
                f"  {dt / n_steps * 1e6:5.1f} us/step  drift={drift:.2e}"
            )
        except Exception as err:
            print(f"{name:8s} FAIL "
                  f"{type(err).__name__}: {str(err)[:200]}")


if __name__ == "__main__":
    main()
