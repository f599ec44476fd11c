# -*- coding: utf-8 -*-
"""
MXU dot layout microbench inside a Pallas kernel (persistent scratch,
many grid steps) -- isolates the one-hot matmul's throughput question.

exp_x16g's "onlymain" ablation showed the production-shaped dot pair
(onehot (K, M=tile) contracted with A (K, N=sblk) on dim 0 of BOTH
operands) sustains only ~145 TFLOP/s (~37% of v5e bf16 peak) -- so the
detect step was always matmul-bound and every DMA probe was chasing a
hidden cost. Candidates:

- kk:   lhs (K, M) dim0 x rhs (K, N) dim0   (production layout)
- mk:   lhs (M, K) dim1 x rhs (K, N) dim0   (standard row-major feed)
- kk1:  kk but ONE dot with N doubled (hi|lo concat along N)
- mk1:  mk with N doubled
- kkT:  kk with lhs transposed in-kernel each step then mk dot

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_dot_layout.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(seed_ref, out_ref, lhs, rhs, *, mode, K, M, N, two):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # Non-trivial fill so nothing folds; values small (no overflow).
        if mode in ("kk", "kk1", "kkT"):
            lhs[...] = (jax.lax.broadcasted_iota(
                jnp.int32, (K, M), 1) % 7).astype(jnp.bfloat16) * 0.125
        else:
            lhs[...] = (jax.lax.broadcasted_iota(
                jnp.int32, (M, K), 1) % 7).astype(jnp.bfloat16) * 0.125
        rhs[...] = (jax.lax.broadcasted_iota(
            jnp.int32, rhs.shape, 1) % 5).astype(jnp.bfloat16) * 0.25

    dim_kk = (((0,), (0,)), ((), ()))
    dim_mk = (((1,), (0,)), ((), ()))
    nb = N * (2 if two else 1)
    if mode == "kkT":
        lt = lhs[...].T
        acc = jax.lax.dot_general(
            lt, rhs[...], dimension_numbers=dim_mk,
            preferred_element_type=jnp.float32,
        )
    elif mode in ("kk", "kk1"):
        acc = jax.lax.dot_general(
            lhs[...], rhs[...], dimension_numbers=dim_kk,
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.dot_general(
            lhs[...], rhs[...], dimension_numbers=dim_mk,
            preferred_element_type=jnp.float32,
        )
    if not two:
        acc2 = jax.lax.dot_general(
            lhs[...],
            rhs[...] * jnp.bfloat16(0.5),
            dimension_numbers=dim_kk if mode in ("kk", "kk1") else dim_mk,
            preferred_element_type=jnp.float32,
        ) if mode != "kkT" else acc
        if mode != "kkT":
            acc = acc + acc2
        out_ref[0] = jnp.sum(acc, axis=0, keepdims=True)[:, 0:N]
    else:
        out_ref[0] = jnp.sum(
            acc[:, 0:N] + acc[:, N:2 * N], axis=0, keepdims=True
        )


@partial(jax.jit, static_argnames=("mode", "K", "M", "N", "two", "steps"))
def run(seed, mode, K, M, N, two, steps):
    kern = partial(_kern, mode=mode, K=K, M=M, N=N, two=two)
    lhs_shape = (K, M) if mode in ("kk", "kk1", "kkT") else (M, K)
    rhs_shape = (K, N * (2 if two else 1))
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((1,), lambda t: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((steps, 1, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(lhs_shape, jnp.bfloat16),
            pltpu.VMEM(rhs_shape, jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
        ),
    )(seed)
    return out.sum()


def main():
    steps = 4096
    seed = jnp.zeros(1, jnp.int32)
    for mode, two in (("kk", False), ("kk1", True), ("mk", False),
                      ("mk1", True), ("kkT", False)):
        for K, M, N in ((1536, 512, 2048), (1344, 512, 2048),
                        (1536, 1024, 2048)):
            try:
                run(seed, mode, K, M, N, two, steps)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run(seed, mode, K, M, N, two, steps))
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                ndots = 1 if mode == "kkT" else 2
                fl = ndots * 2 * K * M * N * (2 if two else 1) / (
                    1 if not two else 2
                )
                # two=True folds both "halves" into one dot of width 2N:
                # total FLOPs identical to two=False's pair.
                fl = 2 * 2 * K * M * N if mode != "kkT" else 2 * K * M * N
                tf = fl * steps / dt / 1e12
                print(f"{mode:4s} K={K} M={M} N={N}: "
                      f"{dt / steps * 1e6:6.2f} us/step  {tf:6.0f} TFLOP/s")
            except Exception as err:
                print(f"{mode:4s} K={K} M={M} N={N}: FAIL "
                      f"{type(err).__name__} {str(err)[:120]}")


if __name__ == "__main__":
    main()
