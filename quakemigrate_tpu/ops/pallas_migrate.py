# -*- coding: utf-8 -*-
"""
Pallas TPU kernel for the fused detect migration.

TPUs have no vectorised gather, so the migration's per-node dynamic-offset
reads are implemented as a *binary shift network* on the VPU: for each
(node-tile, onset) grid step, the onset row is aligned to the tile's
minimum traveltime with one dynamic roll, broadcast across the tile's
sublanes, and then each node's residual shift (tt - tile_min) is applied
bit by bit with log2(R) static roll + select passes. The per-tile
coalescence accumulator lives in VMEM scratch for the whole onset loop and
the per-sample max/argmax/sum grid reduction happens in-register before
anything is written back -- the coalescence map never touches HBM.

To keep the residual shift range R small, the flat node axis is reordered
into spatially compact bricks (nodes close in space have close
traveltimes); the permutation is undone when mapping argmax indices back.

Numerically identical to ops.migrate.migrate_detect except for argmax
tie-breaking on exactly-equal coalescence values (which follows brick order
rather than flat-grid order).

"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .migrate import _prepare_onsets

LANE = 128

# MXU-kernel scratch budget under _mxu_vmem_bytes' accounting. Mosaic's
# default scoped-VMEM limit (16 MiB) is raised per-kernel to
# estimate + 8 MiB via CompilerParams(vmem_limit_bytes), so this budget
# is no longer a compile ceiling -- it caps how much VMEM the config
# selection lets a kernel claim, for performance. Calibrated on v5e
# (experiments/exp_vmem_sweep.py, day-scale 30k-sample window): configs
# up to ~40 MiB estimate are the measured optimum (tile=512/sblk=2048 at
# 432 G/s); pushing to ~60-71 MiB (sblk=4096) compiled fine but measured
# 10-15% SLOWER -- too little VMEM left for DMA overlap.
VMEM_BUDGET = 40 * 2**20

# Fixed-point range of the 3-word int8 table encoding. Log onsets are
# bounded below by the MIN_ONSET_CLIP floor (ln 0.01); the upper bound
# is a generous static cap (an onset function value of 1e9) -- values
# beyond it saturate, mirroring the existing lower clip. The worst-case
# absolute encoding error is s3/2 = (vmax - vmin) / (2 * 254^3) ~
# 7.7e-7 in log domain vs the bf16 hi/lo pair's |v| * 2^-18 (~1.8e-5
# at a typical |log onset| of 4.6): ~20x tighter.
I8_VMIN = float(np.log(1e-2))
I8_VMAX = float(np.log(1e9))


def _i8_terms(n_onsets, n_words=3):
    """Static (scales, constant) of the n-word int8 decomposition."""

    c = 0.5 * (I8_VMIN + I8_VMAX)
    s = (I8_VMAX - I8_VMIN) / 254.0
    scales = []
    for _ in range(n_words):
        scales.append(s)
        s /= 254.0
    return tuple(scales), float(n_onsets) * c


def _encode_i8(table, n_words=3):
    """f32 table -> n int8 words: v ~ c + sum_i scales[i] * w[i]."""

    scales, _ = _i8_terms(1, n_words)
    c = 0.5 * (I8_VMIN + I8_VMAX)
    r = jnp.clip(table, I8_VMIN, I8_VMAX) - c
    words = []
    for s in scales:
        w = jnp.round(r / s)
        r = r - w * s
        words.append(w.astype(jnp.int8))
    return tuple(words)


def _i8_zero_words(n_words=3):
    """The int8 words encoding the value 0.0 (a masked onset's log),
    used as the table pad so padded rows/columns decode to ~0 --
    matching the bf16 path's zero padding instead of decoding to the
    range centre c (which, divided by a small ``available``, could
    overflow exp in the padded sample columns)."""

    scales, _ = _i8_terms(1, n_words)
    c = 0.5 * (I8_VMIN + I8_VMAX)
    r = -c
    words = []
    for s in scales:
        w = round(r / s)
        r = r - w * s
        words.append(int(w))
    return tuple(words)


def _i8_n_words(precision):
    """Word count of an ``i8x<n>`` precision string, or None for bf16."""

    if precision.startswith("i8x"):
        n = int(precision[3:])
        if not 1 <= n <= 4:
            raise ValueError(f"unsupported int8 word count: {precision!r}")
        return n
    return None


def _round_up(x, m):
    return -(-x // m) * m


def _combine_tiles(tmax, targ, tsum, perm, tile, nsamples):
    """
    Cross-tile combine shared by the VPU and MXU kernels: per-sample max
    with FIRST-tile tie-break (argmax), brick-permutation mapping of the
    winning local index back to the flat grid, and the grid sum.
    Returns (max_coa, max_idx, coa_sum).

    """

    tmax = tmax[:, 0, :nsamples]
    targ = targ[:, 0, :nsamples]
    tsum = tsum[:, 0, :nsamples]

    best_tile = jnp.argmax(tmax, axis=0)
    max_coa = jnp.take_along_axis(tmax, best_tile[None, :], axis=0)[0]
    local = jnp.take_along_axis(targ, best_tile[None, :], axis=0)[0]
    perm_idx = best_tile.astype(jnp.int32) * tile + local
    max_idx = jnp.take(perm, perm_idx)
    coa_sum = jnp.sum(tsum, axis=0)
    return max_coa, max_idx, coa_sum


def brick_permutation(node_count, brick_shape):
    """
    Permutation reordering the flat (C-order) node axis into spatially
    compact bricks. Returns (perm, n_padded): ``perm[new] = old`` flat
    index, with -1 marking padding nodes (bricks overhanging the grid).

    """

    node_count = np.asarray(node_count, dtype=int)
    brick_shape = np.asarray(brick_shape, dtype=int)
    n_bricks = -(-node_count // brick_shape)

    # Index grids over the padded volume, brick-major
    bi, bj, bk = [np.arange(n) for n in n_bricks]
    li, lj, lk = [np.arange(b) for b in brick_shape]

    # full index arrays: (Bi, Bj, Bk, bi, bj, bk)
    gi = (bi[:, None, None, None, None, None] * brick_shape[0]
          + li[None, None, None, :, None, None])
    gj = (bj[None, :, None, None, None, None] * brick_shape[1]
          + lj[None, None, None, None, :, None])
    gk = (bk[None, None, :, None, None, None] * brick_shape[2]
          + lk[None, None, None, None, None, :])
    gi, gj, gk = np.broadcast_arrays(gi, gj, gk)

    valid = (gi < node_count[0]) & (gj < node_count[1]) & (gk < node_count[2])
    flat = (gi * node_count[1] + gj) * node_count[2] + gk
    perm = np.where(valid, flat, -1).ravel()

    return perm.astype(np.int64), perm.size


class PallasDetectPlan:
    """
    Precomputed per-run state for the Pallas detect kernel: brick-permuted
    fine traveltimes, per-(tile, onset) base shifts, validity mask and the
    inverse permutation for argmax mapping.

    """

    def __init__(self, traveltimes, node_count, tile=512,
                 brick_shape=(8, 8, 8), vpu_fine=True):
        traveltimes = np.asarray(traveltimes)
        n_nodes, n_onsets = traveltimes.shape
        assert int(np.prod(node_count)) == n_nodes

        perm, n_padded = brick_permutation(node_count, brick_shape)
        n_padded = _round_up(n_padded, tile)
        if perm.size < n_padded:
            perm = np.concatenate(
                [perm, np.full(n_padded - perm.size, -1, dtype=perm.dtype)]
            )

        tt_perm = np.zeros((n_padded, n_onsets), dtype=np.int32)
        live = perm >= 0
        tt_perm[live] = np.maximum(traveltimes[perm[live]], 0)

        n_tiles = n_padded // tile
        tt_tiles = tt_perm.reshape(n_tiles, tile, n_onsets)
        live_tiles = live.reshape(n_tiles, tile)
        # Base shift from REAL nodes only; padding rows take the base (fine
        # shift 0) so they never widen the per-tile shift range.
        masked = np.where(live_tiles[..., None], tt_tiles, np.iinfo(np.int32).max)
        base = masked.min(axis=1)
        base = np.where(base == np.iinfo(np.int32).max, 0, base).astype(np.int32)
        fine = np.where(
            live_tiles[..., None], tt_tiles - base[:, None, :], 0
        )
        r_max = int(fine.max()) if fine.size else 0
        bits = max(1, int(np.ceil(np.log2(r_max + 1))) if r_max else 1)

        self.tile = tile
        self.n_tiles = n_tiles
        self.n_onsets = n_onsets
        self.n_nodes = n_nodes
        self.bits = bits
        self.r_pow2 = 1 << bits
        if vpu_fine:
            # [n_tiles, O, TILE, 1] so the kernel sees a (TILE, 1) column
            self.fine = np.ascontiguousarray(
                fine.transpose(0, 2, 1)[..., None].astype(np.int32)
            )
            self._fine_raw = None
        else:
            # MXU consumer derives its own layout; skip the transposed
            # contiguous copy (a ~GB-scale transient at regional scale)
            self.fine = None
            self._fine_raw = fine.astype(np.int32)  # (n_tiles, tile, O)
        self.base = base
        self.valid = live.reshape(n_tiles, tile, 1).astype(np.float32)
        self.perm = np.where(live, perm, 0).astype(np.int32)

    def device_put(self, with_fine=True):
        if with_fine:
            self.fine = jax.device_put(self.fine)
        self.base = jax.device_put(self.base)
        self.valid = jax.device_put(self.valid)
        self.perm = jax.device_put(self.perm)
        return self


def _detect_kernel(base_ref, inv_avail_ref, onset_ref, fine_ref, valid_ref,
                   max_ref, arg_ref, sum_ref, acc_ref, *, fsmp, bits, width,
                   s_pad, tile, n_onsets):
    i = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    t_pad = onset_ref.shape[-1]
    base = base_ref[i, o]
    # Align the row so column 0 is sample (fsmp + base); one dynamic roll.
    row = onset_ref[pl.ds(o, 1), :]
    rolled = pltpu.roll(row, t_pad - (base + fsmp), axis=1)
    window = jax.lax.broadcast_in_dim(
        rolled[:, :width], (tile, width), (0, 1)
    )

    fine = fine_ref[0, 0]  # (TILE, 1) int32
    for k in range(bits):
        shifted = pltpu.roll(window, width - (1 << k), axis=1)
        bit = (fine >> k) & 1
        window = jnp.where(bit == 1, shifted, window)

    acc_ref[...] += window[:, :s_pad]

    @pl.when(o == n_onsets - 1)
    def _():
        coa = jnp.exp(acc_ref[...] * inv_avail_ref[0]) * valid_ref[0]
        max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
        arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
        sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


@partial(
    jax.jit,
    static_argnames=("fsmp", "nsamples", "tile", "bits", "n_nodes_real",
                     "interpret"),
)
def _pallas_detect_core(onsets, mask, available, fine, base, valid, perm,
                        fsmp, nsamples, tile, bits, n_nodes_real,
                        interpret=False):
    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape

    s_pad = _round_up(nsamples, LANE)
    r_pow2 = 1 << bits
    width = s_pad + r_pow2
    # Row must cover fsmp + base_max + width reads: base_max <= lsmp, so
    # t_pad = T + (s_pad - S) + r_pow2 suffices.
    t_pad = _round_up(onsets_log.shape[-1] + r_pow2 + (s_pad - nsamples), LANE)
    onsets_padded = jnp.pad(
        onsets_log, ((0, 0), (0, t_pad - onsets_log.shape[-1]))
    )

    kernel = partial(
        _detect_kernel, fsmp=fsmp, bits=bits, width=width, s_pad=s_pad,
        tile=tile, n_onsets=n_onsets,
    )

    grid = (n_tiles, n_onsets)
    tmax, targ, tsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(base.shape, lambda i, o: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, o: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_onsets, t_pad), lambda i, o: (0, 0)),
            pl.BlockSpec((1, 1, tile, 1), lambda i, o: (i, o, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda i, o: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s_pad), lambda i, o: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda i, o: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda i, o: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, s_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, s_pad), jnp.float32)],
        interpret=interpret,
    )(
        base,
        jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        onsets_padded,
        fine,
        valid,
    )

    max_coa, max_idx, coa_sum = _combine_tiles(
        tmax, targ, tsum, perm, tile, nsamples
    )
    return max_coa, max_coa * n_nodes_real / coa_sum, max_idx


class PallasDetect:
    """
    Callable wrapper: build once per (LUT, scan geometry), then call with
    per-window onsets like ops.migrate.migrate_detect.

    """

    def __init__(self, traveltimes, node_count, fsmp, nsamples, tile=512,
                 brick_shape=(8, 8, 8), interpret=False):
        self.plan = PallasDetectPlan(
            traveltimes, node_count, tile=tile, brick_shape=brick_shape
        ).device_put()
        self.fsmp = fsmp
        self.nsamples = nsamples
        self.interpret = interpret
        self._max_shift = int(np.maximum(np.asarray(traveltimes), 0).max())
        # The VPU kernel stages the whole (n_tiles, n_onsets) base table
        # as one SMEM block; ~1 MiB of SMEM caps that at a few hundred
        # thousand nodes. (The MXU kernel stages per-tile row PAIRS and
        # has no such limit -- use it, or the XLA path, at scale.)
        smem_bytes = self.plan.n_tiles * self.plan.n_onsets * 4
        if not interpret and smem_bytes > 2**20:
            raise ValueError(
                f"PallasDetect base table ({smem_bytes / 2**20:.1f} MiB "
                f"for {self.plan.n_tiles} tiles x {self.plan.n_onsets} "
                "onsets) exceeds the ~1 MiB SMEM. Use PallasDetectMXU or "
                "the XLA migrate_detect kernel for grids this large."
            )

    def __call__(self, onsets, mask, available):
        _check_onset_length(
            onsets, self.fsmp, self.nsamples, self._max_shift
        )
        p = self.plan
        return _pallas_detect_core(
            onsets, mask, available, p.fine, p.base, p.valid, p.perm,
            self.fsmp, self.nsamples, p.tile, p.bits, p.n_nodes,
            interpret=self.interpret,
        )


# ---------------------------------------------------------------------------
# MXU variant: one-hot matmul instead of the VPU shift network.
#
# For each node tile, the per-node residual shift selection is expressed as
# a matrix product: S_onehot[n, o*R + r] = (fine[n, o] == r), and
# A[o*R + r, t] = onsets_log[o, fsmp + base[o] + r + t] (a per-tile slice of
# the global Hankel shift table, DMA'd HBM -> VMEM). Then
#
#     coalescence_tile = S_onehot @ A            (MXU, f32 accumulation)
#
# The table is stored as a bf16 hi/lo pair (a = hi + lo with
# lo = bf16(a - f32(hi))), so two bf16 matmuls recover ~f32 precision at
# full MXU rate. The selection itself is exact (one-hot entries are 0/1).
# ---------------------------------------------------------------------------


def _mxu_detect_kernel(base_ref, inv_avail_ref, fine_ref, valid_ref,
                       *rest, r_spans, n_onsets, tile,
                       n_tiles, sblk, n_sblocks, i8_terms=None):
    # rest = per-word table refs, then 3 output refs, then 3 scratch.
    # ``i8_terms`` is None for the bf16 hi/lo pair, or the static
    # (scales, constant) of the 3-word int8 fixed-point decomposition.
    n_words = 2 if i8_terms is None else len(i8_terms[0])
    tables = rest[:n_words]
    max_ref, arg_ref, sum_ref = rest[n_words:n_words + 3]
    a_slots, onehot, sems = rest[n_words + 3:]
    i = pl.program_id(0)  # node tile
    j = pl.program_id(1)  # sample block (minor: full sweep per tile)
    step = i * n_sblocks + j
    slot = jax.lax.rem(step, jnp.int32(2))

    # Per-onset residual spans: each onset's K rows start at its static
    # offset (all 16-aligned). Sized per onset because e.g. P onsets
    # (faster velocity) span roughly half the shifts of S onsets -- a
    # uniform max-span would pad 12-17% of the DMA and matmul away.
    k_off = [0]
    for r in r_spans:
        k_off.append(k_off[-1] + r)

    # Table-slice DMAs (rows base..base+R_o, sample columns
    # col0..col0+sblk of each onset's Hankel block) are double-buffered
    # across grid steps: step (i, j) computes from slot step%2 while the
    # next step's slices stream into the other slot. Blocking the sample
    # axis bounds every VMEM term by ``sblk`` instead of the window
    # length, so day-scale windows (e.g. timestep=120 s at 250 Hz) stay
    # on the MXU path. Bases are pre-aligned to the sublane tiling (the
    # remainder is folded into the fine residuals). base_ref is a
    # (1, 2, O) SMEM block holding rows [i, i+1] of the base table (SMEM
    # cannot hold the whole table on large grids).
    def slice_dmas(local_row, col0, into_slot):
        for o in range(n_onsets):
            row0 = pl.multiple_of(base_ref[0, local_row, o], 16)
            for word, table in enumerate(tables):
                yield pltpu.make_async_copy(
                    table.at[o, pl.ds(row0, r_spans[o]), pl.ds(col0, sblk)],
                    a_slots.at[
                        into_slot, word, pl.ds(k_off[o], r_spans[o]), :
                    ],
                    sems.at[into_slot, word, o],
                )

    @pl.when(step == 0)
    def _():
        for dma in slice_dmas(0, 0, 0):
            dma.start()

    # Prefetch the NEXT step's slices: (i, j+1) while sweeping this
    # tile's sample blocks, or (i+1, 0) at the end of the sweep.
    last_j = j == n_sblocks - 1
    next_row = jnp.where(last_j, 1, 0)
    next_col = pl.multiple_of(jnp.where(last_j, 0, (j + 1) * sblk), LANE)

    @pl.when(jnp.logical_or(jnp.logical_not(last_j), i + 1 < n_tiles))
    def _():
        for dma in slice_dmas(next_row, next_col, 1 - slot):
            dma.start()

    # Build the (transposed) one-hot selector while the DMAs are in
    # flight: onehot[k_off[o] + r, n] = (fine[o, n] == r). It depends only
    # on the tile, so it is built once per tile (j == 0) and reused across
    # the tile's sample blocks (scratch persists across grid steps). The K
    # axis sits on sublanes so spans only need 16-alignment, not full
    # lanes. Onsets are grouped into runs of equal span (typically two:
    # the P block and the S block) and each run is built with ONE
    # broadcast comparison -- a separate compare/store per onset leaves
    # ~24 unshared (r, tile) stack temporaries and blows the 16 MB
    # scoped-VMEM budget at tile=1024.
    runs = []  # (first_onset, count, span)
    for o, r in enumerate(r_spans):
        if runs and runs[-1][2] == r:
            runs[-1][1] += 1
        else:
            runs.append([o, 1, r])

    oh_dtype = jnp.bfloat16 if i8_terms is None else jnp.int8

    @pl.when(j == 0)
    def _():
        for o0, count, r in runs:
            # (count, r, tile): fine rows broadcast over the residue axis
            residues = jax.lax.broadcasted_iota(
                jnp.int32, (count, r, tile), 1
            )
            block = (
                fine_ref[0, o0:o0 + count, :][:, None, :] == residues
            ).astype(oh_dtype)
            onehot[k_off[o0]:k_off[o0] + count * r, :] = block.reshape(
                count * r, tile
            )

    cur_col = pl.multiple_of(j * sblk, LANE)
    for dma in slice_dmas(0, cur_col, slot):
        dma.wait()

    # coa[n, t] = sum_k onehot[k, n] * A[k, t] -- contract the K (sublane)
    # axis of both operands on the MXU. bf16 pair: f32 accumulation of
    # hi + lo. int8: three int32 selections combined with the static
    # fixed-point scales (v5e runs int8 matmuls at 2x the bf16 rate, so
    # three int8 dots cost ~0.75x the bf16 pair at ~20x tighter error).
    contract_k = (((0,), (0,)), ((), ()))
    if i8_terms is None:
        acc = jax.lax.dot_general(
            onehot[...], a_slots[slot, 0],
            dimension_numbers=contract_k,
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            onehot[...], a_slots[slot, 1],
            dimension_numbers=contract_k,
            preferred_element_type=jnp.float32,
        )
    else:
        scales, const = i8_terms
        acc = jnp.full((tile, sblk), const, jnp.float32)
        for word, scale in enumerate(scales):
            sel = jax.lax.dot_general(
                onehot[...], a_slots[slot, word],
                dimension_numbers=contract_k,
                preferred_element_type=jnp.int32,
            )
            acc = acc + sel.astype(jnp.float32) * scale

    coa = jnp.exp(acc * inv_avail_ref[0]) * valid_ref[0]
    max_ref[0] = jnp.max(coa, axis=0, keepdims=True)
    arg_ref[0] = jnp.argmax(coa, axis=0, keepdims=True).astype(jnp.int32)
    sum_ref[0] = jnp.sum(coa, axis=0, keepdims=True)


def mxu_detect_reduce(onsets, mask, available, fine_t, base, valid, perm,
                      fsmp, nsamples, tile, r_spans, n_nodes_real,
                      sblk=None, interpret=False, precision="i8x3"):
    """
    Traceable MXU fused migrate + reduce with the same contract as
    ops.migrate.detect_reduce: returns (max_coa, max_idx, coa_sum). The
    plan arrays (fine_t/base/valid/perm) come from a PallasDetectMXU;
    ``r_spans`` is its per-onset residual-span tuple (a scalar is
    broadcast for compatibility). ``sblk`` is the static sample-block
    width (lane-aligned; default = the whole lane-padded window): the
    kernel sweeps each tile's window in blocks of ``sblk`` samples so
    its VMEM scratch is bounded by the block, not the window length --
    this is what keeps day-scale windows (timestep=120 s at 250 Hz) on
    the MXU path. ``n_nodes_real`` is not used in the body (padding
    validity comes from the plan's ``valid`` mask and the caller
    computes the normalisation) -- it is kept for signature parity with
    ops.migrate.detect_reduce.

    """

    from .migrate import _build_shift_table

    onsets_log = _prepare_onsets(onsets, mask).astype(jnp.float32)
    n_tiles, n_onsets = base.shape
    if not isinstance(r_spans, tuple):
        r_spans = (int(r_spans),) * n_onsets
    if sblk is None:
        sblk = _round_up(nsamples, LANE)
    sblk = _round_up(int(sblk), LANE)
    s_pad = _round_up(nsamples, sblk)
    n_sblocks = s_pad // sblk
    # Row pairs [base[i], base[i+1]] per tile, so the kernel's SMEM block
    # carries this tile's slice offsets AND the next tile's (for the
    # double-buffered prefetch) without holding the whole table in SMEM.
    padded = jnp.pad(base, ((0, 1), (0, 0)))
    base_pairs = jnp.stack([padded[:-1], padded[1:]], axis=1)

    # Global Hankel tables [O, D, S], padded so every base..base+R slice
    # and the block-aligned sample axis are in range. The reduced-
    # precision encodings are per-element, so they COMMUTE with the
    # Hankel gather: encode the small (O, T) traces first and expand the
    # encoded words -- at day-scale windows the f32 table is ~1.4 GB and
    # skipping it (plus its multi-pass encode traffic) is a measurable
    # per-window saving on the critical path.
    i8_words = _i8_n_words(precision)

    def expand(trace, pad_value=0):
        tw, d_max = _build_shift_table(trace, fsmp, nsamples)
        d_pad = _round_up(d_max + 1 + max(r_spans), 16)
        return jnp.pad(
            tw, ((0, 0), (0, d_pad - (d_max + 1)), (0, s_pad - nsamples)),
            constant_values=pad_value,
        )

    if i8_words is not None:
        # Pad rows/samples hold the encoding of 0.0 (a masked onset's
        # log) so they decode to ~0 like the bf16 path's zero padding --
        # an all-zero int8 pad would decode to the range centre c, and
        # exp(n_onsets*c / available) can overflow f32 in the padded
        # sample columns when most onsets are masked.
        words = tuple(
            expand(w, pad) for w, pad in zip(
                _encode_i8(onsets_log, i8_words),
                _i8_zero_words(i8_words),
            )
        )
        i8_terms = _i8_terms(n_onsets, i8_words)
        w_dtype = jnp.int8
    else:
        # reduce_precision guarantees the bf16 rounding actually happens --
        # a plain astype round-trip is elided under
        # --xla_allow_excess_precision, which silently zeroes the lo half.
        hi_exact = jax.lax.reduce_precision(
            onsets_log, exponent_bits=8, mantissa_bits=7
        )
        words = (
            expand(hi_exact.astype(jnp.bfloat16)),
            expand((onsets_log - hi_exact).astype(jnp.bfloat16)),
        )
        i8_terms = None
        w_dtype = jnp.bfloat16

    kernel = partial(
        _mxu_detect_kernel, r_spans=r_spans, n_onsets=n_onsets, tile=tile,
        n_tiles=n_tiles, sblk=sblk, n_sblocks=n_sblocks, i8_terms=i8_terms,
    )

    n_words = len(words)
    tmax, targ, tsum = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_sblocks),
        in_specs=[
            pl.BlockSpec((1, 2, n_onsets), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_onsets, tile), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, 0, 0)),
        ] + [
            pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_words)
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
            pltpu.VMEM((2, n_words, sum(r_spans), sblk), w_dtype),
            pltpu.VMEM((sum(r_spans), tile), w_dtype),
            pltpu.SemaphoreType.DMA((2, n_words, n_onsets)),
        ],
        # Mosaic's default scoped-VMEM limit (16 MiB) is conservative;
        # v5e has far more physical VMEM. Raising the limit to our own
        # accounting (plus slack for Mosaic stack temporaries the
        # accounting cannot see) lets the selection logic -- not the
        # compiler default -- decide how much VMEM a config may use.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                112 * 2**20,
                _mxu_vmem_bytes(tile, sum(r_spans), n_onsets, sblk,
                                precision)
                + 8 * 2**20,
            ),
        ),
        interpret=interpret,
    )(
        base_pairs,
        jnp.asarray(1.0 / available, jnp.float32).reshape(1),
        fine_t,
        valid,
        *words,
    )

    return _combine_tiles(tmax, targ, tsum, perm, tile, nsamples)


@partial(
    jax.jit,
    static_argnames=("fsmp", "nsamples", "tile", "r_spans", "n_nodes_real",
                     "sblk", "interpret", "precision"),
)
def _pallas_mxu_detect_core(onsets, mask, available, fine_t, base, valid,
                            perm, fsmp, nsamples, tile, r_spans, n_nodes_real,
                            sblk=None, interpret=False, precision="i8x3"):
    max_coa, max_idx, coa_sum = mxu_detect_reduce(
        onsets, mask, available, fine_t, base, valid, perm,
        fsmp, nsamples, tile, r_spans, n_nodes_real, sblk=sblk,
        interpret=interpret, precision=precision,
    )
    return max_coa, max_coa * n_nodes_real / coa_sum, max_idx


def _check_onset_length(onsets, fsmp, nsamples, max_shift):
    """
    The plans clamp traveltimes at 0 but (unlike the XLA path's d_max
    clip) cannot clamp above: migration reads onsets[tt + fsmp + t], so
    an onset block shorter than the plan's maximum shift would make the
    one-hot select zero padding -- silently wrong values -- and, for
    violations beyond the residual span, drive the MXU table-slice DMA
    out of bounds. Fail loudly instead.

    """

    t_len = onsets.shape[-1]
    if fsmp + nsamples + max_shift > t_len:
        raise ValueError(
            f"Onset block too short for this Pallas plan: migration reads "
            f"up to sample {fsmp + nsamples + max_shift - 1} (fsmp {fsmp} "
            f"+ nsamples {nsamples} + max traveltime shift {max_shift}) "
            f"but the block has {t_len} samples. Rebuild the kernel for "
            "this scan geometry or use the XLA kernel."
        )


class PallasDetectMXU:
    """
    MXU-formulated fused detect: one-hot selection matmul over per-tile
    Hankel-table slices. Same call contract as :class:`PallasDetect`.

    """

    def __init__(self, traveltimes, node_count, fsmp, nsamples, tile=256,
                 brick_shape=(8, 8, 4), sblk=None, interpret=False,
                 precision="i8x3"):
        plan = PallasDetectPlan(
            traveltimes, node_count, tile=tile, brick_shape=brick_shape,
            vpu_fine=False,
        )
        self._max_shift = int(np.maximum(np.asarray(traveltimes), 0).max())
        self.precision = precision
        # Align each tile's base shift down to 16 rows so the
        # table-slice DMA offsets are provably aligned; the remainder
        # moves into the fine residuals. 16 is the measured Mosaic DMA
        # row granularity for BOTH bf16 and int8 tables (int8's memref
        # tiling is (32, 128) but its copies accept 16-multiples --
        # probed on hardware, see docs/performance.md).
        align = 16
        remainder = plan.base % align
        base8 = plan.base - remainder
        fine8 = (
            plan._fine_raw.transpose(0, 2, 1) + remainder[:, :, None]
        )  # (n_tiles, O, tile)
        plan._fine_raw = None
        # Residual spans: bf16 memrefs tile as (16, 128), so bases and
        # spans align to 16 sublanes; the one-hot selector is built
        # transposed, with K on the sublane axis. Spans are sized PER
        # ONSET -- P onsets (faster velocity) span roughly half the
        # shifts of S onsets, so a uniform max span pads their DMA and
        # matmul K rows away. Round 2 shipped the uniform max because
        # mixed spans tripped Mosaic's default 16 MiB scoped-VMEM limit;
        # that limit is now raised per-kernel (CompilerParams in
        # mxu_detect_reduce), and per-onset spans measure +7% at the
        # day-scale window (exp_kernel_breakdown --pspan: K 1536 -> 1344,
        # 491 -> 527 G/s, checksum-identical).
        self.r_spans = tuple(
            max(align, _round_up(int(fine8[:, o, :].max()) + 1, align))
            for o in range(plan.n_onsets)
        )
        self.r_span = max(self.r_spans)
        # (n_tiles, O, tile) selector input for the kernel. plan.fine is
        # superseded by fine_t here -- don't waste HBM uploading it. The
        # upload is deferred to first use so rejected candidate configs
        # (make_mxu_detect) never touch the device.
        self._fine_host = np.ascontiguousarray(fine8)
        self._fine_dev = None
        plan.base = base8
        self.plan = plan
        self.fsmp = fsmp
        self.nsamples = nsamples
        # Sample-block width: the kernel sweeps the window in lane-aligned
        # blocks of ``sblk`` samples (default: the whole window in one
        # block). make_mxu_detect picks the largest block whose scratch
        # fits VMEM, so long windows block instead of losing the MXU.
        self.sblk = _round_up(
            int(sblk) if sblk else _round_up(nsamples, LANE), LANE
        )
        self.interpret = interpret

    @property
    def fine_t(self):
        if self._fine_dev is None:
            self._fine_dev = jax.device_put(self._fine_host)
            self.plan.device_put(with_fine=False)
        return self._fine_dev

    def estimated_vmem_bytes(self):
        p = self.plan
        return _mxu_vmem_bytes(
            p.tile, sum(self.r_spans), p.n_onsets, self.sblk,
            self.precision,
        )

    def fits_vmem(self, budget=None):
        """Whether the kernel's scratch fits the ~16 MB VMEM (with slack)."""

        return self.estimated_vmem_bytes() <= (
            VMEM_BUDGET if budget is None else budget
        )

    def __call__(self, onsets, mask, available):
        _check_onset_length(
            onsets, self.fsmp, self.nsamples, self._max_shift
        )
        fine_t = self.fine_t  # triggers the deferred device upload
        p = self.plan
        return _pallas_mxu_detect_core(
            onsets, mask, available, fine_t, p.base, p.valid, p.perm,
            self.fsmp, self.nsamples, p.tile, self.r_spans, p.n_nodes,
            sblk=self.sblk, interpret=self.interpret,
            precision=self.precision,
        )


# Candidate (tile, brick_shape) configs. One brick per tile keeps the
# residual span tight (a tile spanning two bricks pays the union of their
# shift ranges); larger tiles amortise grid-step sequencing and halve/
# quarter the per-node table-slice DMA bytes, but their bigger bricks can
# widen the span (more redundant MXU FLOPs). make_mxu_detect scores the
# candidates with the measured cost model (_config_score) instead of a
# fixed order -- at equal spans the largest tile wins (regional sweep,
# experiments/exp_mxu_tile.py: 475/456/430 G/s), at unequal spans the
# tighter span wins (day-scale sweep, experiments/exp_vmem_sweep.py:
# tile=512/span=64 at 432 G/s vs tile=1024/span=80 at 329 G/s).
MXU_CONFIGS = ((1024, (16, 8, 8)), (512, (8, 8, 8)), (256, (8, 8, 4)))


def _mxu_vmem_bytes(tile, k_dim, n_onsets, sblk, precision="i8x3"):
    """
    Approximate VMEM footprint of the MXU kernel: table-slice slots
    (double-buffered; two bf16 halves or three int8 words per
    ``precision``), the one-hot selector, the f32 accumulator, the
    pipelined input/output blocks, PLUS the Mosaic stack temporaries
    that live across the kernel body -- the in-flight dot_general
    result (alive during the accumulate; the int8 path also holds its
    int32->f32 cast), and the one-hot build's broadcasted-iota/
    comparison block. ``k_dim`` is the selector's contraction size (the
    sum of per-onset residual spans); ``sblk`` the sample-block width
    (every sample-axis term scales with the block, not the window --
    the point of sample-axis blocking).

    The matching ``VMEM_BUDGET`` is calibrated against on-hardware
    compile outcomes (v5e): omitting the stack terms previously let
    configs through that died at compile with a scoped-vmem stack
    overflow (e.g. 52 onsets x 1000 samples at tile=1024).

    """

    s_pad = _round_up(sblk, LANE)
    i8_words = _i8_n_words(precision)
    if i8_words is not None:
        n_words, w_bytes = i8_words, 1
        # sequential int32 dot result + its f32 cast, alive with the
        # accumulator during each scaled add
        dot_temps = 2 * tile * s_pad * 4
    else:
        n_words, w_bytes = 2, 2
        dot_temps = tile * s_pad * 4
    slices = 2 * n_words * k_dim * s_pad * w_bytes
    onehot = k_dim * tile * w_bytes
    accumulator = tile * s_pad * 4
    blocks = 2 * (n_onsets * tile * 4 + tile * LANE * 4 + 3 * s_pad * 4)
    onehot_scratch = k_dim * tile * (4 + w_bytes)  # int32 iota + block
    return (
        slices + onehot + accumulator + blocks + dot_temps + onehot_scratch
    )


def _estimate_r_spans(traveltimes, node_count, brick_shape):
    """
    The exact r_spans tuple a PallasDetectMXU plan would land on, computed
    from per-brick traveltime min/max alone (no per-node plan arrays).
    Valid when one tile == one brick (every MXU_CONFIGS entry): onset o's
    residual span after the 16-row base alignment (the measured Mosaic
    DMA row granularity for BOTH the bf16 and int8 tables) is
    ``max(tt) - 16 * (min(tt) // 16)`` maximised over bricks, sized
    per onset (P onsets span roughly half the shifts of S onsets).

    """
    align = 16

    traveltimes = np.maximum(np.asarray(traveltimes), 0)
    n_onsets = traveltimes.shape[-1]
    node_count = np.asarray(node_count, dtype=int)
    brick_shape = np.asarray(brick_shape, dtype=int)
    n_bricks = -(-node_count // brick_shape)

    # Edge-replicate up to whole bricks: the pad copies each overhanging
    # brick's own boundary layer, so per-brick min/max are unchanged.
    tt = traveltimes.reshape(tuple(node_count) + (n_onsets,))
    pad = n_bricks * brick_shape - node_count
    tt = np.pad(tt, [(0, p) for p in pad] + [(0, 0)], mode="edge")
    tt = tt.reshape(
        n_bricks[0], brick_shape[0], n_bricks[1], brick_shape[1],
        n_bricks[2], brick_shape[2], n_onsets,
    )
    lo = tt.min(axis=(1, 3, 5))
    hi = tt.max(axis=(1, 3, 5))
    per_brick = hi - align * (lo // align)  # (bx, by, bz, O)
    return tuple(
        int(max(align, _round_up(int(per_brick[..., o].max()) + 1, align)))
        for o in range(n_onsets)
    )


# Sample-block width candidates (lanes). The full lane-padded window is
# always tried first (one block, no re-sweep overhead); long windows then
# fall down this ladder until the scratch fits. Capped at 3072: the
# on-hardware sweep (exp_vmem_sweep) measured sblk=4096 SLOWER at every
# tile (501 vs 432 ms at tile=512) -- oversized blocks starve DMA overlap
# -- while 3072 measures ~2-5% FASTER than 2048 at the day-scale window
# under the i8x2 encoding (A/B/A/B: 960-975 vs 949-952 G/s), whose 2/3
# scratch lets it fit the 40 MiB budget (38.4 MiB at the day K=1344;
# i8x3 at 3072 exceeds the budget and keeps falling to 2048).
SBLK_CANDIDATES = (3072, 2048, 1024, 512, 256, LANE)


def _pick_sblk(tile, k_dim, n_onsets, nsamples, budget=None,
               precision="i8x3"):
    """
    Largest sample-block width whose MXU scratch fits the VMEM budget for
    this (tile, contraction size) -- the whole lane-padded window if it
    fits, else the first fitting rung of SBLK_CANDIDATES. None if even a
    single-lane block does not fit (pathologically wide residual spans).

    """

    budget = VMEM_BUDGET if budget is None else budget
    s_full = _round_up(nsamples, LANE)
    for sblk in (s_full,) + tuple(c for c in SBLK_CANDIDATES if c < s_full):
        if _mxu_vmem_bytes(tile, k_dim, n_onsets, sblk,
                           precision) <= budget:
            return sblk
    return None


def _config_score(span_sum, sblk, tile, nsamples):
    """
    Predicted relative cost of a candidate (tile, sblk) config, from the
    on-hardware sweep (experiments/exp_vmem_sweep.py, v5e):

    - MXU FLOPs scale with the residual-span sum (the one-hot matmul does
      span-many mostly-zero MACs per node*sample), the dominant term
      (measured: tile=1024/span=80 runs ~1.28x slower than
      tile=512/span=64 at the day-scale window).
    - Small sample blocks pay a re-sweep penalty (sblk=128 measured +35%
      over sblk>=512 at the same tile); >=512 is flat.
    - Larger tiles amortise table-slice DMA and grid-step sequencing
      (round-2 regional sweep: 475/456/430 G/s for 1024/512/256 at equal
      spans), worth ~4% per halving.

    """

    s_full = _round_up(nsamples, LANE)
    if sblk >= min(512, s_full):
        block_penalty = 1.0
    elif sblk >= 256:
        block_penalty = 1.15
    else:
        block_penalty = 1.35
    tile_penalty = 1.0 + 0.04 * (MXU_CONFIGS[0][0] / tile - 1.0)
    return span_sum * block_penalty * tile_penalty


def make_mxu_detect(traveltimes, node_count, fsmp, nsamples, interpret=False,
                    precision="i8x2"):
    """
    Build the MXU detect kernel with the measured-cheapest (tile,
    sample-block) config whose scratch fits the VMEM budget for this
    (LUT, scan geometry) -- see :func:`_config_score`. Candidates are
    vetted with a cheap per-brick span estimate (no plan arrays are
    materialised for rejected configs, and nothing touches the device
    until first use). Long windows block the sample axis rather than
    losing the MXU path; only pathologically wide residual spans (no
    config fits even at a single-lane block) return a kernel whose
    ``fits_vmem()`` is False, routing the caller to the XLA shift-table
    path.

    """

    n_onsets = np.asarray(traveltimes).shape[-1]
    best = None  # (score, tile, brick, sblk, est_spans)
    for cand_tile, cand_brick in MXU_CONFIGS:
        cand_spans = _estimate_r_spans(traveltimes, node_count, cand_brick)
        cand_sblk = _pick_sblk(cand_tile, sum(cand_spans), n_onsets,
                               nsamples, precision=precision)
        if cand_sblk is None:
            continue
        score = _config_score(sum(cand_spans), cand_sblk, cand_tile, nsamples)
        if best is None or score < best[0]:
            best = (score, cand_tile, cand_brick, cand_sblk, cand_spans)

    if best is None:
        tile, brick_shape = MXU_CONFIGS[-1]
        sblk, est_spans = None, None
    else:
        _, tile, brick_shape, sblk, est_spans = best

    kernel = PallasDetectMXU(
        traveltimes, node_count, fsmp, nsamples,
        tile=tile, brick_shape=brick_shape, sblk=sblk, interpret=interpret,
        precision=precision,
    )
    if sblk is not None and not kernel.fits_vmem():
        # The cheap per-brick estimate diverged from the built plan (the
        # plan's r_spans are authoritative): re-pick the sample block for
        # the actual spans. If nothing fits, leave the kernel oversized
        # so the caller's fits_vmem() check routes to the XLA path.
        logging.warning(
            "MXU span estimate (%s) disagrees with the built plan (%s); "
            "re-selecting the sample-block width from the plan.",
            est_spans, kernel.r_spans,
        )
        actual = _pick_sblk(tile, sum(kernel.r_spans), n_onsets, nsamples,
                            precision=precision)
        if actual is not None:
            kernel.sblk = actual
    return kernel
