# -*- coding: utf-8 -*-
"""
Two-level shift feasibility analysis (host-side, no device needed).

The MXU detect kernel's binding cost is the one-hot matmul's K =
sum(per-onset residual spans): every node pays K MACs per sample to
select n_onsets useful values (useful fraction ~0.5%,
docs/performance.md "MFU / bound analysis"). All prior K levers
(per-onset spans, bucketing, X16G) are measured dead.

The untried lever: traveltime fields are smooth and their within-brick
variation is dominated by a COMMON moveout — a node deeper/further
along the gradient is later for *every* onset. Factor each node's fine
residual as

    fine[n, o] = G * c[n] + rebase[tile, o] + s[n, o]

with c[n] onset-INDEPENDENT (applied after the matmul as a per-node
roll of the accumulator along the sample axis: log2(C) static-roll +
select passes on the VPU, the same construct the VPU kernel compiles
today) and s[n, o] the only part the one-hot matmul must span. If the
within-brick variation is mostly common-mode, span(s) << span(fine)
and K shrinks by the same factor — a direct cut of the matmul AND the
table-slice DMA (both scale with K).

This script computes, for the two production geometries (day-scale
Icequake harness and the regional harness), the exact K the existing
plan uses and the K a two-level plan would use, for several choices of
the coarse granularity G and of c[n] (mean / median over onsets), plus
the accumulator-roll width cost (extra sample columns = G * C_max).

Run: PYTHONPATH=/root/repo python experiments/exp_twolevel_span.py
"""

import numpy as np


def geometry_day():
    import pandas as pd
    from quakemigrate_tpu import compute_traveltimes
    from quakemigrate_tpu.coords import Proj

    n_sta = 8
    angles = np.linspace(0, 2 * np.pi, n_sta, endpoint=False)
    stations = pd.DataFrame({
        "Name": [f"SK{i:02d}" for i in range(n_sta)],
        "Longitude": -17.222 + 0.010 * np.cos(angles),
        "Latitude": 64.329 + 0.005 * np.sin(angles),
        "Elevation": np.zeros(n_sta),
    })
    gproj = Proj(proj="lcc", units="km", lon_0=-17.222, lat_0=64.329,
                 lat_1=64.323, lat_2=64.335, datum="WGS84", ellps="WGS84",
                 no_defs=True)
    cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)
    lut = compute_traveltimes(
        dict(ll_corner=[-17.24, 64.322, -1.4],
             ur_corner=[-17.204, 64.336, 0.0],
             node_spacing=[0.025] * 3, grid_proj=gproj, coord_proj=cproj),
        stations, method="homogeneous", phases=["P", "S"],
        vp=3.630, vs=1.833,
    )
    tt = lut.serve_traveltimes(250)
    tt = tt.reshape(-1, tt.shape[-1])
    return "day (Icequake, 250 Hz)", tt, tuple(lut.node_count)


def geometry_regional():
    import pandas as pd
    from quakemigrate_tpu import compute_traveltimes
    from quakemigrate_tpu.coords import Proj

    rng = np.random.default_rng(7)
    n_sta = 12
    stations = pd.DataFrame({
        "Name": [f"RG{i:02d}" for i in range(n_sta)],
        "Longitude": -120.0 + rng.uniform(-0.8, 0.8, n_sta),
        "Latitude": 38.0 + rng.uniform(-0.6, 0.6, n_sta),
        "Elevation": np.zeros(n_sta),
    })
    gproj = Proj(proj="lcc", units="km", lon_0=-120.0, lat_0=38.0,
                 lat_1=37.6, lat_2=38.4, datum="WGS84", ellps="WGS84",
                 no_defs=True)
    cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)
    lut = compute_traveltimes(
        dict(ll_corner=[-120.9, 37.4, -30.0],
             ur_corner=[-119.1, 38.6, 0.0],
             node_spacing=[1.0, 1.0, 1.0], grid_proj=gproj,
             coord_proj=cproj),
        stations, method="homogeneous", phases=["P", "S"],
        vp=6.0, vs=3.4,
    )
    tt = lut.serve_traveltimes(50)
    tt = tt.reshape(-1, tt.shape[-1])
    return "regional (50 Hz)", tt, tuple(lut.node_count)


def analyse(name, traveltimes, node_count, tile, brick_shape, align=16):
    from quakemigrate_tpu.ops.pallas_migrate import (
        PallasDetectPlan, _round_up,
    )

    plan = PallasDetectPlan(traveltimes, node_count, tile=tile,
                            brick_shape=brick_shape, vpu_fine=False)
    # Reproduce PallasDetectMXU's base 16-alignment
    remainder = plan.base % align
    fine = plan._fine_raw + remainder[:, None, :]  # (n_tiles, tile, O)
    live = plan.valid[..., 0] > 0  # (n_tiles, tile)
    n_onsets = fine.shape[-1]

    def spans_of(f):
        """Per-onset K rows after per-tile rebase + 16-alignment, padding
        rows excluded from the span (they take the rebase)."""
        masked_min = np.where(live[:, :, None], f, np.iinfo(np.int64).max)
        masked_max = np.where(live[:, :, None], f, np.iinfo(np.int64).min)
        lo = masked_min.min(axis=1)  # (n_tiles, O)
        hi = masked_max.max(axis=1)
        per_tile = hi - align * (lo // align)  # rebase is 16-aligned
        per_onset = per_tile.max(axis=0)
        return tuple(
            int(max(align, _round_up(int(r) + 1, align))) for r in per_onset
        )

    base_spans = spans_of(fine.astype(np.int64))
    k_base = sum(base_spans)
    print(f"\n== {name}  tile={tile} brick={brick_shape} "
          f"n_onsets={n_onsets}")
    print(f"   production spans: K={k_base}  "
          f"(per-onset min/max {min(base_spans)}/{max(base_spans)})")

    results = {"k_base": k_base}
    for G in (8, 16, 32):
        for how in ("mean", "median", "minmax"):
            if how == "mean":
                centre = fine.mean(axis=-1)
            elif how == "median":
                centre = np.median(fine, axis=-1)
            else:
                centre = 0.5 * (fine.max(axis=-1) + fine.min(axis=-1))
            c = np.rint(centre / G).astype(np.int64)
            c = np.where(live, c, 0)
            # Per-tile c floor folds into the tile base (the roll only
            # needs the RELATIVE coarse shift within the tile).
            c_lo = np.where(live, c, np.iinfo(np.int64).max).min(
                axis=1, keepdims=True)
            c_lo = np.where(c_lo == np.iinfo(np.int64).max, 0, c_lo)
            c_rel = np.where(live, c - c_lo, 0)
            c_max = int(c_rel.max())
            s = fine.astype(np.int64) - G * c_rel[:, :, None]
            # s can be negative; per-tile per-onset rebase absorbs it
            # (rebase folds into the DMA base row, kept 16-aligned).
            two_spans = spans_of(s)
            k_two = sum(two_spans)
            extra_cols = G * c_max  # accumulator roll width
            bits = int(np.ceil(np.log2(c_max + 1))) if c_max else 0
            tag = f"G={G:2d} c={how:6s}"
            print(f"   {tag}: K={k_two:5d} ({k_two / k_base:5.1%} of base)"
                  f"  c_max={c_max:3d} roll_bits={bits}"
                  f"  extra_cols={extra_cols}")
            results[tag] = (k_two, c_max, bits, extra_cols)
    return results


def main():
    for builder, tile, brick in (
        (geometry_day, 512, (8, 8, 8)),
        (geometry_day, 1024, (16, 8, 8)),
        (geometry_regional, 512, (8, 8, 8)),
        (geometry_regional, 1024, (16, 8, 8)),
    ):
        name, tt, node_count = builder()
        analyse(name, tt, node_count, tile, brick)


if __name__ == "__main__":
    main()
