# -*- coding: utf-8 -*-
"""
Regional-scale locate under a device mesh (round-4 verdict item 5: the
mesh path was only ever exercised by detect; this proves the locate
stage -- the accuracy path, reference signal/scan.py:472-591 -- runs
sharded at the 915k-node regional grid and reproduces the single-device
locations).

Both locate passes shard over the virtual 8-device CPU mesh: the
origin-time scan through ``make_sharded_detect`` (ICI max/argmax/psum
combine) and the window marginalisation through
``make_sharded_marginalise`` (per-node, no collective). The location
estimators are per-event host math on the fetched 3-D map.

Writes REGIONAL_MESH_LOCATE.json: per-event TPU-vs-mesh position deltas
in node spacings plus wall-clock for both runs.

Requires a completed regional_e2e run (/tmp/qm_regional_e2e). Run:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/regional_mesh_locate.py [n_events]
"""

import json
import os
import pathlib
import sys
import time

# Must precede any backend initialisation (the environment pre-imports
# jax with JAX_PLATFORMS=axon via sitecustomize; see tests/conftest.py).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from regional_e2e import WORLD, build_lut
from regional_locate import make_scan

ROOT = pathlib.Path(__file__).resolve().parent.parent
N_EVENTS = 6


def main(n_events=N_EVENTS):
    from quakemigrate_tpu.parallel import make_mesh

    assert jax.devices()[0].platform == "cpu"
    n_dev = len(jax.devices())

    ev_dir = WORLD / "runs" / "regional" / "trigger" / "events"
    tables = sorted(ev_dir.glob("*.csv"))
    if not tables:
        sys.exit("no triggered events; run tools/regional_e2e.py first")
    events = pd.concat([pd.read_csv(f) for f in tables])
    step = max(1, len(events) // n_events)
    events = events.iloc[::step].iloc[:n_events]
    trig_file = WORLD / "runs" / "regional" / "mesh_locate.csv"
    events.to_csv(trig_file, index=False)

    lut, stations = build_lut()

    def run(name, mesh):
        scan = make_scan(lut, stations, run_name=name, mesh=mesh)
        t0 = time.perf_counter()
        scan.locate(trigger_file=str(trig_file))
        wall = time.perf_counter() - t0
        out = WORLD / "runs" / name / "locate" / "events"
        return wall, {
            f.stem: pd.read_csv(f).iloc[0] for f in sorted(out.glob("*.event"))
        }

    single_wall, single = run("regional_mesh_single", None)
    mesh = make_mesh(jax.devices())
    mesh_wall, sharded = run("regional_mesh_sharded", mesh)

    if set(single) != set(sharded):
        sys.exit(f"event sets differ: {set(single) ^ set(sharded)}")
    if not single:
        sys.exit("no events located")

    # Same grid-delta metric as the reference-oracle audit, so the two
    # parity artifacts (LOCATE_AUDIT.json, REGIONAL_MESH_LOCATE.json)
    # stay directly comparable.
    from locate_audit import delta_nodes

    rows = []
    for uid, a in single.items():
        b = sharded[uid]
        assert a["DT"] == b["DT"], f"{uid}: origin time differs"
        deltas = {}
        for est, cols in (
            ("spline", ("X", "Y", "Z")),
            ("gaussian", ("GAU_X", "GAU_Y", "GAU_Z")),
        ):
            pa = [float(a[c]) for c in cols]
            pb = [float(b[c]) for c in cols]
            deltas[est] = delta_nodes(lut, pa, pb)
        rows.append({
            "uid": uid,
            "delta_spline_nodes": round(deltas["spline"], 6),
            "delta_gaussian_nodes": round(deltas["gaussian"], 6),
        })
        print(json.dumps(rows[-1]))

    worst = max(
        max(r["delta_spline_nodes"], r["delta_gaussian_nodes"]) for r in rows
    )
    # Parity bar: well under the catalogue's own <=1-node accuracy bar.
    assert worst <= 0.01, f"mesh locate diverged: worst {worst} nodes"

    record = {
        "grid_nodes": int(np.prod(lut.node_count)),
        "n_devices": n_dev,
        "events_located": len(rows),
        "single_wall_seconds": round(single_wall, 1),
        "mesh_wall_seconds": round(mesh_wall, 1),
        "single_seconds_per_event": round(single_wall / len(rows), 2),
        "mesh_seconds_per_event": round(mesh_wall / len(rows), 2),
        "worst_delta_nodes": worst,
        "parity_ok": True,
        "events": rows,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (ROOT / "REGIONAL_MESH_LOCATE.json").write_text(
        json.dumps(record, indent=1)
    )
    print(json.dumps({k: v for k, v in record.items() if k != "events"},
                     indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else N_EVENTS)
