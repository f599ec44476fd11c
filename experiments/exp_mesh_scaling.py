# -*- coding: utf-8 -*-
"""
Grid-sharding scaling measurement on the virtual 8-device CPU mesh.

Real ICI isn't available in this environment (one physical TPU chip, and
the CPU host has a single core), so this measures what CAN be measured
without it: the *overhead* the sharded program adds on top of the same
total work. On one core, perfect sharding costs exactly 1.00x the
single-device wall-clock; anything above that is the collective combine
(pmax/psum/pmin over 3 x O(S) vectors) plus per-shard dispatch. Measured
2026-08-16: 2 shards 0.97x, 4 shards 0.94x, 8 shards 0.83x efficiency
(i.e. <= 21% overhead at 8 shards on a 786k-node grid) -- on k real chips
the expected wall-clock is t_single/k x (1 + that overhead fraction).

Run with:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python experiments/exp_mesh_scaling.py

"""

import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from quakemigrate_tpu.ops.migrate import migrate_detect  # noqa: E402
from quakemigrate_tpu.parallel import (  # noqa: E402
    make_mesh,
    make_sharded_detect,
    pad_nodes_for_mesh,
)

N_NODES, N_ONSETS = 786_432, 16
FSMP, LSMP, NSAMPLES = 100, 150, 250
T_LEN = NSAMPLES + FSMP + LSMP
TILE = 4096
WORK = N_NODES * N_ONSETS * NSAMPLES


def main():
    rng = np.random.default_rng(0)
    onsets = rng.gamma(2.0, 1.5, size=(N_ONSETS, T_LEN)).astype(np.float32)
    # Smooth moveout field (the realistic case)
    side = round(N_NODES ** (1 / 3))
    nx, ny = side, side
    nz = -(-N_NODES // (nx * ny))
    x, y, z = np.meshgrid(
        np.arange(nx) * 0.025, np.arange(ny) * 0.025, np.arange(nz) * 0.025,
        indexing="ij",
    )
    tts = []
    for i in range(N_ONSETS):
        d = np.sqrt(
            (x - rng.uniform(0, nx * 0.025)) ** 2
            + (y - rng.uniform(0, ny * 0.025)) ** 2 + z**2
        )
        tts.append(np.rint(d / 2.5 * 250).astype(np.int32))
    tt = np.clip(
        np.stack(tts, -1).reshape(-1, N_ONSETS)[:N_NODES], 0, LSMP
    )
    mask = np.ones(N_ONSETS, dtype=np.float32)

    def timed(fn, *args, reps=3):
        fn(*args)[0].block_until_ready()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(*args)[0].block_until_ready()
            times.append(time.perf_counter() - t0)
        return min(times)

    base = timed(
        lambda o, t, m: migrate_detect(
            o, t, m, float(N_ONSETS), FSMP, NSAMPLES, tile=TILE
        ),
        onsets, tt, mask,
    )
    print(f"single-device: {base:7.3f} s   {WORK / base / 1e9:6.2f} G/s   1.00x")

    for k in (2, 4, 8):
        mesh = make_mesh(devices=np.array(jax.devices()[:k]))
        tt_pad, _ = pad_nodes_for_mesh(tt, k, tile=TILE)
        fn = make_sharded_detect(mesh, FSMP, NSAMPLES, N_NODES, tile=TILE)
        elapsed = timed(fn, onsets, tt_pad, mask, float(N_ONSETS))
        print(
            f"{k} shards:      {elapsed:7.3f} s   {WORK / elapsed / 1e9:6.2f} "
            f"G/s   {base / elapsed:4.2f}x"
        )


if __name__ == "__main__":
    main()
