# -*- coding: utf-8 -*-
"""
Multi-process (DCN) dry run of the sharded detect: 2 processes x 4 CPU
devices each form one 8-device global mesh via ``jax.distributed``, the
grid axis spanning the process boundary -- so mesh construction, global
array creation, and the cross-shard ICI combine all exercise the
process-spanning (multi-host) code path, not just the single-process
virtual mesh.

On real hardware the same code maps to multi-host TPU pods: JAX's
collectives ride ICI within a slice and DCN across slices with no code
change (docs/architecture.md, multi-host note). SURVEY scopes DCN to
"very large grids"; this dry run is the executable proof of the path.

Run directly (spawns its own workers):
    PYTHONPATH=/root/repo python tools/dcn_dryrun.py
or as part of the driver dry run:
    QM_DRYRUN_DCN=1 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

Exit code 0 + "DCN_DRYRUN_OK" on stdout = pass.

"""

import json
import os
import pathlib
import socket
import subprocess
import sys

N_PROCESSES = 2
DEVICES_PER_PROC = 4


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(process_id, coordinator):
    import jax

    # The axon sitecustomize pre-imports jax pinned to the TPU tunnel;
    # env JAX_PLATFORMS is a silent no-op by then. Force the host
    # platform before the backend initialises.
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quakemigrate_tpu.parallel import (
        make_mesh,
        make_sharded_detect,
        make_sharded_detect_fused,
        pad_nodes_for_mesh,
    )

    n_global = N_PROCESSES * DEVICES_PER_PROC
    devices = jax.devices()
    assert len(devices) == n_global, (
        f"global device count {len(devices)} != {n_global}"
    )
    assert jax.process_count() == N_PROCESSES
    mesh = make_mesh(devices, axis_names=("grid",))

    def globalise(arr, spec):
        """Host numpy -> process-spanning global jax.Array."""

        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    n_onsets, nsamples, fsmp, lsmp = 8, 64, 16, 32
    tile = 32
    rng = np.random.default_rng(1)  # same seed on both processes
    t_samples = nsamples + fsmp + lsmp
    tt = rng.integers(0, lsmp, size=(1000, n_onsets)).astype(np.int32)
    onsets = rng.gamma(2.0, 1.5, size=(n_onsets, t_samples)).astype(
        np.float32
    )
    mask = np.ones(n_onsets, dtype=np.float32)
    tt_padded, n_real = pad_nodes_for_mesh(tt, n_global, tile=tile)

    fn = make_sharded_detect(mesh, fsmp, nsamples, n_real, tile=tile)
    out = fn(
        globalise(onsets, P()),
        globalise(tt_padded, P("grid", None)),
        globalise(mask, P()),
        globalise(np.asarray(mask.sum(), dtype=np.float32), P()),
    )
    # Outputs are replicated (out_specs P()): every process holds full
    # copies in its addressable shards.
    got = [np.asarray(o.addressable_shards[0].data) for o in out]

    # The fused window program across the same process-spanning mesh.
    n_slots, c_max = n_onsets, 3
    channels = rng.normal(size=(n_slots, c_max, t_samples)).astype(
        np.float32
    )
    chan_mask = np.ones((n_slots, c_max), dtype=np.float32)
    chan_mask[: n_slots // 2, 1:] = 0.0
    slot_mask = np.ones(n_slots, dtype=np.float32)
    nsta = np.full(n_slots, 4, dtype=np.int32)
    nlta = np.full(n_slots, 12, dtype=np.int32)
    fused = make_sharded_detect_fused(
        mesh, "classic", "energy", 0.5, fsmp, nsamples, n_real, tile=tile,
    )
    fused_out = fused(
        globalise(channels, P()),
        globalise(chan_mask, P()),
        globalise(slot_mask, P()),
        globalise(nsta, P()),
        globalise(nlta, P()),
        globalise(tt_padded, P("grid", None)),
    )
    fused_got = [
        np.asarray(o.addressable_shards[0].data) for o in fused_out
    ]

    if process_id == 0:
        # Single-device reference on this process's local devices.
        from quakemigrate_tpu.ops.migrate import migrate_detect

        ref = [
            np.asarray(v)
            for v in migrate_detect(
                onsets, tt, mask, float(mask.sum()), fsmp, nsamples,
                tile=tile,
            )
        ]
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-6)
        np.testing.assert_array_equal(got[2], ref[2])
        assert np.isfinite(fused_got[0]).all()
        print(
            json.dumps(
                {
                    "processes": N_PROCESSES,
                    "devices_per_process": DEVICES_PER_PROC,
                    "global_devices": n_global,
                    "argmax_match": True,
                    "fused_finite": True,
                }
            )
        )
        print("DCN_DRYRUN_OK")
    jax.distributed.shutdown()


def main():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}"
        ),
        PYTHONPATH=(
            str(pathlib.Path(__file__).resolve().parent.parent)
            + os.pathsep
            + env.get("PYTHONPATH", "")
        ),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i), coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROCESSES)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and "DCN_DRYRUN_OK" in outs[0]
    for i, text in enumerate(outs):
        sys.stdout.write(
            "".join(
                f"[proc {i}] {line}\n" for line in text.strip().splitlines()
            )
        )
    if not ok:
        sys.exit("DCN dry run FAILED")
    print("DCN_DRYRUN_OK (parent)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
