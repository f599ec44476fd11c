# -*- coding: utf-8 -*-
"""
Reference-kernel oracle for parity testing.

Compiles the reference project's C sources (migratelib.c / onsetlib.c) from
the read-only checkout at REFERENCE_PATH *at test time* and exposes them via
ctypes, so the JAX kernels can be diffed against the exact float64 semantics
of the original implementation. The sources are never copied into this
repository. Tests that need the oracle are skipped if the reference
checkout or a C compiler is unavailable.

"""

import ctypes
import os
import pathlib
import subprocess
import tempfile

import numpy as np
import numpy.ctypeslib as clib

REFERENCE_PATH = pathlib.Path(
    os.environ.get("QM_REFERENCE_PATH", "/root/reference")
)
_SRC = REFERENCE_PATH / "quakemigrate" / "core" / "src"

_cache = {}


def load_oracle():
    """Compile (once) and load the reference C kernels. None if unavailable."""

    if "lib" in _cache:
        return _cache["lib"]

    lib = None
    if _SRC.exists():
        tmpdir = tempfile.mkdtemp(prefix="qmoracle_")
        sofile = pathlib.Path(tmpdir) / "qmlib_oracle.so"
        cmd = [
            "cc", "-O2", "-shared", "-fPIC", "-fopenmp",
            "-o", str(sofile),
            str(_SRC / "migratelib.c"), str(_SRC / "onsetlib.c"),
            "-lm", "-lgomp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(str(sofile))
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            lib = None

    if lib is not None:
        c_d = clib.ndpointer(dtype=np.double, flags="C_CONTIGUOUS")
        c_i32p = clib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        c_i64p = clib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        i32, i64 = ctypes.c_int32, ctypes.c_int64
        lib.migrate.argtypes = [c_d, c_i32p, c_d, i32, i32, i32, i32, i32,
                                i64, i64]
        lib.find_max_coa.argtypes = [c_d, c_d, c_d, c_i64p, i32, i64, i64]
        hdr = np.dtype(
            [("n", np.int32), ("nsta", np.int32), ("nlta", np.int32)],
            align=True,
        )
        hdr_p = clib.ndpointer(hdr, flags="C_CONTIGUOUS")
        for name in ("overlapping_sta_lta", "centred_sta_lta",
                     "recursive_sta_lta"):
            getattr(lib, name).argtypes = [c_d, hdr_p, c_d]
        lib._hdr_dtype = hdr

    _cache["lib"] = lib
    return lib


def oracle_migrate(onsets, traveltimes_4d, fsmp, lsmp, available, threads=1):
    """Run the reference migrate kernel (expects raw onsets; logs inside)."""

    lib = load_oracle()
    onsets = np.log(np.clip(np.ascontiguousarray(onsets, dtype=np.float64),
                            0.01, np.inf))
    *grid_dims, n_onsets = traveltimes_4d.shape
    t_samples = onsets.shape[1]
    n_samples = t_samples - fsmp - lsmp
    map4d = np.zeros(tuple(grid_dims) + (n_samples,), dtype=np.float64)
    n_nodes = int(np.prod(grid_dims))
    lib.migrate(
        onsets, np.ascontiguousarray(traveltimes_4d, dtype=np.int32), map4d,
        ctypes.c_int32(fsmp), ctypes.c_int32(lsmp), ctypes.c_int32(n_samples),
        ctypes.c_int32(onsets.shape[0]), ctypes.c_int32(available),
        ctypes.c_int64(n_nodes), ctypes.c_int64(threads),
    )
    return map4d


def oracle_find_max_coa(map4d, threads=1):
    lib = load_oracle()
    *grid_dims, n_samples = map4d.shape
    n_nodes = int(np.prod(grid_dims))
    max_coa = np.zeros(n_samples)
    max_norm = np.zeros(n_samples)
    max_idx = np.zeros(n_samples, dtype=np.int64)
    lib.find_max_coa(
        np.ascontiguousarray(map4d), max_coa, max_norm, max_idx,
        ctypes.c_int32(n_samples), ctypes.c_int64(n_nodes),
        ctypes.c_int64(threads),
    )
    return max_coa, max_norm, max_idx


def oracle_sta_lta(signal, nsta, nlta, position="overlapping"):
    lib = load_oracle()
    signal = np.ascontiguousarray(signal, dtype=np.float64)
    head = np.empty(1, dtype=lib._hdr_dtype)
    head[:] = (len(signal), nsta, nlta)
    init = 0.0 if position == "recursive" else 1.0
    onset = np.full(len(signal), init, dtype=np.float64)
    getattr(lib, f"{position}_sta_lta")(signal, head, onset)
    return onset
