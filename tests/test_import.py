# -*- coding: utf-8 -*-
"""
Dependency/import smoke test (the reference keeps an equivalent,
tests/test_import.py): every public subpackage imports and the forbidden
dependencies are genuinely absent from the import graph.

"""

import sys


def test_public_imports():
    import quakemigrate_tpu
    from quakemigrate_tpu import (  # noqa: F401
        LUT,
        Archive,
        QuakeScan,
        Trigger,
        compute_traveltimes,
        read_lut,
        read_nlloc,
        read_stations,
    )
    from quakemigrate_tpu.coords import Proj, Transformer  # noqa: F401
    from quakemigrate_tpu.core import native_available
    from quakemigrate_tpu.export import write_quakeml  # noqa: F401
    from quakemigrate_tpu.ops import migrate_detect  # noqa: F401
    from quakemigrate_tpu.parallel import make_sharded_detect  # noqa: F401
    from quakemigrate_tpu.plot import event_summary  # noqa: F401
    from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime  # noqa: F401
    from quakemigrate_tpu.signal.local_mag import LocalMag  # noqa: F401
    from quakemigrate_tpu.signal.onsets import (  # noqa: F401
        KurtosisOnset,
        STALTAOnset,
    )
    from quakemigrate_tpu.signal.pickers import GaussianPicker  # noqa: F401
    from quakemigrate_tpu.synthetics import simulate_waveforms  # noqa: F401

    assert native_available(), "C core must compile in this environment"


def test_no_forbidden_dependencies():
    # The framework must not (transitively) import the reference's heavy
    # dependencies -- they are not available in deployment environments.
    for module in ("obspy", "pyproj", "skfmm"):
        assert module not in sys.modules, f"{module} leaked into the import graph"
