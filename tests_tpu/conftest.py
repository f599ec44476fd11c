# -*- coding: utf-8 -*-
"""
On-hardware (TPU) test tier configuration.

Unlike tests/conftest.py (which pins the suite to a virtual CPU mesh),
this tier runs ONLY when a real TPU backend is attached and compiles the
Pallas kernels with Mosaic -- catching the regression class that is
invisible on CPU: scoped-VMEM compile deaths, Mosaic lowering anomalies,
and layout/alignment faults (see commit abfafbd and VERDICT r2 weak #2).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python -m pytest tests_tpu -q
Record into the bench artifact: tools/run_tpu_tests.py

"""

import pytest


def _tpu_available():
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_available():
        return
    skip = pytest.mark.skip(reason="no TPU backend attached")
    for item in items:
        item.add_marker(skip)
