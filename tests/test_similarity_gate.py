# -*- coding: utf-8 -*-
"""
Similarity gate: fail if any repo file regresses toward being a copy of its
reference counterpart (docstring-stripped, in-order line matching). See
tools/simcheck.py for methodology; the reference must be present to run.

"""

import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parents[1] / "tools"
sys.path.insert(0, str(TOOLS))

import simcheck  # noqa: E402


@pytest.mark.skipif(
    not simcheck.REFERENCE.exists(), reason="reference checkout not present"
)
def test_no_file_over_similarity_gate():
    offenders = [
        (path, frac, n)
        for path, frac, n in simcheck.check_all()
        if simcheck.over_gate(frac, n)
    ]
    assert not offenders, (
        "files too similar to their reference counterparts "
        f"(>{simcheck.THRESHOLD:.0%} in-order match and "
        f">{simcheck.MIN_MATCHED_LINES} matched lines): "
        + ", ".join(f"{p} ({f:.0%} of {n})" for p, f, n in offenders)
    )
