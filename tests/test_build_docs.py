# -*- coding: utf-8 -*-
"""
The static docs site builds cleanly: every markdown page renders, the
autodoc API pages cover every package in the reference's sourcecode
toctree (reference docs/sourcecode.rst, docs/submodules/*.rst), and no
internal link in the built site is broken.
"""

import pathlib
import re
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "docs" / "_build" / "html"


@pytest.fixture(scope="module")
def built_site():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "build_docs.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr
    return OUT


def test_markdown_pages_all_rendered(built_site):
    md_pages = [
        p.relative_to(ROOT / "docs").with_suffix(".html")
        for p in (ROOT / "docs").rglob("*.md")
        if "_build" not in p.parts
    ]
    assert md_pages, "docs/ should contain markdown sources"
    for rel in md_pages:
        assert (built_site / rel).exists(), "missing rendered page %s" % rel


def test_api_pages_cover_reference_toctree(built_site):
    # The reference's sourcecode toctree packages (docs/sourcecode.rst)
    # mapped onto this package's layout, plus the native stacks this
    # tree adds.
    for pkg in [
        "quakemigrate_tpu.core",
        "quakemigrate_tpu.export",
        "quakemigrate_tpu.io",
        "quakemigrate_tpu.lut",
        "quakemigrate_tpu.plot",
        "quakemigrate_tpu.signal",
        "quakemigrate_tpu.signal.onsets",
        "quakemigrate_tpu.signal.pickers",
        "quakemigrate_tpu.signal.local_mag",
        "quakemigrate_tpu.util",
        "quakemigrate_tpu.ops",
        "quakemigrate_tpu.parallel",
        "quakemigrate_tpu.seis",
        "quakemigrate_tpu.coords",
    ]:
        page = built_site / "api" / (pkg + ".html")
        assert page.exists(), "missing API page for %s" % pkg
        assert len(page.read_text()) > 500, "API page for %s is empty" % pkg


def test_flagship_symbols_documented(built_site):
    signal = (built_site / "api" / "quakemigrate_tpu.signal.html").read_text()
    for symbol in ["QuakeScan", "Trigger", "detect", "locate"]:
        assert symbol in signal
    lut = (built_site / "api" / "quakemigrate_tpu.lut.html").read_text()
    for symbol in ["LUT", "Grid3D", "compute_traveltimes"]:
        assert symbol in lut


def test_no_broken_internal_links(built_site):
    bad = []
    for f in built_site.rglob("*.html"):
        for m in re.finditer(r'href=[\'"]([^\'"]+)[\'"]', f.read_text()):
            target = m.group(1)
            if target.startswith(("http://", "https://", "#", "mailto:")):
                continue
            target = target.split("#")[0]
            if not target:
                continue
            if not (f.parent / target).resolve().exists():
                bad.append((str(f.relative_to(built_site)), target))
    assert not bad, "broken internal links: %s" % bad[:10]
