"""Installability: pyproject metadata, wheel contents, console script.

The reference's only packaged artifact is
examples/EntropyStableEuler.jl/Project.toml; here the whole framework is
pip-installable (`pip install -e .`) with an ``esdg-cns`` console entry
point.  The wheel build below is the CI-style smoke test: it exercises the
same setuptools path as an editable install (metadata, package discovery,
package-data) without mutating site-packages from inside the test suite.
"""

import subprocess
import sys
import tomllib
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _pyproject():
    return tomllib.loads((REPO / "pyproject.toml").read_text())


def test_pyproject_metadata():
    meta = _pyproject()
    proj = meta["project"]
    assert proj["name"] == "esdg-cns-tpu"
    assert "jax" in proj["dependencies"]
    # console script targets the real CLI main
    assert proj["scripts"]["esdg-cns"] == "esdg_cns_tpu.__main__:main"
    mod, _, attr = proj["scripts"]["esdg-cns"].partition(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), attr))


def test_all_subpackages_listed():
    meta = _pyproject()
    listed = set(meta["tool"]["setuptools"]["packages"])
    on_disk = {"esdg_cns_tpu"} | {
        f"esdg_cns_tpu.{p.parent.name}"
        for p in (REPO / "esdg_cns_tpu").glob("*/__init__.py")
    }
    assert on_disk == listed, (
        f"pyproject packages out of sync: missing {on_disk - listed}, "
        f"stale {listed - on_disk}")


@pytest.mark.slow
def test_wheel_builds_with_data(tmp_path):
    """`pip wheel .` succeeds and the wheel carries every subpackage and
    all 27 vendored quadrature tables (basis/quadrature_data/*.txt)."""
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(REPO), "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path), "--quiet"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    (wheel,) = tmp_path.glob("*.whl")
    names = zipfile.ZipFile(wheel).namelist()
    quad = [n for n in names if "quadrature_data" in n and n.endswith(".txt")]
    assert len(quad) == 27
    for pkg in _pyproject()["tool"]["setuptools"]["packages"]:
        assert f"{pkg.replace('.', '/')}/__init__.py" in names, pkg
    assert any("entry_points.txt" in n for n in names)
