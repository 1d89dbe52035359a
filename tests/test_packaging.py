"""Packaging: the repo is an installable package with a `danerf` console
entry point (VERDICT r3 item 3).  The reference has no packaging at all;
a framework should — these tests pin the pyproject contract."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_declares_entry_point_and_deps():
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "danerf-tpu"
    assert proj["scripts"]["danerf"] == "danerf_tpu.cli.main:main"
    deps = " ".join(proj["dependencies"])
    for need in ("jax", "optax", "numpy", "pillow", "opencv", "matplotlib"):
        assert need in deps, f"missing core dependency {need}"
    extras = proj["optional-dependencies"]
    assert any("torch" in d for d in extras["torch"])
    assert any("scikit-image" in d for d in extras["metrics"])


def test_console_script_runs():
    """After `pip install -e .`, `danerf --help` must work and list the
    subcommand surface (skips when the env hasn't installed the package)."""
    exe = shutil.which("danerf")
    if exe is None:
        pytest.skip("danerf entry point not installed in this environment")
    r = subprocess.run([exe, "--help"], capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    for sub in ("train", "render", "spiral", "effects", "eval", "preview",
                "video"):
        assert sub in r.stdout


def test_module_invocation_still_works():
    """`python -m danerf_tpu.cli.main --help` (the pre-packaging spelling)
    keeps working for users following older docs."""
    r = subprocess.run([sys.executable, "-m", "danerf_tpu.cli.main", "--help"],
                       capture_output=True, text=True, timeout=120, cwd=REPO)
    assert r.returncode == 0, r.stderr
    assert "train" in r.stdout


def test_version_flag():
    r = subprocess.run([sys.executable, "-m", "danerf_tpu.cli.main",
                        "--version"], capture_output=True, text=True,
                       timeout=120, cwd=REPO)
    assert r.returncode == 0
    assert r.stdout.startswith("danerf ")
