"""Packaging: the framework pip-installs (PEP 660 editable) and its
console entry point + import surface work from an installed context —
no checkout sys.path tricks (the reference is a flat script repo with a
prose dependency list, README.md:15-27; a framework must be
installable)."""

import os
import subprocess
import sys
import venv

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed_venv(tmp_path_factory):
    """A fresh venv (system site-packages for the heavy deps, which are
    preinstalled in CI images) with THIS checkout pip-installed
    editable."""
    env_dir = tmp_path_factory.mktemp("pkg") / "venv"
    try:
        venv.EnvBuilder(system_site_packages=True, with_pip=False,
                        symlinks=True).create(str(env_dir))
    except Exception as e:                      # pragma: no cover
        pytest.skip(f"venv unavailable: {e}")
    py = os.path.join(str(env_dir), "bin", "python")
    # When the test itself runs inside a venv, the new venv chains to
    # the BASE interpreter and can't see this env's site-packages
    # (setuptools for the PEP 660 build, jax/pandas for imports) —
    # bridge them via PYTHONPATH
    import sysconfig
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=sysconfig.get_paths()["purelib"])
    probe = subprocess.run([py, "-m", "pip", "--version"],
                           capture_output=True, text=True, env=env)
    if probe.returncode != 0:                   # pragma: no cover
        pytest.skip("pip unavailable in the venv")
    # --ignore-installed: a dev machine may already have the package on
    # the system site; the test must exercise a genuine install
    r = subprocess.run(
        [py, "-m", "pip", "install", "-e", REPO, "--no-deps",
         "--no-build-isolation", "--ignore-installed", "-q"],
        capture_output=True, text=True, env=env, cwd=str(env_dir))
    assert r.returncode == 0, f"editable install failed:\n{r.stderr}"
    return str(env_dir), env


def test_imports_from_installed_context(installed_venv, tmp_path):
    """From a cwd OUTSIDE the checkout, the package and its public
    surface import via the installed distribution."""
    env_dir, env = installed_venv
    py = os.path.join(env_dir, "bin", "python")
    code = (
        "import multimodalautoencoder_tpu as m\n"
        "from multimodalautoencoder_tpu.api import MultimodalAutoencoder\n"
        "from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep\n"
        "from multimodalautoencoder_tpu import cli\n"
        "print(m.__file__)\n")
    r = subprocess.run([py, "-c", code], capture_output=True, text=True,
                       env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    # editable install resolves to this checkout's package
    assert os.path.realpath(REPO) in os.path.realpath(r.stdout.strip())


def test_console_entry_point(installed_venv, tmp_path):
    """`mmae-tpu` (pyproject [project.scripts]) runs the unified CLI."""
    env_dir, env = installed_venv
    exe = os.path.join(env_dir, "bin", "mmae-tpu")
    assert os.path.exists(exe), "console script not installed"
    r = subprocess.run([exe, "--help"], capture_output=True, text=True,
                       env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    for sub in ("sweep-mmae", "sweep-classification", "fill", "embed",
                "merge-shards"):
        assert sub in r.stdout


def test_version_metadata(installed_venv):
    env_dir, env = installed_venv
    py = os.path.join(env_dir, "bin", "python")
    r = subprocess.run(
        [py, "-c", "from importlib.metadata import version; "
         "print(version('multimodalautoencoder-tpu'))"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "0.5.0"
