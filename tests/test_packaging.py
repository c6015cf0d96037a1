"""Wheel packaging: the built wheel must carry the compiled C engine and
import + run on a host with no toolchain (reference ships built wheels
via scikit-build / cibuildwheel; here setuptools ext_modules builds
librefcore.so into the wheel)."""

import os
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(os.path.join(REPO, "setup.py")),
                    reason="not running from a source tree")
def test_wheel_ships_native_engine_and_imports_without_gcc(tmp_path):
    wheelhouse = tmp_path / "wheelhouse"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", ".", "--no-deps",
         "--no-build-isolation", "-w", str(wheelhouse)],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(wheelhouse.glob("*.whl"))
    assert len(wheels) == 1
    names = zipfile.ZipFile(wheels[0]).namelist()
    assert "pyrodigal_tpu/_native/librefcore.so" in names
    assert "pyrodigal_tpu/models/metagenomic_bins.npz" in names

    inst = tmp_path / "inst"
    zipfile.ZipFile(wheels[0]).extractall(inst)
    # no compiler on PATH: the ctypes loader must use the shipped .so
    env = dict(os.environ, PATH="/nonexistent",
               PYTHONPATH=str(inst))
    probe = (
        "import shutil; assert shutil.which('gcc') is None;\n"
        "import pyrodigal_tpu;\n"
        "assert str(pyrodigal_tpu.__file__).startswith(%r);\n"
        "from pyrodigal_tpu import GeneFinder;\n"
        "g = GeneFinder(meta=True, backend='refcore').find_genes("
        "'AATGTAGGAAAAACAGCATTTTCATTTCGCCATTTT' * 30);\n"
        "print(len(g))\n" % str(inst)
    )
    r = subprocess.run([sys.executable, "-c", probe], env=env,
                       cwd=str(tmp_path), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip() == "1"
