"""Examples suite: every script compiles; the offline ones (no dataset
download) run end-to-end.

Mirrors the reference's CI strategy of smoke-running examples
(reference ``.github/workflows/python-package.yml`` runs
``examples/first_example.py``); since this environment has no network
egress, the network-free examples stand in for it.
"""

import glob
import os
import py_compile
import runpy

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
ALL_EXAMPLES = sorted(glob.glob(os.path.join(EXAMPLES_DIR, "*.py")))

# Examples that run without any dataset download.
OFFLINE = [
    "offline_quickstart.py",
    "given_data.py",
    "vebpr_example.py",
    "multichip_sharding.py",
    "seq_objectives_offline.py",
]


def test_examples_exist():
    assert len(ALL_EXAMPLES) >= 60


@pytest.mark.parametrize("path", ALL_EXAMPLES, ids=os.path.basename)
def test_example_compiles(path):
    py_compile.compile(path, doraise=True)


@pytest.mark.parametrize("name", OFFLINE)
def test_offline_example_runs(name, capsys, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # any artifacts land in tmp
    runpy.run_path(os.path.join(EXAMPLES_DIR, name), run_name="__main__")
