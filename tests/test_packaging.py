"""Packaging surface: pyproject entry points resolve and stay in sync.

The reference exposes ~19 top-level scripts (SURVEY.md §2b); after
``pip install`` our console scripts must cover the same names
(docs/MIGRATION.md script map).  These tests keep pyproject.toml, the
dispatcher TOOLS map, and entrypoints.py from drifting apart.
"""

import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        return tomllib.load(fh)


def test_every_console_script_resolves():
    import importlib

    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) == 20  # dispatcher + 19 reference script names
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), name


def test_reference_script_names_covered():
    scripts = set(_pyproject()["project"]["scripts"])
    expected = {
        "teHmmTrain", "teHmmEval", "teHmmView", "teHmmBenchmark",
        "segmentTracks", "setTrackScaling", "trackDump",
        "compareBedStates", "fitStateNames", "addBedGaps",
        "addBedColors", "removeBedOverlaps", "chunkBedRegions",
        "bedStats", "tsdFinder", "addTsdTrack", "trackRanking",
        "cleanRM", "cleanLtrFinderID",
    }
    assert expected <= scripts


def test_packaged_subpackages_match_disk():
    pkgs = set(_pyproject()["tool"]["setuptools"]["packages"])
    on_disk = {"tehmm_tpu"}
    root = os.path.join(REPO, "tehmm_tpu")
    for entry in os.listdir(root):
        if os.path.isfile(os.path.join(root, entry, "__init__.py")):
            on_disk.add(f"tehmm_tpu.{entry}")
    assert pkgs == on_disk


def test_version_in_sync():
    import tehmm_tpu

    assert _pyproject()["project"]["version"] == tehmm_tpu.__version__


def test_entrypoint_dispatch_runs(capsys, monkeypatch, tmp_path):
    """addBedGaps-style alias actually reaches the subtool parser."""
    from tehmm_tpu import entrypoints

    # bed-tools add-gaps with --help exits 0 through argparse
    monkeypatch.setattr(
        "sys.argv", ["addBedGaps", "--help"], raising=False
    )
    with pytest.raises(SystemExit) as exc:
        entrypoints.add_bed_gaps()
    assert exc.value.code == 0
    assert "add-gaps" in capsys.readouterr().out


def test_native_source_ships_inside_package():
    data = _pyproject()["tool"]["setuptools"]["package-data"]["tehmm_tpu"]
    assert "tehmm_native.cpp" in data
    assert os.path.exists(os.path.join(REPO, "tehmm_tpu",
                                       "tehmm_native.cpp"))
