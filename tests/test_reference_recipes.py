"""Literal reference command recipes through our CLI.

The reference documents its intended usage as one command line per system
(ref: test/README.md). These tests replay those exact flag sequences
through `run_optmain`/`run_ieipmain`, substituting the on-device `sqm2`
backend for `-xtb GFN2-xTB` (tblite is absent from this image) and a short
step budget — proving a reference user's command lines port unchanged.
"""

import os

import numpy as np
import pytest

from multioptpy_tpu.cli import run_ieipmain, run_optmain

FIXTURES = "/root/reference/test"


def _read_last_energy(out):
    rows = np.loadtxt(os.path.join(out, "energies.csv"), ndmin=1)
    return rows[0], rows[-1]


def test_recipe_222cycle_triple_afir(tmp_path):
    """`optmain 222cycle.xyz -xtb GFN2-xTB -ma 70 1 9 70 11 5 70 7 3
    -opt RFO_FSB -modelhess` (ref: test/README.md line 3) — three
    simultaneous AFIR pairs on a 12-atom macrocycle fragment."""
    out = str(tmp_path / "out")
    run_optmain([f"{FIXTURES}/222cycle.xyz", "-calc", "sqm2",
                 "-ma", "70", "1", "9", "70", "11", "5", "70", "7", "3",
                 "-opt", "RFO_FSB", "-modelhess",
                 "-ns", "12", "-out", out])
    assert os.path.exists(os.path.join(out, "optimized.xyz"))
    e0, e1 = _read_last_energy(out)
    assert np.isfinite(e0) and np.isfinite(e1)
    # AFIR-biased relaxation must make downhill progress on the biased PES
    assert e1 < e0


def test_recipe_epoxidation_lcc(tmp_path):
    """`optmain epoxidation.xyz -xtb GFN2-xTB -ma 200 1 10,13 100 5 2
    -opt RFO_FSB -modelhess -lcc` (ref: test/README.md) — AFIR with a
    multi-atom fragment target (`10,13`) plus loose criteria."""
    out = str(tmp_path / "out")
    run_optmain([f"{FIXTURES}/epoxidation.xyz", "-calc", "sqm2",
                 "-ma", "200", "1", "10,13", "100", "5", "2",
                 "-opt", "RFO_FSB", "-modelhess", "-lcc",
                 "-ns", "10", "-out", out])
    assert os.path.exists(os.path.join(out, "optimized.xyz"))
    e0, e1 = _read_last_energy(out)
    assert np.isfinite(e1) and e1 < e0


def test_recipe_ieip_hcn_pair(tmp_path):
    """`ieipmain <dir>` on the reference's literal hcn A/B pair fixture
    (ref: test/ieip_test/hcn_{A,B}.xyz, ieip.py:250 pair discovery)."""
    out = str(tmp_path / "out")
    rc = run_ieipmain([f"{FIXTURES}/ieip_test", "-calc", "sqm2",
                       "-ns", "30", "-out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "ts_guess.xyz"))
    with open(os.path.join(out, "ts_guess.xyz")) as fh:
        assert fh.readline().strip() == "3"


@pytest.mark.parametrize("name,ma", [
    ("hydroboration", ["100", "1", "13", "100", "14", "4"]),
    ("intramolecular_aldol_rxn", ["100", "2", "16", "100", "17", "25"]),
    ("diels_alder_rxn", ["120", "1", "11", "120", "13", "8"]),
    ("claisen_rearrengment", ["200", "6", "12"]),
    ("swarn_oxidation", ["50", "10", "6"]),
    ("witting_rxn", ["100", "1", "26", "150", "14", "24"]),
])
def test_recipe_more_afir_systems(tmp_path, name, ma):
    """Remaining README optmain recipes with their literal -ma arguments
    (hydroboration has boron, Swern a sulfonium S, Wittig a phosphorus —
    the Pd/Co systems need transition metals beyond the minimal basis)."""
    out = str(tmp_path / "out")
    run_optmain([f"{FIXTURES}/{name}.xyz", "-calc", "sqm2",
                 "-ma", *ma, "-opt", "RFO_FSB", "-modelhess", "-lcc",
                 "-ns", "8", "-out", out])
    assert os.path.exists(os.path.join(out, "optimized.xyz"))
    e0, e1 = _read_last_energy(out)
    assert np.isfinite(e1) and e1 < e0


def test_recipe_ieip_curtius_pair(tmp_path):
    """`ieipmain curtius_rearrgement -xtb GFN2-xTB` (ref: test/README.md)
    — the reference's literal Curtius A/B folder (9 atoms C/H/N/O; the A
    frame uses a charge/spin second line instead of a comment)."""
    out = str(tmp_path / "out")
    rc = run_ieipmain([f"{FIXTURES}/curtius_rearrgement", "-calc", "sqm2",
                       "-ns", "25", "-out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "ts_guess.xyz"))
    with open(os.path.join(out, "ts_guess.xyz")) as fh:
        assert fh.readline().strip() == "9"


def test_recipe_confsearch_s8(tmp_path):
    """Conformer search on the reference's shipped confsearch fixture
    (test/s8_for_confomation_search_test.xyz, an S8 ring) — exercises the
    row-3 d shells through the full confsearch CLI."""
    from multioptpy_tpu.cli import run_confsearch
    out = str(tmp_path / "out")
    rc = run_confsearch([f"{FIXTURES}/s8_for_confomation_search_test.xyz",
                         "-calc", "sqm2", "-ms", "1", "-bsize", "2",
                         "-out", out])
    assert rc == 0
    energies = np.loadtxt(os.path.join(out, "EQ_energy.csv"), ndmin=1)
    assert energies.size >= 1 and np.all(np.isfinite(energies))
