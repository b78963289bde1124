"""Reference v1 legacy AutoTS config translation.

The reference's run_autots consumes a JSON config with top-level
step1_settings..step4_settings whose keys are interface.py argparse dest
names (ref: Entrypoints/autots.py:17 "V1 (Legacy)", :21-26 config guide).
autots_config_from_v1 must map the reference's OWN regression fixture
(test/config_autots_run_xtb_test.json) field by field.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.drivers.optimize import _parse_method
from multioptpy_tpu.workflows.autots import autots_config_from_v1

REF_CONFIG = "/root/reference/test/config_autots_run_xtb_test.json"


@pytest.fixture(scope="module")
def ref_cfg():
    with open(REF_CONFIG) as f:
        return json.load(f)


def test_reference_fixture_translates(ref_cfg):
    cfg, flow = autots_config_from_v1(ref_cfg)

    # top level
    assert cfg.top_n_candidates == 3

    # step 1: two AFIR triples -> multi-AFIR list, gamma in kJ/mol units
    # preserved; fragments parsed from the 1-indexed syntax
    assert len(cfg.afir_list) == 2
    (g1, f1a, f1b), (g2, f2a, f2b) = cfg.afir_list
    assert (g1, g2) == (95.0, 50.0)
    assert (tuple(f1a), tuple(f1b)) == ((1,), (5,))
    assert (tuple(f2a), tuple(f2b)) == ((3,), (11,))
    # step-1 optimizer: reference method key passes the registry
    assert cfg.afir_opt.method == "rsirfo_block_fsb"
    assert _parse_method(cfg.afir_opt.method)[0] == "rfo"
    assert cfg.afir_opt.init_hessian == "model:fischerd3"

    # step 2: NSTEP, QSMv2 variant, cubic-predicted redistribution every 1
    assert cfg.neb.n_steps == 20
    assert cfg.neb.variant == "qsm2"
    assert cfg.neb.redistribute == "pred"
    assert cfg.neb.redistribute_every == 1
    assert flow["node_distance"] == pytest.approx(0.30)
    assert cfg.node_distance_ang == pytest.approx(0.30)
    assert flow["save_pict"] is True

    # step 3: saddle refinement keeps saddle_order=1, exact Hessian
    # cadence 5, tight criteria, trust cap 0.2 Ang
    assert cfg.saddle.saddle_order == 1
    assert cfg.saddle.method == "rsirfo_block_bofill"
    assert cfg.saddle.fc_count == 5
    assert cfg.saddle.init_hessian == "exact"
    assert cfg.saddle.max_force == pytest.approx(1.5e-5)
    assert cfg.saddle.trust_radius_ang == pytest.approx(0.2)

    # step 4: IRC spec [0.5, 200, lqa] + step4b endpoint optimizer
    assert cfg.irc.step_size == pytest.approx(0.5)
    assert cfg.irc.n_steps == 200
    assert cfg.irc.method == "lqa"
    assert cfg.endpoint_opt.method == "rsirfo_block_fsb"

    # flow: v1 defaults — no skips; usextb surfaced for calculator choice
    assert flow["skip_step1"] is False
    assert flow["skip_to_step4"] is False
    assert flow["usextb"] == "GFN2-xTB"
    assert flow["frequency_analysis"] is True


def test_switch_pair_and_flow_flags():
    cfg, flow = autots_config_from_v1({
        "skip_to_step4": True,
        "step1_settings": {"opt_method": ["fire", "rsirfo_fsb"],
                           "manual_AFIR": ["120", "1,2", "3-5"]},
        "step2_settings": {"memory_limited_BFGS": True,
                           "apply_CI_NEB": 4,
                           "align_distances_savgol": "2,7,3",
                           "partition": 9,
                           "use_image_dependent_pair_potential": True},
        "step3_settings": {"loose_convergence_criteria": True},
    })
    # two-entry opt_method = sigmoid switching pair (ref optimizer.py:582)
    assert cfg.afir_opt.switch_method == "fire"
    assert cfg.afir_opt.method == "rsirfo_fsb"
    # single AFIR triple -> scalar fields with ranges parsed
    assert tuple(cfg.afir_fragm_1) == (1, 2)
    assert tuple(cfg.afir_fragm_2) == (3, 4, 5)
    assert cfg.afir_gamma == pytest.approx(120.0)
    # NEB: lbfgs clock, CI from iteration 4, savgol respacing w=7 o=3
    assert cfg.neb.optimizer == "lbfgs"
    assert cfg.neb.climbing_start == 4
    assert cfg.neb.redistribute == "savgol"
    assert cfg.neb.redistribute_every == 2
    assert cfg.neb.savgol_window == 7
    assert cfg.use_idpp is True
    assert cfg.n_images == 9          # -p partition overrides image count
    assert cfg.saddle.max_force == pytest.approx(3e-3)  # loose
    assert flow["skip_to_step4"] is True


def test_cli_v1_config_skip_to_step4(tmp_path):
    """End-to-end v1 flow through run_autots_cli: skip_to_step4 treats the
    input as a TS guess — refine + IRC + endpoint opts only (ref:
    Entrypoints/autots.py:78)."""
    from multioptpy_tpu.calculators.model_surfaces import (
        MB_MIN_A, MB_MIN_B, MB_TS_AB)
    from multioptpy_tpu.cli import run_autots_cli
    from multioptpy_tpu.io import read_xyz, write_xyz
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    cfg = {"skip_to_step4": True,
           "step3_settings": {"opt_method": ["rsirfo_bofill"],
                              "calc_exact_hess": 3,
                              "max_trust_radius": 0.1},
           "step4_settings": {
               "intrinsic_reaction_coordinates": ["0.08", "150", "lqa"]}}
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    # the CLI converts input Angstrom -> Bohr; Muller-Brown works in raw
    # units, so pre-divide to land on the intended surface point
    guess = np.array([[MB_TS_AB[0] + 0.05, MB_TS_AB[1] - 0.04, 0.0]])
    xyz = tmp_path / "guess.xyz"
    write_xyz(str(xyz), ["H"], guess * BOHR2ANGSTROM)
    out = tmp_path / "out"

    rc = run_autots_cli([str(xyz), "-cfg", str(cfg_path), "-calc",
                         "muller_brown", "-out", str(out)])
    assert rc == 0
    _, ts_ang = read_xyz(str(out / "ts.xyz"))
    ts = ts_ang * ANGSTROM2BOHR
    np.testing.assert_allclose(ts[0, :2], MB_TS_AB, atol=1e-3)
    # IRC endpoints reached the two adjacent minima
    _, e1 = read_xyz(str(out / "irc_end_1.xyz"))
    _, e2 = read_xyz(str(out / "irc_end_2.xyz"))
    e1, e2 = e1 * ANGSTROM2BOHR, e2 * ANGSTROM2BOHR
    ends = sorted([tuple(e1[0, :2]), tuple(e2[0, :2])])
    expect = sorted([tuple(MB_MIN_A), tuple(MB_MIN_B)])
    np.testing.assert_allclose(np.asarray(ends), np.asarray(expect),
                               atol=5e-3)
