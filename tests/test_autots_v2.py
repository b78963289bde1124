"""AutoTS v2 JSON workflow engine on Muller-Brown."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_C,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.workflows.autots_v2 import (
    AutoTSv2,
    WorkflowError,
    run_autots_v2,
    validate_workflow,
)


def test_validation():
    validate_workflow([{"step": "opt", "repeat": 2}])
    with pytest.raises(WorkflowError):
        validate_workflow([{"step": "nonsense"}])
    with pytest.raises(WorkflowError):
        validate_workflow([{"step": "opt", "repeat": 0}])
    with pytest.raises(WorkflowError):
        validate_workflow([{"step": "opt", "repeat": 1,
                            "repeat_settings": ["a", "b"]}])


def test_neb_saddle_freq_irc_pipeline():
    calc = MullerBrown()
    z = jnp.array([1])
    reactant = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    config = {
        "workflow": [
            {"step": "neb", "settings_key": "neb_settings"},
            {"step": "saddle", "param_override": {"trust_radius": 0.1}},
            {"step": "freq"},
            {"step": "irc", "settings_key": "irc_settings"},
        ],
        "neb_settings": {"n_images": 12, "nsteps": 300, "k_spring": 5e-4,
                         "climbing_start": 40, "from_path": False},
        "irc_settings": {"nsteps": 120, "step_size": 0.05},
    }
    engine = AutoTSv2(calc, reactant, z, config)
    engine.ctx["product"] = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    reports = engine.run()

    steps = [r["step"] for r in reports]
    assert steps == ["neb", "saddle", "freq", "irc"]
    # saddle refined onto TS_AB; freq sees exactly one imaginary mode
    np.testing.assert_allclose(np.asarray(engine.ctx["ts"][0, :2]),
                               MB_TS_AB, atol=1e-4)
    freq_report = reports[2]
    assert freq_report["n_imaginary"] == 1
    assert engine.ctx["irc_ends"] is not None


def test_repeat_with_param_override():
    calc = MullerBrown()
    z = jnp.array([1])
    start = jnp.array([[MB_MIN_A[0] + 0.15, MB_MIN_A[1] - 0.1, 0.0]])
    config = {
        "workflow": [
            {"step": "opt", "repeat": 2,
             "param_override": {"nsteps": 40}},
        ],
    }
    engine, reports = run_autots_v2(calc, start, z, config)
    assert len(reports) == 2
    np.testing.assert_allclose(np.asarray(engine.ctx["geometry"][0, :2]),
                               MB_MIN_A, atol=1e-4)


def test_reference_vocabulary_workflow():
    """The reference's own v2 config layout (test/config_autots_v2_test.json):
    steps named step2/step3/step4 with stepN_settings carrying interface.py
    dest names (NSTEP, opt_method, calc_exact_hess, max_trust_radius,
    intrinsic_reaction_coordinates, step4b_opt_method)."""
    calc = MullerBrown()
    z = jnp.array([1])
    reactant = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    config = {
        "workflow": [
            {"step": "step2"},
            {"step": "step3"},
            {"step": "step4"},
        ],
        "step2_settings": {"NSTEP": 300, "n_images": 12, "k_spring": 5e-4,
                           "climbing_start": 40, "from_path": False},
        "step3_settings": {"opt_method": ["rsirfo_bofill"],
                           "calc_exact_hess": 3,
                           "max_trust_radius": 0.1,
                           "frequency_analysis": True},
        "step4_settings": {
            "intrinsic_reaction_coordinates": ["0.05", "120", "lqa"],
            "step4b_opt_method": ["rsirfo_fsb"]},
    }
    engine = AutoTSv2(calc, reactant, z, config)
    engine.ctx["product"] = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    reports = engine.run()

    assert [r["step"] for r in reports] == ["neb", "saddle", "irc"]
    np.testing.assert_allclose(np.asarray(engine.ctx["ts"][0, :2]),
                               MB_TS_AB, atol=1e-4)
    # step3's frequency_analysis folded into the saddle report
    assert reports[1]["n_imaginary"] == 1
    # step4b endpoint optimization ran and produced two energies
    assert len(reports[2]["endpoint_energies"]) == 2
    # endpoints are the two adjacent minima (A and B)
    from multioptpy_tpu.calculators.model_surfaces import MB_MIN_B
    ends = np.asarray(
        [np.asarray(e)[0, :2] for e in engine.ctx["irc_ends"]])
    got = sorted([tuple(x) for x in ends])
    expect = sorted([tuple(MB_MIN_A), tuple(MB_MIN_B)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=5e-3)


def test_reference_fixture_validates_and_normalizes():
    """The reference's shipped v2 config passes validation and its step1
    settings normalize into engine keys."""
    import json

    with open("/root/reference/test/config_autots_v2_test.json") as f:
        cfg = json.load(f)
    validate_workflow(cfg["workflow"])
    norm = AutoTSv2._normalize(cfg["step1_settings"])
    assert norm["method"] == "rsirfo_block_fsb"
    assert norm["gamma"] == 300.0
    assert norm["fragm_1"] == [3]
    assert norm["fragm_2"] == [21]
    norm2 = AutoTSv2._normalize(cfg["step4_settings"])
    assert norm2["irc_nsteps"] > 0
    assert norm2["irc_method"] == "lqa"
