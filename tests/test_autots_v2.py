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
