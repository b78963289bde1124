"""LIVE parity wave 36: the learned-step family — RLStepSizeOptimizer,
GANStep, GaussianProcessRegression (gpr_step) — the reference's ML step
enhancements executed, deterministic parts pinned, side by side with our
steppers/learned.py.

Conventions learned by execution (ref: Optimizer/rl_step.py, gan_step.py,
gpr_step.py):

  * RLStepSizeOptimizer.run (:468): the FIRST call short-circuits to
    default_step_size (0.5) * original step — pinned verbatim.
    DEFECT (executed): the "displacement" stored for the policy state
    is geometry MINUS THE PREVIOUS GRADIENT ((geom_num_list - pre_B_g),
    :512) — a geometry and a gradient subtracted in mismatched units
    instead of geom - pre_geom; pinned via displacement_history.
    LATENT DEFECT: _calculate_reward (:365) references energy_change
    in the energy-increase penalty guard before it is ever assigned
    when prev_energy is None -> UnboundLocalError (pinned by direct
    call); the driver path never passes None so it stays latent.
    The normal-path reward is 10 dE/|E_prev| + 0.5 dg/|g_prev| -
    0.2|s-1| (only outside s in [0.1, 1.9]) - 5|dE|/|E_prev| when the
    energy rose — replica-pinned.
  * GANStep.run (:379): verbatim passthrough for the first 3 calls and
    until 10 energy-decreasing samples fill the replay buffer (both
    pinned by object identity). DEFECT (executed): the generator is
    built with input_dim = feature_dim = 3 (:100, :135) but
    _generate_improved_step feeds 9-dim per-row features
    (geometry|gradient|step, :338-343), so generation ALWAYS raises
    "mat1 and mat2 shapes cannot be multiplied (3x9 and 3x64)" and
    run()'s except handler returns the original step — the GAN
    enhancement is a structural NO-OP upstream (pinned over 16 driver
    calls: every return is the original object). A near-zero original
    step also returns by identity. Ours (steppers/learned.py gan_step)
    implements the INTENDED per-DOF multiplicative modulation,
    move = base*(1 + 0.5 tanh(G)), with working shapes.
  * GaussianProcessRegression.kernel (gpr_step.py:22) is the
    vectorized squared-exponential amplitude^2 exp(-|dx|^2/(2 ls^2))
    — pinned against the explicit formula, including that the
    amplitude IS squared here (unlike GPmin's sigma_f, wave 34).

Ref anchors: rl_step.py:180-236 (defaults), :365-396, :468-560;
gan_step.py:97-134 (defaults), :327-449; gpr_step.py:9-33;
ours: steppers/learned.py.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def test_rl_reward_formula_live(tmp_path, monkeypatch):
    # RLStepSizeOptimizer.__init__ mkdirs cwd/rl_models (rl_step.py:227) —
    # run in a tmpdir so it doesn't litter the repo root.
    monkeypatch.chdir(tmp_path)
    rl_mod = _ref_module("multioptpy.Optimizer.rl_step")
    rl = rl_mod.RLStepSizeOptimizer()

    def replica(e, pe, gn, pgn, s):
        r = 10.0 * (pe - e) / (abs(pe) + 1e-10)
        r += 0.5 * (pgn - gn) / (pgn + 1e-10)
        if s < 0.1 or s > 1.9:
            r += -0.2 * abs(s - 1.0)
        if (pe - e) < 0:
            r += -5.0 * abs(pe - e) / (abs(pe) + 1e-10)
        return r

    cases = [(-1.01, -1.0, 0.05, 0.08, 1.0),   # decrease, normal step
             (-0.99, -1.0, 0.09, 0.08, 1.0),   # increase -> extra penalty
             (-1.01, -1.0, 0.05, 0.08, 2.5),   # huge step -> size penalty
             (-1.01, -1.0, 0.05, 0.08, 0.05)]  # tiny step -> size penalty
    for e, pe, gn, pgn, s in cases:
        assert rl._calculate_reward(e, pe, gn, pgn, s) == pytest.approx(
            replica(e, pe, gn, pgn, s), abs=1e-12)

    # LATENT DEFECT: prev_energy=None path reads energy_change unbound
    with pytest.raises(UnboundLocalError):
        rl._calculate_reward(-1.0, None, 0.05, 0.08, 1.0)


def test_rl_first_call_and_displacement_defect_live(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # see test_rl_reward_formula_live
    import torch
    rl_mod = _ref_module("multioptpy.Optimizer.rl_step")
    torch.manual_seed(36)
    rl = rl_mod.RLStepSizeOptimizer()

    rng = np.random.default_rng(36)
    geom = rng.normal(size=(9, 1))
    grad = rng.normal(size=(9, 1)) * 0.1
    move = rng.normal(size=(9, 1)) * 0.05

    with contextlib.redirect_stdout(io.StringIO()):
        out1 = rl.run(geom, grad, None, -1.0, None, move)
    assert np.allclose(out1, 0.5 * move)  # default_step_size passthrough

    grad2 = grad * 0.8
    with contextlib.redirect_stdout(io.StringIO()):
        out2 = rl.run(geom + 0.05, grad2, grad, -1.05, -1.0, move)
    # DEFECT: the stored "displacement" is geometry - PREVIOUS GRADIENT
    disp = np.asarray(rl.displacement_history[-1])
    assert np.allclose(disp, ((geom + 0.05) - grad).flatten(), atol=1e-14)
    assert not np.allclose(disp, np.full(9, 0.05), atol=1e-3)
    # the returned move is a scalar multiple of the original step
    ratio = out2.flatten() / move.flatten()
    assert np.ptp(ratio) < 1e-10
    assert 0.0 < ratio[0] < 2.1  # policy action range, loosely


def test_gan_gating_and_rowwise_scaling_live():
    import torch
    gan_mod = _ref_module("multioptpy.Optimizer.gan_step")
    torch.manual_seed(360)
    gan = gan_mod.GANStep()

    rng = np.random.default_rng(360)
    geom = rng.normal(size=(3, 3))
    grad = rng.normal(size=(3, 3)) * 0.1
    move = rng.normal(size=(3, 3)) * 0.01

    # first 3 calls: verbatim passthrough while history builds
    for i in range(3):
        with contextlib.redirect_stdout(io.StringIO()):
            out = gan.run(geom, -1.0 - 0.01 * i, grad, move)
        assert out is move
    # 4th call: still not enough good samples (10 needed) -> passthrough
    with contextlib.redirect_stdout(io.StringIO()):
        out4 = gan.run(geom, -1.04, grad, move)
    assert out4 is move

    # DEFECT: 3-dim generator vs 9-dim features — generation always
    # raises, so even with a full good-buffer and successful training
    # every driver call keeps returning the ORIGINAL step object
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        for i in range(12):
            out = gan.run(geom - 0.001 * i, -1.05 - 0.01 * i, grad, move)
            assert out is move
    assert "mat1 and mat2 shapes cannot be multiplied (3x9" in buf.getvalue()
    with pytest.raises(RuntimeError, match="cannot be multiplied"):
        with contextlib.redirect_stdout(io.StringIO()):
            gan._generate_improved_step(geom, grad, move.copy())

    # near-zero original step: returned by identity (the only path that
    # escapes before the broken generator)
    tiny = np.zeros((3, 3))
    with contextlib.redirect_stdout(io.StringIO()):
        back = gan._generate_improved_step(geom, grad, tiny)
    assert back is tiny


def test_gpr_kernel_formula_live():
    gpr_mod = _ref_module("multioptpy.Optimizer.gpr_step")
    g = gpr_mod.GaussianProcessRegression(length_scale=0.7, amplitude=1.3)

    rng = np.random.default_rng(361)
    x1 = rng.normal(size=(4, 5))
    x2 = rng.normal(size=(3, 5))
    k = g.kernel(x1, x2)
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    expect = 1.3 ** 2 * np.exp(-d2 / (2 * 0.7 ** 2))
    assert np.allclose(k, expect, atol=1e-10)
    # amplitude is SQUARED here (contrast: GPmin's sigma_f is used raw)
    assert g.kernel(x1[:1], x1[:1])[0, 0] == pytest.approx(1.69)
