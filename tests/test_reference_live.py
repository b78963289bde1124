"""LIVE parity vs the actual reference implementation.

The reference's bias-potential layer (torch) and optimizer math (numpy)
import cleanly in this image, so instead of hand-ported oracles these
tests execute the REAL reference code side by side with ours on the same
inputs: reference energies via torch autograd vs our jax.grad, reference
Hessian-update deltas vs ours. They are the strongest parity evidence the
environment allows (the host QM backends the 1e-8 Ha anchors need are
still absent). Skipped when /root/reference is not mounted.

Import strategy: the reference package __init__ pulls in `ase`, which is
not installed — a stub package module with only __path__ set lets the
pure submodules import directly.

Conventions learned by execution (not visible in the signatures):
  * the reference update formulas are only correct for COLUMN vectors —
    its optimizer reshapes to (3N, 1) (rsirfo.py:1319); 1-D inputs
    silently degenerate through `np.dot(y, y.T)` to scalars.
  * bias-potential energies match to ~1e-6 relative, limited by the last
    digits of the published covalent-radii / unit-conversion constants
    each side ships; the formulas are identical.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

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


def _torch_energy_and_grad(pot, coords_bohr, params):
    import torch

    g = torch.tensor(coords_bohr, dtype=torch.float64, requires_grad=True)
    with contextlib.redirect_stdout(io.StringIO()):
        e = pot.calc_energy(g, params)
    e.backward()
    return float(e.detach()), g.grad.numpy()


# ==========================================================================
# Bias potentials: reference torch autograd vs our jax.grad
# ==========================================================================

def test_afir_live_energy_and_gradient():
    """AFIR (ref: Potential/AFIR_potential.py:18 calc_energy): same alpha
    formula, omega weights, and fragment pair sum — executed live."""
    mod = _ref_module("multioptpy.Potential.AFIR_potential")
    from multioptpy_tpu.potentials.afir import AFIRPotential

    rng = np.random.default_rng(7)
    coords = rng.standard_normal((6, 3)) * 2.0 + 4.0  # Bohr
    z = np.array([6, 1, 1, 8, 1, 1])
    symbols = ["C", "H", "H", "O", "H", "H"]
    gamma = 150.0  # kJ/mol

    ref = mod.AFIRPotential(AFIR_Fragm_1=[1, 2, 3], AFIR_Fragm_2=[4, 5, 6],
                            element_list=symbols)
    import torch

    e_ref, g_ref = _torch_energy_and_grad(
        ref, coords, torch.tensor([gamma], dtype=torch.float64))

    ours = AFIRPotential(gamma=gamma, fragm_1=[1, 2, 3], fragm_2=[4, 5, 6],
                         element_z=z)
    p = jnp.asarray(ours.init_params())
    e = float(ours.energy(jnp.asarray(coords), p))
    g = np.asarray(jax.grad(lambda c: ours.energy(c, p))(jnp.asarray(coords)))

    assert e == pytest.approx(e_ref, rel=2e-6)
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-10)


def test_keep_potential_live():
    """Harmonic bond keep (ref: Potential/keep_potential.py:21)."""
    mod = _ref_module("multioptpy.Potential.keep_potential")
    from multioptpy_tpu.potentials.keep import KeepPotential

    rng = np.random.default_rng(8)
    coords = rng.standard_normal((4, 3)) * 1.5 + 3.0
    k, r0_ang = 2.0, 1.2

    import torch

    ref = mod.StructKeepPotential(keep_pot_spring_const=k,
                                  keep_pot_distance=r0_ang,
                                  keep_pot_atom_pairs=[1, 3])
    e_ref, g_ref = _torch_energy_and_grad(
        ref, coords, torch.tensor([k, r0_ang], dtype=torch.float64))

    ours = KeepPotential(spring_const=k, distance=r0_ang, atom_pair=[1, 3])
    p = jnp.asarray(ours.init_params())
    e = float(ours.energy(jnp.asarray(coords), p))
    g = np.asarray(jax.grad(lambda c: ours.energy(c, p))(jnp.asarray(coords)))
    assert e == pytest.approx(e_ref, rel=2e-6)
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-10)


def test_keep_angle_live():
    """Harmonic angle keep (ref: Potential/keep_angle_potential.py:7
    StructKeepAnglePotential)."""
    mod = _ref_module("multioptpy.Potential.keep_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepAnglePotential

    rng = np.random.default_rng(9)
    coords = rng.standard_normal((4, 3)) * 1.5 + 3.0
    k, angle_deg = 1.5, 104.0

    import torch

    ref = mod.StructKeepAnglePotential(keep_angle_spring_const=k,
                                       keep_angle_angle=angle_deg,
                                       keep_angle_atom_pairs=[1, 2, 3])
    e_ref, g_ref = _torch_energy_and_grad(
        ref, coords, torch.tensor([k, angle_deg], dtype=torch.float64))

    ours = KeepAnglePotential(spring_const=k, angle=angle_deg,
                              atoms=[1, 2, 3])
    p = jnp.asarray(ours.init_params())
    e = float(ours.energy(jnp.asarray(coords), p))
    g = np.asarray(jax.grad(lambda c: ours.energy(c, p))(jnp.asarray(coords)))
    assert e == pytest.approx(e_ref, rel=2e-6)
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-10)


# ==========================================================================
# Hessian updates: reference numpy deltas vs ours
# ==========================================================================

def _sy_fixture(seed=21, d=9):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((d, d))
    h = a @ a.T + np.eye(d)
    s = rng.standard_normal(d) * 0.1
    y = h @ s + 0.02 * rng.standard_normal(d)
    return h, s, y


def _ref_update(name, h, s, y, *extra):
    """Call a reference ModelHessianUpdate method with the COLUMN-vector
    convention its optimizer uses (rsirfo.py:1319 reshape(-1, 1))."""
    mod = _ref_module("multioptpy.Optimizer.hessian_update")
    upd = mod.ModelHessianUpdate()
    with contextlib.redirect_stdout(io.StringIO()):  # ref prints per call
        out = getattr(upd, name)(h, s.reshape(-1, 1), y.reshape(-1, 1),
                                 *extra)
    return out


@pytest.mark.parametrize("ref_name,ours_fn,kw", [
    ("BFGS_hessian_update", "bfgs_delta", {}),
    ("SR1_hessian_update", "sr1_delta", {}),
    ("PSB_hessian_update", "psb_delta", {}),
    ("FSB_hessian_update", "fsb_delta", {}),
    ("Bofill_hessian_update", "bofill_delta", {}),
    ("MSP_hessian_update", "msp_delta", {}),
    ("CFD_FSB_hessian_update", "fsb_delta", {"cfd": True}),
    ("CFD_Bofill_hessian_update", "bofill_delta", {"cfd": True}),
])
def test_hessian_update_live(ref_name, ours_fn, kw):
    """Every quasi-Newton delta vs the reference's ModelHessianUpdate
    executed live (ref: Optimizer/hessian_update.py:248-374)."""
    import multioptpy_tpu.hessian.updates as U

    h, s, y = _sy_fixture()
    ref_delta = _ref_update(ref_name, h, s, y)
    ours = np.asarray(getattr(U, ours_fn)(jnp.asarray(h), jnp.asarray(s),
                                          jnp.asarray(y), **kw))
    np.testing.assert_allclose(ours, ref_delta, rtol=1e-9, atol=1e-12)


def test_flowchart_update_live():
    """Flowchart auto-select (ref: hessian_update.py:163): same branch
    taken and same delta across secant pairs that hit different branches."""
    from multioptpy_tpu.hessian.updates import flowchart_delta

    for seed in (31, 32, 33, 34):
        h, s, y = _sy_fixture(seed)
        ref_delta = _ref_update("flowchart_hessian_update", h, s, y, "fsb")
        ours = np.asarray(flowchart_delta(jnp.asarray(h), jnp.asarray(s),
                                          jnp.asarray(y)))
        np.testing.assert_allclose(ours, ref_delta, rtol=1e-8, atol=1e-11)


def test_double_damping_live():
    """Powell damping step 2 (ref: hessian_update.py:200
    double_damping_step2_only): the damped y~ matches on a pair that
    needs damping (s.y < mu2 s.s) and is untouched on one that doesn't."""
    mod = _ref_module("multioptpy.Optimizer.hessian_update")
    from multioptpy_tpu.hessian.updates import double_damping

    upd = mod.ModelHessianUpdate()
    h, s, y = _sy_fixture(41)
    y_bad = y - 1.5 * (y @ s) / (s @ s) * s  # force s.y < 0 -> damping on
    for yy in (y, y_bad):
        with contextlib.redirect_stdout(io.StringIO()):
            _, y_ref = upd.double_damping_step2_only(s.reshape(-1, 1),
                                                     yy.reshape(-1, 1))
        y_ours = double_damping(jnp.asarray(s), jnp.asarray(yy))
        np.testing.assert_allclose(np.asarray(y_ours),
                                   np.ravel(y_ref), rtol=1e-9, atol=1e-12)


def test_judge_shape_condition_live():
    """Run the reference's own judge_shape_condition (pure numpy) against
    ours on identical geometries and condition triples (ref:
    Utils/bond_connectivity.py:137)."""
    bc = _ref_module("multioptpy.Utils.bond_connectivity")
    from multioptpy_tpu.geometry import judge_shape_condition

    rng = np.random.default_rng(4)
    for _ in range(6):
        c = rng.standard_normal((5, 3)) * 2.5
        for spec in (["1.5", "gt", "1,2"],
                     ["1.5", "lt", "1,2"],
                     ["95", "gt", "1,2,3"],
                     ["95", "lt", "2,3,4"],
                     ["1.0", "gt", "1,2", "2.0", "lt", "3,4"]):
            with contextlib.redirect_stdout(io.StringIO()):
                ref = bool(bc.judge_shape_condition(c.copy(), list(spec)))
            ours = bool(judge_shape_condition(c, list(spec)))
            assert ours == ref, (spec, c)


def test_calc_fragment_grads_live():
    """Reference calc_fragment_grads (optimization.py:1228) vs our
    FragmentGradWrapper projection on the same gradient."""
    opt_mod = _ref_module("multioptpy.optimization")
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.base import Calculator, \
        FragmentGradWrapper

    rng = np.random.default_rng(5)
    g = rng.standard_normal((6, 3))
    frags = [[1, 2, 3], [5, 6]]
    ref = opt_mod.ConstraintManager.calc_fragment_grads(g.copy(), frags)

    class _Fixed(Calculator):
        def energy_and_gradient(self, coords, z):
            return jnp.asarray(0.0), jnp.asarray(g)

    wrapped = FragmentGradWrapper(_Fixed(), frags, 6)
    _, ours = wrapped.energy_and_gradient(jnp.zeros((6, 3)), jnp.ones(6))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-12)


def test_fischer_model_hessian_live():
    """Execute the reference's FischerD3ApproxHessianOld end to end on the
    Claisen fixture and compare with our fischerd3old model Hessian —
    independently expressed (vmapped B-matrix assembly vs per-primitive
    loops), same published force-constant formulas; agreement is at the
    sub-percent level."""
    m = _ref_module("multioptpy.ModelHessian.fischerd3old")
    import jax.numpy as jnp

    from multioptpy_tpu.hessian.model import model_hessian
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR

    s, ca = read_xyz("/root/reference/test/claisen_rearrengment.xyz")
    c = ca * ANGSTROM2BOHR
    z = symbols_to_z(s)
    obj = m.FischerD3ApproxHessianOld()
    with contextlib.redirect_stdout(io.StringIO()):
        h_ref = np.asarray(obj.main(c.copy(), list(s), np.zeros_like(c)))
    h_ours = np.asarray(model_hessian(jnp.asarray(c), jnp.asarray(z),
                                      kind="fischerd3old", project=False))
    assert np.corrcoef(h_ref.ravel(), h_ours.ravel())[0, 1] > 0.995
    assert np.linalg.norm(h_ours) == pytest.approx(
        np.linalg.norm(h_ref), rel=0.02)
    diag_rel = (np.max(np.abs(np.diag(h_ref) - np.diag(h_ours)))
                / np.max(np.abs(np.diag(h_ref))))
    assert diag_rel < 0.05
