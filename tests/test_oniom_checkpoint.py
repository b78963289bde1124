"""ONIOM composite, O1NumHess, checkpoint/resume, failure detection."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.calculators.oniom import ONIOM
from multioptpy_tpu.calculators.tersoff import Tersoff
from multioptpy_tpu.checkpoint import load_checkpoint, save_checkpoint
from multioptpy_tpu.drivers.optimize import (
    OptimizeConfig,
    dissociation_detected,
    init_state,
    optimize,
)
from multioptpy_tpu.hessian.o1numhess import o1numhess
from multioptpy_tpu.periodic import UFF_VDW_R

RMIN = float(UFF_VDW_R[18])


class TestONIOM:
    def test_extrapolation_identity(self, rng):
        # same calc for both layers -> E_ONIOM == E_low(real) exactly
        coords = jnp.asarray(rng.normal(size=(4, 3)) * 3.0 + 5.0)
        z = jnp.array([18, 18, 18, 18])
        calc = LennardJones()
        oniom = ONIOM(calc, calc, high_atoms=[1, 2])
        e_oniom = float(oniom.energy(coords, z))
        e_direct = float(calc.energy(coords, z))
        assert e_oniom == pytest.approx(e_direct, rel=1e-12)

    def test_gradient_with_link_atoms(self, rng):
        # high layer = doubled LJ so the extrapolation terms do not cancel
        # and the link-atom chain rule is exercised
        class DoubledLJ(LennardJones):
            def energy(self, coords, z):
                return 2.0 * super().energy(coords, z)

        coords = jnp.asarray(rng.normal(size=(4, 3)) * 3.0 + 5.0)
        z = jnp.array([18, 18, 18, 18])
        oniom = ONIOM(DoubledLJ(), LennardJones(), high_atoms=[1, 2],
                      link_bonds=[(2, 3)])
        e, g = oniom.energy_and_gradient(coords, z)
        assert np.all(np.isfinite(np.asarray(g)))
        # finite-difference check including the link-atom chain rule
        eps = 1e-6
        cp = coords.at[2, 0].add(eps)
        cm = coords.at[2, 0].add(-eps)
        fd = (float(oniom.energy(cp, z)) - float(oniom.energy(cm, z))) / (2 * eps)
        assert float(g[2, 0]) == pytest.approx(fd, abs=1e-6)


def test_o1numhess_matches_exact_on_probed_modes(rng):
    coords = jnp.asarray([[0.0, 0.0, 0.0], [RMIN * 1.05, 0.0, 0.0],
                          [RMIN * 0.5, RMIN * 0.9, 0.0]])
    z = jnp.array([18, 18, 18])
    calc = LennardJones()
    h_exact = np.asarray(calc.hessian(coords, z))
    h_o1 = np.asarray(o1numhess(calc, coords, z, n_probes=9, step=1e-4))
    # with all 9 probes the reconstruction must match the exact Hessian
    np.testing.assert_allclose(h_o1, h_exact, atol=5e-6)
    # with few probes, still symmetric and finite
    h_few = np.asarray(o1numhess(calc, coords, z, n_probes=3, step=1e-4))
    np.testing.assert_allclose(h_few, h_few.T, atol=1e-10)


class TestCheckpoint:
    def test_optstate_roundtrip(self, tmp_path, rng):
        coords = jnp.asarray(rng.normal(size=(3, 3)) * 3.0 + 5.0)
        z = jnp.array([18, 18, 18])
        state = init_state(coords, z, LennardJones(), None, OptimizeConfig())
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, state, meta={"iteration": 3})
        state2, meta = load_checkpoint(p)
        assert meta["iteration"] == 3
        assert type(state2).__name__ == "OptState"
        np.testing.assert_allclose(np.asarray(state2.coords),
                                   np.asarray(state.coords))
        np.testing.assert_allclose(np.asarray(state2.hessian),
                                   np.asarray(state.hessian))

    def test_resume_continues(self, tmp_path, rng):
        coords = jnp.asarray([[0.0, 0.0, 0.0], [RMIN * 1.15, 0.0, 0.0],
                              [RMIN * 0.5, RMIN, 0.1]])
        z = jnp.array([18, 18, 18])
        cfg = OptimizeConfig(method="rfo_fsb", nsteps=5, max_force=1e-6,
                             rms_force=7e-7, max_displacement=1e-4,
                             rms_displacement=7e-5)
        p = str(tmp_path / "ck.npz")
        res1 = optimize(LennardJones(), coords, z, config=cfg,
                        checkpoint_path=p, checkpoint_every=5)
        assert os.path.exists(p)
        cfg2 = OptimizeConfig(method="rfo_fsb", nsteps=200, max_force=1e-6,
                              rms_force=7e-7, max_displacement=1e-4,
                              rms_displacement=7e-5)
        res2 = optimize(LennardJones(), coords, z, config=cfg2,
                        resume_from=p)
        assert bool(res2.converged)


class TestFailureDetection:
    def test_dissociation_detector(self):
        ok = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
        broken = np.array([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]])
        assert not dissociation_detected(ok, limit=10.0)
        assert dissociation_detected(broken, limit=10.0)

    def test_stop_file_breaks_loop(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        coords = jnp.asarray([[0.0, 0.0, 0.0], [RMIN * 1.3, 0.0, 0.0],
                              [RMIN * 0.5, RMIN, 0.1]])
        z = jnp.array([18, 18, 18])
        (tmp_path / "end.txt").write_text("stop")
        res = optimize(LennardJones(), coords, z, config=OptimizeConfig(
            method="rfo_fsb", nsteps=500, max_force=1e-9, rms_force=1e-9,
            max_displacement=1e-9, rms_displacement=1e-9))
        assert res.n_iterations == 1  # stopped immediately by end.txt


def test_o1numhess_full_reproduces_lj_hessian():
    """The published O1NumHess pipeline (directions + ODLR + LR loop,
    ref: ModelHessian/o1numhess.py:125) must reproduce the exact Hessian
    of a small LJ cluster within finite-difference accuracy."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.hessian.o1numhess import o1numhess_full

    rng_l = np.random.default_rng(5)
    r = 7.2
    coords = jnp.asarray(np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0],
                                   [r / 2, r * 0.85, 0.0],
                                   [r / 2, r * 0.3, r * 0.8]])
                         + 0.1 * rng_l.standard_normal((4, 3)))
    z = jnp.array([18, 18, 18, 18])
    calc = LennardJones()

    h_o1 = np.asarray(o1numhess_full(calc, coords, z, delta=1e-3))
    h_exact = np.asarray(calc.hessian(coords, z))
    # all atoms are within each other's cutoff here, so the reconstruction
    # is complete: agreement at the FD-truncation level
    scale = np.abs(h_exact).max()
    np.testing.assert_allclose(h_o1, h_exact, atol=3e-5 * max(scale, 1.0),
                               rtol=2e-3)


def test_microiter_oniom_relaxes_environment():
    """MicroiterONIOM (ref: optimization.py:716): the environment FIRE-
    relaxes on the low-level surface with the high layer frozen, so the
    effective energy at a strained environment is lower than plain ONIOM's
    and high-layer rows keep exact positions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.calculators.oniom import MicroiterONIOM, ONIOM
    from multioptpy_tpu.periodic import UFF_VDW_R

    rmin = float(UFF_VDW_R[18])
    # high layer = atoms 1,2 (dimer at equilibrium); environment atom 3
    # starts compressed against them
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [rmin, 0.0, 0.0], [rmin / 2, rmin * 0.55, 0.0]]))
    z = jnp.array([18, 18, 18])
    plain = ONIOM(high_calc=LennardJones(), low_calc=LennardJones(),
                  high_atoms=[1, 2])
    micro = MicroiterONIOM(high_calc=LennardJones(),
                           low_calc=LennardJones(), high_atoms=[1, 2],
                           microiter=60)
    e0 = float(plain.energy(coords, z))
    e1 = float(micro.energy(coords, z))
    assert e1 < e0 - 1e-4
    # gradient flows to the high layer only through its direct dependence
    e, g = micro.energy_and_gradient(coords, z)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(e) == pytest.approx(e1, abs=1e-10)
