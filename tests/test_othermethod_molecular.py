"""OtherMethod engines at molecular scale (VERDICT r3 item 4).

HCN <-> HNC isomerization on the on-device SQM2 backend: every
single/double-ended TS-search engine (ADDF multi-channel exploration,
2PSHS, growing Newton trajectory, dimer) must hand a usable guess to
`refine_saddle` and land on a CONVERGED first-order saddle of the real
PES — the reference validates these engines on molecules only
(OtherMethod/addf.py:12, twopshs.py:12, newton_traj.py:9, dimer.py:12);
until this file ours were Muller-Brown-only.

Ground truth pinned by probing this PES: HCN minimum -0.957724 Ha, HNC
minimum -0.935960 Ha, tight isomerization TS -0.775892 Ha (1 imaginary
mode); a second first-order saddle (the wide-arc H-migration channel)
sits at -0.755289 Ha.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multioptpy_tpu.analysis import normal_modes
from multioptpy_tpu.analysis.vibrations import count_imaginary
from multioptpy_tpu.calculators.sqm import SQM2
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.workflows.autots import refine_saddle

A2B = 1.0 / 0.52917721067
Z = (6, 7, 1)

# pinned stationary-point energies of the round-5 SQM2 PES (rep_cn +
# rep_hh_gem model form; re-pinned when the calibration changes)
E_HCN = -0.9067770088720954
E_HNC = -0.8863350532961091
E_TS = -0.7392955671568175


@pytest.fixture(scope="module")
def system():
    calc = SQM2()
    z = jnp.asarray(Z)
    cfg = OptimizeConfig(method="rfo_fsb", nsteps=150, fc_count=10)
    hcn = optimize(calc, jnp.asarray(
        np.array([[0, 0, 0], [0, 0, 1.156], [0.1, 0, -1.064]]) * A2B),
        z, config=cfg)
    hnc = optimize(calc, jnp.asarray(
        np.array([[0, 0, 0], [0, 0, 1.17], [0.1, 0, 2.16]]) * A2B),
        z, config=cfg)
    ts = refine_saddle(calc, jnp.asarray(
        np.array([[0, 0, 0], [0, 0, 1.17], [1.1, 0, 0.6]]) * A2B), z)
    assert bool(hcn.converged) and bool(hnc.converged)
    assert bool(ts.converged)
    assert float(hcn.energy) == pytest.approx(E_HCN, abs=1e-6)
    assert float(hnc.energy) == pytest.approx(E_HNC, abs=1e-6)
    assert float(ts.energy) == pytest.approx(E_TS, abs=1e-6)
    return calc, z, hcn, hnc, ts


def _n_imag(calc, coords, z):
    h = calc.hessian(coords, z)
    return int(count_imaginary(normal_modes(h, coords, z).frequencies_cm1))


def test_addf_explore_finds_isomerization_ts(system):
    """Multi-channel ADD following from the HCN minimum: the softest-mode
    (bend) channels cross the isomerization TS, refine to it exactly, and
    dedupe to a single distinct saddle (ref driver flow:
    OtherMethod/addf.py:12 — channel following + re-optimization)."""
    from multioptpy_tpu.drivers.addf import ADDFConfig, addf_explore

    calc, z, hcn, _, _ = system
    ts_list, channels = addf_explore(calc, hcn.coords, z,
                                     config=ADDFConfig(n_channels=4))
    assert any(ch.crossed_ts for ch in channels)
    assert len(ts_list) >= 1
    best = ts_list[0]
    assert best.converged
    assert best.n_imaginary == 1
    assert best.energy == pytest.approx(E_TS, abs=1e-6)


def test_twopshs_crosses_and_refines_to_first_order_saddle(system):
    """Product-directed sphere growth HCN -> HNC crosses a barrier and the
    crossing refines to a CONVERGED first-order saddle of the PES (this
    PES routes the double-ended frontier over the wide-arc H-migration
    saddle at -0.68676 on the round-5 PES, above the tight bend TS)."""
    from multioptpy_tpu.drivers.twopshs import twopshs

    calc, z, hcn, hnc, _ = system
    res = twopshs(calc, hcn.coords, hnc.coords, z)
    assert res.crossed_ts
    rt = refine_saddle(calc, jnp.asarray(res.ts_guess), z)
    assert bool(rt.converged)
    assert _n_imag(calc, rt.coords, z) == 1
    assert float(rt.energy) > max(E_HCN, E_HNC)
    assert float(rt.energy) == pytest.approx(-0.686762, abs=1e-4)


def test_gnt_guess_refines_to_tight_ts(system):
    """Growing Newton trajectory toward HNC climbs the barrier; its
    highest point refines to the tight isomerization TS (the TR/rot-free
    corrector is what makes the climb real — without it the molecule
    drifts rigidly along r at constant energy)."""
    from multioptpy_tpu.drivers.newton_traj import newton_trajectory

    calc, z, hcn, hnc, _ = system
    g = newton_trajectory(calc, hcn.coords, z, product_coords=hnc.coords)
    assert g.energies.max() > g.energies[0] + 0.05  # climbed
    rg = refine_saddle(calc, jnp.asarray(g.ts_guess), z)
    assert bool(rg.converged)
    assert _n_imag(calc, rg.coords, z) == 1
    assert float(rg.energy) == pytest.approx(E_TS, abs=1e-6)


def test_dimer_converges_from_perturbed_ts(system):
    """Hessian-free dimer refinement: from a randomly perturbed TS with a
    mode-informed orientation it walks back to the exact saddle (the
    reference's dimer runs single-ended from a user guess, ieip.py:326)."""
    from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip
    from multioptpy_tpu.geometry import project_hessian_tr_rot

    calc, z, _, _, ts = system
    h = project_hessian_tr_rot(calc.hessian(ts.coords, z), ts.coords)
    _, v = jnp.linalg.eigh(0.5 * (h + h.T))
    mode = jnp.asarray(np.asarray(v[:, 0]).reshape(3, 3))

    rng = np.random.default_rng(5)
    x0 = ts.coords + jnp.asarray(0.08 * rng.standard_normal((3, 3)))
    d = mode * 0.5
    res = ieip(calc, x0 - d, x0 + d, z,
               config=IEIPConfig(engine="dimer", n_steps=400))
    assert res.converged
    assert res.ts_energy == pytest.approx(E_TS, abs=1e-6)


def test_irc_connects_ts_to_both_minima(system):
    """LQA IRC from the tight TS reaches both basins; endpoint
    optimizations land on the HCN and HNC minima (the reference's
    step-4 connectivity check, autots.py:237)."""
    from multioptpy_tpu.drivers.irc import IRCConfig, irc

    calc, z, hcn, hnc, ts = system
    h_ts = calc.hessian(ts.coords, z)
    res = irc(calc, ts.coords, z, hessian=h_ts,
              config=IRCConfig(method="lqa", step_size=0.15, n_steps=60))
    cfg = OptimizeConfig(method="rfo_fsb", nsteps=150, fc_count=10)
    e_f = float(optimize(calc, jnp.asarray(res.forward_path[-1]), z,
                         config=cfg).energy)
    e_b = float(optimize(calc, jnp.asarray(res.backward_path[-1]), z,
                         config=cfg).energy)
    found = sorted([e_f, e_b])
    assert found[0] == pytest.approx(E_HCN, abs=2e-5)
    assert found[1] == pytest.approx(E_HNC, abs=2e-5)
