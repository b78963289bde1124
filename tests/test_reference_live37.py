"""LIVE parity wave 37: the NVT thermostats — Nose-Hoover, Nose-Hoover
chain, and Langevin/BAOAB — the reference's actual Thermostat class
executed step by step on shared analytic force fields, side by side with
our drivers/md.py scan kernels (wave 5 pinned Velocity_Verlet; this closes
the rest of MD/thermostat.py).

Conventions learned by execution (ref: MD/thermostat.py):

  * FROZEN FORCE: every thermostat method receives one gradient (new_g,
    evaluated by the driver at the INPUT geometry) and uses it for BOTH
    half-kicks (Nose_Hoover :117, chain :150, Langevin B-steps :262/:307).
    The second kick of a textbook splitting would use the force at the
    updated position; the reference's is a lagged-force integrator. Our
    BAOAB re-evaluates the gradient after the second A (md.py:141) — on a
    CONSTANT force field the two coincide exactly, which is what the
    mapping test below exploits.
  * Nose-Hoover (:117): p *= exp(-dt z/2); p += F dt/2; x += p/m dt;
    z += dt (2KE - 3N kB T0)/Q with KE taken AFTER the first kick and
    Q = 0.1 fixed (:41); p += F dt/2; p *= exp(-dt z_new/2) — the closing
    scaling uses the UPDATED zeta (asymmetric, unlike the symmetric
    Trotter NHC of Martyna-Tuckerman). DOF is 3N, not 3N-3 (:44 g_value;
    no COM removal anywhere).
  * NH chain (:150): fixed 10-link mass ladder Q = [1,2,3,6,10,20,40,50,
    100,200] (:46) regardless of system size or temperature;
    _propagate_nhc_zeta (:71) is a SEQUENTIAL Gauss-Seidel pass — each
    link j's driving force reads the ALREADY-UPDATED link j-1, and the
    coupling drag -dt z_j z_{j+1} uses the updated z_j against the
    not-yet-updated z_{j+1}; the last link gets no drag. Only z[0]
    touches the particle momenta.
  * Langevin/BAOAB (:262): textbook Leimkuhler-Matthews B-A-O-A-B with
    c1 = exp(-gamma dt), c2 = sqrt(1-c1^2), sigma = sqrt(m kB T) — the
    correct momentum-space OU stationary variance — but gamma is the
    hardcoded Langevin_zeta = 0.01 (1/a.u.-time, :31; the -lgv CLI flag
    value is never forwarded into it) and both B kicks reuse the frozen
    entry force. Noise is np.random.normal per step, unseeded.
  * All thermostats run in amu-mass "atomic units" (wave 5): masses enter
    as amu (:18), so trajectories map to true a.u. dynamics with
    dt_au = dt_ref sqrt(1822.888...).
  * init_purtubation (:238) draws Maxwell-Boltzmann momenta as
    randn * sqrt(kB T / m) * m = randn * sqrt(kB T m) via its own
    Box-Muller (:211) — same distribution as our maxwell_boltzmann
    (md.py:62) modulo the amu/au mass convention.

Ours is the symmetric-split redesign (half-dt chain update on each side of
the Verlet core, per-chain masses Q0 = dof kB T tau^2, dof = 3N-3): same
ODE, different (consistent) discretization — pinned here by the
constant-force equivalences and the exact replicas of the reference's
schemes, not by trajectory-matching on curved fields.
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

KB = 3.16681e-6          # hartree/K (ref: MD/thermostat.py:43)
AMU2AU = 1.66053906660e-27 / 9.1093837015e-31


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _make_thermo(p0, temperature=300.0):
    tm = _ref_module("multioptpy.MD.thermostat")
    thermo = tm.Thermostat(p0.copy(), temperature, 101.3,
                           element_list=["Ar", "Ar", "Ar"])
    return thermo


def _harmonic_grad(x, x0, k=0.5):
    return k * (x - x0)


_X0 = np.array([[0.0, 0.0, 0.0], [3.0, 0.1, -0.2], [-0.3, 2.8, 0.4]])
_P0 = np.array([[0.4, -0.2, 0.1], [-0.3, 0.5, 0.0], [0.2, 0.1, -0.6]])


# ==========================================================================
# Nose-Hoover (ref: MD/thermostat.py:117)
# ==========================================================================

def test_nose_hoover_live_exact_replica():
    thermo = _make_thermo(_P0)
    m = thermo.masses.copy()            # (3,1) amu
    dt = thermo.delta_timescale         # 0.1
    q = thermo.Q_value                  # 0.1
    t0 = thermo.initial_temperature
    g_dof = 9.0                         # 3N, not 3N-3

    x_ref = _X0.copy()
    xs_ref, temps_ref = [], []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(10):
            g = _harmonic_grad(x_ref, _X0)
            x_ref = np.asarray(thermo.Nose_Hoover_thermostat(x_ref, g))
            xs_ref.append(x_ref.copy())
            temps_ref.append(thermo.Instantaneous_temperature)

    # transparent replica of the executed discretization
    x, p, zeta = _X0.copy(), _P0.copy(), 0.0
    for step in range(10):
        f = -_harmonic_grad(x, _X0)
        p = p * np.exp(-dt * zeta * 0.5)
        p = p + f * dt * 0.5
        x = x + (p / m) * dt
        ke = np.sum(p ** 2 / (2.0 * m))
        # temperature printed AFTER the first kick, with DOF = 3N
        t_inst = 2.0 * ke / (g_dof * KB)
        zeta = zeta + dt * (2.0 * ke - g_dof * KB * t0) / q
        p = p + f * dt * 0.5
        p = p * np.exp(-dt * zeta * 0.5)     # UPDATED zeta
        np.testing.assert_allclose(x, xs_ref[step], atol=1e-14)
        assert t_inst == pytest.approx(temps_ref[step], abs=1e-10)
    np.testing.assert_allclose(p, thermo.momentum_list, atol=1e-14)
    assert zeta == pytest.approx(thermo.zeta, abs=1e-14)


# ==========================================================================
# Nose-Hoover chain (ref: MD/thermostat.py:150, :71 _propagate_nhc_zeta)
# ==========================================================================

def test_nose_hoover_chain_live_exact_replica():
    thermo = _make_thermo(_P0)
    m = thermo.masses.copy()
    dt = thermo.delta_timescale
    qc = thermo.Q_value_chain.copy()    # fixed 10-link ladder
    t0 = thermo.initial_temperature
    g_dof = 9.0
    assert list(qc) == [1.0, 2.0, 3.0, 6.0, 10.0, 20, 40, 50, 100, 200]

    x_ref = _X0.copy()
    xs_ref = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(10):
            g = _harmonic_grad(x_ref, _X0)
            x_ref = np.asarray(
                thermo.Nose_Hoover_chain_thermostat(x_ref, g))
            xs_ref.append(x_ref.copy())

    x, p = _X0.copy(), _P0.copy()
    zc = np.zeros(10)
    for step in range(10):
        f = -_harmonic_grad(x, _X0)
        p = p * np.exp(-dt * zc[0] * 0.5)
        p = p + f * dt * 0.5
        x = x + (p / m) * dt
        ke2 = 2.0 * np.sum(p ** 2 / (2.0 * m))
        # Gauss-Seidel chain pass: updated j-1 feeds j; drag uses old j+1
        zc[0] += dt * (ke2 - g_dof * KB * t0) / qc[0]
        zc[0] -= dt * zc[0] * zc[1]
        for j in range(1, 9):
            zc[j] += dt * (qc[j - 1] * zc[j - 1] ** 2 - KB * t0) / qc[j]
            zc[j] -= dt * zc[j] * zc[j + 1]
        zc[9] += dt * (qc[8] * zc[8] ** 2 - KB * t0) / qc[9]
        p = p + f * dt * 0.5
        p = p * np.exp(-dt * zc[0] * 0.5)
        np.testing.assert_allclose(x, xs_ref[step], atol=1e-14)
    np.testing.assert_allclose(p, thermo.momentum_list, atol=1e-14)
    np.testing.assert_allclose(zc, thermo.zeta_chain, atol=1e-14)


# ==========================================================================
# Langevin / BAOAB (ref: MD/thermostat.py:262)
# ==========================================================================

def test_langevin_baoab_live_exact_replica():
    thermo = _make_thermo(_P0)
    m = thermo.masses.copy()
    dt = thermo.delta_timescale
    gamma = thermo.Langevin_zeta        # hardcoded 0.01
    t0 = thermo.initial_temperature
    assert gamma == 0.01

    np.random.seed(20260820)
    x_ref = _X0.copy()
    xs_ref = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(8):
            g = _harmonic_grad(x_ref, _X0)
            x_ref = np.asarray(thermo.Langevin_thermostat(x_ref, g))
            xs_ref.append(x_ref.copy())

    np.random.seed(20260820)
    x, p = _X0.copy(), _P0.copy()
    c1 = np.exp(-gamma * dt)
    c2 = np.sqrt(1.0 - c1 ** 2)
    sigma = np.sqrt(m * KB * t0)        # momentum-space OU variance
    for step in range(8):
        f = -_harmonic_grad(x, _X0)     # frozen for BOTH B kicks
        p = p + 0.5 * dt * f
        x = x + (p / m) * (0.5 * dt)
        noise = np.random.normal(0.0, 1.0, p.shape)
        p = c1 * p + c2 * sigma * noise
        x = x + (p / m) * (0.5 * dt)
        p = p + 0.5 * dt * f
        np.testing.assert_allclose(x, xs_ref[step], atol=1e-14)
    np.testing.assert_allclose(p, thermo.momentum_list, atol=1e-14)


# ==========================================================================
# Constant-force equivalence: the frozen-force distinction vanishes, so the
# reference thermostats and our scan kernels coincide exactly under the
# amu<->au mapping of wave 5
# ==========================================================================

class _ConstantForceCalc:
    """Linear potential E = sum(g0 * x): gradient independent of x."""

    on_device = True
    name = "constforce"
    charge = 0
    multiplicity = 1
    options = {}

    def __init__(self, g0):
        self._g0 = jnp.asarray(g0)

    def energy(self, coords, z):
        return jnp.sum(self._g0 * coords)

    def energy_and_gradient(self, coords, z):
        return jnp.sum(self._g0 * coords), jnp.broadcast_to(
            self._g0, coords.shape).astype(coords.dtype)


def test_nose_hoover_qinf_constant_force_matches_our_vv():
    """Q -> inf freezes zeta at 0, reducing the reference NH to lagged-force
    leapfrog; on a constant force field that IS velocity Verlet, and the
    position track matches our thermostat='none' scan under
    dt_au = dt_ref sqrt(amu2au), v = p/(m_amu sqrt(amu2au))."""
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.units import AU2FS

    g0 = np.array([[0.02, -0.01, 0.03]]) * np.ones((3, 1))
    thermo = _make_thermo(_P0)
    thermo.Q_value = 1e300
    m_amu = thermo.masses.copy()
    dt_ref = thermo.delta_timescale

    x_ref = _X0.copy()
    xs_ref = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(10):
            x_ref = np.asarray(thermo.Nose_Hoover_thermostat(x_ref, g0))
            xs_ref.append(x_ref.copy())

    dt_au = dt_ref * np.sqrt(AMU2AU)
    v0 = _P0 / (m_amu * np.sqrt(AMU2AU))
    z = jnp.array([18, 18, 18])
    cfg = MDConfig(timestep_fs=dt_au * AU2FS, n_steps=10,
                   thermostat="none", remove_com=False)
    res = run_md(_ConstantForceCalc(g0), jnp.asarray(_X0), z, cfg,
                 velocities=jnp.asarray(v0), record_every=1)
    traj = np.asarray(res.trajectory)
    for step in range(10):
        np.testing.assert_allclose(traj[step], xs_ref[step], atol=1e-10)


def test_langevin_gamma0_constant_force_matches_our_baoab():
    """gamma -> 0 kills the O step (c1=1, c2=0) on both sides; on a
    constant force the frozen-force BAOAB and our re-evaluating BAOAB
    coincide step for step."""
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.units import AU2FS

    g0 = np.array([[0.015, -0.02, 0.01]]) * np.ones((3, 1))
    thermo = _make_thermo(_P0)
    thermo.Langevin_zeta = 0.0
    m_amu = thermo.masses.copy()
    dt_ref = thermo.delta_timescale

    x_ref = _X0.copy()
    xs_ref = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(10):
            x_ref = np.asarray(thermo.Langevin_thermostat(x_ref, g0))
            xs_ref.append(x_ref.copy())

    dt_au = dt_ref * np.sqrt(AMU2AU)
    v0 = _P0 / (m_amu * np.sqrt(AMU2AU))
    z = jnp.array([18, 18, 18])
    cfg = MDConfig(timestep_fs=dt_au * AU2FS, n_steps=10,
                   thermostat="langevin", friction_fs=0.0,
                   remove_com=False)
    res = run_md(_ConstantForceCalc(g0), jnp.asarray(_X0), z, cfg,
                 velocities=jnp.asarray(v0), record_every=1)
    traj = np.asarray(res.trajectory)
    for step in range(10):
        np.testing.assert_allclose(traj[step], xs_ref[step], atol=1e-10)


# ==========================================================================
# Maxwell-Boltzmann initialization (ref: MD/thermostat.py:238
# init_purtubation, :211 Box-Muller, :226 calc_rand_moment)
# ==========================================================================

def test_init_perturbation_live_momentum_statistics():
    """The reference draws p = randn sqrt(kB T m) per component (amu m);
    executed over many atoms the sample variance matches, and
    calc_rand_moment's scaling is exactly sqrt(kB T m)."""
    tm = _ref_module("multioptpy.MD.thermostat")
    n = 4000
    thermo = tm.Thermostat(np.zeros((n, 3)), 300.0, 101.3,
                           element_list=["Ar"] * n)
    np.random.seed(7)
    thermo.init_purtubation(np.zeros((n, 3)), 0.0, np.zeros((n, 3)))
    p = np.asarray(thermo.momentum_list)
    m_ar = float(thermo.masses[0, 0])
    var_expected = KB * 300.0 * m_ar
    assert np.var(p) == pytest.approx(var_expected, rel=0.05)

    # exact scaling pin: unit random variables -> sqrt(kB T m)
    ones = np.ones((n, 3))
    scaled = np.asarray(thermo.calc_rand_moment_based_on_boltzman_const(
        ones))
    np.testing.assert_allclose(scaled, np.sqrt(var_expected) * ones,
                               rtol=1e-12)

    # ours: same distribution in au masses (md.py:62 maxwell_boltzmann)
    from multioptpy_tpu.drivers.md import maxwell_boltzmann
    m_au = jnp.full((n,), m_ar * AMU2AU)
    v = np.asarray(maxwell_boltzmann(jax.random.PRNGKey(0), m_au, 300.0))
    assert np.var(v * np.asarray(m_au)[:, None]) == pytest.approx(
        KB * 300.0 * m_ar * AMU2AU, rel=0.05)
