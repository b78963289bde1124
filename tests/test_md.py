"""MD: NVE energy conservation, thermostats reach target temperature."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.md import (
    MDConfig,
    instantaneous_temperature,
    maxwell_boltzmann,
    run_md,
)
from multioptpy_tpu.geometry import masses_from_z
from multioptpy_tpu.periodic import UFF_VDW_R

RMIN = float(UFF_VDW_R[18])


@pytest.fixture(scope="module")
def ar4():
    c = np.array([[0.0, 0.0, 0.0], [RMIN, 0.0, 0.0],
                  [RMIN / 2, RMIN * 0.866, 0.0],
                  [RMIN / 2, RMIN * 0.289, RMIN * 0.816]])
    return jnp.asarray(c), jnp.array([18, 18, 18, 18])


def test_nve_conserves_energy(ar4):
    coords, z = ar4
    res = run_md(LennardJones(), coords, z, MDConfig(
        timestep_fs=2.0, n_steps=400, temperature=30.0, thermostat="none"))
    from multioptpy_tpu.drivers.md import AMU2AU, kinetic_energy
    m = masses_from_z(z) * AMU2AU
    # total energy drift must be tiny relative to kinetic energy scale
    ke_final = float(kinetic_energy(res.final.velocities, m))
    e_tot_start = res.energies[0]  # potential only; compare drift via std
    # reconstruct total energy at each recorded frame is overkill — check
    # the potential energy stays bounded and finite, and temperature sane
    assert np.all(np.isfinite(res.energies))
    assert np.all(res.temperatures < 500.0)
    # LJ4 at 30 K must not dissociate in 0.8 ps
    d01 = np.linalg.norm(res.trajectory[-1, 0] - res.trajectory[-1, 1])
    assert d01 < 3 * RMIN


def test_nve_total_energy_drift(ar4):
    coords, z = ar4
    from multioptpy_tpu.drivers.md import AMU2AU, kinetic_energy, make_md_step, MDState
    import jax
    cfg = MDConfig(timestep_fs=1.0, n_steps=200, temperature=30.0,
                   thermostat="none", remove_com=False)
    m = masses_from_z(z) * AMU2AU
    key = jax.random.PRNGKey(1)
    v0 = maxwell_boltzmann(key, m, 30.0)
    res = run_md(LennardJones(), coords, z, cfg, velocities=v0)
    e_pot = res.energies
    # recompute KE along traj: use velocity at end only; proxy: start/end
    # total energies agree to ~1e-7 Ha with dt=1 fs for argon
    calc = LennardJones()
    e_k_end = float(kinetic_energy(res.final.velocities, m))
    e_k_start = float(kinetic_energy(v0, m))
    e_start = float(calc.energy(coords, z)) + e_k_start
    e_end = float(res.final.energy) + e_k_end
    assert abs(e_end - e_start) < 5e-7


@pytest.mark.parametrize("thermo", ["langevin", "nosehoover", "berendsen"])
def test_thermostats_hold_temperature(ar4, thermo):
    coords, z = ar4
    res = run_md(LennardJones(), coords, z, MDConfig(
        timestep_fs=2.0, n_steps=1500, temperature=40.0, thermostat=thermo,
        tau_fs=20.0, friction_fs=0.05, seed=3))
    t_avg = float(np.mean(res.temperatures[500:]))
    assert 10.0 < t_avg < 120.0  # loose: small system, large fluctuations
    assert np.all(np.isfinite(res.trajectory))


def test_pbc_fragment_wrap():
    """-pbc box: whole covalent fragments wrap so their centers of mass
    stay inside the orthorhombic box (ref: Utils/pbc.py
    apply_periodic_boundary_condition), without tearing bonds."""
    import jax.numpy as jnp
    import numpy as np

    from multioptpy_tpu.drivers.md import make_fragment_pbc_wrap
    from multioptpy_tpu.units import ANGSTROM2BOHR

    # H2 molecule placed outside a 5x5x5 Ang box
    box = (5.0, 5.0, 5.0)
    r = 0.74 * ANGSTROM2BOHR
    mol = np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    shifted = mol + np.array([7.3, -2.0, 11.0]) * ANGSTROM2BOHR
    z = jnp.array([1, 1])
    wrap = make_fragment_pbc_wrap(jnp.asarray(shifted), z, box)
    out = np.asarray(wrap(jnp.asarray(shifted)))
    # bond length preserved exactly (rigid fragment translation)
    np.testing.assert_allclose(np.linalg.norm(out[1] - out[0]), r,
                               rtol=1e-12)
    com = out.mean(axis=0)  # equal masses
    box_bohr = np.asarray(box) * ANGSTROM2BOHR
    assert np.all(com >= 0.0) and np.all(com < box_bohr)


def test_md_with_pbc_box_runs():
    import jax.numpy as jnp
    import numpy as np

    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.periodic import UFF_VDW_R

    rmin = float(UFF_VDW_R[18])
    coords = jnp.asarray(np.array([[0.0, 0.0, 0.0], [rmin, 0.0, 0.0]]))
    z = jnp.array([18, 18])
    res = run_md(LennardJones(), coords, z,
                 MDConfig(n_steps=50, thermostat="none", remove_com=False,
                          temperature=400.0, pbc_box_ang=(8.0, 8.0, 8.0)))
    assert np.all(np.isfinite(res.trajectory))
