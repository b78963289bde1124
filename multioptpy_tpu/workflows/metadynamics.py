"""Metadynamics: MD with Gaussian hills deposited on collective variables.

ref: multioptpy/Potential/potential.py:77-96 (metadynamics history list,
hills appended each step) + gaussian_potential.py driven from the MD loop.
Here the trajectory runs in on-device chunks (`lax.scan`) and hills are
deposited between chunks; the hill buffer has a static shape so the jitted
step never retraces (params carry centers + count).
"""

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.drivers.md import MDConfig, run_md
from multioptpy_tpu.potentials import BiasEngine, get_potential


@dataclasses.dataclass(frozen=True)
class MetadynamicsConfig:
    md: MDConfig = dataclasses.field(default_factory=lambda: MDConfig(
        thermostat="langevin", temperature=300.0, timestep_fs=0.5))
    height_kjmol: float = 2.0
    width_ang: float = 0.2
    deposit_every: int = 50     # MD steps between hills
    n_hills: int = 100
    cv_atom_pair: tuple = (1, 2)


class MetadynamicsResult(NamedTuple):
    trajectory: np.ndarray
    cv_history: np.ndarray       # CV at every deposit
    hill_centers: np.ndarray
    free_energy_cv: np.ndarray   # grid of CV values
    free_energy: np.ndarray      # -sum of hills on the grid (kJ/mol)


def run_metadynamics(calc, coords, z, config=MetadynamicsConfig(),
                     extra_bias=None):
    """Well-tempered-less (standard) metadynamics on a bond CV."""
    pot = get_potential("gaussian_metadyn",
                        height_kjmol=config.height_kjmol,
                        width_ang=config.width_ang,
                        atom_pair=list(config.cv_atom_pair),
                        max_hills=config.n_hills + 1)
    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    cv_hist = []
    frames = []
    velocities = None
    md_cfg = dataclasses.replace(config.md, n_steps=config.deposit_every)
    for i in range(config.n_hills):
        pots = [pot] + (list(extra_bias.potentials) if extra_bias else [])
        engine = BiasEngine(pots)
        res = run_md(calc, coords, z, md_cfg, bias_engine=engine,
                     velocities=velocities)
        coords = jnp.asarray(res.trajectory[-1])
        velocities = res.final.velocities
        cv = float(pot.cv(coords))
        pot.deposit(cv)
        cv_hist.append(cv)
        frames.append(np.asarray(coords))

    centers = pot.centers[: pot.n_hills]
    grid = np.linspace(max(centers.min() - 1.0, 0.1), centers.max() + 1.0,
                       200)
    from multioptpy_tpu.units import HARTREE2KJMOL
    hills = config.height_kjmol * np.exp(
        -(grid[:, None] - centers[None, :]) ** 2
        / (2.0 * (pot.width) ** 2))
    free_energy = -hills.sum(axis=1)

    return MetadynamicsResult(
        trajectory=np.stack(frames), cv_history=np.asarray(cv_hist),
        hill_centers=centers.copy(), free_energy_cv=grid,
        free_energy=free_energy)
