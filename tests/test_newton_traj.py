"""Growing Newton trajectory on Muller-Brown."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.drivers.newton_traj import GNTConfig, newton_trajectory


def test_gnt_finds_saddle_between_minima():
    calc = MullerBrown()
    z = jnp.array([1])
    a = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    b = jnp.array([[MB_MIN_B[0], MB_MIN_B[1], 0.0]])
    res = newton_trajectory(calc, a, z, product_coords=b, config=GNTConfig(
        step_size=0.06, n_steps=60, n_corrector=80, corrector_rate=0.3))
    d = np.linalg.norm(np.asarray(res.ts_guess[0, :2]) - np.asarray(MB_TS_AB))
    assert d < 0.02
    assert res.ts_energy / 1e-3 == pytest.approx(-40.665, abs=0.1)
    # trajectory stays bounded and ends near the product
    assert np.all(np.isfinite(res.path))
    end = res.path[-1, 0, :2]
    assert np.linalg.norm(end - np.asarray(MB_MIN_B)) < 0.5


def test_gnt_explicit_direction():
    calc = MullerBrown()
    z = jnp.array([1])
    a = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    direction = jnp.array([[0.508, -0.975, 0.0]])
    res = newton_trajectory(calc, a, z, direction=direction, config=GNTConfig(
        step_size=0.06, n_steps=20, n_corrector=80, corrector_rate=0.3))
    assert np.all(np.isfinite(res.path))
    assert res.energies.max() > res.energies[0]  # climbed a barrier
