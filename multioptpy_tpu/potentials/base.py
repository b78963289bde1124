"""Bias-potential engine: differentiable JAX potentials with free param-grads.

The reference computes, per step and per potential, the bias energy, its
geometry gradient via `torch.func.jacrev`, its Hessian via
`torch.func.hessian`, and dE/dparams (ref: multioptpy/Potential/potential.py:
53-202, autodiff at :127-155). Here each potential is a pure function
`energy(coords, params)`; the engine sums them and differentiates the SUM
once with `jax.value_and_grad` / `jax.hessian`, so XLA fuses the whole bias
stack into one kernel — and `vmap` batches it over ensembles/NEB images.

Atom indices in configs are 1-based (reference CLI convention,
ref: interface.py:408 num_parse) and converted to 0-based arrays here.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.units import ANGSTROM2BOHR


def idx0(atoms):
    """1-based index list -> 0-based int32 numpy array."""
    return np.asarray(atoms, dtype=np.int32) - 1


class BiasPotential:
    """Base class. Subclasses define `name`, `init_params()`, and
    `energy(coords_bohr, params) -> Hartree scalar` (traceable)."""

    name = "base"

    def __init__(self, **config):
        self.config = config

    def init_params(self):
        """Continuously tunable parameters as a 1-D float array (the
        quantities the reference exposes as `bias_pot_params` and logs
        dE/dparam for, ref: potential.py:137-144)."""
        return np.zeros((0,), dtype=np.float64)

    def energy(self, coords, params):
        raise NotImplementedError


class BiasResult(NamedTuple):
    energy: jnp.ndarray          # scalar bias energy (Hartree)
    gradient: jnp.ndarray        # (N,3) bias gradient (Hartree/Bohr)
    param_grads: tuple           # dE/dparams per potential


class BiasEngine:
    """Sums a static list of potentials into one differentiable function.

    Usage:
        engine = BiasEngine([AFIRPotential(...), KeepPotential(...)])
        e, g = engine.energy_and_gradient(coords)       # jit/vmap-safe
        hess = engine.hessian(coords)                    # (3N,3N)
        res = engine.compute(coords)                     # + dE/dparam
    """

    def __init__(self, potentials, dtype=jnp.float64):
        self.potentials = list(potentials)
        self.params = tuple(jnp.asarray(p.init_params(), dtype=dtype)
                            for p in self.potentials)

    def total_energy(self, coords, params=None):
        params = self.params if params is None else params
        e = jnp.asarray(0.0, dtype=coords.dtype)
        for pot, prm in zip(self.potentials, params):
            e = e + pot.energy(coords, prm)
        return e

    def energy_and_gradient(self, coords):
        return jax.value_and_grad(self.total_energy)(coords)

    def hessian(self, coords):
        n = coords.shape[0]
        flat = lambda x: self.total_energy(x.reshape(n, 3))
        return jax.hessian(flat)(coords.reshape(-1))

    def compute(self, coords):
        e, g = self.energy_and_gradient(coords)
        pgrads = jax.grad(lambda prms: self.total_energy(coords, prms))(self.params)
        return BiasResult(e, g, pgrads)

    def __len__(self):
        return len(self.potentials)


_REGISTRY = {}


def register_potential(cls):
    _REGISTRY[cls.name] = cls
    return cls


def get_potential(name, **config):
    import multioptpy_tpu.potentials as _pkg  # noqa: F401  (registration)
    if name not in _REGISTRY:
        raise KeyError(f"unknown bias potential '{name}'; "
                       f"available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**config)


def available_potentials():
    import multioptpy_tpu.potentials as _pkg  # noqa: F401
    return sorted(_REGISTRY)


# ---- shared geometry helpers (all differentiable & branchless) ------------

def _dist(a, b, eps=1e-12):
    d = a - b
    return jnp.sqrt(jnp.sum(d * d) + eps)


def _angle(p1, p2, p3, eps=1e-12):
    """Angle p1-p2-p3 in radians via atan2 (smooth away from exactly 0/pi;
    replaces the reference's Taylor-patched acos,
    ref: keep_angle_potential.py)."""
    v1 = p1 - p2
    v2 = p3 - p2
    cross = jnp.cross(v1, v2)
    return jnp.arctan2(jnp.sqrt(jnp.sum(cross * cross) + eps), jnp.dot(v1, v2))


def _dihedral(p1, p2, p3, p4, eps=1e-12):
    """Signed dihedral in radians, atan2 formulation, IUPAC sign
    convention phi = atan2((n1 x n2) . b2_hat, n1 . n2) — the same as the
    reference's (keep_dihedral_angle_potential.py:90-95; pinned live by
    tests/test_reference_live11.py). The pre-round-3 form used
    (n1 x b2_hat) . n2, which is exactly the NEGATIVE."""
    b1 = p2 - p1
    b2 = p3 - p2
    b3 = p4 - p3
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.sqrt(jnp.sum(b2 * b2) + eps)
    x = jnp.dot(n1, n2)
    y = jnp.dot(jnp.cross(n1, n2), b2n)
    return jnp.arctan2(y, x)


def _fragment_center(coords, indices):
    return jnp.mean(coords[indices], axis=0)


def ang_to_bohr(x):
    return np.asarray(x, dtype=np.float64) * ANGSTROM2BOHR
