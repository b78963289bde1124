"""Calculator protocol: pluggable energy backends.

The reference exposes one duck-typed class per backend with
`single_point(file_directory, ...) -> (e, g, positions, finish_flag)` driven
by files on disk (ref: multioptpy/Calculator/tblite_calculation_tools.py:162).
Here a calculator is a *pure function of device arrays*:

    energy(coords_bohr (N,3), z (N,) int32) -> Hartree scalar

For on-device backends (LJ, EMT, Tersoff, SQM) the function is traceable, so
gradients/Hessians come from `jax.grad`/`jax.hessian`, ensembles from `vmap`,
and multi-chip scaling from `shard_map`. Host backends (tblite/PySCF/Psi4/ASE)
wrap their library call in `jax.pure_callback` with the same signature, so the
drivers are backend-agnostic jitted functions either way.
"""

import jax
import jax.numpy as jnp


class Calculator:
    """Base class. Subclasses implement `energy(coords, z)`.

    Attributes
    ----------
    on_device : bool
        True if `energy` is JAX-traceable end to end (no host callback).
    """

    on_device = True
    name = "base"

    def __init__(self, charge=0, multiplicity=1, **kwargs):
        self.charge = int(charge)
        self.multiplicity = int(multiplicity)
        self.options = kwargs

    def energy(self, coords, z):
        raise NotImplementedError

    def energy_and_gradient(self, coords, z):
        """-> (E, g (N,3)). Overridden by host backends with a callback."""
        return jax.value_and_grad(self.energy, argnums=0)(coords, z)

    def gradient(self, coords, z):
        return self.energy_and_gradient(coords, z)[1]

    def hessian(self, coords, z):
        """Exact Hessian, (3N,3N) (ref: calc_exact_hess, e.g.
        tblite_calculation_tools.py:140). On-device: forward-over-reverse."""
        n = coords.shape[0]
        flat_e = lambda x: self.energy(x.reshape(n, 3), z)
        return jax.hessian(flat_e)(coords.reshape(-1))

    def numerical_hessian(self, coords, z, step=1e-3):
        """Batched central-difference Hessian: all 6N displaced gradients in
        ONE vmapped call (the reference loops them serially,
        ref: tblite_calculation_tools.py:100-138)."""
        n = coords.shape[0]
        n3 = 3 * n
        eye = jnp.eye(n3, dtype=coords.dtype) * step
        flat = coords.reshape(-1)
        plus = (flat[None, :] + eye).reshape(n3, n, 3)
        minus = (flat[None, :] - eye).reshape(n3, n, 3)
        grad_fn = lambda x: self.energy_and_gradient(x, z)[1].reshape(-1)
        g_plus = jax.vmap(grad_fn)(plus)
        g_minus = jax.vmap(grad_fn)(minus)
        h = (g_plus - g_minus) / (2.0 * step)
        return 0.5 * (h + h.T)


_REGISTRY = {}


def register_calculator(name):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.name = name
        return cls
    return deco


def get_calculator(name, **kwargs):
    """Instantiate a backend by name (ref: optimization.py:1528
    _init_calculation_module's string dispatch)."""
    # import for registration side effects
    from multioptpy_tpu.calculators import (  # noqa: F401
        emt, host, lj, model_surfaces, sqm, tersoff)
    if name not in _REGISTRY:
        raise KeyError(f"unknown calculator '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def available_calculators():
    from multioptpy_tpu.calculators import (  # noqa: F401
        emt, host, lj, model_surfaces, sqm, tersoff)
    return sorted(_REGISTRY)


class FragmentGradWrapper(Calculator):
    """Rigid-fragment optimization gradient filter (ref: -of/--opt_fragment,
    optimization.py:1228 calc_fragment_grads): within each listed fragment
    the gradient is replaced by its mean, so those atoms move as one rigid
    translation unit. Wraps any backend; the averaging is a static (N,N)
    projection matmul, jit/vmap-safe."""

    def __init__(self, inner, fragments, n_atoms):
        import numpy as np
        self.inner = inner
        self.on_device = inner.on_device
        self.name = f"fragopt({inner.name})"
        self.charge = inner.charge
        self.multiplicity = inner.multiplicity
        self.options = inner.options
        p = np.eye(n_atoms)
        for frag in fragments:
            idx = [int(a) - 1 for a in frag]
            for i in idx:
                p[i, :] = 0.0
                for j in idx:
                    p[i, j] = 1.0 / len(idx)
        self._proj = jnp.asarray(p)

    def energy(self, coords, z):
        return self.inner.energy(coords, z)

    def energy_and_gradient(self, coords, z):
        e, g = self.inner.energy_and_gradient(coords, z)
        return e, jnp.asarray(self._proj, g.dtype) @ g

    def hessian(self, coords, z):
        return self.inner.hessian(coords, z)


class BondGradProjWrapper(Calculator):
    """Zero the internal-coordinate gradient between atom pairs (ref:
    -gfix/--gradient_fix_atoms, interface.py:90 'set the gradient of
    internal coordinates between atoms to zero'): each listed pair's
    bond-stretch direction is projected out of the gradient, so that bond
    length feels no force while everything else relaxes. The projector is
    rebuilt from the live geometry each call (pure JAX, jit/vmap-safe)."""

    def __init__(self, inner, pairs):
        self.inner = inner
        self.on_device = inner.on_device
        self.name = f"gfix({inner.name})"
        self.charge = inner.charge
        self.multiplicity = inner.multiplicity
        self.options = inner.options
        self.pairs = tuple((int(i) - 1, int(j) - 1) for i, j in pairs)

    def energy(self, coords, z):
        return self.inner.energy(coords, z)

    def _b_rows(self, coords):
        rows = []
        n = coords.shape[0]
        for i, j in self.pairs:
            d = coords[i] - coords[j]
            u = d / (jnp.linalg.norm(d) + 1e-30)
            row = jnp.zeros((n, 3), coords.dtype)
            row = row.at[i].set(u).at[j].set(-u)
            rows.append(row.reshape(-1))
        return jnp.stack(rows)

    def energy_and_gradient(self, coords, z):
        e, g = self.inner.energy_and_gradient(coords, z)
        b = self._b_rows(coords)                      # (P, 3N)
        gram = b @ b.T + 1e-12 * jnp.eye(b.shape[0], dtype=b.dtype)
        from multioptpy_tpu.ops.eigh64 import solve_f64safe
        coef = solve_f64safe(gram, b @ g.reshape(-1), assume_sym=True)
        g_proj = g.reshape(-1) - b.T @ coef
        return e, g_proj.reshape(g.shape)

    def hessian(self, coords, z):
        return self.inner.hessian(coords, z)
