"""Geometry constraints: gradient/Hessian projection + SHAKE restoration.

TPU-native redesign of the reference constraint layer
(ref: multioptpy/Constraint/constraint_condition.py: ProjectOutConstrain
:341 with types bond/angle/dihedral/x/y/z :374-427, SHAKE :62,
GradientSHAKE :177; fixed atoms: optimization.py:1157 ConstraintManager).

A constraint set is a static list of primitives with target values. The
constraint Jacobian B (K, 3N) comes from `jax.jacfwd` of the stacked
constraint-value function (the reference hand-codes partial B rows,
constraint_condition.py:764-788), so:

    project gradient:  g' = g - B^T (B B^T)^-1 B g
    project Hessian:   H' = P H P,  P = I - B^T (B B^T)^-1 B
    SHAKE:             Gauss-Newton iterations x <- x + B^T (B B^T)^-1 dc
                       until c(x) = c_target  (fixed trip count, jittable)

Cartesian freezes (x/y/z of chosen atoms, whole atoms) are a boolean mask
applied to gradients and steps.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.potentials.base import _angle, _dihedral
from multioptpy_tpu.units import ANGSTROM2BOHR, DEG2RAD


class Constraints:
    """Static constraint specification.

    Parameters
    ----------
    bonds : list of (i, j, target_ang or None)   1-based atoms; None = freeze
        at the initial value.
    angles : list of (i, j, k, target_deg or None)
    dihedrals : list of (i, j, k, l, target_deg or None)
    fixed_atoms : 1-based atom indices frozen in all three directions
        (ref: optimization.py:1200 zero gradients).
    fixed_coords : list of (atom, axis) pairs, axis in {'x','y','z'}
        (ref: constraint_condition.py:374 x/y/z types).
    """

    def __init__(self, bonds=(), angles=(), dihedrals=(), fixed_atoms=(),
                 fixed_coords=(), fbonds=(), projection_vectors=(),
                 atoms_pairs=(), eigvec_modes=(), n_atoms=None):
        self.bond_idx = np.asarray([[b[0] - 1, b[1] - 1] for b in bonds],
                                   np.int32).reshape(-1, 2)
        self.bond_targets = [b[2] for b in bonds]
        self.angle_idx = np.asarray(
            [[a[0] - 1, a[1] - 1, a[2] - 1] for a in angles],
            np.int32).reshape(-1, 3)
        self.angle_targets = [a[3] for a in angles]
        self.dihedral_idx = np.asarray(
            [[d[0] - 1, d[1] - 1, d[2] - 1, d[3] - 1] for d in dihedrals],
            np.int32).reshape(-1, 4)
        self.dihedral_targets = [d[4] for d in dihedrals]
        self.fixed_atoms = np.asarray([a - 1 for a in fixed_atoms], np.int32)
        ax_map = {"x": 0, "y": 1, "z": 2}
        self.fixed_coords = [(a - 1, ax_map[ax]) for a, ax in fixed_coords]
        # fragment-centroid distance constraints
        # (ref: constraint_condition.py:385 "fbond"):
        # list of (fragm1_atoms, fragm2_atoms, target_ang or None), 1-based
        self.fbond_idx = [(np.asarray(f[0], np.int32) - 1,
                           np.asarray(f[1], np.int32) - 1) for f in fbonds]
        self.fbond_targets = [f[2] for f in fbonds]
        # arbitrary fixed directions projected out of gradient and step
        # (ref: constraint_condition.py:414 "eigvec" — resolve the Hessian
        # eigenvector ONCE at setup and pass it here)
        self.projection_vectors = [np.asarray(v, np.float64).reshape(-1)
                                   for v in projection_vectors]
        # "atoms_pair": project out the mutual approach/retreat direction of
        # an atom pair (ref: constraint_condition.py:425 "atoms_pair" —
        # there the vector is frozen at the initial geometry; here it is
        # rebuilt from the CURRENT geometry so it stays meaningful when the
        # molecule rotates). 1-based pairs.
        self.atoms_pairs = [(p[0] - 1, p[1] - 1) for p in atoms_pairs]
        # unresolved eigvec constraints: sorted-eigenvalue mode indices to
        # be turned into projection vectors once a Hessian is available
        # (ref: constraint_condition.py:414-424 — the reference also
        # resolves them lazily at setup from the first Hessian)
        self.eigvec_modes = [int(m) for m in eigvec_modes]
        self.n_atoms = n_atoms

    def resolve_eigvecs(self, hessian):
        """Resolve pending `eigvec_modes` against a (3N,3N) Hessian: mode k
        = the k-th smallest eigenvalue with |eig| > 1e-10 (the reference's
        selection, constraint_condition.py:417-422); appends the
        eigenvectors to `projection_vectors` and clears the pending list."""
        if not self.eigvec_modes:
            return self
        h = np.asarray(hessian)
        w, v = np.linalg.eigh(h)
        valid = np.where(np.abs(w) > 1e-10)[0]
        order = valid[np.argsort(w[valid])]
        for m in self.eigvec_modes:
            self.projection_vectors.append(
                np.asarray(v[:, order[m]], np.float64).reshape(-1))
        self.eigvec_modes = []
        return self

    @property
    def n_constraints(self):
        return (len(self.bond_idx) + len(self.angle_idx)
                + len(self.dihedral_idx) + len(self.fbond_idx))

    def has_any(self):
        return (self.n_constraints > 0 or len(self.fixed_atoms) > 0
                or len(self.fixed_coords) > 0
                or len(self.projection_vectors) > 0
                or len(self.atoms_pairs) > 0)

    # --- values ------------------------------------------------------------

    def values(self, coords):
        """(K,) stacked constraint values (Bohr / radians)."""
        parts = []
        for i, j in self.bond_idx:
            d = coords[i] - coords[j]
            parts.append(jnp.sqrt(jnp.sum(d * d) + 1e-14))
        for i, j, k in self.angle_idx:
            parts.append(_angle(coords[i], coords[j], coords[k]))
        for i, j, k, l in self.dihedral_idx:
            parts.append(_dihedral(coords[i], coords[j], coords[k], coords[l]))
        for f1, f2 in self.fbond_idx:
            d = jnp.mean(coords[f1], axis=0) - jnp.mean(coords[f2], axis=0)
            parts.append(jnp.sqrt(jnp.sum(d * d) + 1e-14))
        if not parts:
            return jnp.zeros((0,), coords.dtype)
        return jnp.stack(parts)

    def targets(self, coords0):
        """Resolve target vector; None targets freeze at coords0 values.
        Units: Angstrom for bonds, degrees for angles/dihedrals."""
        current = np.asarray(self.values(jnp.asarray(coords0)))
        out = []
        idx = 0
        for t in self.bond_targets:
            out.append(current[idx] if t is None else float(t) * ANGSTROM2BOHR)
            idx += 1
        for t in self.angle_targets:
            out.append(current[idx] if t is None else float(t) * DEG2RAD)
            idx += 1
        for t in self.dihedral_targets:
            out.append(current[idx] if t is None else float(t) * DEG2RAD)
            idx += 1
        for t in self.fbond_targets:
            out.append(current[idx] if t is None else float(t) * ANGSTROM2BOHR)
            idx += 1
        return jnp.asarray(out, dtype=jnp.asarray(coords0).dtype)

    # --- Jacobian & projections -------------------------------------------

    def jacobian(self, coords):
        n = coords.shape[0]
        return jax.jacfwd(
            lambda x: self.values(x.reshape(n, 3)))(coords.reshape(-1))

    def _projector_apply(self, vec_flat, coords):
        """v - B^T (B B^T)^-1 B v, plus removal of any fixed projection
        vectors (eigvec constraints)."""
        if self.n_constraints:
            b = self.jacobian(coords)
            bbt = b @ b.T
            from multioptpy_tpu.ops.eigh64 import solve_f64safe
            lam = solve_f64safe(
                bbt + 1e-12 * jnp.eye(bbt.shape[0], dtype=bbt.dtype),
                b @ vec_flat, assume_sym=True)
            vec_flat = vec_flat - b.T @ lam
        for v in self.projection_vectors:
            u = jnp.asarray(v, vec_flat.dtype)
            u = u / (jnp.linalg.norm(u) + 1e-30)
            vec_flat = vec_flat - jnp.dot(u, vec_flat) * u
        for i, j in self.atoms_pairs:
            d = coords[j] - coords[i]
            u = jnp.zeros((coords.shape[0], 3), vec_flat.dtype)
            u = u.at[i].set(d).at[j].set(-d)
            u = u.reshape(-1)
            u = u / (jnp.linalg.norm(u) + 1e-30)
            vec_flat = vec_flat - jnp.dot(u, vec_flat) * u
        return vec_flat

    def mask(self, dtype=jnp.float64):
        """(N,3) multiplicative freeze mask (1 = free)."""
        m = np.ones((self.n_atoms, 3))
        for a in self.fixed_atoms:
            m[a, :] = 0.0
        for a, ax in self.fixed_coords:
            m[a, ax] = 0.0
        return jnp.asarray(m, dtype)

    def project_gradient(self, gradient, coords):
        """Remove constraint-violating directions + apply freezes
        (ref: constraint_condition.py:341, optimization.py:1200)."""
        g = gradient.reshape(-1)
        g = self._projector_apply(g, coords)
        g = g.reshape(gradient.shape) * self.mask(gradient.dtype)
        return g

    def project_hessian(self, hessian, coords):
        """P H P with the same projector; frozen DOFs get unit diagonal."""
        if self.n_constraints:
            b = self.jacobian(coords)
            bbt = b @ b.T
            from multioptpy_tpu.ops.eigh64 import solve_f64safe
            binv = solve_f64safe(
                bbt + 1e-12 * jnp.eye(bbt.shape[0], dtype=bbt.dtype), b,
                assume_sym=True)
            p = jnp.eye(b.shape[1], dtype=hessian.dtype) - b.T @ binv
            hessian = p.T @ hessian @ p
        m = self.mask(hessian.dtype).reshape(-1)
        hessian = hessian * m[:, None] * m[None, :]
        hessian = hessian + jnp.diag(1.0 - m)
        return 0.5 * (hessian + hessian.T)

    # --- SHAKE -------------------------------------------------------------

    def shake(self, coords, targets, n_iter=30):
        """Restore c(x) = targets by Gauss-Newton (ref:
        constraint_condition.py:62 SHAKE; fixed-iteration, jittable).
        Dihedral mismatches wrap mod 2 pi."""
        if self.n_constraints == 0:
            return coords
        nb, na = len(self.bond_idx), len(self.angle_idx)
        is_dihedral = jnp.arange(self.n_constraints) >= (nb + na)
        n = coords.shape[0]
        mask_flat = self.mask(coords.dtype).reshape(-1)

        def body(_, x):
            c = self.values(x.reshape(n, 3))
            dc = targets - c
            dc = jnp.where(is_dihedral,
                           jnp.arctan2(jnp.sin(dc), jnp.cos(dc)), dc)
            b = jax.jacfwd(lambda xx: self.values(xx.reshape(n, 3)))(x)
            b = b * mask_flat[None, :]  # frozen DOFs cannot move
            bbt = b @ b.T
            from multioptpy_tpu.ops.eigh64 import solve_f64safe
            lam = solve_f64safe(
                bbt + 1e-12 * jnp.eye(bbt.shape[0], dtype=bbt.dtype), dc,
                assume_sym=True)
            return x + b.T @ lam

        x = jax.lax.fori_loop(0, n_iter, body, coords.reshape(-1))
        return x.reshape(coords.shape)
