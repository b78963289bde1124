"""Point-group detection (Schoenflies symbol + rotational symmetry number).

ref: multioptpy/Utils/symmetry_analyzer.py:403 analyze_symmetry (618 LoC).
Pragmatic numpy implementation: principal-axis alignment, then tests for
inversion, proper C_n axes (n up to 8) along candidate directions, mirror
planes, and S_2n — enough to classify the common groups and provide the
rotational symmetry number sigma for RRHO thermochemistry.
"""

from typing import NamedTuple

import numpy as np

from multioptpy_tpu.geometry import center_of_mass, masses_from_z
import jax.numpy as jnp


class SymmetryResult(NamedTuple):
    point_group: str
    symmetry_number: int
    is_linear: bool


def _coincides(coords, z, transformed, tol):
    """Does the transformed structure map onto the original (same-element
    matching)?"""
    n = len(coords)
    used = np.zeros(n, dtype=bool)
    for i in range(n):
        d = np.linalg.norm(transformed[i] - coords, axis=1)
        d[z != z[i]] = np.inf
        d[used] = np.inf
        j = np.argmin(d)
        if d[j] > tol:
            return False
        used[j] = True
    return True


def _rotation_matrix(axis, angle):
    axis = axis / (np.linalg.norm(axis) + 1e-30)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def _reflection_matrix(normal):
    nrm = normal / (np.linalg.norm(normal) + 1e-30)
    return np.eye(3) - 2.0 * np.outer(nrm, nrm)


def _candidate_axes(coords, principal_axes):
    cands = [principal_axes[:, i] for i in range(3)]
    # atom positions and midpoints as additional axis candidates
    for p in coords:
        if np.linalg.norm(p) > 1e-6:
            cands.append(p / np.linalg.norm(p))
    for i in range(len(coords)):
        for j in range(i + 1, len(coords)):
            m = 0.5 * (coords[i] + coords[j])
            if np.linalg.norm(m) > 1e-6:
                cands.append(m / np.linalg.norm(m))
    # dedupe
    uniq = []
    for c in cands:
        if not any(abs(abs(np.dot(c, u)) - 1.0) < 1e-6 for u in uniq):
            uniq.append(c)
    return uniq[:40]


def analyze_symmetry(coords, z, tol=0.05):
    """-> SymmetryResult (ref: symmetry_analyzer.py:403)."""
    coords = np.asarray(coords, dtype=np.float64)
    z = np.asarray(z)
    n = len(coords)
    if n == 1:
        return SymmetryResult("Kh", 1, False)

    masses = np.asarray(masses_from_z(jnp.asarray(z)))
    com = np.asarray(center_of_mass(jnp.asarray(coords), jnp.asarray(masses)))
    x = coords - com

    # inertia tensor & principal axes
    inertia = np.zeros((3, 3))
    for mi, p in zip(masses, x):
        inertia += mi * (np.dot(p, p) * np.eye(3) - np.outer(p, p))
    moments, axes = np.linalg.eigh(inertia)

    # linear?
    if moments[0] < 1e-4 * max(moments[2], 1e-30):
        has_inversion = _coincides(x, z, -x, tol)
        return (SymmetryResult("D*h", 2, True) if has_inversion
                else SymmetryResult("C*v", 1, True))

    has_inversion = _coincides(x, z, -x, tol)

    # find the highest-order proper axis
    best_n, best_axis = 1, None
    for axis in _candidate_axes(x, axes):
        for order in (8, 7, 6, 5, 4, 3, 2):
            r = _rotation_matrix(axis, 2 * np.pi / order)
            if _coincides(x, z, x @ r.T, tol):
                if order > best_n:
                    best_n, best_axis = order, axis
                break

    if best_n == 1:
        # Cs / Ci / C1
        for axis in _candidate_axes(x, axes):
            if _coincides(x, z, x @ _reflection_matrix(axis).T, tol):
                return SymmetryResult("Cs", 1, False)
        if has_inversion:
            return SymmetryResult("Ci", 1, False)
        return SymmetryResult("C1", 1, False)

    # cubic groups: four or more C3 axes
    if best_n >= 2 and _count_c3_axes(x, z, tol) >= 4:
        if has_inversion:
            return SymmetryResult("Oh" if best_n >= 4 else "Th",
                                  24 if best_n >= 4 else 12, False)
        return SymmetryResult("Td", 12, False)

    # count perpendicular C2 axes
    n_perp_c2 = 0
    for axis in _candidate_axes(x, axes):
        if abs(np.dot(axis, best_axis)) < 0.05:
            r = _rotation_matrix(axis, np.pi)
            if _coincides(x, z, x @ r.T, tol):
                n_perp_c2 += 1

    sigma_h = _coincides(x, z, x @ _reflection_matrix(best_axis).T, tol)
    # vertical mirror?
    sigma_v = False
    for axis in _candidate_axes(x, axes):
        if abs(np.dot(axis, best_axis)) < 0.05:
            if _coincides(x, z, x @ _reflection_matrix(axis).T, tol):
                sigma_v = True
                break

    nax = best_n
    if n_perp_c2 >= nax:
        # dihedral family
        if sigma_h:
            pg, sigma = f"D{nax}h", 2 * nax
        elif sigma_v:
            pg, sigma = f"D{nax}d", 2 * nax
        else:
            pg, sigma = f"D{nax}", 2 * nax
        return SymmetryResult(pg, sigma, False)

    if sigma_h:
        return SymmetryResult(f"C{nax}h", nax, False)
    if sigma_v:
        return SymmetryResult(f"C{nax}v", nax, False)
    # S_2n?
    s2n = _rotation_matrix(best_axis, np.pi / nax) @ _reflection_matrix(best_axis)
    if _coincides(x, z, x @ s2n.T, tol):
        return SymmetryResult(f"S{2 * nax}", nax, False)
    return SymmetryResult(f"C{nax}", nax, False)


def _count_c3_axes(x, z, tol):
    count = 0
    for axis in _candidate_axes(x, np.eye(3)):
        r = _rotation_matrix(axis, 2 * np.pi / 3)
        if _coincides(x, z, x @ r.T, tol):
            count += 1
    return count
