"""Pure-JAX geometry utilities: distances, mass-weighting, TR/rot projection, Kabsch.

Branchless re-design of the reference's numpy helpers
(ref: multioptpy/Utils/calc_tools.py:160-330, :412 Kabsch) so that every
function jits, differentiates, and vmaps over a leading batch axis.
All coordinates are (N, 3) in Bohr unless noted.
"""

import jax
import jax.numpy as jnp

from multioptpy_tpu.periodic import MASS_AMU

_EPS = 1e-12


def pairwise_distances(coords):
    """(N,3) -> (N,N) distance matrix, safe at the diagonal."""
    diff = coords[:, None, :] - coords[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(sq + jnp.eye(coords.shape[0], dtype=coords.dtype) * _EPS) * (
        1.0 - jnp.eye(coords.shape[0], dtype=coords.dtype)
    )


def safe_norm(x, axis=-1, eps=_EPS):
    """Differentiable-at-zero vector norm."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def center_of_mass(coords, masses):
    """(N,3), (N,) -> (3,) (ref: calc_tools.py calc_center_of_mass)."""
    return jnp.sum(coords * masses[:, None], axis=0) / jnp.sum(masses)


def masses_from_z(z):
    """Atomic numbers -> amu masses, as a traced gather."""
    return jnp.asarray(MASS_AMU)[z]


def mass_weight_coords(coords, masses):
    """COM-shifted mass-weighted coordinates (ref: calc_tools.py:160)."""
    com = center_of_mass(coords, masses)
    return (coords - com) * jnp.sqrt(masses)[:, None]


def _orthonormalize_masked(vectors):
    """Modified Gram-Schmidt with rank masking.

    vectors: (k, D). Returns (k, D) where linearly dependent rows are zeroed
    (mirrors the reference's `norm > 1e-10` drop at calc_tools.py:213-224,
    but branchless: dropped vectors become zero rows so the projector
    P = I - sum v v^T is unchanged).
    """
    k = vectors.shape[0]

    def body(i, vecs):
        v = vecs[i]
        # subtract projections onto all previous (already orthonormal) rows
        prev_mask = (jnp.arange(k) < i).astype(v.dtype)
        coeffs = vecs @ v * prev_mask  # (k,)
        v = v - coeffs @ vecs
        norm = jnp.linalg.norm(v)
        v = jnp.where(norm > 1e-10, v / jnp.where(norm > 1e-10, norm, 1.0), 0.0)
        return vecs.at[i].set(v)

    return jax.lax.fori_loop(0, k, body, vectors)


def tr_rot_basis(coords, masses=None):
    """Orthonormal translation+rotation basis, shape (6, 3N).

    If `masses` is given the vectors are mass-weighted (for mass-weighted
    Hessians, ref: calc_tools.py:170); otherwise plain Cartesian
    (ref: calc_tools.py:249 project_out_hess_tr_and_rot_for_coord).
    Zero rows stand in for linearly dependent directions (linear molecules).
    """
    n = coords.shape[0]
    dtype = coords.dtype
    if masses is None:
        w = jnp.ones((n,), dtype=dtype)
        centered = coords - jnp.mean(coords, axis=0)
    else:
        w = jnp.sqrt(masses).astype(dtype)
        centered = coords - center_of_mass(coords, masses)

    eye3 = jnp.eye(3, dtype=dtype)
    # translations: (3, N, 3)
    trans = eye3[:, None, :] * w[None, :, None]
    x, y, z = centered[:, 0], centered[:, 1], centered[:, 2]
    zero = jnp.zeros_like(x)
    # rotations about x, y, z: (3, N, 3)
    rots = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]) * w[None, :, None]
    basis = jnp.concatenate([trans, rots], axis=0).reshape(6, 3 * n)
    return _orthonormalize_masked(basis)


def tr_rot_projector(coords, masses=None):
    """P = I - sum_k v_k v_k^T over the TR/rot basis, shape (3N, 3N)."""
    basis = tr_rot_basis(coords, masses)
    n3 = basis.shape[1]
    return jnp.eye(n3, dtype=coords.dtype) - basis.T @ basis


def project_gradient_tr_rot(gradient, coords):
    """Remove net translation/rotation components from a (N,3) gradient
    (ref: optimization.py:2022 project_out_translation_rotation)."""
    basis = tr_rot_basis(coords)
    g = gradient.reshape(-1)
    g = g - basis.T @ (basis @ g)
    return g.reshape(gradient.shape)


def project_hessian_tr_rot(hessian, coords, masses=None):
    """Project TR/rot modes out of a (3N,3N) Hessian; symmetrized.

    With masses: mass-weighted projection of a *mass-weighted* Hessian
    (caller mass-weights first). Without: Cartesian projection
    (ref: calc_tools.py:249).
    """
    p = tr_rot_projector(coords, masses)
    h = p.T @ hessian @ p
    return 0.5 * (h + h.T)


def kabsch_rotation(p, q, weights=None):
    """Optimal rotation matrix aligning p onto q (both (N,3), centered by
    the caller or here). Returns (3,3) R with det +1.

    ref: calc_tools.py:412 (Kabsch algorithm). SVD-based; jit/vmap-safe.
    """
    if weights is None:
        weights = jnp.ones(p.shape[0], dtype=p.dtype)
    w = weights[:, None]
    pc = p - jnp.sum(p * w, axis=0) / jnp.sum(weights)
    qc = q - jnp.sum(q * w, axis=0) / jnp.sum(weights)
    h = (pc * w).T @ qc
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    flip = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=p.dtype)) + \
        jnp.diag(jnp.array([0.0, 0.0, 1.0], dtype=p.dtype)) * d
    return u @ flip @ vt


def align_to(p, q, weights=None):
    """Rigid-align p onto q (translation + rotation), returns aligned p."""
    if weights is None:
        weights = jnp.ones(p.shape[0], dtype=p.dtype)
    w = weights[:, None]
    pc_mean = jnp.sum(p * w, axis=0) / jnp.sum(weights)
    qc_mean = jnp.sum(q * w, axis=0) / jnp.sum(weights)
    r = kabsch_rotation(p, q, weights)
    return (p - pc_mean) @ r + qc_mean


def rmsd(p, q, weights=None, align=True):
    """Root-mean-square deviation after optional Kabsch alignment."""
    if align:
        p = align_to(p, q, weights)
    return jnp.sqrt(jnp.mean(jnp.sum((p - q) ** 2, axis=-1)))


def bond_connectivity(coords, z, scale=1.2):
    """Boolean (N,N) adjacency: r_ij < scale * (R_i + R_j) using single-bond
    covalent radii (ref: Utils/bond_connectivity.py)."""
    from multioptpy_tpu.periodic import COVALENT_RADII_1
    radii = jnp.asarray(COVALENT_RADII_1)[z]
    rsum = radii[:, None] + radii[None, :]
    d = pairwise_distances(coords)
    adj = (d < scale * rsum) & (d > _EPS)
    return adj


def judge_shape_condition(coords, spec):
    """True -> abort: some [value, gt|lt, atoms] condition is violated.

    Host-side guard for the reference's -sc flag — "exit optimization if
    these conditions are not satisfied" (ref:
    Utils/bond_connectivity.py:137 judge_shape_condition). Triples:
    atoms "i,j" = bond length [Angstrom], "i,j,k" = angle at j [deg],
    "i,j,k,l" = dihedral [deg]; `gt`/`lt` states what must remain true.
    Coordinates in Bohr, 1-indexed atoms.
    """
    import numpy as np

    spec = list(spec)
    if not spec:
        return False
    if len(spec) % 3 != 0:
        raise ValueError("-sc expects repeated [value gt|lt atoms] triples")
    c = np.asarray(coords, dtype=np.float64)
    bohr2ang = 0.52917721067
    for i in range(0, len(spec), 3):
        value = float(spec[i])
        op = str(spec[i + 1]).lower()
        atoms = [int(a) - 1 for a in str(spec[i + 2]).split(",")]
        if len(atoms) == 2:
            cur = float(np.linalg.norm(c[atoms[0]] - c[atoms[1]])) * bohr2ang
        elif len(atoms) == 3:
            v1 = c[atoms[0]] - c[atoms[1]]
            v2 = c[atoms[2]] - c[atoms[1]]
            cos = np.dot(v1, v2) / max(
                np.linalg.norm(v1) * np.linalg.norm(v2), 1e-12)
            cur = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
        elif len(atoms) == 4:
            b1 = c[atoms[1]] - c[atoms[0]]
            b2 = c[atoms[2]] - c[atoms[1]]
            b3 = c[atoms[3]] - c[atoms[2]]
            n1 = np.cross(b1, b2)
            n2 = np.cross(b2, b3)
            m = np.cross(n1, b2 / max(np.linalg.norm(b2), 1e-12))
            cur = float(np.degrees(np.arctan2(np.dot(m, n2),
                                              np.dot(n1, n2))))
        else:
            raise ValueError(f"-sc atoms '{spec[i + 2]}': need 2-4 atoms")
        if op == "gt":
            ok = cur > value
        elif op == "lt":
            ok = cur < value
        else:
            raise ValueError(f"-sc operator '{op}': use gt or lt")
        if not ok:
            print(f"# shape condition violated: {spec[i + 2]} = {cur:.3f} "
                  f"not {op} {value} - aborting")
            return True
    return False
