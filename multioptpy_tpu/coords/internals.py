"""Redundant internal coordinates — autodiff Wilson B, G-inverse, transforms.

The reference hand-writes per-primitive B-matrix rows and differentiates
torch scalar functions one primitive at a time
(ref: multioptpy/Coordinate/redundant_coordinate.py:150-375). Here the whole
primitive vector q(x) is ONE vectorized function of the (N,3) geometry, so:

    B  = jax.jacfwd(q)            (M, 3N)   exact Wilson matrix
    K  = <g_q, d2q/dx2>           (3N, 3N)  curvature correction, one
                                            jax.hessian contraction
                                            (ref: RIChess2carthess :65-150)

Everything jits and vmaps; primitive index arrays are static per molecule.

Primitive auto-detection (bonds from covalent radii, angles/torsions from
the bond graph, inter-fragment link bonds) runs host-side in numpy once.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.periodic import COVALENT_RADII_1
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast


def _stretch(p, idx):
    a, b = p[idx[:, 0]], p[idx[:, 1]]
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + 1e-14)


def _bend(p, idx):
    a, b, c = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    v1, v2 = a - b, c - b
    cross = jnp.cross(v1, v2)
    return jnp.arctan2(jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-14),
                       jnp.sum(v1 * v2, axis=-1))


def _linear_bend(p, idx, axes):
    """Orthogonal linear-bend pair for near-linear a-b-c triples.

    The regular bend's Wilson row carries a 1/sin(theta) factor that
    diverges at 180 deg (the autodiff Jacobian inherits it: a fixture
    with an exactly collinear O-H...O arrangement produced |B| ~ 1e16 and
    annihilated the DIC active space). Instead, for each triple measure
    the two components of unit(a-b) + unit(c-b) along fixed reference
    axes u, v perpendicular to the a-c line: both are zero at linearity,
    ~ the bend angle for small bends, and smooth EVERYWHERE. The axes are
    frozen at primitive-detection time (standard practice for static
    primitive sets). Returns (2*Ml,) = [u-components..., v-components...].
    """
    a, b, c = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    v1 = a - b
    v2 = c - b
    v1 = v1 / jnp.sqrt(jnp.sum(v1 * v1, axis=-1, keepdims=True) + 1e-14)
    v2 = v2 / jnp.sqrt(jnp.sum(v2 * v2, axis=-1, keepdims=True) + 1e-14)
    s = v1 + v2
    qu = jnp.sum(axes[:, 0, :] * s, axis=-1)
    qv = jnp.sum(axes[:, 1, :] * s, axis=-1)
    return jnp.concatenate([qu, qv])


def _torsion(p, idx):
    a, b, c, d = (p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]], p[idx[:, 3]])
    b1, b2, b3 = b - a, c - b, d - c
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.sqrt(jnp.sum(b2 * b2, axis=-1, keepdims=True) + 1e-14)
    m1 = jnp.cross(n1, b2n)
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


class InternalCoordinates:
    """Static primitive lists; pure-function transforms.

    bonds (Mb,2) / angles (Ma,3) / torsions (Mt,4): 0-based numpy indices.
    """

    def __init__(self, bonds=None, angles=None, torsions=None, n_atoms=None,
                 linear_bends=None, linear_axes=None):
        as_arr = lambda x, w: (np.zeros((0, w), dtype=np.int32) if x is None
                               or len(x) == 0 else np.asarray(x, np.int32))
        self.bonds = as_arr(bonds, 2)
        self.angles = as_arr(angles, 3)
        self.torsions = as_arr(torsions, 4)
        self.linear_bends = as_arr(linear_bends, 3)
        if linear_axes is None or len(self.linear_bends) == 0:
            self.linear_axes = np.zeros((0, 2, 3))
        else:
            self.linear_axes = np.asarray(linear_axes, np.float64)
        self.n_atoms = n_atoms
        self.n_primitives = (len(self.bonds) + len(self.angles)
                             + len(self.torsions)
                             + 2 * len(self.linear_bends))

    def torsion_mask(self):
        """(M,) bool: which primitive slots hold torsions (the values that
        must be compared mod 2*pi). Linear-bend components sit AFTER the
        torsion block and are plain differences."""
        nb, na, nt = len(self.bonds), len(self.angles), len(self.torsions)
        idx = jnp.arange(self.n_primitives)
        return (idx >= nb + na) & (idx < nb + na + nt)

    # --- primitive values --------------------------------------------------

    def q(self, coords):
        """(N,3) -> (M,) primitive values (Bohr / radians)."""
        parts = []
        if len(self.bonds):
            parts.append(_stretch(coords, jnp.asarray(self.bonds)))
        if len(self.angles):
            parts.append(_bend(coords, jnp.asarray(self.angles)))
        if len(self.torsions):
            parts.append(_torsion(coords, jnp.asarray(self.torsions)))
        if len(self.linear_bends):
            parts.append(_linear_bend(coords, jnp.asarray(self.linear_bends),
                                      jnp.asarray(self.linear_axes,
                                                  coords.dtype)))
        if not parts:
            return jnp.zeros((0,), dtype=coords.dtype)
        return jnp.concatenate(parts)

    def q_flat(self, x_flat):
        n = x_flat.shape[0] // 3
        return self.q(x_flat.reshape(n, 3))

    # --- Wilson B and G ----------------------------------------------------

    def b_matrix(self, coords):
        """(M, 3N) exact Wilson matrix via forward-mode autodiff
        (ref: redundant_coordinate.py:150/:175/:230 hand-coded rows)."""
        return jax.jacfwd(self.q_flat)(coords.reshape(-1))

    @staticmethod
    def g_matrix(b):
        return b @ b.T

    @staticmethod
    def g_pinv(g, thresh=1e-8):
        """Moore-Penrose inverse via masked eigendecomposition
        (ref: redundant_coordinate.py:381-401)."""
        w, v = _eigh_fast(g)
        keep = w > thresh * jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
        inv_w = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
        return (v * inv_w[None, :]) @ v.T

    # --- gradient / Hessian transforms ------------------------------------

    def cart_to_internal_gradient(self, g_cart, coords):
        """g_q = G^- B g_x (ref: redundant_coordinate.py:403)."""
        b = self.b_matrix(coords)
        g = self.g_matrix(b)
        return self.g_pinv(g) @ (b @ g_cart.reshape(-1))

    def internal_to_cart_gradient(self, g_q, coords):
        """g_x = B^T g_q (ref: redundant_coordinate.py RICgrad2cartgrad)."""
        b = self.b_matrix(coords)
        return (b.T @ g_q).reshape(-1, 3)

    def curvature_correction(self, g_q, coords):
        """K = sum_k g_q[k] * d2 q_k / dx dx' — one contraction against the
        primitive Hessian tensor (replaces the reference's per-primitive
        torch.func.hessian loop, redundant_coordinate.py:65-150)."""
        x = coords.reshape(-1)
        contracted = lambda xf: jnp.dot(g_q, self.q_flat(xf))
        return jax.hessian(contracted)(x)

    def cart_hessian_from_internal(self, h_q, g_q, coords):
        """H_x = B^T H_q B + K."""
        b = self.b_matrix(coords)
        return b.T @ h_q @ b + self.curvature_correction(g_q, coords)

    def internal_hessian_from_cart(self, h_x, g_cart, coords):
        """H_q = G^- B (H_x - K) B^T G^- (ref: redundant_coordinate.py:420)."""
        b = self.b_matrix(coords)
        ginv = self.g_pinv(self.g_matrix(b))
        g_q = ginv @ (b @ g_cart.reshape(-1))
        k = self.curvature_correction(g_q, coords)
        return ginv @ b @ (h_x - k) @ b.T @ ginv

    # --- iterative back-transformation ------------------------------------

    def to_cartesian(self, q_target, coords0, n_iter=25):
        """Find x with q(x) = q_target by damped Gauss-Newton from coords0
        (standard back-transform; torsions compared mod 2 pi). Fixed
        iteration count -> jit/vmap-safe."""
        is_torsion = self.torsion_mask()

        def body(_, x):
            q_now = self.q_flat(x)
            dq = q_target - q_now
            dq = jnp.where(is_torsion,
                           jnp.arctan2(jnp.sin(dq), jnp.cos(dq)), dq)
            b = jax.jacfwd(self.q_flat)(x)
            dx = b.T @ (self.g_pinv(b @ b.T) @ dq)
            return x + dx

        x = jax.lax.fori_loop(0, n_iter, body, coords0.reshape(-1))
        return x.reshape(coords0.shape)

    # --- delocalized internals (Baker 1996) --------------------------------

    def delocalized_basis(self, coords, n_active=None, thresh=1e-8):
        """U: (M, n_active) eigenvectors of G with nonzero eigenvalues —
        the DIC active space (ref: Optimizer/dic_rsirfo.py:8). Returned
        padded to M columns with zeros when n_active is None (static shape);
        a mask of valid columns accompanies it."""
        b = self.b_matrix(coords)
        g = self.g_matrix(b)
        w, v = _eigh_fast(g)
        keep = w > thresh * jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
        u = jnp.where(keep[None, :], v, 0.0)
        return u, keep


# --------------------------------------------------------------------------
# primitive auto-detection (host-side)
# --------------------------------------------------------------------------

def detect_primitives(coords_np, z, scale=1.3, link_fragments=True,
                      linear_thresh_deg=170.0, with_linear=False):
    """Bond graph from covalent radii; angles and torsions from the graph;
    minimal link bonds between disconnected fragments
    (ref: Utils/bond_connectivity.py + DIC primitive setup).
    Returns (bonds, angles, torsions) numpy index arrays.

    With `with_linear=True` (the DIC path via `auto_internals`),
    near-linear triples (angle >= linear_thresh_deg) are excluded from
    the regular bend list — their Wilson rows diverge as 1/sin(theta)
    and annihilate the DIC active space — and come back as a 4th return
    value for `_linear_bend` treatment; torsions whose INNER angles are
    near-linear are dropped for the same reason. With the default
    `with_linear=False` NO filtering happens (model-Hessian primitive
    sets and every other caller see the full graph exactly as before —
    the stiff near-singular rows there are harmless inside a damped
    H0 and the downstream pipelines are calibrated against them).
    """
    if not with_linear:
        linear_thresh_deg = 181.0      # unreachable: keep every triple
    coords_np = np.asarray(coords_np, dtype=np.float64)
    z = np.asarray(z)
    n = len(coords_np)
    radii = np.asarray(COVALENT_RADII_1)[z]
    d = np.linalg.norm(coords_np[:, None] - coords_np[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    adj = d < scale * (radii[:, None] + radii[None, :])

    # connect fragments with shortest inter-fragment contacts
    if link_fragments:
        labels = _components(adj)
        while len(set(labels)) > 1:
            best = None
            for a in range(n):
                for b in range(a + 1, n):
                    if labels[a] != labels[b]:
                        if best is None or d[a, b] < d[best]:
                            best = (a, b)
            adj[best[0], best[1]] = adj[best[1], best[0]] = True
            labels = _components(adj)

    bonds = [(i, j) for i in range(n) for j in range(i + 1, n) if adj[i, j]]

    def _angle_deg(a, j, c):
        v1 = coords_np[a] - coords_np[j]
        v2 = coords_np[c] - coords_np[j]
        cosv = np.dot(v1, v2) / max(np.linalg.norm(v1) * np.linalg.norm(v2),
                                    1e-30)
        return np.degrees(np.arccos(np.clip(cosv, -1.0, 1.0)))

    angles, linear = [], []
    for j in range(n):
        nb = [i for i in range(n) if adj[i, j]]
        for a, c in itertools.combinations(nb, 2):
            (linear if _angle_deg(a, j, c) >= linear_thresh_deg
             else angles).append((a, j, c))

    torsions = []
    for (j, k) in bonds:
        for i in range(n):
            if adj[i, j] and i != k:
                for l in range(n):
                    if adj[l, k] and l != j and l != i:
                        if (_angle_deg(i, j, k) < linear_thresh_deg
                                and _angle_deg(j, k, l) < linear_thresh_deg):
                            torsions.append((i, j, k, l))

    out = (np.asarray(bonds, np.int32).reshape(-1, 2),
           np.asarray(angles, np.int32).reshape(-1, 3),
           np.asarray(torsions, np.int32).reshape(-1, 4))
    if with_linear:
        out = out + (np.asarray(linear, np.int32).reshape(-1, 3),)
    return out


def linear_bend_axes(coords_np, linear):
    """Frozen orthonormal reference axes (Ml,2,3) for `_linear_bend`:
    for each near-linear a-b-c, u and v span the plane perpendicular to
    the a->c direction (computed once from the detection geometry)."""
    coords_np = np.asarray(coords_np, dtype=np.float64)
    axes = np.zeros((len(linear), 2, 3))
    for m, (a, _, c) in enumerate(np.asarray(linear).reshape(-1, 3)):
        w = coords_np[c] - coords_np[a]
        w = w / max(np.linalg.norm(w), 1e-30)
        e = np.eye(3)[np.argmin(np.abs(w))]
        u = np.cross(w, e)
        u = u / max(np.linalg.norm(u), 1e-30)
        axes[m, 0] = u
        axes[m, 1] = np.cross(w, u)
    return axes


def _components(adj):
    n = adj.shape[0]
    labels = list(range(n))
    changed = True
    while changed:
        changed = False
        for i in range(n):
            for j in range(n):
                if adj[i, j] and labels[j] != labels[i]:
                    m = min(labels[i], labels[j])
                    labels[i] = labels[j] = m
                    changed = True
    return labels


def auto_internals(coords_np, z, **kw):
    """Convenience: detect primitives (near-linear triples as smooth
    linear-bend pairs) and build InternalCoordinates."""
    bonds, angles, torsions, linear = detect_primitives(
        coords_np, z, with_linear=True, **kw)
    return InternalCoordinates(bonds, angles, torsions,
                               n_atoms=len(coords_np),
                               linear_bends=linear,
                               linear_axes=linear_bend_axes(coords_np,
                                                            linear))


def cartesian_to_z_matrix(coords):
    """Chain Z-matrix values [r_12, r_23, th_123, (r_i, th, phi)...] —
    distances Bohr, angles DEGREES, matching the reference's layout
    (ref: Coordinate/redundant_coordinate.py:503 cartesian_to_z_matrix).
    Vectorized over the chain instead of the reference's per-atom loop."""
    c = jnp.asarray(coords)
    n = c.shape[0]
    if n < 2:
        return jnp.zeros((0,), c.dtype)
    out = [jnp.linalg.norm(c[1] - c[0]) + 1e-15]
    if n >= 3:
        r13 = jnp.linalg.norm(c[2] - c[0]) + 1e-15
        cosv = jnp.dot(c[1] - c[0], c[2] - c[0]) / (out[0] * r13)
        out.append(jnp.linalg.norm(c[2] - c[1]) + 1e-15)
        out.append(jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0))))
    if n >= 4:
        a = c[:-3]         # i-3
        b = c[1:-2]        # i-2
        d = c[2:-1]        # i-1
        e = c[3:]          # i
        r = jnp.linalg.norm(e - d, axis=1) + 1e-15
        r_bd = jnp.linalg.norm(d - b, axis=1) + 1e-15
        cos_th = jnp.sum((d - b) * (e - d), axis=1) / (r_bd * r)
        th = jnp.degrees(jnp.arccos(jnp.clip(cos_th, -1.0, 1.0)))
        n1 = jnp.cross(b - a, d - b)
        n2 = jnp.cross(d - b, e - d)
        n1 = n1 / (jnp.linalg.norm(n1, axis=1, keepdims=True) + 1e-15)
        n2 = n2 / (jnp.linalg.norm(n2, axis=1, keepdims=True) + 1e-15)
        cos_p = jnp.clip(jnp.sum(n1 * n2, axis=1), -1.0, 1.0)
        sign = jnp.sign(jnp.sum(jnp.cross(n1, n2) * (d - b), axis=1))
        phi = jnp.degrees(jnp.arccos(cos_p)) * jnp.where(sign < 0, -1.0, 1.0)
        out.append(jnp.stack([r, th, phi], axis=1).reshape(-1))
    return jnp.concatenate([jnp.atleast_1d(jnp.asarray(v, c.dtype))
                            for v in out])


def local_force_constants(cart_hess, b_matrix, method="compliance"):
    """Per-primitive local force constants from a Cartesian Hessian.

    method "compliance": k_q = 1 / (B H^+ B^T)_qq — the compliance-matrix
      route (Brandhorst & Grunenberg, Chem. Soc. Rev. 37 (2008) 1558; the
      reference's calc_local_fc_from_pBmat, redundant_coordinate.py:480,
      with the pseudo-inverse instead of its ill-conditioned plain
      inverse + TR/rot-projected input requirement). Valid anywhere.
    method "projection": k = B^+T H B^+ via the G-inverse (reference's
      calc_local_fc_from_pBmat_2/3, :491-501; stationary points only).

    Returns the (Q,) diagonal (compliance) or the full (Q, Q) matrix
    (projection)."""
    h = jnp.asarray(cart_hess)
    b = jnp.asarray(b_matrix)
    if method == "compliance":
        h_pinv = jnp.linalg.pinv(0.5 * (h + h.T), rcond=1e-8)
        compliance = b @ h_pinv @ b.T
        return 1.0 / jnp.diagonal(compliance)
    if method == "projection":
        g = b @ b.T
        g_inv = jnp.linalg.pinv(g, rcond=1e-10)
        b_plus = g_inv @ b           # (Q, 3N)
        return b_plus @ h @ b_plus.T
    raise ValueError("method must be 'compliance' or 'projection'")
