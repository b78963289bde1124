"""Reference-oracle parity layer (SURVEY §4 item 2).

Each test pins the framework against an INDEPENDENT numpy oracle
hand-ported from the reference implementation's formula (not its code),
with the reference's own unit constants, cited by file:line. These are the
golden-value tests that convert "re-designed" into "matching": the
reference itself cannot run in this image (no torch/tblite), so the
oracles are the executable form of its math.

Unit constants below are the reference's UnitValueLib values
(ref: Parameters/unit_values.py:2-19).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# --- reference constants (ref: Parameters/unit_values.py) -----------------
BOHR2ANG = 0.52917721067
H2KJ = 2625.500
H2KCAL = 627.509

# Pyykko-Atsumi single-bond covalent radii, Angstrom
# (ref: Parameters/covalent_radii.py:9-13)
CRL_ANG = {"H": 0.32, "C": 0.75, "N": 0.71, "O": 0.63, "Ar": 0.96}
# UFF vdW parameters (ref: Parameters/uff.py:51-70), Angstrom / kcal/mol
UFF_R_ANG = {"H": 2.886, "C": 3.851, "O": 3.500, "Ar": 3.868}
UFF_EPS_KCAL = {"H": 0.0152, "C": 0.0951, "O": 0.0957, "Ar": 0.185}


def crad(sym):
    return CRL_ANG[sym] / BOHR2ANG


# fixed, reproducible test geometry (Bohr): 4 atoms, no symmetry
GEOM4 = np.array([
    [0.10, -0.20, 0.05],
    [1.95, 0.30, -0.40],
    [4.10, 2.05, 0.70],
    [5.60, 3.90, -0.90],
])
Z4 = np.array([6, 1, 8, 1])       # C H O H
SYM4 = ["C", "H", "O", "H"]


# ==========================================================================
# AFIR (ref: Potential/AFIR_potential.py:18-56)
# ==========================================================================

def afir_oracle(geom, symbols, gamma_kjmol, frag1, frag2):
    """Reference AFIR formula, numpy (ref: AFIR_potential.py:33-54)."""
    r0 = 3.8164 / BOHR2ANG
    eps = 1.0061 / H2KJ
    g = gamma_kjmol / H2KJ
    if gamma_kjmol != 0.0:
        alpha = g / ((2 ** (-1 / 6)
                      - (1 + np.sqrt(1 + abs(g) / eps)) ** (-1 / 6)) * r0)
    else:
        alpha = 0.0
    i = np.asarray(frag1) - 1
    j = np.asarray(frag2) - 1
    ri = np.array([crad(symbols[a]) for a in i])
    rj = np.array([crad(symbols[a]) for a in j])
    diff = geom[i][:, None, :] - geom[j][None, :, :]
    r = np.linalg.norm(diff, axis=2)
    omega = ((ri[:, None] + rj[None, :]) / r) ** 6.0
    return alpha * (omega * r).sum() / omega.sum(), alpha


def test_afir_alpha_values():
    from multioptpy_tpu.potentials.afir import afir_alpha
    for gamma in (100.0, 50.0, -50.0, 300.0):
        _, alpha_ref = afir_oracle(GEOM4, SYM4, gamma, [1, 2], [3, 4])
        np.testing.assert_allclose(float(afir_alpha(gamma)), alpha_ref,
                                   rtol=1e-12)


def test_afir_energy_fixture():
    from multioptpy_tpu.potentials.afir import AFIRPotential
    pot = AFIRPotential(gamma=120.0, fragm_1=[1, 2], fragm_2=[3, 4],
                        element_z=Z4)
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    e_ref, _ = afir_oracle(GEOM4, SYM4, 120.0, [1, 2], [3, 4])
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


def test_afir_param_gradient_matches_oracle_fd():
    """dE/dgamma (the per-step logged quantity, ref: potential.py:137-144)
    against a central difference of the ORACLE."""
    from multioptpy_tpu.potentials.afir import AFIRPotential
    pot = AFIRPotential(gamma=120.0, fragm_1=[1, 2], fragm_2=[3, 4],
                        element_z=Z4)
    dg = jax.grad(lambda p: pot.energy(jnp.asarray(GEOM4), p))(
        jnp.asarray(pot.init_params()))
    h = 1e-4
    ep, _ = afir_oracle(GEOM4, SYM4, 120.0 + h, [1, 2], [3, 4])
    em, _ = afir_oracle(GEOM4, SYM4, 120.0 - h, [1, 2], [3, 4])
    np.testing.assert_allclose(float(dg[0]), (ep - em) / (2 * h), rtol=1e-6)


# ==========================================================================
# keep potentials (ref: Potential/keep_potential.py:21-117)
# ==========================================================================

def test_keep_potential():
    from multioptpy_tpu.potentials.keep import KeepPotential
    k, r0_ang = 0.75, 1.40
    pot = KeepPotential(spring_const=k, distance=r0_ang, atom_pair=[1, 3])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    r = np.linalg.norm(GEOM4[0] - GEOM4[2])
    e_ref = 0.5 * k * (r - r0_ang / BOHR2ANG) ** 2   # ref: keep_potential.py:58
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


def test_keep_potential_gradient():
    from multioptpy_tpu.potentials.keep import KeepPotential
    k, r0_ang = 0.75, 1.40
    pot = KeepPotential(spring_const=k, distance=r0_ang, atom_pair=[1, 3])
    g = jax.grad(pot.energy)(jnp.asarray(GEOM4),
                             jnp.asarray(pot.init_params()))
    # analytic: dE/dx_i = k (r - r0) rhat
    vec = GEOM4[0] - GEOM4[2]
    r = np.linalg.norm(vec)
    gref = k * (r - r0_ang / BOHR2ANG) * vec / r
    np.testing.assert_allclose(np.asarray(g[0]), gref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g[2]), -gref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-14)


def test_keep_v2_fragment_centers():
    from multioptpy_tpu.potentials.keep import KeepPotentialV2
    k, r0_ang = 0.33, 2.10
    pot = KeepPotentialV2(spring_const=k, distance=r0_ang,
                          fragm_1=[1, 2], fragm_2=[3, 4])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    c1 = GEOM4[[0, 1]].mean(axis=0)
    c2 = GEOM4[[2, 3]].mean(axis=0)
    r = np.linalg.norm(c1 - c2)
    e_ref = 0.5 * k * (r - r0_ang / BOHR2ANG) ** 2  # ref: keep_potential.py:64
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


def test_keep_anharmonic_morse():
    from multioptpy_tpu.potentials.keep import AnharmonicKeepPotential
    k, de, r0_ang = 0.5, 0.2, 1.10
    pot = AnharmonicKeepPotential(spring_const=k, well_depth=de,
                                  distance=r0_ang, atom_pair=[1, 2])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    r = np.linalg.norm(GEOM4[0] - GEOM4[1])
    a = np.sqrt(k / (2 * de))
    e_ref = de * (1 - np.exp(-a * (r - r0_ang / BOHR2ANG))) ** 2
    # ref: anharmonic_keep_potential.py (Morse form)
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


# ==========================================================================
# well potential, all 5 regions (ref: Potential/switching_potential.py:34-66)
# ==========================================================================

def well_oracle(r_bohr, limits_ang, wall_kjmol):
    a, b, c, d = [x / BOHR2ANG for x in limits_ang]
    e0 = wall_kjmol / H2KJ
    xs = 0.5 / (b - a) * r_bohr + (1.0 - 0.5 * b / (b - a))
    xl = 0.5 / (c - d) * r_bohr + (1.0 - 0.5 * c / (c - d))
    if r_bohr <= a:
        return e0 * (-3.75 * xs + 2.875)
    if r_bohr <= b:
        return e0 * (2.0 - 20.0 * xs ** 3 + 30.0 * xs ** 4 - 12.0 * xs ** 5)
    if r_bohr < c:
        return 0.0
    if r_bohr < d:
        return e0 * (2.0 - 20.0 * xl ** 3 + 30.0 * xl ** 4 - 12.0 * xl ** 5)
    return e0 * (-3.75 * xl + 2.875)


@pytest.mark.parametrize("r_ang", [0.8, 1.3, 2.5, 4.3, 6.5])
def test_well_potential_all_regions(r_ang):
    from multioptpy_tpu.potentials.well import WellPotential
    limits = (1.0, 1.8, 4.0, 5.0)   # Angstrom a<b<c<d
    wall = 50.0                     # kJ/mol
    pot = WellPotential(wall_energy=wall, limits=limits,
                        fragm_1=[1], fragm_2=[2])
    r_bohr = r_ang / BOHR2ANG
    geom = np.zeros((2, 3))
    geom[1, 0] = r_bohr
    e = float(pot.energy(jnp.asarray(geom), jnp.asarray(pot.init_params())))
    np.testing.assert_allclose(e, well_oracle(r_bohr, limits, wall),
                               rtol=1e-10, atol=1e-18)


# ==========================================================================
# LJ repulsive Scale / Value (ref: Potential/LJ_repulsive_potential.py:43-115)
# ==========================================================================

def test_lj_repulsive_scale():
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveScale
    ws, ds = 1.2, 0.9
    pot = LJRepulsiveScale(well_scale=ws, dist_scale=ds, fragm_1=[1, 2],
                           fragm_2=[3, 4], element_z=Z4)
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))

    e_ref = 0.0
    for i, si in [(0, "C"), (1, "H")]:
        for j, sj in [(2, "O"), (3, "H")]:
            eps = np.sqrt(ws ** 2 * (UFF_EPS_KCAL[si] / H2KCAL)
                          * (UFF_EPS_KCAL[sj] / H2KCAL))
            r0 = np.sqrt(ds ** 2 * (UFF_R_ANG[si] / BOHR2ANG)
                         * (UFF_R_ANG[sj] / BOHR2ANG))
            r = np.linalg.norm(GEOM4[i] - GEOM4[j])
            e_ref += eps * ((r0 / r) ** 12 - 2 * (r0 / r) ** 6)
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


def test_lj_repulsive_value_kjmol():
    """The Value form's well depth is kJ/mol (ref divides by hartree2kjmol,
    LJ_repulsive_potential.py:110)."""
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveValue
    well, dist = 8.0, 2.5   # kJ/mol, Angstrom
    pot = LJRepulsiveValue(well_value_kjmol=well, dist_value_ang=dist,
                           fragm_1=[1], fragm_2=[3], element_z=Z4)
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    r = np.linalg.norm(GEOM4[0] - GEOM4[2])
    r0 = dist / BOHR2ANG
    e_ref = (well / H2KJ) * ((r0 / r) ** 12 - 2 * (r0 / r) ** 6)
    np.testing.assert_allclose(e, e_ref, rtol=1e-10)


# ==========================================================================
# angle / dihedral restraints
# (ref: Potential/keep_angle_potential.py:58, keep_dihedral_angle_potential.py:60)
# ==========================================================================

def test_keep_angle():
    from multioptpy_tpu.potentials.angles import KeepAnglePotential
    k, th0 = 0.4, 104.5
    pot = KeepAnglePotential(spring_const=k, angle=th0, atoms=[1, 2, 3])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    v1 = GEOM4[0] - GEOM4[1]
    v2 = GEOM4[2] - GEOM4[1]
    th = np.arccos(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    e_ref = 0.5 * k * (th - np.deg2rad(th0)) ** 2
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)


def test_keep_dihedral():
    from multioptpy_tpu.potentials.angles import KeepDihedralPotential
    k, p0 = 0.25, 60.0
    pot = KeepDihedralPotential(spring_const=k, angle=p0, atoms=[1, 2, 3, 4])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    b1 = GEOM4[1] - GEOM4[0]
    b2 = GEOM4[2] - GEOM4[1]
    b3 = GEOM4[3] - GEOM4[2]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    # IUPAC sign phi = atan2((n1 x n2).b2_hat, n1.n2) — the convention the
    # reference executes (keep_dihedral_angle_potential.py:90-95), pinned
    # live in test_reference_live11.py::test_keep_dihedral_live.
    phi = np.arctan2(np.dot(np.cross(n1, n2), b2 / np.linalg.norm(b2)),
                     np.dot(n1, n2))
    dphi = phi - np.deg2rad(p0)
    dphi = np.arctan2(np.sin(dphi), np.cos(dphi))
    e_ref = 0.5 * k * dphi ** 2
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)


# ==========================================================================
# model-Hessian primitive force constants
# (ref: ModelHessian/{lindh.py:52-77,98, fischer.py:19-40, schlegel.py:20-107})
# ==========================================================================

def _prims(kind, coords, z, bonds, angles=None, torsions=None):
    from multioptpy_tpu.hessian.model import _primitive_constants
    bonds = np.asarray(bonds if bonds is not None else
                       np.zeros((0, 2)), int).reshape(-1, 2)
    angles = np.asarray(angles if angles is not None else
                        np.zeros((0, 3)), int).reshape(-1, 3)
    torsions = np.asarray(torsions if torsions is not None else
                          np.zeros((0, 4)), int).reshape(-1, 4)
    return np.asarray(_primitive_constants(
        kind, jnp.asarray(coords), z, bonds, angles, torsions, len(z)))


def test_lindh_bond_constant():
    """k = 0.45 rho, rho = exp(alpha (R_ref^2 - R^2)), R_ref = rcov sum,
    alpha from the period-pair table (ref: lindh.py:17,52-77,98)."""
    r = 2.05
    coords = np.zeros((2, 3))
    coords[1, 2] = r
    z = np.array([6, 1])
    k = _prims("lindh", coords, z, bonds=[[0, 1]])
    rref = crad("C") + crad("H")
    alpha = 0.3949   # period pair (1st, 2nd) row table (ref: lindh.py:52)
    k_ref = 0.45 * np.exp(alpha * (rref ** 2 - r ** 2))
    np.testing.assert_allclose(k[0], k_ref, rtol=1e-10)


def test_lindh_angle_constant():
    """0.15 rho_12 rho_23 (ref: lindh.py:90-98 force_const product loop)."""
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 1.9, 2.8]])
    z = np.array([1, 6, 8])
    k = _prims("lindh", coords, z, bonds=[[0, 1], [1, 2]],
               angles=[[0, 1, 2]])
    def rho(i, j, alpha):
        rr = crad(SYM_LOOKUP[z[i]]) + crad(SYM_LOOKUP[z[j]])
        d = np.linalg.norm(coords[i] - coords[j])
        return np.exp(alpha * (rr ** 2 - d ** 2))
    k_ref = 0.15 * rho(0, 1, 0.3949) * rho(1, 2, 0.2800)
    np.testing.assert_allclose(k[2], k_ref, rtol=1e-10)


SYM_LOOKUP = {1: "H", 6: "C", 8: "O", 18: "Ar", 7: "N"}


def test_fischer_bond_constant():
    """k = 0.3601 exp(-1.944 (r - rcov)) (ref: fischer.py:19-21)."""
    r = 2.6
    coords = np.zeros((2, 3))
    coords[1, 0] = r
    z = np.array([6, 8])
    k = _prims("fischer", coords, z, bonds=[[0, 1]])
    k_ref = 0.3601 * np.exp(-1.944 * (r - (crad("C") + crad("O"))))
    np.testing.assert_allclose(k[0], k_ref, rtol=1e-10)


def test_schlegel_bond_constant():
    """F = 1.734/(r - B)^3, B from the period-pair table
    (ref: schlegel.py:26-32,91; Schlegel TCA 66 (1984) 333)."""
    r = 2.9
    coords = np.zeros((2, 3))
    coords[1, 1] = r
    z = np.array([6, 8])   # both 2nd period -> B = 0.9652
    k = _prims("schlegel", coords, z, bonds=[[0, 1]])
    np.testing.assert_allclose(k[0], 1.734 / (r - 0.9652) ** 3, rtol=1e-10)
    # H-C pair -> B = 0.3401
    z2 = np.array([1, 6])
    k2 = _prims("schlegel", coords, z2, bonds=[[0, 1]])
    np.testing.assert_allclose(k2[0], 1.734 / (r - 0.3401) ** 3, rtol=1e-10)


def test_schlegel_angle_constants():
    """0.160 if an H terminates the angle else 0.250
    (ref: schlegel.py:102-107)."""
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 1.9, 2.8]])
    kh = _prims("schlegel", coords, np.array([1, 6, 8]), bonds=None,
                angles=[[0, 1, 2]])
    kx = _prims("schlegel", coords, np.array([7, 6, 8]), bonds=None,
                angles=[[0, 1, 2]])
    np.testing.assert_allclose(kh[0], 0.160, rtol=1e-12)
    np.testing.assert_allclose(kx[0], 0.250, rtol=1e-12)


def test_schlegel_torsion_constant():
    """0.0023 - 0.07 (r - rcov_sum) on the central bond
    (ref: schlegel.py:109-124)."""
    coords = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0],
                       [2.8, 2.0, 0.0], [3.1, 2.6, 2.0]])
    z = np.array([1, 6, 8, 1])
    k = _prims("schlegel", coords, z, bonds=None,
               torsions=[[0, 1, 2, 3]])
    r = np.linalg.norm(coords[1] - coords[2])
    k_ref = 0.0023 - 0.07 * (r - (crad("C") + crad("O")))
    np.testing.assert_allclose(k[0], k_ref, rtol=1e-10)


# ==========================================================================
# RS-RFO secular semantics (ref: Optimizer/rsirfo.py:1374-1688)
# ==========================================================================

def rfo_oracle_step(grad, hess, alpha):
    """Reference solve_rfo semantics in numpy: leftmost root of
    f(lam) = lam + sum g_i'^2/(eps_i' - lam) below the lowest pole, then
    s_i = -(g_i/alpha)/(eps_i/alpha - lam) (ref: rsirfo.py:1688-1714,
    secular function :1388-1399)."""
    w, v = np.linalg.eigh(hess)
    gt = v.T @ grad
    poles = w / alpha
    g2 = (gt / alpha) ** 2

    def f(lam):
        return lam + np.sum(g2 / (poles - lam))

    lo = poles.min() - np.sqrt(g2.sum()) - 1.0
    hi = poles.min() - 1e-14
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > 0:
            hi = mid
        else:
            lo = mid
    lam = 0.5 * (lo + hi)
    s_t = -(gt / alpha) / (poles - lam)
    return v @ s_t, lam


def test_rs_rfo_unrestricted_matches_secular_oracle():
    from multioptpy_tpu.steppers.rfo import rs_rfo_step
    rng = np.random.default_rng(3)
    d = 9
    a = rng.standard_normal((d, d))
    hess = a @ a.T + 0.5 * np.eye(d)      # PD, alpha stays 1
    grad = rng.standard_normal(d) * 0.1
    step, aux = rs_rfo_step(jnp.asarray(grad), jnp.asarray(hess),
                            jnp.asarray(1e6))
    s_ref, lam_ref = rfo_oracle_step(grad, hess, 1.0)
    np.testing.assert_allclose(np.asarray(step), s_ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(aux["lambda"]), lam_ref, rtol=1e-8)


def test_rs_rfo_restricted_matches_clipped_oracle():
    """Restricted-step semantics. The reference's secular form
    f(lam) = lam + sum (g_i/a)^2 / (eps_i/a - lam) is exactly
    alpha-INVARIANT (substituting lam = mu/a factors out 1/a, so the step
    -(g/a)/(eps/a - lam) = -g/(eps - mu) for every alpha — verified by the
    oracle below). Its alpha iteration (rsirfo.py:986 compute_rsprfo_step)
    therefore cannot change the step norm, and the effective reference
    behavior is the RFO direction clipped by the global trust clamp
    (optimizer.py:792). The rebuild reproduces exactly that emergent
    semantic: direction == oracle RFO direction, norm == trust."""
    from multioptpy_tpu.steppers.rfo import rs_rfo_step
    rng = np.random.default_rng(4)
    d = 6
    a = rng.standard_normal((d, d))
    hess = a @ a.T + 0.1 * np.eye(d)
    grad = rng.standard_normal(d)
    trust = 0.1

    # oracle alpha-invariance (the latent reference property)
    s1, _ = rfo_oracle_step(grad, hess, 1.0)
    s100, _ = rfo_oracle_step(grad, hess, 100.0)
    np.testing.assert_allclose(s1, s100, rtol=1e-9)

    step, aux = rs_rfo_step(jnp.asarray(grad), jnp.asarray(hess),
                            jnp.asarray(trust))
    s = np.asarray(step)
    np.testing.assert_allclose(np.linalg.norm(s), trust, rtol=1e-6)
    np.testing.assert_allclose(s, s1 / np.linalg.norm(s1) * trust,
                               rtol=1e-6, atol=1e-10)


def test_rfo_classic_matches_augmented_eigenvector():
    """Classic RFO step = last eigenvector of [[H, g], [g^T, 0]] scaled by
    its last component (the nu normalization, ref: rsirfo.py solve_rfo
    docstring / pysisyphus RFOptimizer)."""
    from multioptpy_tpu.steppers.rfo import rfo_classic_step
    rng = np.random.default_rng(5)
    d = 5
    a = rng.standard_normal((d, d))
    hess = a @ a.T + 0.3 * np.eye(d)
    grad = rng.standard_normal(d)
    step = np.asarray(rfo_classic_step(jnp.asarray(grad), jnp.asarray(hess)))
    aug = np.zeros((d + 1, d + 1))
    aug[:d, :d] = hess
    aug[:d, d] = grad
    aug[d, :d] = grad
    w, v = np.linalg.eigh(aug)
    vec = v[:, 0]
    s_ref = vec[:d] / vec[d]
    np.testing.assert_allclose(step, s_ref, rtol=1e-8, atol=1e-10)


# ==========================================================================
# Hessian updates (ref: Optimizer/hessian_update.py:248-374)
# ==========================================================================

def _fix_sy(seed=11, d=7):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((d, d))
    h = a @ a.T + np.eye(d)
    s = rng.standard_normal(d) * 0.1
    y = h @ s + 0.01 * rng.standard_normal(d)
    return h, s, y


def _bfgs_oracle(h, s, y):
    return (np.outer(y, y) / (y @ s)
            - np.outer(h @ s, h @ s) / (s @ h @ s))


def _sr1_oracle(h, s, y, a=None):
    a = (y - h @ s) if a is None else a
    return np.outer(a, a) / (a @ s)


def _psb_oracle(h, s, y):
    a = y - h @ s
    ss = s @ s
    return ((np.outer(a, s) + np.outer(s, a)) / ss
            - (a @ s) * np.outer(s, s) / ss ** 2)


def _bofill_const(a, s):
    return (a @ s) ** 2 / ((a @ a) * (s @ s))


def test_bfgs_update():
    from multioptpy_tpu.hessian.updates import bfgs_delta
    h, s, y = _fix_sy()
    np.testing.assert_allclose(
        np.asarray(bfgs_delta(jnp.asarray(h), jnp.asarray(s),
                              jnp.asarray(y))),
        _bfgs_oracle(h, s, y), rtol=1e-10)


def test_sr1_update():
    from multioptpy_tpu.hessian.updates import sr1_delta
    h, s, y = _fix_sy(12)
    np.testing.assert_allclose(
        np.asarray(sr1_delta(jnp.asarray(h), jnp.asarray(s),
                             jnp.asarray(y))),
        _sr1_oracle(h, s, y), rtol=1e-10)


def test_psb_update():
    from multioptpy_tpu.hessian.updates import psb_delta
    h, s, y = _fix_sy(13)
    np.testing.assert_allclose(
        np.asarray(psb_delta(jnp.asarray(h), jnp.asarray(s),
                             jnp.asarray(y))),
        _psb_oracle(h, s, y), rtol=1e-10)


def test_fsb_update_sqrt_bofill_mixing():
    """FSB mixes SR1/BFGS with phi = sqrt(Bofill const)
    (ref: hessian_update.py:261-272)."""
    from multioptpy_tpu.hessian.updates import fsb_delta
    h, s, y = _fix_sy(14)
    a = y - h @ s
    phi = np.sqrt(_bofill_const(a, s))
    ref = (1 - phi) * _bfgs_oracle(h, s, y) + phi * _sr1_oracle(h, s, y)
    np.testing.assert_allclose(
        np.asarray(fsb_delta(jnp.asarray(h), jnp.asarray(s),
                             jnp.asarray(y))),
        ref, rtol=1e-10)


def test_bofill_update_phi2_mixing():
    """Bofill mixes SR1/PSB with the constant directly
    (ref: hessian_update.py:286-297)."""
    from multioptpy_tpu.hessian.updates import bofill_delta
    h, s, y = _fix_sy(15)
    a = y - h @ s
    c = _bofill_const(a, s)
    ref = (1 - c) * _psb_oracle(h, s, y) + c * _sr1_oracle(h, s, y)
    np.testing.assert_allclose(
        np.asarray(bofill_delta(jnp.asarray(h), jnp.asarray(s),
                                jnp.asarray(y))),
        ref, rtol=1e-10)


def test_msp_update():
    """MSP: phi = (1 - cos^2) mixing of SR1(MS) and PSB
    (ref: hessian_update.py:345-374; Anglada THEOCHEM 591 (2002) 35)."""
    from multioptpy_tpu.hessian.updates import msp_delta
    h, s, y = _fix_sy(16)
    a = y - h @ s
    cos = (s @ a) / (np.linalg.norm(a) * np.linalg.norm(s))
    phi = 1.0 - cos ** 2
    ref = (1 - phi) * _sr1_oracle(h, s, y) + phi * _psb_oracle(h, s, y)
    got = np.asarray(msp_delta(jnp.asarray(h), jnp.asarray(s),
                               jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


# ==========================================================================
# convergence checker (ref: optimization.py:1252-1290)
# ==========================================================================

def conv_oracle(grad, disp, crit):
    max_f_th, rms_f_th, max_d_th, rms_d_th = crit

    def rms_safe(v):
        f = v[np.abs(v) > 1e-10]
        return np.sqrt((f ** 2).mean()) if f.size else 0.0

    max_f = np.abs(grad).max()
    rms_f = rms_safe(grad)
    d_f = max(0.0, max_f_th - max_f)
    d_r = max(0.0, rms_f_th - rms_f)
    max_d_t = max(max_d_th, max_d_th + d_f)
    rms_d_t = max(rms_d_th, rms_d_th + d_r)
    return (max_f < max_f_th and rms_f < rms_f_th
            and np.abs(disp).max() < max_d_t and rms_safe(disp) < rms_d_t)


@pytest.mark.parametrize("seed,scale_g,scale_d", [
    (0, 1e-4, 1e-3),    # converged region
    (1, 1e-3, 1e-3),    # force too large
    (2, 1e-5, 5e-3),    # large disp but tiny force -> coupled threshold
    (3, 1e-4, 2e-3),    # borderline
    (4, 2.9e-4, 1.4e-3),
])
def test_convergence_checker_matches_reference(seed, scale_g, scale_d):
    from multioptpy_tpu.drivers.optimize import check_convergence
    rng = np.random.default_rng(seed)
    g = rng.standard_normal(12) * scale_g
    d = rng.standard_normal(12) * scale_d
    crit = (3e-4, 2e-4, 1.5e-3, 1e-3)   # ref: optimization.py:129-132
    got = bool(check_convergence(jnp.asarray(g), jnp.asarray(d), crit))
    assert got == conv_oracle(g, d, crit)


# ==========================================================================
# D4 dispersion (ref: Parameters/d4.py, ModelHessian/lindh2007d4.py:98-322)
# ==========================================================================

D4_REF = dict(s6=1.0, s8=1.03683, a1=0.4171, a2=4.5337, ga=3.0)
# D2 C6 (J nm^6/mol) for the Casimir-Polder combination
# (ref: Parameters/d2.py; get_c6_coefficient uses D2_C6_coeff_lib)
D2_C6_JNM6 = {"H": 0.14, "C": 1.75, "O": 0.70}
D4_R4R2_REF = {"H": 8.0589, "C": 7.8715, "O": 4.7566}
D4_EN_REF = {"H": 2.20, "C": 2.55, "O": 3.44}
_C6_CONV = 1.0 / 6.02214076e23 / 4.3597447222071e-18 / 0.052917721067 ** 6


def d4_params_oracle(s1, s2, q1=0.0, q2=0.0):
    """ref: lindh2007d4.py:218 get_d4_parameters."""
    c6_1 = D2_C6_JNM6[s1] * _C6_CONV
    c6_2 = D2_C6_JNM6[s2] * _C6_CONV
    c6 = 2.0 * c6_1 * c6_2 / (c6_1 + c6_2)
    c8 = 3.0 * c6 * np.sqrt(D4_R4R2_REF[s1] * D4_R4R2_REF[s2])
    # reference divides its already-Bohr UFF radii by bohr2angstroms again
    r0 = (UFF_R_ANG[s1] / BOHR2ANG + UFF_R_ANG[s2] / BOHR2ANG) / BOHR2ANG
    qs = np.exp(-D4_REF["ga"] * (q1 ** 2 + q2 ** 2))
    return c6, c8, r0, qs


def d4_fc_oracle(r, c6, c8, r0, qs):
    """ref: lindh2007d4.py:186 calc_d4_force_const."""
    bj6 = ((r0 + D4_REF["a1"]) * D4_REF["a2"]) ** 6
    bj8 = ((r0 + D4_REF["a1"]) * D4_REF["a2"]) ** 8
    f6 = r ** 6 / (r ** 6 + bj6)
    f8 = r ** 8 / (r ** 8 + bj8)
    e6 = -D4_REF["s6"] * c6 * qs * f6 / r ** 6
    e8 = -D4_REF["s8"] * c8 * qs * f8 / r ** 8
    return -(e6 + e8)


def test_d4_pair_force_const():
    from multioptpy_tpu.hessian.dispersion import (
        d4_pair_force_const, d4_pair_tables)
    z = np.array([6, 8])
    c6m, c8m, r0m = d4_pair_tables(z)
    c6o, c8o, r0o, _ = d4_params_oracle("C", "O")
    np.testing.assert_allclose(c6m[0, 1], c6o, rtol=1e-10)
    np.testing.assert_allclose(c8m[0, 1], c8o, rtol=1e-10)
    np.testing.assert_allclose(r0m[0, 1], r0o, rtol=1e-10)
    for r in (6.0, 10.0, 20.0):
        got = float(d4_pair_force_const(jnp.asarray(r), c6m[0, 1],
                                        c8m[0, 1], r0m[0, 1], 0.9))
        ref = d4_fc_oracle(r, c6o, c8o, r0o, 0.9)
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_d4_charge_estimate():
    """ref: lindh2007d4.py:110 estimate_atomic_charges — per bond transfer
    0.1 tanh(0.2 dEN), mean-centered. Water fixture."""
    from multioptpy_tpu.hessian.dispersion import d4_charges
    geom = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.81],
                     [1.75, 0.0, -0.48]])
    z = np.array([8, 1, 1])
    q = np.asarray(d4_charges(jnp.asarray(geom), z))
    t = 0.1 * np.tanh(0.2 * (D4_EN_REF["H"] - D4_EN_REF["O"]))
    q_ref = np.array([2 * t, -t, -t])
    q_ref -= q_ref.mean()
    np.testing.assert_allclose(q, q_ref, rtol=1e-10)


def test_lindh2007_bond_constant():
    """kr exp(alpha (rcov^2 - r^2)) + gated kd D4 term
    (ref: lindh2007d4.py:360-369). Close pair: pure exp screening; far
    pair: D4 term joins."""
    from multioptpy_tpu.hessian.model import _primitive_constants
    z = np.array([6, 8])
    rc = crad("C") + crad("O")

    # close pair — no D4 gate
    coords = np.zeros((2, 3))
    coords[1, 0] = 2.2
    k = np.asarray(_primitive_constants(
        "lindh2007", jnp.asarray(coords), z,
        np.array([[0, 1]]), np.zeros((0, 3), int), np.zeros((0, 4), int), 2))
    k_ref = 0.45 * np.exp(0.2800 * (rc ** 2 - 2.2 ** 2))
    np.testing.assert_allclose(k[0], k_ref, rtol=1e-10)

    # far pair — D4 term gated in (charges are zero for 2 identical legs)
    coords[1, 0] = 3.0 * rc
    k = np.asarray(_primitive_constants(
        "lindh2007", jnp.asarray(coords), z,
        np.array([[0, 1]]), np.zeros((0, 3), int), np.zeros((0, 4), int), 2))
    c6o, c8o, r0o, _ = d4_params_oracle("C", "O")
    r = 3.0 * rc
    k_ref = (0.45 * np.exp(0.2800 * (rc ** 2 - r ** 2))
             + 0.05 * d4_fc_oracle(r, c6o, c8o, r0o, 1.0))
    np.testing.assert_allclose(k[0], k_ref, rtol=1e-8)


def test_lindh2007_d4_model_hessian_smoke():
    from multioptpy_tpu.hessian.model import model_hessian
    geom = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.81],
                     [1.75, 0.0, -0.48], [4.9, 0.1, 0.2]])
    z = np.array([8, 1, 1, 18])
    h = np.asarray(model_hessian(jnp.asarray(geom), z, kind="lindh2007d4"))
    assert h.shape == (12, 12)
    assert np.all(np.isfinite(h))
    np.testing.assert_allclose(h, h.T, atol=1e-12)
    w = np.linalg.eigvalsh(h)
    assert w.max() > 0.1   # bonded stretches present


# ==========================================================================
# second oracle batch: universal / value-range / void-point / mechano /
# electrostatic potentials
# ==========================================================================

def test_universal_potential():
    """E = (c/kJmol/nPairs) sum_i |x_i - centroid|
    (ref: universal_potential.py:18-34)."""
    from multioptpy_tpu.potentials.extra import UniversalPotential
    pot = UniversalPotential(const=50.0, atoms=[1, 2, 3])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    pts = GEOM4[:3]
    centroid = pts.mean(axis=0)
    n_pairs = 3
    e_ref = sum(50.0 / H2KJ / n_pairs * np.linalg.norm(p - centroid)
                for p in pts)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)


def test_value_range_softplus_form():
    """E = log[(1+e^{ku(r-up)})(1+e^{kl(lo-r)})]
    (ref: value_range_potential.py:35)."""
    from multioptpy_tpu.potentials.misc import ValueRangePotential
    ku, kl, up, lo = 2.0, 3.0, 2.2, 1.0   # Angstrom walls
    pot = ValueRangePotential(upper_const=ku, lower_const=kl,
                              upper_distance=up, lower_distance=lo,
                              fragm_1=[1], fragm_2=[2])
    for r_set in (1.5, 2.0, 4.2, 5.0):
        geom = np.zeros((2, 3))
        geom[1, 0] = r_set
        e = float(pot.energy(jnp.asarray(geom),
                             jnp.asarray(pot.init_params())))
        r = r_set
        e_ref = np.log((1 + np.exp(ku * (r - up / BOHR2ANG)))
                       * (1 + np.exp(kl * (lo / BOHR2ANG - r))))
        np.testing.assert_allclose(e, e_ref, rtol=1e-9)


def test_void_point_potential():
    """(k/n)(r - r0)^n per target atom to a fixed point
    (ref: void_point_potential.py)."""
    from multioptpy_tpu.potentials.well import VoidPointPotential
    k, r0, n = 0.5, 1.2, 3.0
    point = [0.4, -0.2, 0.7]   # Angstrom
    pot = VoidPointPotential(spring_const=k, distance=r0, order=n,
                             point=point, atom=[1, 2])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    p = np.asarray(point) / BOHR2ANG
    e_ref = 0.0
    for i in (0, 1):
        r = np.linalg.norm(GEOM4[i] - p)
        e_ref += (k / n) * (r - r0 / BOHR2ANG) ** n
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)


def test_mechano_force_v2():
    """E = -f r_ij with f in pN converted to a.u.
    (ref: mechano_force_potential.py v2)."""
    from multioptpy_tpu.potentials.misc import LinearMechanoForceV2
    f_pn = 500.0
    pot = LinearMechanoForceV2(force_pn=f_pn, atom_pair=[1, 3])
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    # 1 a.u. force = 8.2387234983e-8 N -> pN conversion
    f_au = f_pn * 1e-12 / 8.2387234983e-8
    r = np.linalg.norm(GEOM4[0] - GEOM4[2])
    np.testing.assert_allclose(e, -f_au * r, rtol=1e-6)


def test_electrostatic_fragment_uff_charges():
    """E = scale sum q_i q_j / r with UFF effective charges
    (ref: electrostatic_potential.py)."""
    from multioptpy_tpu.periodic import UFF_EFFECTIVE_CHARGE
    from multioptpy_tpu.potentials.misc import ElectrostaticFragment
    pot = ElectrostaticFragment(charge_scale=0.7, fragm_1=[1, 2],
                                fragm_2=[3, 4], element_z=Z4)
    e = float(pot.energy(jnp.asarray(GEOM4), jnp.asarray(pot.init_params())))
    q = np.asarray(UFF_EFFECTIVE_CHARGE)[Z4]
    e_ref = 0.0
    for i in (0, 1):
        for j in (2, 3):
            r = np.linalg.norm(GEOM4[i] - GEOM4[j])
            e_ref += 0.7 * q[i] * q[j] / r
    # the implementation regularizes r with a tiny epsilon -> ~1e-6 rel
    np.testing.assert_allclose(e, e_ref, rtol=1e-5)
