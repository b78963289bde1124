"""Differentiable D2 dispersion: energy + autodiff Hessian corrections.

ref: multioptpy/Parameters/d2.py (Grimme JCC 27 (2006) 1787 tables, H-Rn) and
the dispersion-corrected model Hessians lindh2007d{2,3,4} / fischerd3 /
swartd4 etc. (ModelHessian/*.py, 500-1000 LoC each of hand-written second
derivatives). Here the dispersion Hessian is `jax.hessian` of the 10-line
closed-form energy — exact, and the same code serves every model-Hessian
flavor.

E_D2 = -s6 sum_{i<j} C6_ij / r^6 * f_damp,  f_damp = 1/(1+exp(-d(r/R0-1))),
C6_ij = sqrt(C6_i C6_j). `d3_energy/d3_hessian` add the reference's
D3(BJ)-style C6+C8 form (which reuses the D2 C6 values — see d3_energy).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.units import ANGSTROM2BOHR

# Z-indexed (0..86): Grimme D2 C6 (J nm^6 / mol) and vdW radii (Angstrom)
D2_C6_JNM6 = np.array([
    0, 0.14, 0.08, 1.61, 1.61, 3.13, 1.75, 1.23,
    0.7, 0.75, 0.63, 5.71, 5.71, 10.79, 9.23, 7.84,
    5.57, 5.07, 4.61, 10.8, 10.8, 10.8, 10.8, 10.8,
    10.8, 10.8, 10.8, 10.8, 10.8, 10.8, 10.8, 16.99,
    17.1, 16.37, 12.64, 12.47, 12.01, 24.67, 24.67, 24.67,
    24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67,
    24.67, 37.32, 38.71, 38.44, 31.74, 31.5, 29.99, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50,
], dtype=np.float64)

D2_VDW_ANG = np.array([
    1, 1.001, 1.012, 0.825, 1.408, 1.485, 1.452, 1.397,
    1.342, 1.287, 1.243, 1.144, 1.364, 1.639, 1.716, 1.705,
    1.683, 1.639, 1.595, 1.485, 1.474, 1.562, 1.562, 1.562,
    1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.65,
    1.727, 1.76, 1.771, 1.749, 1.727, 1.628, 1.606, 1.639,
    1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639,
    1.639, 1.672, 1.804, 1.881, 1.892, 1.892, 1.881, 1.802,
    1.762, 1.72, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753,
    1.753, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753,
    1.788, 1.772, 1.772, 1.772, 1.772, 1.772, 1.772, 1.772,
    1.758, 1.989, 1.944, 1.898, 2.005, 1.991, 1.924,
], dtype=np.float64)

# J nm^6/mol -> Hartree Bohr^6
_C6_AU = D2_C6_JNM6 / 6.02214076e23 / 4.3597447222071e-18 / 0.052917721067 ** 6


def d2_energy(coords, z, s6=1.2, damping=20.0):
    """Grimme D2 dispersion energy (Hartree, coords in Bohr)."""
    z = np.asarray(z)
    n = len(z)
    c6 = jnp.asarray(_C6_AU[z], coords.dtype)
    r0 = jnp.asarray(D2_VDW_ANG[z] * ANGSTROM2BOHR, coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    c6_ij = jnp.sqrt(c6[:, None] * c6[None, :])
    r0_ij = r0[:, None] + r0[None, :]
    f = 1.0 / (1.0 + jnp.exp(-damping * (r / r0_ij - 1.0)))
    e = -s6 * c6_ij / r ** 6 * f
    return jnp.sum(jnp.where(mask, e, 0.0))


def d2_gradient(coords, z, s6=1.2):
    return jax.grad(d2_energy)(coords, z, s6)


# Z-indexed <r^4>/<r^2> expectation values (a.u.), Grimme PBE0/def2-QZVP
# (2010), as shipped by tad-dftd3 — the table the reference loads in
# Parameters/d3.py:17. Unlisted/super-heavy elements fall back to 10.0
# (ref: d3.py default_r4r2).
D3_R4R2 = np.full(87, 10.0)
D3_R4R2[:55] = [
    10.0,
    8.0589, 3.4698,
    29.0974, 14.8517, 11.8799, 7.8715, 5.5588, 4.7566, 3.8025, 3.1036,
    26.1552, 17.2304, 17.7210, 12.7442, 9.5361, 8.1652, 6.7463, 5.6004,
    29.2012, 22.3934,
    19.0598, 16.8590, 15.4023, 12.5589, 13.4788, 12.2309, 11.2809,
    10.5569, 10.1428, 9.4907,
    13.4606, 10.8544, 8.9386, 8.1350, 7.1251, 6.1971,
    30.0162, 24.4103,
    20.3537, 17.4780, 13.5528, 11.8451, 11.0355, 10.1997, 9.5414,
    9.0061, 8.6417, 8.9975,
    14.0834, 11.8333, 10.0179, 9.3844, 8.4110, 7.5152,
]
D3_R4R2[55:57] = [32.7622, 27.5708]
D3_R4R2[57:64] = [23.1671, 21.6003, 20.9615, 20.4562, 20.1010, 19.7475,
                  19.4828]
D3_R4R2[64:71] = [15.6013, 19.2362, 17.4717, 17.8321, 17.4237, 17.1954,
                  17.1631]
D3_R4R2[71:87] = [14.5716, 15.8758, 13.8989, 12.4834, 11.4421, 10.2671,
                  8.3549, 7.8496, 7.3278, 7.4820, 13.5124, 11.6554,
                  10.0959, 9.7340, 8.8584, 8.0125]


# typical-valency reference coordination numbers, Z-indexed 0..54
# (ref: ModelHessian/fischerd3.py:27 ref_cn_map; default 4)
_D3_REF_CN = np.full(87, 4.0)
for _z, _cn in {1: 1, 2: 0, 3: 4, 4: 4, 5: 3, 6: 4, 7: 3, 8: 2, 9: 1,
                10: 0, 11: 6, 12: 6, 13: 6, 14: 4, 15: 5, 16: 6, 17: 1,
                18: 0, 19: 8, 20: 6, 21: 12, 22: 12, 23: 12, 24: 6,
                25: 6, 26: 6, 27: 6, 28: 4, 29: 4, 30: 4, 31: 4, 32: 4,
                33: 3, 34: 2, 35: 1, 36: 0, 37: 8, 38: 6, 39: 12,
                40: 12, 41: 12, 42: 6, 43: 6, 44: 6, 45: 6, 46: 4,
                47: 4, 48: 4, 49: 6, 50: 4, 51: 3, 52: 2, 53: 1,
                54: 0}.items():
    _D3_REF_CN[_z] = float(_cn)


def d3_coordination_numbers(coords, z, k1=16.0, k2=4.0 / 3.0):
    """Fractional D3 coordination numbers (Grimme JCP 132, 154104 eq. 15):
    CN_i = sum_j 1/(1+exp(-k1 (k2 rcov_ij / r_ij - 1))) — bonded pairs
    count ~1, far pairs ~0.

    NOTE: the reference's calc_coordination_numbers
    (ModelHessian/fischerd3.py:45) accidentally inverts the ratio
    (r/rcov), which makes every DISTANT atom count as coordinated; this
    follows the published formula instead."""
    from multioptpy_tpu.periodic import COVALENT_RADII_1
    n = coords.shape[0]
    # tracer-safe table lookup: z may be a traced int array when the
    # caller is itself jitted (e.g. the jitted model-Hessian closure)
    rcov = jnp.asarray(np.asarray(COVALENT_RADII_1),
                       coords.dtype)[jnp.asarray(z)]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    rcov_sum = rcov[:, None] + rcov[None, :]
    term = jnp.clip(-k1 * (k2 * (rcov_sum / r) - 1.0), -100.0, 100.0)
    f = 1.0 / (1.0 + jnp.exp(term))
    f = f * (1.0 - jnp.eye(n, dtype=coords.dtype))
    return jnp.sum(f, axis=1)


def d3_energy(coords, z, s6=1.0, s8=0.7875, a1=0.4289, a2=4.4407,
              dynamic_cn=False):
    """D3(BJ)-style dispersion with the reference's construction
    (ref: ModelHessian/lindh2007d3.py:109-166 + Parameters/d3.py PBE0
    defaults): C6 from the D2 table (sqrt combination), C8 = 3 C6
    sqrt(r4r2_i r4r2_j), Becke-Johnson damping with R0 = sqrt(C8/C6).
    With `dynamic_cn` the per-atom C6 are scaled by the coordination-
    number deviation from typical valency,
    clip(1 - 0.05 (CN_i - CN_ref_i), 0.75, 1.25) — the reference's
    current fischerd3 flavor (fischerd3.py:235); without it this is the
    static fischerd3old / lindh2007d3 form."""
    z = np.asarray(z)
    n = len(z)
    c6 = jnp.asarray(_C6_AU[z], coords.dtype)
    if dynamic_cn:
        cn = d3_coordination_numbers(coords, jnp.asarray(z))
        ref_cn = jnp.asarray(_D3_REF_CN[z], coords.dtype)
        c6 = c6 * jnp.clip(1.0 - 0.05 * (cn - ref_cn), 0.75, 1.25)
    r4r2 = jnp.asarray(D3_R4R2[z], coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    c6_ij = jnp.sqrt(c6[:, None] * c6[None, :])
    c8_ij = 3.0 * c6_ij * jnp.sqrt(r4r2[:, None] * r4r2[None, :])
    r0_ij = jnp.sqrt(c8_ij / (c6_ij + 1e-300))
    bj = a1 * r0_ij + a2
    e6 = -s6 * c6_ij / (r ** 6 + bj ** 6)
    e8 = -s8 * c8_ij / (r ** 8 + bj ** 8)
    return jnp.sum(jnp.where(mask, e6 + e8, 0.0))


def d3_gradient(coords, z, **kw):
    return jax.grad(d3_energy)(coords, z, **kw)


def d3_hessian(coords, z, **kw):
    """(3N,3N) exact D3(BJ) Hessian via autodiff (replaces the reference's
    hand-written calc_d3_gradient_components second derivatives,
    lindh2007d3.py:168-224)."""
    n = coords.shape[0]
    flat = lambda x: d3_energy(x.reshape(n, 3), z, **kw)
    return jax.hessian(flat)(coords.reshape(-1))


def d2_hessian(coords, z, s6=1.2):
    """(3N,3N) exact dispersion Hessian via autodiff (replaces the
    reference's hand-derived per-pair second-derivative blocks)."""
    n = coords.shape[0]
    flat = lambda x: d2_energy(x.reshape(n, 3), z, s6)
    return jax.hessian(flat)(coords.reshape(-1))


# ==========================================================================
# D4 — charge-scaled dispersion (ref: Parameters/d4.py D4Parameters,
# ModelHessian/lindh2007d4.py:98-322). The reference's "D4" model-Hessian
# flavor is its own construction: D2 C6 values combined Casimir-Polder
# style, C8 from tad-dftd3 r4/r2 ratios, a Gaussian charge scaling
# exp(-ga (q_i^2 + q_j^2)) with EN-equilibration charge estimates, and a
# BJ-style damping r^6/(r^6 + ((R0+a1) a2)^6).
# ==========================================================================

# PBE0/def2-QZVP reference polarizabilities, Z=1..56
# (ref: Parameters/d4.py:20-29; default 20.0 beyond)
D4_POL = np.full(87, 20.0)
D4_POL[1:57] = [
    4.50, 1.38, 164.20, 38.40, 21.10, 12.00, 7.40, 5.40, 3.80, 2.67,
    162.70, 71.00, 57.80, 37.00, 25.00, 19.60, 15.00, 11.10, 292.80,
    160.80, 120.00, 98.00, 84.00, 72.00, 63.00, 56.00, 50.00, 44.00,
    42.00, 40.00, 60.00, 41.00, 29.00, 25.00, 20.00, 16.80, 320.20,
    199.30, 126.70, 119.97, 101.60, 88.42, 80.08, 65.89, 56.10, 23.68,
    46.00, 39.72, 70.22, 55.95, 43.67, 37.65, 35.00, 27.30, 0.0, 0.0,
]
D4_POL[55:57] = 20.0  # Cs/Ba unlisted in the reference table -> default

# tad-dftd3 r4/r2 ratios, Z=1..56 (ref: Parameters/d4.py:31-57; default 10)
D4_R4R2 = np.full(87, 10.0)
D4_R4R2[1:57] = [
    8.0589, 3.4698, 29.0974, 14.8517, 11.8799, 7.8715, 5.5588, 4.7566,
    3.8025, 3.1036, 26.1552, 17.2304, 17.7210, 12.7442, 9.5361, 8.1652,
    6.7463, 5.6004, 29.2012, 22.3934, 19.0598, 16.8590, 15.4023, 12.5589,
    13.4788, 12.2309, 11.2809, 10.5569, 10.1428, 9.4907, 13.4606, 10.8544,
    8.9386, 8.1350, 7.1251, 6.1971, 30.0162, 24.4103, 20.3537, 17.4780,
    13.5528, 11.8451, 11.0355, 10.1997, 9.5414, 9.0061, 8.6417, 8.9975,
    14.0834, 11.8333, 10.0179, 9.3844, 8.4110, 7.5152, 32.7622, 27.5708,
]

# Pauling electronegativities for the charge estimate, Z=1..56
# (ref: Parameters/d4.py:60-69; default 2.0)
D4_EN = np.full(87, 2.0)
D4_EN[1:57] = [
    2.20, 0.00, 0.98, 1.57, 2.04, 2.55, 3.04, 3.44, 3.98, 0.00,
    0.93, 1.31, 1.61, 1.90, 2.19, 2.58, 3.16, 0.00, 0.82, 1.00,
    1.36, 1.54, 1.63, 1.66, 1.55, 1.83, 1.88, 1.91, 1.90, 1.65,
    1.81, 2.01, 2.18, 2.55, 2.96, 0.00, 0.82, 0.95, 1.22, 1.33,
    1.60, 2.16, 1.90, 2.20, 2.28, 2.20, 1.93, 1.69, 1.78, 1.96,
    2.05, 2.10, 2.66, 0.00, 0.79, 0.89,
]

# PBE0/def2-QZVP damping defaults (ref: Parameters/d4.py:8)
D4_S6, D4_S8, D4_A1, D4_A2 = 1.0, 1.03683, 0.4171, 4.5337
D4_GA, D4_GC = 3.0, 2.0


def d4_charges(coords, z, bond_scale=1.3):
    """Electronegativity-equilibration charge ESTIMATE for D4 scaling
    (ref: lindh2007d4.py:110 estimate_atomic_charges): per detected bond
    (r < bond_scale * rcov sum) transfer 0.1 tanh(0.2 (EN_j - EN_i)) from
    j to i, then remove the mean. Traced in coords (the hard bond mask is
    piecewise-constant, which is fine for a model-Hessian guess)."""
    from multioptpy_tpu.periodic import COVALENT_RADII_1

    z = np.asarray(z)
    n = len(z)
    en = jnp.asarray(D4_EN[z], coords.dtype)
    rcov = jnp.asarray(np.asarray(COVALENT_RADII_1)[z], coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    bonded = (r < bond_scale * (rcov[:, None] + rcov[None, :])) \
        & ~jnp.eye(n, dtype=bool)
    transfer = jnp.where(bonded,
                         0.1 * jnp.tanh(0.2 * (en[None, :] - en[:, None])),
                         0.0)
    q = jnp.sum(transfer, axis=1)
    return q - jnp.mean(q)


def d4_pair_tables(z, dtype=np.float64):
    """Static per-pair (C6, C8, R0) matrices (ref: lindh2007d4.py:218
    get_d4_parameters): C6 Casimir-Polder-combined from the D2 per-element
    values, C8 = 3 C6 sqrt(r4r2_i r4r2_j), R0 = vdW radii sum. The
    reference divides its (already-Bohr) UFF vdW radii by bohr2angstroms
    once more (get_d4_parameters r0_1/r0_2) — reproduced verbatim so the
    damping matches the reference numerically."""
    from multioptpy_tpu.periodic import UFF_VDW_R

    z = np.asarray(z)
    c6 = _C6_AU[z]
    c6_ij = 2.0 * c6[:, None] * c6[None, :] / (c6[:, None] + c6[None, :]
                                               + 1e-300)
    r4r2 = D4_R4R2[z]
    c8_ij = 3.0 * c6_ij * np.sqrt(r4r2[:, None] * r4r2[None, :])
    r_bohr = np.asarray(UFF_VDW_R)[z] / 0.52917721067
    r0_ij = r_bohr[:, None] + r_bohr[None, :]
    return (np.asarray(c6_ij, dtype), np.asarray(c8_ij, dtype),
            np.asarray(r0_ij, dtype))


def d4_pair_energy(r, c6, c8, r0, q_scaling=1.0,
                   s6=D4_S6, s8=D4_S8, a1=D4_A1, a2=D4_A2):
    """Per-pair D4 energy e6 + e8 (negative = attractive), BJ-style damping
    f6 = r^6/(r^6 + ((R0+a1) a2)^6) (ref: lindh2007d4.py:186-217)."""
    bj = (r0 + a1) * a2
    f6 = r ** 6 / (r ** 6 + bj ** 6)
    f8 = r ** 8 / (r ** 8 + bj ** 8)
    e6 = -s6 * c6 * q_scaling * f6 / r ** 6
    e8 = -s8 * c8 * q_scaling * f8 / r ** 8
    return e6 + e8


def d4_pair_force_const(r, c6, c8, r0, q_scaling=1.0, **kw):
    """-(e6 + e8): the pairwise force-constant contribution the reference's
    D4 model Hessians add to long pairs (ref: lindh2007d4.py:186
    calc_d4_force_const, used at :366/:493/:715 with weight kd)."""
    return -d4_pair_energy(r, c6, c8, r0, q_scaling, **kw)


def d4_energy(coords, z, charges=None, ga=D4_GA, **kw):
    """Total two-body D4 dispersion energy with Gaussian charge scaling
    exp(-ga (q_i^2 + q_j^2)) (ref: lindh2007d4.py:253 q_scaling)."""
    z = np.asarray(z)
    n = len(z)
    if charges is None:
        charges = d4_charges(coords, z)
    c6_ij, c8_ij, r0_ij = d4_pair_tables(z)
    diff = coords[:, None, :] - coords[None, :, :]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    q2 = charges[:, None] ** 2 + charges[None, :] ** 2
    qs = jnp.exp(-ga * q2)
    e = d4_pair_energy(r, jnp.asarray(c6_ij, coords.dtype),
                       jnp.asarray(c8_ij, coords.dtype),
                       jnp.asarray(r0_ij, coords.dtype), qs, **kw)
    return jnp.sum(jnp.where(mask, e, 0.0))


def d4_gradient(coords, z, **kw):
    return jax.grad(d4_energy)(coords, z, **kw)


def d4_hessian(coords, z, **kw):
    """(3N,3N) exact charge-scaled D4 Hessian via autodiff (replaces the
    reference's hand-written calc_d4_gradient_components blocks,
    lindh2007d4.py:260-322)."""
    n = coords.shape[0]
    flat = lambda x: d4_energy(x.reshape(n, 3), z, **kw)
    return jax.hessian(flat)(coords.reshape(-1))
