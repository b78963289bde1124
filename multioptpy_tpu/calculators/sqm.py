"""SQM — on-device semiempirical quantum chemistry (tight-binding EHT).

TPU-native counterpart of the reference's SQM1/SQM2 torch backends
(ref: multioptpy/SQM/sqm1/sqm1_core.py:378 SQM1Calculator — Slater-Koster
EHT :679 + EEQ charges :760 + repulsion :839 + dispersion :878 + SRB :985;
SQM/sqm2/* is the same architecture with an STO overlap basis). This is an
independent implementation from standard published constants, NOT a port of
the reference's fitted pair tables:

  * valence basis: minimal s/p STO-3G Gaussian expansions (Hehre, Stewart,
    Pople JCP 51 (1969) 2657) with Slater-rule zetas — TRUE closed-form
    overlap integrals via the Gaussian product theorem, fully
    differentiable (the reference instead fits A exp(-alpha R) radial
    integrals per element pair, sqm1_core.py:450).
  * EHT Hamiltonian: Wolfsberg-Helmholz H_ij = 0.5 K (h_i + h_j) S_ij with
    Hoffmann VSIP diagonal energies.
  * electron filling: Fermi smearing with a bisected chemical potential
    (differentiable fractional occupations; handles open shells).
  * EEQ: electronegativity-equalization charges from a linear solve with a
    total-charge constraint (Parr-Pearson chi/eta), Ohno-Klopman damped
    Coulomb; E_IES + E_EEQ like GFN0-xTB.
  * repulsion: Z_eff Z_eff / r * exp(-(r/R0)^1.5) (GFN0-style form).
  * dispersion: Grimme D2 (JCC 27 (2006) 1787) C6/R0 tables, s6 = 1.2.

Everything is dense linear algebra over static (4N, 4N) orbital blocks
(every atom carries an s+p shell; unused shells are masked to high energy),
so the whole energy is one fused XLA program: two eighs + matmuls on the
MXU, vmap-able over ensembles. Elements H-Ar.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multioptpy_tpu.calculators.base import Calculator, register_calculator
from multioptpy_tpu.units import HARTREE2EV

# --- STO-3G expansion (scale-1 exponents; multiply by zeta^2) -------------
_G1S_A = np.array([2.227660584, 0.405771156, 0.109818])
_G1S_C = np.array([0.154328967, 0.535328142, 0.444634542])
_G2SP_A = np.array([0.994203122, 0.231031402, 0.0751386])
_G2S_C = np.array([-0.09996723, 0.39951283, 0.70011547])
_G2P_C = np.array([0.15591627, 0.60768372, 0.39195739])
_G3SP_A = np.array([0.499663, 0.1331, 0.0519573])
_G3S_C = np.array([-0.2196204, 0.2255954, 0.9003984])
_G3P_C = np.array([0.01058760, 0.59516700, 0.46200100])

# Z -> (n_shell, zeta_s(=zeta_p), VSIP_s eV, VSIP_p eV, n_valence)
# zetas: Slater rules; VSIPs: Hoffmann extended-Hueckel tables.
_ELEMENTS = {
    1:  (1, 1.240, -13.60, None,  1),
    2:  (1, 1.700, -23.40, None,  2),
    3:  (2, 0.650, -5.40, -3.50,  1),
    4:  (2, 0.975, -10.00, -6.00, 2),
    5:  (2, 1.300, -15.20, -8.50, 3),
    6:  (2, 1.625, -21.40, -11.40, 4),
    7:  (2, 1.950, -26.00, -13.40, 5),
    8:  (2, 2.275, -32.30, -14.80, 6),
    9:  (2, 2.600, -40.00, -18.10, 7),
    10: (2, 2.925, -43.20, -20.00, 8),
    11: (3, 0.733, -5.10, -3.00,  1),
    12: (3, 0.950, -9.00, -4.50,  2),
    13: (3, 1.167, -12.30, -6.50, 3),
    14: (3, 1.383, -17.30, -9.20, 4),
    15: (3, 1.600, -18.60, -14.00, 5),
    16: (3, 1.817, -20.00, -13.30, 6),
    17: (3, 2.033, -26.30, -14.20, 7),
    18: (3, 2.250, -29.20, -15.80, 8),
}

# EEQ electronegativity / hardness (eV, Parr-Pearson) + charge radius (Bohr)
_EEQ = {
    1: (7.18, 12.85, 1.4), 2: (12.3, 25.0, 1.3),
    3: (3.01, 4.77, 2.6), 4: (4.90, 8.90, 2.0), 5: (4.29, 8.02, 1.7),
    6: (6.27, 10.00, 1.6), 7: (7.30, 14.46, 1.5), 8: (7.54, 12.16, 1.4),
    9: (10.41, 14.02, 1.3), 10: (10.6, 21.0, 1.3),
    11: (2.85, 4.60, 3.0), 12: (3.75, 7.80, 2.6), 13: (3.23, 5.54, 2.2),
    14: (4.77, 6.76, 2.0), 15: (5.62, 9.76, 1.9), 16: (6.22, 8.28, 1.8),
    17: (8.30, 9.36, 1.7), 18: (7.7, 14.0, 1.7),
}

# effective repulsion charges (GFN0-flavoured: sub-valence for N/O/F so a
# single global prefactor balances X-H vs X-X walls; tuned here on
# H2 / H2O / CH4 / NH3 equilibrium geometries)
_Z_EFF_REP = {
    1: 1.6, 2: 1.2, 3: 1.0, 4: 1.8, 5: 2.4, 6: 4.0, 7: 3.0, 8: 3.4,
    9: 3.8, 10: 3.5, 11: 1.2, 12: 2.0, 13: 2.6, 14: 3.8, 15: 4.4,
    16: 4.6, 17: 4.4, 18: 4.0,
}

# Grimme D2 C6 (J mol^-1 nm^6) and vdW radii (Angstrom), JCC 27, 1787
_D2 = {
    1: (0.14, 1.001), 2: (0.08, 1.012),
    3: (1.61, 0.825), 4: (1.61, 1.408), 5: (3.13, 1.485),
    6: (1.75, 1.452), 7: (1.23, 1.397), 8: (0.70, 1.342),
    9: (0.75, 1.287), 10: (0.63, 1.243),
    11: (5.71, 1.144), 12: (5.71, 1.364), 13: (10.79, 1.639),
    14: (9.23, 1.716), 15: (7.84, 1.705), 16: (5.57, 1.683),
    17: (5.07, 1.639), 18: (4.61, 1.595),
}

_K_WH = 1.75         # Wolfsberg-Helmholz constant (ss pairs)
_K_SP = 2.2          # s-p pairs: controls hybridized/directional bonding —
                     # 1.75 leaves water nearly linear, 2.2 bends it to 110
                     # degrees (exp 104.5)
_K_PP = 2.2          # p-p pairs (heavy-heavy only — H has no p): round-2
                     # recalibration. At the old 1.75 the pi system was too
                     # weak to resist bending: CO2 minimized at ~140 deg
                     # (the round-1 documented defect). 2.2 makes CO2
                     # linear AND shortens r_CO (1.35 -> 1.25 ang) while
                     # leaving every X-H fixture (H2O/NH3/CH4 angles and
                     # bonds, ethane staggered preference) unchanged.
# repulsion constants calibrated against experimental r_e of H2 (1.40),
# H2O (1.81), CH4 (2.06), NH3 (1.91 Bohr): minima land within ~0.1 Bohr
_REP_K = 0.4         # global repulsion prefactor
_REP_R0_SCALE = 0.42  # scale on summed covalent radii
_REP_HH = 0.1        # short-range Gaussian H-H wall strength
_REP_EXP = 1.5       # GFN0-style exponent
_D2_S6 = 1.2
_D2_D = 20.0
_FERMI_KT = 0.005    # Hartree electronic temperature (smearing)


def _tables(max_z=19):
    shell_n = np.zeros(max_z, np.int32)
    zeta = np.ones(max_z)
    h_s = np.zeros(max_z)
    h_p = np.full(max_z, 50.0)  # +50 eV pushes absent p shells far above
    n_val = np.zeros(max_z)
    has_p = np.zeros(max_z)
    chi = np.zeros(max_z)
    eta = np.ones(max_z)
    r_q = np.ones(max_z)
    c6 = np.zeros(max_z)
    r0 = np.ones(max_z)
    z_eff = np.ones(max_z)
    for z, v in _Z_EFF_REP.items():
        z_eff[z] = v
    for z, (n, zt, hs, hp, nv) in _ELEMENTS.items():
        shell_n[z] = n
        zeta[z] = zt
        h_s[z] = hs
        if hp is not None:
            h_p[z] = hp
            has_p[z] = 1.0
        n_val[z] = nv
    for z, (x, e, r) in _EEQ.items():
        chi[z], eta[z], r_q[z] = x, e, r
    nm_per_bohr = 0.052917721067
    for z, (c, r) in _D2.items():
        # J mol^-1 nm^6 -> Hartree Bohr^6:
        # /NA (J nm^6) /Eh (Ha nm^6) * (Bohr/nm)^-6 = * (1/nm_per_bohr)^6
        c6[z] = (c / 6.02214076e23 / 4.3597447222071e-18
                 / nm_per_bohr ** 6)
        r0[z] = r / 0.52917721067  # Angstrom -> Bohr
    return dict(shell_n=shell_n, zeta=zeta, h_s=h_s, h_p=h_p, n_val=n_val,
                has_p=has_p, chi=chi / HARTREE2EV, eta=eta / HARTREE2EV,
                r_q=r_q, c6=c6, r0=r0, z_eff=z_eff)


_T = _tables()

# Pauling electronegativities for the EN-scaled K factor (shared with the
# D4 charge model; ref: Parameters/d4.py:60)
from multioptpy_tpu.hessian.dispersion import D4_EN as _PAULING_EN  # noqa: E402


def _param_active(*vals):
    """Static guard: False only when every value is a literal zero — traced
    values (calibration scans pass tracers through the attributes) always
    activate the branch."""
    return any(not isinstance(v, (int, float)) or v != 0.0 for v in vals)


def _primitive_params(z):
    """Per-atom (3,) gaussian exponents and (3,) s/p contraction coeffs."""
    n = _T["shell_n"][z]
    zeta2 = _T["zeta"][z] ** 2
    alpha = np.where(n[:, None] == 1, _G1S_A[None, :],
                     np.where(n[:, None] == 2, _G2SP_A[None, :],
                              _G3SP_A[None, :])) * zeta2[:, None]
    cs = np.where(n[:, None] == 1, _G1S_C[None, :],
                  np.where(n[:, None] == 2, _G2S_C[None, :], _G3S_C[None, :]))
    cp = np.where(n[:, None] == 2, _G2P_C[None, :],
                  np.where(n[:, None] == 3, _G3P_C[None, :], _G2P_C[None, :]))
    return alpha, cs, cp


def _overlap_blocks(coords, alpha, cs, cp):
    """All-pairs (N,N,4,4) overlap blocks over [s, px, py, pz] orbitals.

    Gaussian product theorem primitives (normalized):
      <s|s>   = E0
      <s|p_k> = (P_k - B_k) E0        <p_k|s> = (P_k - A_k) E0
      <p_i|p_j> = [(P_i-A_i)(P_j-B_j) + delta_ij/(2p)] E0
    contracted over 3x3 primitive pairs in one einsum-free broadcast.
    """
    n = coords.shape[0]
    a_i = alpha[:, None, :, None]          # (N,1,3,1) exponents of i
    a_j = alpha[None, :, None, :]          # (1,N,1,3)
    p_sum = a_i + a_j                      # (N,N,3,3)
    mu = a_i * a_j / p_sum

    rij = coords[:, None, :] - coords[None, :, :]      # (N,N,3) A - B
    r2 = jnp.sum(rij * rij, axis=-1)                   # (N,N)
    e0 = (jnp.pi / p_sum) ** 1.5 * jnp.exp(-mu * r2[:, :, None, None])

    # normalization of primitives
    norm_s_i = (2.0 * a_i / jnp.pi) ** 0.75
    norm_s_j = (2.0 * a_j / jnp.pi) ** 0.75
    norm_p_i = norm_s_i * 2.0 * jnp.sqrt(a_i)
    norm_p_j = norm_s_j * 2.0 * jnp.sqrt(a_j)

    # P - A = (a_j/(a_i+a_j)) (B - A);  P - B = (a_i/(a_i+a_j)) (A - B)
    pa = (a_j / p_sum)[..., None] * (-rij[:, :, None, None, :])  # (N,N,3,3,3)
    pb = (a_i / p_sum)[..., None] * (rij[:, :, None, None, :])

    c_s_i = cs[:, None, :, None]
    c_s_j = cs[None, :, None, :]
    c_p_i = cp[:, None, :, None]
    c_p_j = cp[None, :, None, :]

    # s-s
    s_ss = jnp.sum(c_s_i * c_s_j * norm_s_i * norm_s_j * e0, axis=(2, 3))
    # s(i)-p_k(j)
    s_sp = jnp.sum((c_s_i * c_p_j * norm_s_i * norm_p_j * e0)[..., None]
                   * pb, axis=(2, 3))                     # (N,N,3)
    # p_k(i)-s(j)
    s_ps = jnp.sum((c_p_i * c_s_j * norm_p_i * norm_s_j * e0)[..., None]
                   * pa, axis=(2, 3))                     # (N,N,3)
    # p_i(i)-p_j(j)
    pp_core = (pa[..., :, None] * pb[..., None, :]
               + (jnp.eye(3) / (2.0 * p_sum)[..., None, None]))  # (N,N,3,3,3,3)
    s_pp = jnp.sum((c_p_i * c_p_j * norm_p_i * norm_p_j * e0)[..., None, None]
                   * pp_core, axis=(2, 3))                # (N,N,3,3)

    block = jnp.zeros((n, n, 4, 4), dtype=coords.dtype)
    block = block.at[:, :, 0, 0].set(s_ss)
    block = block.at[:, :, 0, 1:].set(s_sp)
    block = block.at[:, :, 1:, 0].set(s_ps)
    block = block.at[:, :, 1:, 1:].set(s_pp)
    return block


from functools import partial


def _sqm_eigh(a, impl):
    """Band-structure eigensolver dispatch: "xla" | "pallas" (the batched
    lane-parallel Jacobi kernel — f32-on-TPU only, falls back to the XLA
    Jacobi elsewhere; see steppers.rfo._eigh for the measured numbers)."""
    if impl == "pallas":
        from multioptpy_tpu.steppers.rfo import _eigh
        return _eigh(a, "pallas")
    return jnp.linalg.eigh(a)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def _band_free_energy(a, n_elec, kt, eigh_impl="xla"):
    """Mermin band free energy F = sum occ_i eps_i - T S_el of a symmetric
    matrix `a`, with Fermi occupations at fixed electron count.

    Differentiating through `eigh` NaNs on degenerate spectra (placeholder
    orbitals and symmetric molecules guarantee degeneracies); the exact
    derivative of F at self-consistent mu is the Hellmann-Feynman form
    dF = tr(rho dA), which the custom JVP implements directly.
    """
    from jax.scipy.special import xlogy
    eps = _sqm_eigh(a, eigh_impl)[0]
    occ, _ = _fermi_occupations(eps, n_elec, kt)
    f_half = jnp.clip(occ / 2.0, 0.0, 1.0)
    # xlogy defines 0 log 0 = 0, avoiding the 1 - 1e-30 == 1.0 rounding trap
    entropy = -2.0 * jnp.sum(xlogy(f_half, f_half)
                             + xlogy(1.0 - f_half, 1.0 - f_half))
    return jnp.sum(occ * eps) - kt * entropy


@_band_free_energy.defjvp
def _band_free_energy_jvp(n_elec, kt, eigh_impl, primals, tangents):
    (a,), (da,) = primals, tangents
    w, v = _sqm_eigh(a, eigh_impl)
    occ, _ = _fermi_occupations(w, n_elec, kt)
    f = _band_free_energy(a, n_elec, kt, eigh_impl)
    rho = (v * occ[None, :]) @ v.T
    return f, jnp.sum(rho * da)


def _fermi_occupations(eps, n_elec, kt=_FERMI_KT, n_iter=60):
    """Occupations 2 f(eps; mu) with mu bisected so sum = n_elec."""
    lo = jnp.min(eps) - 1.0
    hi = jnp.max(eps) + 1.0

    def n_of(mu):
        return jnp.sum(2.0 * jax.nn.sigmoid(-(eps - mu) / kt))

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        too_few = n_of(m) < n_elec
        return (jnp.where(too_few, m, a), jnp.where(too_few, b, m))

    a, b = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    mu = 0.5 * (a + b)
    return 2.0 * jax.nn.sigmoid(-(eps - mu) / kt), mu


def _inv_sqrt_newton_schulz(s, n_iter=34):
    """S^{-1/2} of an SPD matrix by the coupled Newton-Schulz iteration
    (Denman-Beavers NS form):
        Y_0 = S/c, Z_0 = I;  T_k = 0.5 (3I - Z_k Y_k)
        Y_{k+1} = Y_k T_k,   Z_{k+1} = T_k Z_k
        => Z -> (S/c)^{-1/2},  result = Z / sqrt(c)
    Convergence needs the spectrum of S/c in (0, 2): c is the Gershgorin
    row-sum bound, so eigenvalues lie in (0, 1]. Quadratic convergence;
    34 iterations cover overlap condition numbers to ~1e4 at f64, f32
    saturates earlier. Fixed trip count -> jit/vmap-safe; pure matmuls ->
    exact autodiff with no custom-call JVPs."""
    d = s.shape[-1]
    eye = jnp.eye(d, dtype=s.dtype)
    c = jnp.max(jnp.sum(jnp.abs(s), axis=-1)) + 1e-30
    y0 = s / c

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, n_iter, body, (y0, eye))
    return z / jnp.sqrt(c)


def _sym_solve(a, b):
    """Solve the symmetric (indefinite, bordered) EEQ system.

    TPU implements only F32 LuDecomposition, so f64 `jnp.linalg.solve`
    fails to compile on device; in that regime solve via the pure-matmul
    Jacobi eigendecomposition (ops/jacobi.py) instead — any dtype, any
    backend. CPU / f32 keep the LAPACK-path solve (faster forward AND
    a cheap transpose rule for autodiff)."""
    import jax as _jax

    if a.dtype == jnp.float64 and _jax.default_backend() != "cpu":
        return _cg_solve(a, b)
    return jnp.linalg.solve(a, b)


def _cg_raw(a, b):
    """Fixed-iteration CG on the normal equations: only adds/matvecs, which
    are the f64 ops the TPU emulation handles reliably (batched Jacobi shows
    spectrum drift in f64 there; LU/cholesky/triangular custom calls are
    F32-only). A^T A is SPD; CG converges in <= dim steps in exact
    arithmetic; 3*dim iterations cover f64 roundoff for these tiny,
    well-scaled EEQ systems."""
    ata = a.T @ a
    atb = a.T @ b
    n_it = 3 * a.shape[-1]

    def body(_, xrp):
        x, r, p = xrp
        ap = ata @ p
        denom = jnp.dot(p, ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-300,
                          jnp.dot(r, r) / jnp.where(
                              jnp.abs(denom) > 1e-300, denom, 1.0), 0.0)
        x = x + alpha * p
        r_new = r - alpha * ap
        beta_den = jnp.dot(r, r)
        beta = jnp.where(beta_den > 1e-300,
                         jnp.dot(r_new, r_new) / jnp.where(
                             beta_den > 1e-300, beta_den, 1.0), 0.0)
        return x, r_new, r_new + beta * p

    x0 = jnp.zeros_like(b)
    x, _, _ = jax.lax.fori_loop(0, n_it, body, (x0, atb, atb))
    return x


@jax.custom_vjp
def _cg_solve(a, b):
    return _cg_raw(a, b)


def _cg_solve_fwd(a, b):
    x = _cg_raw(a, b)
    return x, (a, x)


def _cg_solve_bwd(res, xbar):
    # implicit-function adjoint of x = A^-1 b: solve A^T lam = xbar (one
    # more forward CG — reverse-differentiating THROUGH the loop NaNs in
    # f64 on TPU and is wasteful everywhere), then b_bar = lam,
    # A_bar = -lam x^T
    a, x = res
    lam = _cg_raw(a.T, xbar)
    return (-jnp.outer(lam, x), lam)


_cg_solve.defvjp(_cg_solve_fwd, _cg_solve_bwd)


# GFN0-xTB short-range bond (SRB) correction parameters — the published xtb
# gfn0 data the reference ships in SQM/sqm2/sqm2_data.py:17-21,:103-140.
# Z-indexed (0 pad; Z=1..86). Defaults k=-0.013 (attractive gaussian at the
# EN-corrected covalent distance — tightens bond lengths).
_SRB_K, _SRB_ETA, _SRB_GSCAL, _SRB_C1, _SRB_C2 = -0.013, 3.48, 0.51, -1.71, 2.11
_SRB_EN = np.zeros(87)
_SRB_EN[1:87] = [
    2.30085633, 2.78445145, 1.52956084, 1.51714704, 2.20568300,
    2.49640820, 2.81007174, 4.51078438, 4.67476223, 3.29383610,
    2.84505365, 2.20047950, 2.31739628, 2.03636974, 1.97558064,
    2.13446570, 2.91638164, 1.54098156, 2.91656301, 2.26312147,
    2.25621439, 1.32628677, 2.27050569, 1.86790977, 2.44759456,
    2.49480042, 2.91545568, 3.25897750, 2.68723778, 1.86132251,
    2.01200832, 1.97030722, 1.95495427, 2.68920990, 2.84503857,
    2.61591858, 2.64188286, 2.28442252, 1.33011187, 1.19809388,
    1.89181390, 2.40186898, 1.89282464, 3.09963488, 2.50677823,
    2.61196704, 2.09943450, 2.66930105, 1.78349472, 2.09634533,
    2.00028974, 1.99869908, 2.59072029, 2.54497829, 2.52387890,
    2.30204667, 1.60119300, 2.00000000, 2.00000000, 2.00000000,
    2.00000000, 2.00000000, 2.00000000, 2.00000000, 2.00000000,
    2.00000000, 2.00000000, 2.00000000, 2.00000000, 2.00000000,
    2.00000000, 2.30089349, 1.75039077, 1.51785130, 2.62972945,
    2.75372921, 2.62540906, 2.55860939, 3.32492356, 2.65140898,
    1.52014458, 2.54984804, 1.72021963, 2.69303422, 1.81031095,
    2.34224386]
_SRB_R0 = np.zeros(87)
_SRB_R0[1:87] = [
    0.55682207, 0.80966997, 2.49092101, 1.91705642, 1.35974851,
    0.98310699, 0.98423007, 0.76716063, 1.06139799, 1.17736822,
    2.85570926, 2.56149012, 2.31673425, 2.03181740, 1.82568535,
    1.73685958, 1.97498207, 2.00136196, 3.58772537, 2.68096221,
    2.23355957, 2.33135502, 2.15870365, 2.10522128, 2.16376162,
    2.10804037, 1.96460045, 2.00476257, 2.22628712, 2.43846700,
    2.39408483, 2.24245792, 2.05751204, 2.15427677, 2.27191920,
    2.19722638, 3.80910350, 3.26020971, 2.99716916, 2.71707818,
    2.34950167, 2.11644818, 2.47180659, 2.32198800, 2.32809515,
    2.15244869, 2.55958313, 2.59141300, 2.62030465, 2.39935278,
    2.56912355, 2.54374096, 2.56914830, 2.53680807, 4.24537037,
    3.66542289, 3.19903011, 2.80000000, 2.80000000, 2.80000000,
    2.80000000, 2.80000000, 2.80000000, 2.80000000, 2.80000000,
    2.80000000, 2.80000000, 2.80000000, 2.80000000, 2.80000000,
    2.80000000, 2.34880037, 2.37597108, 2.49067697, 2.14100577,
    2.33473532, 2.19498900, 2.12678348, 2.34895048, 2.33422774,
    2.86560827, 2.62488837, 2.88376127, 2.75174124, 2.83054552,
    2.63264944]


def srb_energy(coords, z, k=_SRB_K, eta=_SRB_ETA, g_scal=_SRB_GSCAL,
               c1=_SRB_C1, c2=_SRB_C2, k_heavy=None):
    """GFN0 short-range bond correction (ref: sqm2_srb.py:21 calculation):
    E = k sum_{i<j} exp(-eta (1 + g dEN^2) (r - r_cov)^2),
    r_cov = (r0_i + r0_j)(1 - c1 dEN - c2 dEN^2). Attractive gaussians at
    EN-corrected covalent distances — tightens bond lengths. Pure JAX;
    autodiff gradients/Hessians for free."""
    z_np = np.asarray(z)
    n = len(z_np)
    en = jnp.asarray(_SRB_EN[z_np], coords.dtype)
    r0 = jnp.asarray(_SRB_R0[z_np], coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    den = jnp.abs(en[:, None] - en[None, :])
    r_cov = (r0[:, None] + r0[None, :]) * (1.0 - c1 * den - c2 * den ** 2)
    expo = -eta * (1.0 + g_scal * den ** 2) * (r - r_cov) ** 2
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    if k_heavy is None:
        k_pair = k
    else:
        # pair-resolved strength: heavy-heavy bonds get their own k —
        # the published global -0.013 under-binds X-X bonds in this
        # minimal basis (r_CC/r_CO come out 0.1-0.3 ang long)
        hv = jnp.asarray((z_np > 2).astype(np.float64), coords.dtype)
        k_pair = jnp.where(hv[:, None] * hv[None, :] > 0, k_heavy, k)
    return jnp.sum(jnp.where(mask, k_pair * jnp.exp(expo), 0.0))


@register_calculator("sqm")
class SQM(Calculator):
    """On-device semiempirical backend (H-Ar)."""

    on_device = True

    def __init__(self, charge=0, multiplicity=1, kt=_FERMI_KT,
                 rep_k=_REP_K, rep_r0_scale=_REP_R0_SCALE, rep_hh=_REP_HH,
                 srb=False, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        self.kt = float(kt)
        self.rep_k = float(rep_k)
        self.rep_r0_scale = float(rep_r0_scale)
        # H-H pairs need their own wall strength: the tiny H covalent
        # radius makes the generic exponential negligible at r_e(H2)
        # (GFN-xTB special-cases the H,H pair the same way)
        self.rep_hh = float(rep_hh)
        # opt-in GFN0 SRB term (ref: sqm2_srb.py). OFF by default: the
        # EHT/rep parameters here were calibrated WITHOUT it, and adding it
        # shifts all equilibrium bond lengths ~0.05-0.1 Bohr shorter.
        self.srb = bool(srb)
        self.k_ss = float(kw.pop("k_ss", _K_WH))
        self.k_sp = float(kw.pop("k_sp", _K_SP))
        self.k_pp = float(kw.pop("k_pp", _K_PP))
        # GFN0-style environment-dependent level shifts (ref:
        # SQM/sqm2/sqm2_qm.py:275 _get_self_energy: h -= kCN cn + kQ q
        # + kq2 q^2): the EHT diagonal responds to the coordination number
        # and the EEQ charge, giving the charge self-consistency the
        # round-1 model lacked. OFF by default (0.0) — the base
        # calibration predates them; enable/calibrate via constructor.
        self.k_cn_s = float(kw.pop("k_cn_s", 0.0))
        self.k_cn_p = float(kw.pop("k_cn_p", 0.0))
        self.k_q = float(kw.pop("k_q", 0.0))
        self.k_q2 = float(kw.pop("k_q2", 0.0))
        # s-p Wolfsberg constant for heavy-heavy pairs (defaults to k_sp;
        # see the k_pair construction in energy_terms)
        self.k_sp_heavy = float(kw.pop("k_sp_heavy", self.k_sp))
        # EN-difference K enhancement (ref: sqm2_qm.py:190); 0 = off
        self.k_en = float(kw.pop("k_en", 0.0))
        # pair-resolved SRB strength for heavy-heavy bonds (None = global k)
        self.srb_k_heavy = kw.pop("srb_k_heavy", None)
        # band eigensolver: "xla" | "pallas" (f32 throughput runs)
        self.eigh_impl = str(kw.pop("eigh_impl", "xla"))
        # dispersion model: "d2" (default) or "d4" (charge-scaled C6/C8)
        self.dispersion = str(kw.pop("dispersion", "d2"))

    def energy(self, coords, z):
        t = self.energy_terms(coords, z)
        return t["eht"] + t["eeq"] + t["rep"] + t["disp"] + t["srb"]

    def hessian(self, coords, z):
        """Seminumerical: central differences of the ANALYTIC gradient.

        The band energy's custom JVP gives exact first derivatives at any
        degeneracy, but differentiating that JVP again would differentiate
        the eigenvectors (NaN for the degenerate placeholder shells), so
        second derivatives use 6N batched gradient evaluations instead —
        one vmapped call (ref: the same strategy as
        tblite_calculation_tools.py:100, but batched)."""
        return self.numerical_hessian(coords, z, step=1e-4)

    def energy_terms(self, coords, z):
        z_np = np.asarray(z)
        n = len(z_np)
        dtype = coords.dtype

        alpha, cs, cp = _primitive_params(z_np)
        alpha = jnp.asarray(alpha, dtype)
        cs = jnp.asarray(cs, dtype)
        cp = jnp.asarray(cp, dtype)

        # ---- EEQ electrostatics (computed FIRST: the charges also shift
        # the EHT levels below, ref: sqm2_qm.py:275) ---------------------
        rij_v = coords[:, None, :] - coords[None, :, :]
        r = jnp.sqrt(jnp.sum(rij_v * rij_v, axis=-1)
                     + jnp.eye(n, dtype=dtype))
        chi = jnp.asarray(_T["chi"][z_np], dtype)
        eta = jnp.asarray(_T["eta"][z_np], dtype)
        r_q = jnp.asarray(_T["r_q"][z_np], dtype)
        gamma2 = r_q[:, None] ** 2 + r_q[None, :] ** 2
        j_off = 1.0 / jnp.sqrt(r * r + gamma2)   # Ohno-Klopman
        # diagonal carries the hardness PLUS the self-Coulomb of the charge
        # distribution, sqrt(2/pi)/r_i (D4-EEQ form) — without it the matrix
        # loses diagonal dominance for clustered atoms and the charge solve
        # diverges to +/-1e5 charges
        diag = eta + jnp.sqrt(2.0 / jnp.pi) / r_q
        a_mat = jnp.where(jnp.eye(n, dtype=bool),
                          diag[None, :] * jnp.ones((n, n), dtype=dtype),
                          j_off)
        # constrained linear solve: [A 1; 1 0][q; lam] = [-chi; Q]
        big = jnp.zeros((n + 1, n + 1), dtype=dtype)
        big = big.at[:n, :n].set(a_mat)
        big = big.at[:n, n].set(1.0)
        big = big.at[n, :n].set(1.0)
        rhs = jnp.concatenate([-chi, jnp.asarray([float(self.charge)], dtype)])
        sol = _sym_solve(big, rhs)
        q = sol[:n]
        e_eeq = jnp.dot(chi, q) + 0.5 * jnp.dot(q, a_mat @ q)

        # ---- overlap & Hamiltonian -----------------------------------
        s_blocks = _overlap_blocks(coords, alpha, cs, cp)  # (N,N,4,4)
        h_diag_atom = np.stack([
            _T["h_s"][z_np], _T["h_p"][z_np], _T["h_p"][z_np],
            _T["h_p"][z_np]], axis=1) / HARTREE2EV          # (N,4)
        h_diag = jnp.asarray(h_diag_atom, dtype).reshape(-1)  # (4N,)
        if _param_active(self.k_cn_s, self.k_cn_p, self.k_q, self.k_q2):
            # GFN0 environment shifts (ref: sqm2_qm.py:283-293): CN from a
            # logistic counting function, q from the EEQ solve above
            from multioptpy_tpu.periodic import COVALENT_RADII_1 as _RC
            rcov_a = jnp.asarray(np.asarray(_RC)[z_np], dtype)
            rc_ij = rcov_a[:, None] + rcov_a[None, :]
            cn = jnp.sum(jnp.where(~jnp.eye(n, dtype=bool),
                                   1.0 / (1.0 + jnp.exp(
                                       -16.0 * (rc_ij / r - 1.0))), 0.0),
                         axis=1)
            shift_s = -self.k_cn_s * cn - self.k_q * q - self.k_q2 * q * q
            shift_p = -self.k_cn_p * cn - self.k_q * q - self.k_q2 * q * q
            shifts = jnp.stack([shift_s, shift_p, shift_p, shift_p],
                               axis=1).reshape(-1)
            h_diag = h_diag + shifts

        s_mat = jnp.transpose(s_blocks, (0, 2, 1, 3)).reshape(4 * n, 4 * n)
        # same-atom blocks: exact orthonormality of the minimal basis
        eye_block = jnp.eye(4, dtype=dtype)
        diag_mask = jnp.kron(jnp.eye(n, dtype=dtype),
                             jnp.ones((4, 4), dtype=dtype))
        s_mat = s_mat * (1.0 - diag_mask) + jnp.kron(
            jnp.eye(n, dtype=dtype), eye_block)

        # orbital validity: atoms without a p shell (H, He) carry inert
        # placeholder p orbitals — decouple them entirely (identity overlap,
        # high diagonal energy) so they never mix into the spectrum
        valid_atom = np.stack([np.ones(n), _T["has_p"][z_np],
                               _T["has_p"][z_np], _T["has_p"][z_np]], axis=1)
        valid = jnp.asarray(valid_atom, dtype).reshape(-1)  # (4N,)
        vv = valid[:, None] * valid[None, :]
        eye_full = jnp.eye(4 * n, dtype=dtype)
        s_mat = s_mat * vv + eye_full * (1.0 - valid)[None, :].T * 0.0 \
            + jnp.diag(1.0 - valid)

        # per-orbital-pair Wolfsberg-Helmholz constants: the s-p constant
        # controls directional (hybridized) bonding and thereby bond angles.
        # k_sp is resolved by the PAIR of elements: X-H s-p blocks (which
        # set H2O/NH3 angles) keep k_sp; heavy-heavy s-p blocks get their
        # own k_sp_heavy — the second-order Jahn-Teller sigma*/pi mixing
        # that over-stabilizes bent CO2 lives exclusively there (the GFN
        # family's shell-pair-resolved K has the same resolution,
        # ref: sqm2_qm.py:190 _get_eht_k_factor).
        is_p_orb = jnp.asarray(np.tile([0.0, 1.0, 1.0, 1.0], n), dtype)
        pp = is_p_orb[:, None] + is_p_orb[None, :]  # 0 ss / 1 sp / 2 pp
        heavy = jnp.asarray(np.repeat((z_np > 2).astype(np.float64), 4),
                            dtype)
        both_heavy = heavy[:, None] * heavy[None, :]
        k_sp_pair = jnp.where(both_heavy > 0, self.k_sp_heavy, self.k_sp)
        k_pair = jnp.where(pp == 0, self.k_ss,
                           jnp.where(pp == 1, k_sp_pair, self.k_pp))
        if _param_active(self.k_en):
            # electronegativity-difference enhancement of the off-diagonal
            # K: K *= 1 + k_en dEN^2 (ref: sqm2_qm.py:190 _get_eht_k_factor
            # — polar bonds get stronger off-diagonals in GFN-xTB)
            en_at = jnp.asarray(_PAULING_EN[z_np], dtype)
            en_orb = jnp.repeat(en_at, 4)
            den2 = (en_orb[:, None] - en_orb[None, :]) ** 2
            k_pair = k_pair * (1.0 + self.k_en * den2)
        h_mat = 0.5 * k_pair * (h_diag[:, None] + h_diag[None, :]) * s_mat
        h_mat = jnp.where(jnp.eye(4 * n, dtype=bool), h_diag, h_mat * vv)

        # ---- generalized eigenproblem via Cholesky whitening ----------
        # (ref: sqm1_core.py:690 uses the same factorization; Cholesky
        # gradients are degeneracy-safe, unlike a Loewdin S-eigh)
        # Loewdin orthogonalization via Newton-Schulz S^{-1/2}: pure
        # matmuls, so it is (a) MXU-native, (b) smooth/differentiable at
        # overlap-eigenvalue degeneracies (the reason the earlier Cholesky
        # whitening needed custom handling), and (c) f64-safe on TPU where
        # the cholesky/triangular_solve custom calls are F32-only.
        # H' = S^{-1/2} H S^{-1/2} is similar to the Cholesky-whitened
        # L^-1 H L^-T, so the band energy is unchanged.
        s_reg = s_mat + 1e-10 * jnp.eye(4 * n, dtype=dtype)
        s_inv_sqrt = _inv_sqrt_newton_schulz(s_reg)
        h_prime = s_inv_sqrt @ h_mat @ s_inv_sqrt
        h_prime = 0.5 * (h_prime + h_prime.T)

        n_elec = float(np.sum(_T["n_val"][z_np]) - self.charge)
        e_bs = _band_free_energy(h_prime, n_elec, self.kt, self.eigh_impl)

        # atomic reference: fill isolated-atom s then p levels
        e_ref = 0.0
        for zi in z_np:
            nv = _T["n_val"][zi]
            es = _T["h_s"][zi] / HARTREE2EV
            ep = _T["h_p"][zi] / HARTREE2EV
            ns = min(nv, 2.0)
            e_ref += ns * es + max(nv - 2.0, 0.0) * ep
        e_eht = e_bs - jnp.asarray(e_ref, dtype)

        # ---- repulsion (GFN0-style form; covalent-radius length scale) --
        from multioptpy_tpu.periodic import COVALENT_RADII_1
        z_eff = jnp.asarray(_T["z_eff"][z_np], dtype)
        rcov = jnp.asarray(np.asarray(COVALENT_RADII_1)[z_np], dtype)
        r0_ij = self.rep_r0_scale * (rcov[:, None] + rcov[None, :])
        off = ~jnp.eye(n, dtype=bool)
        e_rep_pair = (self.rep_k * z_eff[:, None] * z_eff[None, :] / r
                      * jnp.exp(-(r / r0_ij) ** _REP_EXP))
        # extra SHORT-RANGE H-H wall (Gaussian): strong at r_e(H2) = 1.4,
        # negligible at geminal H..H distances (~2.9), so it sets the H2
        # bond length without opening X-H2 angles
        is_h = jnp.asarray((z_np == 1).astype(np.float64), dtype)
        hh = is_h[:, None] * is_h[None, :]
        e_rep_pair = e_rep_pair + (self.rep_hh * hh / r
                                   * jnp.exp(-(r / 1.1) ** 2))
        e_rep = 0.5 * jnp.sum(jnp.where(off, e_rep_pair, 0.0))

        # ---- dispersion ----------------------------------------------
        if self.dispersion == "d4":
            # charge-scaled C6/C8 with the EEQ charges already in hand
            # (ref: lindh2007d4.py:186; hessian/dispersion.d4_energy)
            from multioptpy_tpu.hessian.dispersion import d4_energy
            e_disp = d4_energy(coords, z_np, charges=q)
        else:
            c6 = jnp.asarray(_T["c6"][z_np], dtype)
            c6_ij = jnp.sqrt(c6[:, None] * c6[None, :])
            rr0 = jnp.asarray(_T["r0"][z_np], dtype)
            rr0_ij = rr0[:, None] + rr0[None, :]
            f_damp = 1.0 / (1.0 + jnp.exp(-_D2_D * (r / rr0_ij - 1.0)))
            e_disp_pair = -_D2_S6 * c6_ij / r ** 6 * f_damp
            e_disp = 0.5 * jnp.sum(jnp.where(off, e_disp_pair, 0.0))

        e_srb = (srb_energy(coords, z_np, k_heavy=self.srb_k_heavy)
                 if self.srb else jnp.asarray(0.0, dtype))
        return {"eht": e_eht, "eeq": e_eeq, "rep": e_rep, "disp": e_disp,
                "srb": e_srb, "charges": q}


@register_calculator("sqm2")
class SQM2(SQM):
    """Second, higher-quality on-device semiempirical method.

    Counterpart of the reference's SQM2 (ref: SQM/sqm2/sqm2_core.py:14 —
    same EHT architecture, better physics): this one enables the full
    round-2 physics stack and is JOINTLY recalibrated on experimental
    equilibrium geometries:

      * GFN0 short-range bond correction ON (ref: sqm2_srb.py)
      * charge-scaled D4 dispersion driven by the EEQ charges
        (ref: sqm2_disp.py role; model of Parameters/d4.py)
      * pair-resolved Wolfsberg constants: X-H s-p K = 2.4 (water angle
        105 deg vs SQM1's 110; exp 104.5), heavy-heavy s-p K = 2.2
        (CO2 stays linear), p-p K = 2.2
      * recalibrated H-H wall (rep_hh = 0.2) against the SRB shortening

    Validation battery (f64): r(H2) 0.75 A (exp 0.741), r(OH) 0.975
    (0.958), H2O angle 105.0 (104.5), r(CH) 1.075 (1.087), NH3 pyramidal
    112 deg, CO2 linear with r(CO) 1.25 (1.16), ethane staggered < eclipsed.
    Improves on SQM1 in every metric except r(CO) (tied).
    """

    def __init__(self, charge=0, multiplicity=1, **kw):
        kw.setdefault("srb", True)
        kw.setdefault("dispersion", "d4")
        kw.setdefault("k_sp", 2.4)
        kw.setdefault("k_sp_heavy", 2.2)
        kw.setdefault("rep_hh", 0.2)
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
