"""Model (guess) Hessians: Lindh, Fischer, Schlegel, Swart.

TPU-native redesign of the reference's ModelHessian family
(ref: multioptpy/ModelHessian/{lindh,fischer,schlegel,swart}.py, dispatch
approx_hessian.py:30): each model is a diagonal force-constant vector k over
internal primitives, and the Cartesian guess is ONE fused contraction

    H_x = B^T diag(k) B        (B = autodiff Wilson matrix)

instead of the reference's per-primitive Python accumulation loops. The
force-constant rules (published recipes, identical constants):

  lindh     Lindh, CPL 241 (1995) 423 — k = k0 * prod rho, rho =
            exp(alpha (R_ref^2 - r^2)); k0 = 0.45/0.15/0.005
            (ref: lindh.py:17,52-77,98)
  fischer   Fischer & Almlof, JPC 96 (1992) 9768 (ref: fischer.py:19-42)
  schlegel  Schlegel, TCA 66 (1984) 333 — 1.734/(r-B)^3 bonds, 0.16/0.25
            bends, 0.0023 - 0.07 dr torsions (ref: schlegel.py:26,91-124)
  swart     Swart & Bickelhaupt, IJQC 106 (2006) 2536 — screened all-pair
            stretches 0.35 s^3 + bond-graph bends
            0.075 s^2 (f + (1-f) sin th)^2 (ref: swart.py:91,:243; the
            reference's torsion term is an unimplemented `pass`, swart.py:311
            — here torsions get the Lindh 0.005 rho-product so the guess
            spans all soft modes)

All return TR/rot-projected Cartesian Hessians. Use
`make_model_hessian_fn` for a jit-compiled coords->H closure (static
primitive sets), or `model_hessian` as a one-shot convenience.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.coords.internals import InternalCoordinates, detect_primitives
from multioptpy_tpu.geometry import project_hessian_tr_rot
from multioptpy_tpu.periodic import COVALENT_RADII_1
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast

# period index: 0 = H/He, 1 = Li..Ne, 2 = rest (ref: lindh.py:56-71)
_LINDH_ALPHA = np.array([[1.0000, 0.3949, 0.3949],
                         [0.3949, 0.2800, 0.2800],
                         [0.3949, 0.2800, 0.2800]])

# Schlegel B parameters by period pair (Bohr), ref: schlegel.py:26-32
_SCHLEGEL_B = np.array([
    [0.2573, 0.3401, 0.6937, 0.7126, 0.8335, 0.9491, 0.9491],
    [0.3401, 0.9652, 1.2843, 1.4725, 1.6549, 1.7190, 1.7190],
    [0.6937, 1.2843, 1.6925, 1.8238, 2.1164, 2.3185, 2.3185],
    [0.7126, 1.4725, 1.8238, 2.0203, 2.2137, 2.5206, 2.5206],
    [0.8335, 1.6549, 2.1164, 2.2137, 2.3718, 2.5110, 2.5110],
    [0.9491, 1.7190, 2.3185, 2.5206, 2.5110, 2.5110, 2.5110],
    [0.9491, 1.7190, 2.3185, 2.5206, 2.5110, 2.5110, 2.5110]])

_PERIOD_EDGES = np.array([2, 10, 18, 36, 54, 86, 118])


def _period3(z):
    """0: H/He, 1: second period, 2: beyond (Lindh classes)."""
    z = np.asarray(z)
    return np.where(z <= 2, 0, np.where(z <= 10, 1, 2))


def _period7(z):
    z = np.asarray(z)
    return np.searchsorted(_PERIOD_EDGES, z, side="left")


def _dist(coords, i, j):
    d = coords[i] - coords[j]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-14)


def _bond_count(bonds, n_atoms):
    cnt = np.zeros(n_atoms, dtype=np.int64)
    for i, j in np.asarray(bonds).reshape(-1, 2):
        cnt[i] += 1
        cnt[j] += 1
    return cnt


def _primitive_constants(kind, coords, z, bonds, angles, torsions, n_atoms):
    """Per-primitive diagonal force constants, traced in coords."""
    rcov = np.asarray(COVALENT_RADII_1)[np.asarray(z)]  # Bohr
    k_parts = []

    if kind == "lindh":
        a3 = _period3(z)

        def rho(i, j):
            r = _dist(coords, i, j)
            rref = rcov[np.asarray(i)] + rcov[np.asarray(j)]
            alpha = _LINDH_ALPHA[a3[np.asarray(i)], a3[np.asarray(j)]]
            return jnp.exp(jnp.asarray(alpha) * (jnp.asarray(rref) ** 2 - r * r))

        if len(bonds):
            k_parts.append(0.45 * rho(bonds[:, 0], bonds[:, 1]))
        if len(angles):
            k_parts.append(0.15 * rho(angles[:, 0], angles[:, 1])
                           * rho(angles[:, 1], angles[:, 2]))
        if len(torsions):
            k_parts.append(0.005 * rho(torsions[:, 0], torsions[:, 1])
                           * rho(torsions[:, 1], torsions[:, 2])
                           * rho(torsions[:, 2], torsions[:, 3]))

    elif kind == "lindh2007":
        # Lindh 2007 all-tuple screening model with D4 long-range terms
        # (ref: ModelHessian/lindh2007d4.py:22-56 constants, :322 bond,
        # :414 angle, :625 dihedral). Groups: H | He..F | rest (:61
        # select_idx uses Z<2 / Z<10); kr/kf/kt = 0.45/0.10/0.0025; the
        # D4 pair force constant joins a pair's screening only beyond
        # 2x the covalent length (:364-366). The reference's rAv table is
        # dead code there (bonds use the covalent-radii sum, :356-358).
        from multioptpy_tpu.hessian.dispersion import (
            d4_charges, d4_pair_force_const, d4_pair_tables)

        g3 = np.where(np.asarray(z) < 2, 0,
                      np.where(np.asarray(z) < 10, 1, 2))
        alpha_t = np.array([[1.0000, 0.3949, 0.3949],
                            [0.3949, 0.2800, 0.1200],
                            [0.3949, 0.1200, 0.0600]])
        d_t = np.array([[0.0, 3.6, 3.6],
                        [3.6, 5.3, 5.3],
                        [3.6, 5.3, 5.3]])
        kr, kf, kt, kd = 0.45, 0.10, 0.0025, 0.05
        charges = d4_charges(coords, z)
        c6m, c8m, r0m = d4_pair_tables(z, dtype=np.float64)

        def g_pair(i, j):
            """exp screening + gated half/full D4 term for the pair."""
            i = np.asarray(i)
            j = np.asarray(j)
            r = _dist(coords, i, j)
            rc = jnp.asarray(rcov[i] + rcov[j])
            alpha = jnp.asarray(alpha_t[g3[i], g3[j]])
            g = jnp.exp(alpha * (rc ** 2 - r * r))
            qs = jnp.exp(-3.0 * (charges[i] ** 2 + charges[j] ** 2))
            d4 = d4_pair_force_const(r, jnp.asarray(c6m[i, j]),
                                     jnp.asarray(c8m[i, j]),
                                     jnp.asarray(r0m[i, j]), qs)
            return g, jnp.where(r > 2.0 * rc, d4, 0.0), \
                jnp.asarray(d_t[g3[i], g3[j]])

        if len(bonds):
            g, d4, _ = g_pair(bonds[:, 0], bonds[:, 1])
            k_parts.append(kr * g + kd * d4)
        if len(angles):
            g1, d41, d01 = g_pair(angles[:, 1], angles[:, 0])
            g2, d42, d02 = g_pair(angles[:, 1], angles[:, 2])
            half = 0.5 * kd / kr
            k_parts.append(kf * (g1 + 0.5 * kd * d41 + half * d01)
                           * (g2 + 0.5 * kd * d42 + half * d02))
        if len(torsions):
            # the reference MULTIPLIES each leg's screening by the d-table
            # factor (lindh2007d4.py:731-733, as written — the angle term's
            # analogous expression ADDS it, :500)
            half = 0.5 * kd / kr
            legs = []
            for a, b in ((0, 1), (1, 2), (2, 3)):
                g, d4, d0 = g_pair(torsions[:, a], torsions[:, b])
                legs.append((g + 0.5 * kd * d4) * half * d0)
            k_parts.append(kt * legs[0] * legs[1] * legs[2])

    elif kind == "fischer":
        if len(bonds):
            r = _dist(coords, bonds[:, 0], bonds[:, 1])
            rc = rcov[bonds[:, 0]] + rcov[bonds[:, 1]]
            k_parts.append(0.3601 * jnp.exp(-1.944 * (r - jnp.asarray(rc))))
        if len(angles):
            r1 = _dist(coords, angles[:, 0], angles[:, 1])
            r2 = _dist(coords, angles[:, 1], angles[:, 2])
            rc1 = rcov[angles[:, 0]] + rcov[angles[:, 1]]
            rc2 = rcov[angles[:, 1]] + rcov[angles[:, 2]]
            val = jnp.asarray(rc1 * rc2)
            k_parts.append(0.089 + 0.11 * val ** 0.42 *
                           jnp.exp(-0.44 * (r1 + r2 - jnp.asarray(rc1 + rc2))))
        if len(torsions):
            r = _dist(coords, torsions[:, 1], torsions[:, 2])
            rc = rcov[torsions[:, 1]] + rcov[torsions[:, 2]]
            cnt = _bond_count(bonds, n_atoms)
            bond_sum = np.maximum(
                cnt[torsions[:, 1]] + cnt[torsions[:, 2]] - 2, 0)
            val = r * jnp.asarray(rc)
            k_parts.append(0.0015 + 14.0 * jnp.asarray(bond_sum, coords.dtype)
                           ** 0.57 / val ** 4.0
                           * jnp.exp(-2.85 * (r - jnp.asarray(rc))))

    elif kind == "schlegel":
        p7 = np.minimum(_period7(z), 6)
        if len(bonds):
            r = _dist(coords, bonds[:, 0], bonds[:, 1])
            b = jnp.asarray(_SCHLEGEL_B[p7[bonds[:, 0]], p7[bonds[:, 1]]])
            denom = jnp.maximum(r - b, 0.1)  # guard near-singular short bonds
            k_parts.append(1.734 / denom ** 3)
        if len(angles):
            term_h = ((np.asarray(z)[angles[:, 0]] == 1)
                      | (np.asarray(z)[angles[:, 2]] == 1))
            k_parts.append(jnp.asarray(np.where(term_h, 0.160, 0.250),
                                       coords.dtype)
                           * jnp.ones((len(angles),), coords.dtype))
        if len(torsions):
            r = _dist(coords, torsions[:, 1], torsions[:, 2])
            rc = jnp.asarray(rcov[torsions[:, 1]] + rcov[torsions[:, 2]])
            k_parts.append(jnp.maximum(0.0023 - 0.07 * (r - rc), 1e-4))

    elif kind == "swart":
        f = 0.12

        def screen(i, j):
            r = _dist(coords, i, j)
            rc = jnp.asarray(rcov[np.asarray(i)] + rcov[np.asarray(j)])
            return jnp.exp(1.0 - r / rc)

        if len(bonds):
            k_parts.append(0.35 * screen(bonds[:, 0], bonds[:, 1]) ** 3)
        if len(angles):
            s2 = (screen(angles[:, 0], angles[:, 1])
                  * screen(angles[:, 1], angles[:, 2]))
            v1 = coords[angles[:, 0]] - coords[angles[:, 1]]
            v2 = coords[angles[:, 2]] - coords[angles[:, 1]]
            cross = jnp.cross(v1, v2)
            sin_t = jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-14) / (
                jnp.sqrt(jnp.sum(v1 * v1, -1) * jnp.sum(v2 * v2, -1)) + 1e-14)
            k_parts.append(0.075 * s2 ** 2 * (f + (1 - f) * sin_t) ** 2)
        if len(torsions):
            s3 = (screen(torsions[:, 0], torsions[:, 1])
                  * screen(torsions[:, 1], torsions[:, 2])
                  * screen(torsions[:, 2], torsions[:, 3]))
            k_parts.append(0.005 * s3)

    elif kind in ("gfn0", "gfnff"):
        # GFN0-xTB-flavoured guess (ref: ModelHessian/gfn0xtb.py:269-530 +
        # Parameters/gfn0xtb_param.py: kStretchBase=0.35, factors
        # single/double/triple 1.0/1.5/2.0, kAngleBase=0.07, weak V2/V3
        # torsions): the bond TYPE is inferred branchlessly from the
        # compression ratio r/r0 against the GFN0 single-bond radii sum
        # (the reference's thresholds follow its triple/double reference
        # lengths ~0.78/0.85 of single). "gfnff" adds the GFN-FF-style
        # electronegativity strengthening (ref: ModelHessian/gfnff.py + Parameters/gfnff_param.py EN-dependent
        # stretch constants).
        rad = _GFN0_RAD[np.asarray(z)]
        en = _GFN0_EN[np.asarray(z)]

        if len(bonds):
            bi, bj = bonds[:, 0], bonds[:, 1]
            r = _dist(coords, bi, bj)
            r0 = jnp.asarray(rad[np.asarray(bi)] + rad[np.asarray(bj)])
            ratio = r / r0
            factor = jnp.where(ratio < 0.82, 2.0,
                               jnp.where(ratio < 0.92, 1.5, 1.0))
            k_b = 0.35 * factor
            if kind == "gfnff":
                den = jnp.asarray(np.abs(en[np.asarray(bi)]
                                         - en[np.asarray(bj)]))
                k_b = k_b * (1.0 + 0.1 * den)
            # damp stretched/broken bonds smoothly
            k_b = k_b * jnp.exp(-2.0 * jnp.maximum(ratio - 1.3, 0.0))
            k_parts.append(k_b)
        if len(angles):
            s = (jnp.exp(-jnp.maximum(
                _dist(coords, angles[:, 0], angles[:, 1])
                / jnp.asarray(rad[np.asarray(angles[:, 0])]
                              + rad[np.asarray(angles[:, 1])]) - 1.3, 0.0))
                 * jnp.exp(-jnp.maximum(
                     _dist(coords, angles[:, 1], angles[:, 2])
                     / jnp.asarray(rad[np.asarray(angles[:, 1])]
                                   + rad[np.asarray(angles[:, 2])]) - 1.3,
                     0.0)))
            k_parts.append(0.07 * s)
        if len(torsions):
            k_parts.append(jnp.full((len(torsions),), 0.005, coords.dtype)
                           * jnp.ones_like(_dist(coords, torsions[:, 0],
                                                 torsions[:, 1])))
    else:
        raise ValueError(f"unknown model hessian '{kind}'")

    if not k_parts:
        return jnp.zeros((0,), coords.dtype)
    return jnp.concatenate(k_parts)


# GFN0-xTB atomic radii (Bohr) and Mulliken electronegativities, Z=1..54
# (ref: Parameters/gfn0xtb_param.py:17,29 — the values of xtb's
# gfn0_param.f90); Z>54 falls back to 1.0 / 2.0 like the reference.
_GFN0_RAD = np.full(119, 1.0)
_GFN0_RAD[1:55] = [
    0.75, 0.75, 1.23, 1.01, 0.90, 0.85, 0.84, 0.83, 0.83, 0.75,
    1.60, 1.40, 1.25, 1.14, 1.09, 1.04, 1.00, 0.75, 1.90, 1.71,
    1.48, 1.36, 1.34, 1.22, 1.19, 1.17, 1.16, 1.15, 1.14, 1.23,
    1.25, 1.21, 1.16, 1.14, 1.12, 0.75, 2.06, 1.85, 1.61, 1.48,
    1.37, 1.31, 1.23, 1.24, 1.24, 1.19, 1.26, 1.36, 1.47, 1.40,
    1.39, 1.35, 1.33, 0.75,
]
_GFN0_EN = np.full(119, 2.0)
_GFN0_EN[1:55] = [
    2.20, 0.00, 0.97, 1.47, 2.01, 2.50, 3.07, 3.50, 4.10, 0.00,
    1.01, 1.23, 1.47, 1.74, 2.06, 2.44, 2.83, 0.00, 0.91, 1.04,
    1.20, 1.32, 1.45, 1.56, 1.60, 1.64, 1.70, 1.75, 1.75, 1.66,
    1.82, 2.02, 2.20, 2.48, 2.74, 0.00, 0.89, 0.99, 1.11, 1.22,
    1.23, 1.30, 1.36, 1.42, 1.45, 1.35, 1.42, 1.46, 1.49, 1.72,
    1.82, 2.01, 2.21, 0.00,
]


MODEL_HESSIAN_KINDS = ("lindh", "lindh2007", "fischer", "schlegel", "swart",
                       "morse", "gfn0", "gfnff")


def lindh2007_primitives(coords, z, rho_cutoff=1e-6):
    """Tuple lists for the Lindh-2007 all-pairs model: every pair is a
    'bond' primitive (the exp screening kills distant ones), triples are
    kept when both legs' screenings survive `rho_cutoff`, torsions come
    from ordinary connectivity (their screened constants are <=1e-6 beyond
    bonded chains). Host-side (static shapes for jit);
    ref: lindh2007d4.py:322/:414 loops over all pairs/triples."""
    from multioptpy_tpu.periodic import COVALENT_RADII_1

    coords = np.asarray(coords)
    z = np.asarray(z)
    n = len(z)
    rcov = np.asarray(COVALENT_RADII_1)[z]
    g3 = np.where(z < 2, 0, np.where(z < 10, 1, 2))
    alpha_t = np.array([[1.0000, 0.3949, 0.3949],
                        [0.3949, 0.2800, 0.1200],
                        [0.3949, 0.1200, 0.0600]])
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    rc = rcov[:, None] + rcov[None, :]
    rho = np.exp(alpha_t[g3[:, None], g3[None, :]] * (rc ** 2 - d ** 2))

    bonds = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     dtype=np.int32).reshape(-1, 2)
    angles = [(j, i, k)
              for i in range(n) for j in range(n) for k in range(n)
              if j < k and i != j and i != k
              and rho[i, j] * rho[i, k] > rho_cutoff]
    angles = np.asarray(angles, dtype=np.int32).reshape(-1, 3)
    _, _, torsions = detect_primitives(coords, z)
    return bonds, angles, np.asarray(torsions, np.int32).reshape(-1, 4)


def make_model_hessian_fn(z, bonds, angles, torsions, kind="lindh",
                          project=True):
    """Jit-able coords -> (3N,3N) model Hessian closure for static
    primitives (ref: approx_hessian.py:30 dispatch).

    `kind` may carry a dispersion suffix, e.g. "lindh_d2" / "lindhd2" /
    "lindh2007d2": the exact autodiff D2 Hessian is added to the bonded
    guess (ref: ModelHessian/lindh2007d2.py etc.). The reference's d3/d4
    suffixes currently map to the d2 correction (CN-dependent C6 is
    round-2 work)."""
    z = np.asarray(z)
    n_atoms = len(z)
    base = kind.lower()
    damp_raw = False
    if base.endswith("_raw"):
        # escape hatch: the bonded+dispersion guess WITHOUT the
        # reference's |lambda|-rescale output transform (see `damp`)
        damp_raw = True
        base = base[: -len("_raw")]
    if base != "lindh2007" and not base.startswith("lindh2007d"):
        # "fischerd3"-style names fold to their parent; lindh2007 is a
        # DISTINCT kind (all-pairs screening + its own alpha/d tables,
        # ref: ModelHessian/lindh2007d4.py:40-56)
        base = base.replace("2007", "")
    make_ts = False
    if base.endswith("_ts"):
        # Householder-reflected TS guess (ref: ModelHessian/tshess.py)
        make_ts = True
        base = base[: -len("_ts")]
    add_sr = False
    if base.endswith("_sr"):
        # short-range erf correction (ref: ModelHessian/shortrange.py)
        add_sr = True
        base = base[: -len("_sr")]
    # the reference's CURRENT fischerd3 scales C6 by coordination-number
    # deviation (dynamic D3, fischerd3.py:235); fischerd3old and the
    # lindh2007d3 family use the static D2-C6 form (fischerd3old.py)
    d3_dynamic = base.startswith("fischer") and not base.endswith("old")
    if base.endswith("old"):
        base = base[: -len("old")]
    # the reference's lindh2007d{2,3,4} mains do NOT return the assembled
    # guess: they eigendecompose the projected Hessian and rebuild it as
    # V diag(|lambda| * 0.1 * exp(-|g|^2)) V^T — an always-PSD, gradient-
    # damped guess (ref: lindh2007d2.py:684-705, lindh2007d3.py:793-819,
    # lindh2007d4.py:993-1017). Faithful by default for those kind names;
    # append "_raw" for the undamped assembly.
    damp = base.startswith("lindh2007") and base != "lindh2007" \
        and not damp_raw
    dispersion = None
    for suffix in ("_d2", "_d3", "_d4", "d2", "d3", "d4"):
        if base.endswith(suffix):
            # d2 -> Grimme D2; d3 -> the D3(BJ) C6+C8 correction (the
            # reference's d3 model Hessians reuse D2 C6 values,
            # lindh2007d3.py:107); d4 -> the charge-scaled C6/C8 model
            # (ref: lindh2007d4.py:186-259, dispersion.d4_hessian)
            dispersion = "d" + suffix[-1]
            base = base[: -len(suffix)]
            break
    ic = InternalCoordinates(bonds, angles, torsions, n_atoms)
    bonds = ic.bonds
    angles = ic.angles
    torsions = ic.torsions

    def fn(coords, gradient=None):
        if base == "morse":
            h = morse_hessian(coords, z)
        else:
            k = _primitive_constants(base, coords, z, bonds, angles,
                                     torsions, n_atoms)
            b = ic.b_matrix(coords)
            h = (b.T * k[None, :]) @ b
        if dispersion == "d2":
            from multioptpy_tpu.hessian.dispersion import d2_hessian
            h = h + d2_hessian(coords, z)
        elif dispersion == "d3":
            from multioptpy_tpu.hessian.dispersion import d3_hessian
            h = h + d3_hessian(coords, z, dynamic_cn=d3_dynamic)
        elif dispersion == "d4":
            from multioptpy_tpu.hessian.dispersion import d4_hessian
            h = h + d4_hessian(coords, z)
        if add_sr:
            h = h + short_range_hessian(coords, z, bonds=np.asarray(bonds))
        h = 0.5 * (h + h.T)
        proj = None
        if project:
            from multioptpy_tpu.geometry import tr_rot_projector
            proj = tr_rot_projector(coords)
            h = project_hessian_tr_rot(h, coords)
        if damp:
            # reference output transform (lindh2007d2.py:685-705): scale
            # the |eigenvalue| spectrum by 0.1*exp(-|raw_gradient|^2)
            ng2 = (jnp.sum(jnp.asarray(gradient) ** 2)
                   if gradient is not None else 0.0)
            if proj is not None:
                from multioptpy_tpu.ops.eigh64 import eigh_deflated
                w, v = eigh_deflated(h, proj)
            else:
                w, v = _eigh_fast(h)
            h = (v * (jnp.abs(w) * 0.1 * jnp.exp(-ng2))[None, :]) @ v.T
        if make_ts:
            h = ts_model_hessian(h, projector=proj)
        return h

    return fn


def model_hessian(coords, z, kind="lindh", project=True, primitives=None,
                  gradient=None):
    """One-shot model Hessian; detects primitives host-side."""
    coords = jnp.asarray(coords)
    if primitives is None:
        if kind.lower().startswith("lindh2007"):
            primitives = lindh2007_primitives(np.asarray(coords), z)
        else:
            primitives = detect_primitives(np.asarray(coords), z)
    bonds, angles, torsions = primitives
    fn = make_model_hessian_fn(z, bonds, angles, torsions, kind, project)
    # one compiled program instead of eager op-by-op dispatch (the
    # assembly is ~100 ops; through the tunneled single-chip setup each
    # eager op pays a round trip — see ops/hosteval.py)
    return jax.jit(fn)(coords, gradient)


def morse_hessian(coords, z, de=0.10, a=0.20):
    """All-pairs Morse model Hessian (ref: ModelHessian/morse.py:4
    MorseApproxHessian): every pair is an independent Morse oscillator
    V = De (1 - exp(-a (r - r_eq)))^2 with r_eq from summed covalent radii
    (the reference samples its GNB radii table; Pyykko radii here — same
    'simplified illustration' spirit the reference's own docstring claims).
    Exact Cartesian second derivatives via jax.hessian instead of the
    reference's bond-direction-only embedding."""
    from multioptpy_tpu.periodic import COVALENT_RADII_1
    z = np.asarray(z)
    n = coords.shape[0]
    r_eq = jnp.asarray(COVALENT_RADII_1[z][:, None]
                       + COVALENT_RADII_1[z][None, :])
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    def energy(x_flat):
        x = x_flat.reshape(n, 3)
        diff = x[:, None, :] - x[None, :, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        v = de * (1.0 - jnp.exp(-a * (r - r_eq))) ** 2
        return jnp.sum(jnp.where(mask, v, 0.0))

    return jax.hessian(energy)(coords.reshape(-1))


def ts_model_hessian(h, thresh=1e-8, projector=None):
    """Inject one negative direction into a positive-definite model Hessian
    for TS searches by a Householder reflection along the lowest
    non-singular mode: H_ts = sym((I - 2 v v^T) H)
    (ref: ModelHessian/tshess.py:3 TransitionStateHessian). Returns `h`
    unchanged when a negative eigenvalue already exists. Branchless.
    Pass `projector` when `h` is TR/rot-projected so the degenerate zero
    block is deflated before the eigh (TPU f64 QR safety)."""
    if projector is not None:
        from multioptpy_tpu.ops.eigh64 import eigh_deflated
        w, v = eigh_deflated(0.5 * (h + h.T), projector)
    else:
        w, v = _eigh_fast(0.5 * (h + h.T))
    has_neg = jnp.any(w < -thresh)
    # first non-(TR/rot-)singular mode
    idx = jnp.argmax(jnp.abs(w) > thresh)
    vec = v[:, idx]
    p = jnp.eye(h.shape[0], dtype=h.dtype) - 2.0 * jnp.outer(vec, vec)
    h_ts = p @ h
    h_ts = 0.5 * (h_ts + h_ts.T)
    return jnp.where(has_neg, h, h_ts)


def short_range_hessian(coords, z, bonds=None, omega=0.2, cx_sr=0.78,
                        scale=0.5, cutoff=15.0):
    """Short-range erf-screened Coulomb correction for NON-bonded pairs
    (ref: ModelHessian/shortrange.py:7 ShortRangeCorrectionHessian,
    wB97X-style (1-erf(w r))/r kernel): exact autodiff Hessian of
    scale*cx_sr*sum_pairs q_i q_j (1-erf(w r))/r with bonded pairs and
    pairs beyond `cutoff` Bohr excluded (static exclusion mask). The
    charges are the reference's Pauling-EN estimate
    q_i = 0.2 (mean(EN) - EN_i) (shortrange.py:190-199), so the pair
    prefactor — and hence the sign of each block — matches its
    calculate_pair_hessian (shortrange.py:213-227) exactly."""
    from multioptpy_tpu.geometry import bond_connectivity
    from multioptpy_tpu.periodic import PAULING_EN
    z = np.asarray(z)
    n = coords.shape[0]
    en = PAULING_EN[z]
    q = 0.2 * (en.mean() - en)
    qq = jnp.asarray(np.outer(q, q))
    if bonds is None:
        conn = np.asarray(bond_connectivity(np.asarray(coords), z))
    else:
        conn = np.zeros((n, n), dtype=bool)
        for i, j in np.asarray(bonds).reshape(-1, 2):
            conn[i, j] = conn[j, i] = True
    pair_mask = np.triu(np.ones((n, n), dtype=bool), k=1) & ~conn
    pair_mask = jnp.asarray(pair_mask)

    def energy(x_flat):
        x = x_flat.reshape(n, 3)
        diff = x[:, None, :] - x[None, :, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        v = qq * (1.0 - jax.scipy.special.erf(omega * r)) / r
        keep = pair_mask & (r < cutoff)
        return scale * cx_sr * jnp.sum(jnp.where(keep, v, 0.0))

    return jax.hessian(energy)(coords.reshape(-1))


def smooth_eigenvalues(h, alpha=0.1):
    """Compress |eigenvalues| >= 1 toward 2 - 1/|e|^alpha
    (ref: approx_hessian.py:115 smooth_eigval 'clip' option)."""
    w, v = _eigh_fast(h)
    big = jnp.abs(w) >= 1.0
    w_s = jnp.where(big, jnp.sign(w) * (2.0 - 1.0 / jnp.abs(w) ** alpha), w)
    return (v * w_s[None, :]) @ v.T
