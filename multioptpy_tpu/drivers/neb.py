"""NEB — nudged elastic band with the whole path as one batched tensor.

TPU-native redesign of the reference's NEB stack (ref: multioptpy/neb.py:380
driver loop :489, MEP/pathopt_neb_force.py force laws, per-image sequential
QM at Calculator/tblite_calculation_tools.py:312): here the path is an
(I, N, 3) array, per-image energies/gradients come from ONE vmapped backend
call, and tangents/springs/projections are whole-array ops — a single jitted
step advances every image in lockstep. Endpoint images are frozen by a mask
(the reference optionally relaxes them).

Force laws (selected by `variant`):
  "neb"   improved-tangent NEB, Henkelman & Jonsson, JCP 113 (2000) 9978
          (ref: MEP/pathopt_neb_force.py:18 CaluculationNEB2)
  "cineb" + climbing image after `climbing_start` iterations, JCP 113
          (2000) 9901 (ref: neb.py:562)
  "dneb"  doubly nudged, Trygubenko & Wales, JCP 120 (2004) 2082
          (ref: MEP/pathopt_dneb_force.py:20 CaluculationDNEB)
  "lup"   locally-updated-planes: perpendicular gradient only
          (ref: MEP/pathopt_lup_force.py:20 CaluculationLUP)
  "om"    Onsager-Machlup action-based force
          (ref: MEP/pathopt_om_force.py:18 CaluculationOM)
          — implemented as NEB with energy-weighted springs.
  "ewbneb" per-atom Wilson-B tangents + energy-weighted spring constants,
          Asgeirsson 2021 (ref: MEP/pathopt_ewbneb_force.py:21)
  "qsm2"  Ayala-Schlegel propagated tangents, perpendicular force only
          (ref: MEP/pathopt_qsmv2_force.py:19)
  "nesb"  node-equilibrated string band (ref: MEP/pathopt_nesb_force.py:21
          CaluculationNESB)

IDPP initial paths: Smidstrup et al., JCP 140 (2014) 214106
(ref: Potential/idpp.py:10).
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.steppers.first_order import FireState, fire_init, fire_step


def _image_dot(a, b):
    """Per-image inner product: (I,N,3)x(I,N,3) -> (I,1,1)."""
    return jnp.sum(a * b, axis=(-1, -2), keepdims=True)


def _normalize(v, eps=1e-14):
    n = jnp.sqrt(_image_dot(v, v) + eps)
    return v / n


def _tangents_from_halo(coords, x_prev, x_next, e, e_prev, e_next):
    """Improved tangents given explicit ±1 neighbor halos — shared by the
    single-array path (halos = jnp.roll) and the shard_map path (halos =
    lax.ppermute ring exchange)."""
    d_plus = x_next - coords   # to next image
    d_minus = coords - x_prev  # from previous image

    uphill = (e_next > e) & (e > e_prev)
    downhill = (e_next < e) & (e < e_prev)

    de_max = jnp.maximum(jnp.abs(e_next - e), jnp.abs(e_prev - e))
    de_min = jnp.minimum(jnp.abs(e_next - e), jnp.abs(e_prev - e))
    next_higher = e_next > e_prev
    w_plus = jnp.where(next_higher, de_max, de_min)[:, None, None]
    w_minus = jnp.where(next_higher, de_min, de_max)[:, None, None]

    tau = jnp.where(uphill[:, None, None], d_plus,
                    jnp.where(downhill[:, None, None], d_minus,
                              w_plus * d_plus + w_minus * d_minus))
    return _normalize(tau)


def improved_tangents(coords, energies):
    """(I,N,3),(I,) -> unit tangents (I,N,3), Henkelman improved tangent."""
    return _tangents_from_halo(
        coords, jnp.roll(coords, 1, axis=0), jnp.roll(coords, -1, axis=0),
        energies, jnp.roll(energies, 1), jnp.roll(energies, -1))


def _per_atom_tangents(coords, energies):
    """Per-ATOM unit tangents (I,N,3): the Wilson-B rows of the inter-image
    per-atom-distance internals, bisection-weighted like the improved tangent
    (ref: MEP/pathopt_bneb_force.py:21, pathopt_ewbneb_force.py:119-153 —
    their B-matrix has one orthonormal row per atom, so B+ = B^T and the
    projection reduces to a per-atom tangent projection)."""
    return _per_atom_tangents_from_halo(
        coords, jnp.roll(coords, 1, axis=0), jnp.roll(coords, -1, axis=0),
        energies, jnp.roll(energies, 1), jnp.roll(energies, -1))


def _per_atom_tangents_from_halo(coords, x_prev, x_next, e, e_prev, e_next):
    """Per-atom tangents given explicit ±1 halos (shared by the rolled
    single-array path and the shard_map ring-exchange path)."""
    d_plus = x_next - coords
    d_minus = coords - x_prev
    de_max = jnp.maximum(jnp.abs(e_next - e), jnp.abs(e_prev - e))
    de_min = jnp.minimum(jnp.abs(e_next - e), jnp.abs(e_prev - e))
    nh = (e_next > e_prev)
    w_p = jnp.where(nh, de_max, de_min)[:, None, None]
    w_m = jnp.where(nh, de_min, de_max)[:, None, None]
    up = ((e_next > e) & (e > e_prev))[:, None, None]
    down = ((e_next < e) & (e < e_prev))[:, None, None]
    t_atom = jnp.where(up, d_plus,
                       jnp.where(down, d_minus,
                                 w_p * d_plus + w_m * d_minus))
    t_norm = jnp.sqrt(jnp.sum(t_atom * t_atom, axis=-1, keepdims=True)
                      + 1e-14)
    return t_atom / t_norm


def ayala_tangents(coords, energies):
    """Ayala-Schlegel path tangents (JCP 107 (1997) 375 eqs. 3a-3d; ref:
    MEP/pathopt_qsmv2_force.py:66 _calculate_all_tangents): the tangent at
    the highest image comes from the weighted difference of its neighbours,
    then propagates DOWNHILL to each side by arc (small turning angle) or
    parabola (large angle) extrapolation. The two sequential sweeps are
    `lax.scan`s with position masks so the whole thing stays jittable with
    a data-dependent peak index. Returns unit tangents (I,N,3) (endpoints
    zero)."""
    n = coords.shape[0]
    flat = coords.reshape(n, -1)
    idx = jnp.arange(n)
    interior = (idx > 0) & (idx < n - 1)
    ts = jnp.argmax(jnp.where(interior, energies, -jnp.inf))

    def nrm(v):
        return v / (jnp.linalg.norm(v) + 1e-30)

    q_ts = jnp.take(flat, ts, axis=0)
    v_prev = jnp.take(flat, ts - 1, axis=0) - q_ts
    v_next = jnp.take(flat, ts + 1, axis=0) - q_ts
    t_ts = nrm(v_next / jnp.maximum(v_next @ v_next, 1e-10)
               - v_prev / jnp.maximum(v_prev @ v_prev, 1e-10))

    def propagate(q_cur, q_uphill, t_up):
        chord = q_cur - q_uphill
        chord_u = nrm(chord)
        cos_t = jnp.clip(chord_u @ t_up, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        # arc approximation (eq. 3c)
        denom = 2.0 * (t_up @ chord)
        safe = jnp.abs(denom) > 1e-10
        r = (chord @ chord) / jnp.where(safe, denom, 1.0)
        r_safe = jnp.where(jnp.abs(r) > 1e-10, r, 1.0)
        t_arc = jnp.where(safe, nrm(chord / r_safe - t_up), chord_u)
        # parabola approximation (eq. 3d)
        n_vec = nrm(chord - (chord @ t_up) * t_up)
        tan_v = jnp.tan(theta - jnp.pi / 4.0)
        t_par = nrm(n_vec - tan_v * (t_up - n_vec))
        return jnp.where(theta <= jnp.pi / 4.0, t_arc, t_par)

    def sweep(order, side_mask_fn, uphill_offset):
        """Scan image indices in `order`, carrying the uphill tangent."""
        def body(t_up, i):
            t_up = jnp.where(i == ts, t_ts, t_up)
            t_new = propagate(jnp.take(flat, i, axis=0),
                              jnp.take(flat, i + uphill_offset, axis=0), t_up)
            on_side = side_mask_fn(i) & interior[i]
            out = jnp.where(on_side, t_new, jnp.zeros_like(t_new))
            t_up = jnp.where(on_side, t_new, t_up)
            return t_up, out
        _, outs = jax.lax.scan(body, jnp.zeros_like(t_ts), order)
        return outs

    left = sweep(idx[::-1], lambda i: i < ts, +1)[::-1]
    right = sweep(idx, lambda i: i > ts, -1)
    tau = left + right + jnp.where(idx[:, None] == ts, t_ts[None], 0.0)
    return tau.reshape(coords.shape)


def neb_forces(coords, energies, gradients, k_spring=0.01, variant="neb",
               climbing=False, optimize_endpoints=False, dmf_beta=10.0,
               dmf_nsegs=4):
    """Whole-path NEB force, (I,N,3). Endpoints get -g (masked by caller if
    frozen). `climbing` may be a traced bool enabling CI on the highest
    interior image."""
    known = ("neb", "cineb", "dneb", "lup", "om", "qsm", "qsm2", "string",
             "bneb", "bneb2", "bneb3", "nesb", "dmf", "ewbneb", "gpneb")
    if variant not in known:
        raise ValueError(f"unknown NEB variant '{variant}' "
                         f"(choose from {', '.join(known)})")
    n_images = coords.shape[0]
    tau = improved_tangents(coords, energies)

    g = gradients
    g_par = _image_dot(g, tau) * tau
    g_perp = g - g_par

    x_prev = jnp.roll(coords, 1, axis=0)
    x_next = jnp.roll(coords, -1, axis=0)
    d_plus_n = jnp.sqrt(_image_dot(x_next - coords, x_next - coords) + 1e-14)
    d_minus_n = jnp.sqrt(_image_dot(coords - x_prev, coords - x_prev) + 1e-14)

    if variant in ("bneb", "nesb", "ewbneb"):
        # Wilson-B-constrained NEB family (ref: MEP/pathopt_bneb_force.py:21,
        # pathopt_ewbneb_force.py:21): the tangent space is PER-ATOM
        # displacement directions (the B-matrix rows of inter-image distance
        # internals); the force is the per-atom perpendicular gradient.
        d_plus = x_next - coords
        d_minus = coords - x_prev
        t_atom = _per_atom_tangents(coords, energies)
        g_par_atom = jnp.sum(g * t_atom, axis=-1, keepdims=True) * t_atom
        force = -(g - g_par_atom)
        dp_n = jnp.sqrt(jnp.sum(d_plus ** 2, axis=-1, keepdims=True) + 1e-14)
        dm_n = jnp.sqrt(jnp.sum(d_minus ** 2, axis=-1, keepdims=True) + 1e-14)
        if variant == "nesb":
            # nudged elastic "stiffness" band: add per-atom springs along
            # the per-atom tangents (ref: MEP CaluculationNESB)
            force = force + k_spring * (dp_n - dm_n) * t_atom
        elif variant == "ewbneb":
            # energy-weighted springs (Asgeirsson et al., JCTC 17 (2021)
            # 4929, the paper the reference cites at
            # pathopt_ewbneb_force.py:24 with k_upper=0.005, k_lower=1e-4):
            # segments near the barrier get STIFF springs, low-energy
            # segments soft ones, k(E_seg) interpolated between the bounds.
            k_u, k_l = 0.005, 1e-4
            e_seg = jnp.maximum(energies[:-1], energies[1:])     # (I-1,)
            e_max = jnp.max(energies)
            e_ref = jnp.maximum(energies[0], energies[-1])
            denom = jnp.maximum(e_max - e_ref, 1e-12)
            k_seg = jnp.where(e_seg > e_ref,
                              k_u - (k_u - k_l) * (e_max - e_seg) / denom,
                              k_l)
            k_fwd = jnp.concatenate([k_seg, k_seg[-1:]])[:, None, None]
            k_bwd = jnp.concatenate([k_seg[:1], k_seg])[:, None, None]
            force = force + (k_fwd * dp_n - k_bwd * dm_n) * t_atom
    elif variant == "bneb2":
        # two-stage per-atom Wilson-B projection (ref:
        # MEP/pathopt_bneb_force.py:226 CaluculationBNEB2): remove each
        # atom's gradient components along its directions to BOTH
        # neighbouring images (closed-form 2x2 Gram solve instead of the
        # reference's pseudoinverse), then along the per-atom chord.
        u1 = (x_prev - coords)
        u1 = u1 / (jnp.sqrt(jnp.sum(u1 ** 2, -1, keepdims=True)) + 1e-15)
        u2 = (x_next - coords)
        u2 = u2 / (jnp.sqrt(jnp.sum(u2 ** 2, -1, keepdims=True)) + 1e-15)
        c12 = jnp.sum(u1 * u2, -1)                        # (I,N)
        g1 = jnp.sum(g * u1, -1)
        g2 = jnp.sum(g * u2, -1)
        det = 1.0 - c12 ** 2
        safe = jnp.abs(det) > 1e-10
        det_s = jnp.where(safe, det, 1.0)
        a1 = jnp.where(safe, (g1 - c12 * g2) / det_s, g1)
        a2 = jnp.where(safe, (g2 - c12 * g1) / det_s, 0.0)
        g_p = g - a1[..., None] * u1 - a2[..., None] * u2
        uc = x_next - x_prev
        uc = uc / (jnp.sqrt(jnp.sum(uc ** 2, -1, keepdims=True)) + 1e-15)
        g_p = g_p - jnp.sum(g_p * uc, -1, keepdims=True) * uc
        force = -g_p
    elif variant == "bneb3":
        # per-atom tangent projection + equal-spacing image springs
        # (ref: MEP/pathopt_bneb_force.py:305 CaluculationBNEB3,
        # spring_force_const=0.05): the reference's hand-assembled 5-image
        # spring force is the gradient of 0.5 k sum_j (L_j - L_{j-1})^2 —
        # taken here with jax.grad over the whole path.
        t_atom = _per_atom_tangents(coords, energies)
        g_par_atom = jnp.sum(g * t_atom, axis=-1, keepdims=True) * t_atom
        force = -(g - g_par_atom)

        def spacing_penalty(path):
            seg = path[1:] - path[:-1]
            ell = jnp.sqrt(jnp.sum(seg ** 2, axis=(1, 2)) + 1e-14)
            return 0.5 * 0.05 * jnp.sum((ell[1:] - ell[:-1]) ** 2)

        force = force - jax.grad(spacing_penalty)(coords)
    elif variant == "qsm2":
        # Ayala-Schlegel tangent QSM (ref: MEP/pathopt_qsmv2_force.py:19):
        # perpendicular gradient with tangents PROPAGATED downhill from the
        # peak instead of finite-differenced from neighbours — no springs
        # and no reparametrization (the tangent construction itself keeps
        # the images spread along the arc).
        tau = ayala_tangents(coords, energies)
        g_par = _image_dot(g, tau) * tau
        g_perp = g - g_par
        force = -g_perp
    elif variant == "dmf":
        # direct MaxFlux (ref: MEP/pathopt_dmf_force.py:33, beta=10): the
        # path minimizes the MaxFlux action A = integral exp(beta E) dl,
        # force = -dA/dx / (beta A), exp-stabilized by factoring out max(E).
        # The integral is evaluated on a dmf_nsegs-fold SUBDIVIDED path
        # (linear interpolation matrix W, static) — the discrete-segment
        # action under-resolves the barrier exactly like the reference's
        # coarse spline without its 4*nsegs quadrature
        # (pathopt_dmf_force.py:133). Both derivative pieces come from
        # jax.grad: the geometric part at fixed energies, and the
        # energy-feedback part dA/dE chained through the per-image
        # gradients (dE_i/dx_i = g_i).
        beta = dmf_beta
        k = max(int(dmf_nsegs), 1)
        t_img = np.linspace(0.0, 1.0, n_images)
        t_ref = np.linspace(0.0, 1.0, k * (n_images - 1) + 1)
        w_mat = np.zeros((len(t_ref), n_images))
        for r, t in enumerate(t_ref):       # static linear-interp weights
            j = min(int(t * (n_images - 1)), n_images - 2)
            a = (t - t_img[j]) * (n_images - 1)
            w_mat[r, j] = 1.0 - a
            w_mat[r, j + 1] = a
        w_mat = jnp.asarray(w_mat, coords.dtype)
        e_shift = energies - jnp.max(energies)

        def action_fn(path_flat, e_img):
            x_r = w_mat @ path_flat.reshape(n_images, -1)
            e_r = w_mat @ e_img
            w_r = jnp.exp(beta * e_r)
            seg = x_r[1:] - x_r[:-1]
            seg_len = jnp.sqrt(jnp.sum(seg ** 2, axis=-1) + 1e-14)
            return jnp.sum(0.5 * (w_r[:-1] + w_r[1:]) * seg_len) + 1e-30

        flat = coords.reshape(n_images, -1).reshape(-1)
        action, geo_grad = jax.value_and_grad(action_fn)(flat, e_shift)
        da_de = jax.grad(action_fn, argnums=1)(flat, e_shift)     # (I,)
        e_term = da_de[:, None, None] * gradients
        da_dx = geo_grad.reshape(coords.shape) + e_term
        force = -da_dx / (beta * action)
    elif variant in ("lup", "qsm", "string"):
        # perpendicular gradient only; qsm/string rely on reparametrization
        # instead of springs (JCP 124, 054109; ref: MEP/pathopt_qsm_force.py)
        force = -g_perp
    elif variant == "om":
        # Onsager-Machlup-flavoured: energy-weighted spring constants
        e_w = 1.0 + (energies - jnp.min(energies)) / (
            jnp.max(energies) - jnp.min(energies) + 1e-12)
        k_i = (k_spring * e_w)[:, None, None]
        f_spring = k_i * (d_plus_n - d_minus_n) * tau
        force = -g_perp + f_spring
    else:
        f_spring = k_spring * (d_plus_n - d_minus_n) * tau
        force = -g_perp + f_spring
        if variant == "dneb":
            # doubly nudged: keep the perpendicular spring component minus
            # its projection onto the perpendicular gradient direction
            f_spring_full = k_spring * ((x_next - coords) - (coords - x_prev))
            f_s_perp = f_spring_full - _image_dot(f_spring_full, tau) * tau
            g_perp_hat = _normalize(g_perp)
            f_dneb = f_s_perp - _image_dot(f_s_perp, g_perp_hat) * g_perp_hat
            force = force + f_dneb

    # climbing image: highest interior image feels -g + 2 g_par
    # (ref: neb.py:562; JCP 113, 9901)
    interior = (jnp.arange(n_images) > 0) & (jnp.arange(n_images) < n_images - 1)
    e_interior = jnp.where(interior, energies, -jnp.inf)
    ci_idx = jnp.argmax(e_interior)
    is_ci = (jnp.arange(n_images) == ci_idx)[:, None, None] & jnp.asarray(climbing)
    ci_force = -g + 2.0 * g_par
    force = jnp.where(is_ci, ci_force, force)

    # endpoints: plain -g (relaxed) or zero (frozen)
    is_end = ((jnp.arange(n_images) == 0)
              | (jnp.arange(n_images) == n_images - 1))[:, None, None]
    end_force = -g if optimize_endpoints else jnp.zeros_like(g)
    return jnp.where(is_end, end_force, force)


# --------------------------------------------------------------------------
# initial-path generation
# --------------------------------------------------------------------------

def interpolate_linear(start, end, n_images):
    """(N,3),(N,3) -> (I,N,3) linear interpolation including endpoints
    (ref: neb.py:1000 make_geometry_list)."""
    t = jnp.linspace(0.0, 1.0, n_images)[:, None, None]
    return (1.0 - t) * start[None] + t * end[None]


def idpp_path(start, end, n_images, n_steps=300, dt_scale=0.05):
    """IDPP preprocessing: relax each interior image on the image-dependent
    pair potential sum_{i<j} w_ij (d_ij - d_ij^target)^2, w = d^-4
    (Smidstrup 2014; ref: Potential/idpp.py:10). Fully on device."""
    path0 = interpolate_linear(start, end, n_images)
    n = start.shape[0]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    def dists(x):
        d = x[:, None, :] - x[None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    d_start = dists(start)
    d_end = dists(end)
    t = jnp.linspace(0.0, 1.0, n_images)
    d_target = (1 - t)[:, None, None] * d_start[None] + t[:, None, None] * d_end[None]

    def idpp_energy(x, d_tgt):
        d = dists(x)
        w = jnp.where(mask, 1.0 / (d ** 4), 0.0)
        return 0.5 * jnp.sum(jnp.where(mask, w * (d - d_tgt) ** 2, 0.0))

    grad_fn = jax.vmap(jax.grad(idpp_energy), in_axes=(0, 0))

    interior = ((jnp.arange(n_images) > 0)
                & (jnp.arange(n_images) < n_images - 1))[:, None, None]

    def body(carry, _):
        path, v, dt = carry
        g = grad_fn(path, d_target)
        g = jnp.where(interior, g, 0.0)
        # simple FIRE-flavoured damped dynamics, shared clock
        power = jnp.sum(-g * v)
        v = jnp.where(power > 0, 0.9 * v - dt * g, -dt * g)
        path = path + dt * v
        return (path, v, dt), None

    dt = jnp.asarray(dt_scale, start.dtype)
    (path, _, _), _ = jax.lax.scan(
        body, (path0, jnp.zeros_like(path0), dt), None, length=n_steps)
    return path


def _idpp_refine_middle(a, m, b, n_steps=200, dt_scale=0.05):
    """Relax the middle geometry of a 3-image path on the IDPP objective
    with endpoints fixed, target = mean of the endpoint distance matrices
    (ref: Potential/idpp.py opt_path as used by
    Utils/calc_tools.py:880-881)."""
    n = a.shape[0]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    def dists(x):
        d = x[:, None, :] - x[None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    d_tgt = 0.5 * (dists(a) + dists(b))

    def idpp_energy(x):
        d = dists(x)
        w = jnp.where(mask, 1.0 / (d ** 4), 0.0)
        return 0.5 * jnp.sum(jnp.where(mask, w * (d - d_tgt) ** 2, 0.0))

    grad = jax.grad(idpp_energy)

    def body(carry, _):
        x, v = carry
        g = grad(x)
        power = jnp.sum(-g * v)
        v = jnp.where(power > 0, 0.9 * v - dt_scale * g, -dt_scale * g)
        return (x + dt_scale * v, v), None

    (m_out, _), _ = jax.lax.scan(body, (m, jnp.zeros_like(m)), None,
                                 length=n_steps)
    return m_out


def spline_climbing_insert(path, energies):
    """The reference's '-ci' climbing image: fit a natural cubic spline to
    the energy profile over the COM-aligned arc length, locate its local
    MAXIMA analytically (roots of the per-segment derivative), and for
    each maximum inside segment (i, i+1) with 2 <= i < I-2 replace image i
    by the IDPP-refined linear interpolation at the maximum
    (ref: interface.py:320 -ci -> neb.py:562-564 ->
    Utils/calc_tools.py:865 apply_climbing_image; the reference's
    spline-extrema finder is Interpolation/interpolation.py:111).
    Host-side numpy + a small jitted IDPP relax; returns the new path."""
    p = np.asarray(path)
    e = np.asarray(energies, dtype=np.float64)
    n_img = p.shape[0]
    if n_img < 5:
        return path
    # COM-aligned arc length (ref: calc_tools.py:853 calc_path_length_list)
    centered = p - p.mean(axis=1, keepdims=True)
    seg = np.sqrt(((centered[1:] - centered[:-1]) ** 2).sum(axis=(1, 2)))
    s = np.concatenate([[0.0], np.cumsum(seg)])
    h = np.diff(s)
    if np.any(h < 1e-12):
        return path
    # natural cubic spline coefficients for e(s)
    n = n_img
    a_mat = np.zeros((n, n))
    rhs = np.zeros(n)
    a_mat[0, 0] = a_mat[-1, -1] = 1.0
    for i in range(1, n - 1):
        a_mat[i, i - 1] = h[i - 1]
        a_mat[i, i] = 2.0 * (h[i - 1] + h[i])
        a_mat[i, i + 1] = h[i]
        rhs[i] = 3.0 * ((e[i + 1] - e[i]) / h[i]
                        - (e[i] - e[i - 1]) / h[i - 1])
    c = np.linalg.solve(a_mat, rhs)
    b = np.diff(e) / h - h * (2.0 * c[:-1] + c[1:]) / 3.0
    d = np.diff(c) / (3.0 * h)
    # local maxima: roots of b + 2c dx + 3d dx^2 in (0, h_i) with S'' < 0
    maxima = []
    for i in range(n - 1):
        roots = np.roots([3.0 * d[i], 2.0 * c[i], b[i]]) if abs(d[i]) > 1e-30 \
            else (np.array([-b[i] / (2.0 * c[i])]) if abs(c[i]) > 1e-30
                  else np.array([]))
        for r in np.real(roots[np.abs(np.imag(roots)) < 1e-12]):
            if 0.0 < r < h[i] and (2.0 * c[i] + 6.0 * d[i] * r) < 0.0:
                maxima.append(s[i] + r)
    new_p = p.copy()
    for dist in maxima:
        for i in range(2, n - 2):
            if s[i] >= dist or dist >= s[i + 1]:
                continue
            t = (dist - s[i]) / (s[i + 1] - s[i])
            interp = p[i] + (p[i + 1] - p[i]) * t
            refined = _idpp_refine_middle(jnp.asarray(path[i]),
                                          jnp.asarray(interp),
                                          jnp.asarray(path[i + 1]))
            new_p[i] = np.asarray(refined)
    return jnp.asarray(new_p, dtype=path.dtype)


# --------------------------------------------------------------------------
# per-image trust radii + adaptive per-image FIRE
# --------------------------------------------------------------------------

def per_image_trust_clamp(path, forces, mv, end_tr=0.5):
    """Per-image trust-radius clamp (ref: Optimizer/trust_radius_neb.py:4
    TR_NEB.TR_calc): each interior image's move is limited to HALF its
    distance to a neighbor it moves toward, so stiff images cannot blow
    through soft ones; a move opposing the image's NEB force is zeroed
    (projected velocity-Verlet rule). Endpoints get a plain min(0.5, |d|)
    clamp. Branchless whole-band version of the reference's per-image
    Python loop."""
    eps = 1e-15
    x_prev = jnp.roll(path, 1, axis=0)
    x_next = jnp.roll(path, -1, axis=0)
    d_norm = jnp.sqrt(_image_dot(mv, mv) + eps)
    tr1 = 0.5 * jnp.sqrt(_image_dot(path - x_prev, path - x_prev) + eps)
    tr2 = 0.5 * jnp.sqrt(_image_dot(x_next - path, x_next - path) + eps)
    u1 = (x_prev - path) / (2.0 * tr1 + eps)
    u2 = (x_next - path) / (2.0 * tr2 + eps)
    dhat = mv / d_norm
    cos1 = _image_dot(u1, dhat)
    cos2 = _image_dot(u2, dhat)
    f_norm = jnp.sqrt(_image_dot(forces, forces) + eps)
    fcos = _image_dot(forces, mv) / (f_norm * d_norm)

    clamp1 = tr1 / d_norm
    clamp2 = tr2 / d_norm
    xor_case = (cos1 > 0) ^ (cos2 > 0)
    both_neg = (cos1 < 0) & (cos2 < 0)
    scale_xor = jnp.where((d_norm > tr1) & (cos1 > 0), clamp1,
                          jnp.where((d_norm > tr2) & (cos2 > 0), clamp2, 1.0))
    scale_else = jnp.where(d_norm > tr1, clamp1,
                           jnp.where(d_norm > tr2, clamp2, 1.0))
    scale = jnp.where(both_neg, 1.0,
                      jnp.where(xor_case, scale_xor, scale_else))
    scale = jnp.where(fcos >= 0, scale, 0.0)   # projected-VV zeroing

    n_images = path.shape[0]
    is_end = ((jnp.arange(n_images) == 0)
              | (jnp.arange(n_images) == n_images - 1))[:, None, None]
    end_scale = jnp.minimum(1.0, end_tr / d_norm)
    return mv * jnp.where(is_end, end_scale, scale)


class AFireState(NamedTuple):
    """Per-image FIRE clocks (ref: Optimizer/afire_neb.py AFIRE_NEB —
    'adaptive parameters for each image in the NEB chain')."""
    velocity: jnp.ndarray   # (I,N,3)
    dt: jnp.ndarray         # (I,)
    alpha: jnp.ndarray      # (I,)
    n_good: jnp.ndarray     # (I,) int32


def afire_init(n_images, n_atoms, dtype=jnp.float64, dt0=0.1, alpha0=0.1):
    return AFireState(
        velocity=jnp.zeros((n_images, n_atoms, 3), dtype),
        dt=jnp.full((n_images,), dt0, dtype),
        alpha=jnp.full((n_images,), alpha0, dtype),
        n_good=jnp.zeros((n_images,), jnp.int32))


def afire_step(state, forces, dt_max=1.0, n_acc=5, f_inc=1.10, f_acc=0.99,
               f_dec=0.50, alpha_start=0.1, maxstep=0.1):
    """One adaptive-FIRE step with INDEPENDENT per-image dt/alpha/n_good
    (same control constants as afire_neb.py:28-34; maxstep default 0.1 as
    its `maxstep` config). Regions of different curvature along the band
    accelerate independently instead of sharing one global clock."""
    v = state.velocity
    power = jnp.sum(v * forces, axis=(1, 2))              # (I,)
    vnorm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2)) + 1e-30)
    fnorm = jnp.sqrt(jnp.sum(forces * forces, axis=(1, 2)) + 1e-30)
    downhill = power > 0.0
    accelerate = downhill & (state.n_good > n_acc)
    dt = jnp.where(downhill,
                   jnp.where(accelerate,
                             jnp.minimum(state.dt * f_inc, dt_max), state.dt),
                   state.dt * f_dec)
    alpha = jnp.where(downhill,
                      jnp.where(accelerate, state.alpha * f_acc, state.alpha),
                      jnp.asarray(alpha_start, v.dtype))
    a3 = state.alpha[:, None, None]
    v_mix = (1.0 - a3) * v + a3 * (vnorm / fnorm)[:, None, None] * forces
    v_new = jnp.where(downhill[:, None, None], v_mix,
                      jnp.zeros_like(v)) + dt[:, None, None] * forces
    n_good = jnp.where(downhill, state.n_good + 1, 0)
    mv = dt[:, None, None] * v_new
    mv_norm = jnp.sqrt(_image_dot(mv, mv) + 1e-30)
    mv = mv * jnp.minimum(1.0, maxstep / mv_norm)
    return mv, AFireState(v_new, dt, alpha, n_good)


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NEBConfig:
    """ref defaults: neb.py:75 NEBConfig (NSTEP=10 default there; more here),
    spring k, CI start iteration (ref: APPLY_CI_NEB)."""

    variant: str = "cineb"
    optimizer: str = "fire"       # fire | afire | quickmin | lbfgs | sd |
                                  # rfo (ref: Optimizer/{fire,afire,
                                  # gradientdescent,lbfgs,rfo}_neb.py;
                                  # afire = per-image adaptive FIRE clocks;
                                  # rfo = blended FIRE + per-image
                                  # quasi-Newton RFO)
    rfo_ratio: float = 0.5        # RFO fraction of the interior move
                                  # (ref: -rrs interface.py:336)
    n_steps: int = 100
    k_spring: float = 0.01
    climbing_start: int = 10
    optimize_endpoints: bool = False
    fmax: float = 4.5e-4          # max |force| component convergence
    dt0: float = 0.3
    dt_max: float = 1.0
    sd_step: float = 0.5          # sd/quickmin step scale
    max_move: float = 0.3         # per-image move clamp (Bohr) — lbfgs/cg
                                  # band clocks need it: NEB forces are
                                  # non-conservative, so curvature-based
                                  # engines can otherwise overshoot to NaN
    per_image_trust: bool = False  # geometry-aware per-image trust radii
                                  # (half neighbor distance + projected-VV
                                  # zeroing; ref: trust_radius_neb.py:4)
    dmf_beta: float = 10.0        # MaxFlux reciprocal temperature (1/Ha)
    dmf_nsegs: int = 4            # action-quadrature subdivision per segment
                                  # (ref: pathopt_dmf_force.py nsegs)
    # in-loop image redistribution (ref: neb.py:572 -> 649
    # _align_geometries; nebmain -ad* flags interface.py:267-287): apply
    # `redistribute` every `redistribute_every` iterations on the host
    # between jitted steps. Scheme names in
    # interpolation.REDISTRIBUTION_SCHEMES.
    redistribute: str = ""
    redistribute_every: int = 0
    savgol_window: int = 5
    savgol_order: int = 3
    # reference '-ci [start interval]' (interface.py:320 -> neb.py:562 ->
    # calc_tools.py:865 apply_climbing_image): every `spline_ci_interval`
    # iterations after `spline_ci_start`, replace the image below each
    # spline-located energy maximum with an IDPP-refined interpolation at
    # the maximum. Distinct from `climbing_start` (the CI-NEB force,
    # ref -cineb). 0 = off.
    spline_ci_start: int = 0
    spline_ci_interval: int = 0
    scan_chunk: int = 0           # >1: run up to this many band steps per
                                  # device dispatch via lax.scan inside
                                  # neb() — host work (redistribution,
                                  # spline-CI insertion, fmax early exit)
                                  # still happens, at its own boundaries;
                                  # segments are cut so those boundaries
                                  # land exactly. 0/1 = per-step host
                                  # loop. Chunking removes the ~1 s
                                  # blocking round-trip the tunneled
                                  # single-chip setup pays per dispatch.


class NEBResult(NamedTuple):
    path: jnp.ndarray          # (I,N,3)
    energies: jnp.ndarray      # (I,)
    converged: jnp.ndarray
    n_iterations: int
    energy_history: np.ndarray
    ts_index: int              # highest-energy image


class RFONEBState(NamedTuple):
    """Carry for the blended FIRE+RFO band clock (ref:
    Optimizer/rfo_neb.py:95 RFOOptimizer)."""

    fire: tuple             # inner FIRE state for the band
    hessians: jnp.ndarray   # (I,D,D) per-image quasi-Newton Hessians
    prev_x: jnp.ndarray     # (I,D)
    prev_g: jnp.ndarray     # (I,D) raw per-image gradients
    have_prev: jnp.ndarray  # bool scalar


def rfo_neb_init(path0, dtype=None, dt0=0.3):
    from multioptpy_tpu.steppers.first_order import fire_init
    path0 = jnp.asarray(path0)
    dt = dtype or path0.dtype
    n_img = path0.shape[0]
    d = path0.shape[1] * 3
    return RFONEBState(
        fire=fire_init(path0.size, dt, dt0=dt0),
        hessians=jnp.tile(jnp.eye(d, dtype=dt)[None], (n_img, 1, 1)),
        prev_x=jnp.zeros((n_img, d), dt),
        prev_g=jnp.zeros((n_img, d), dt),
        have_prev=jnp.asarray(False))


def make_neb_step(calc, z, config=NEBConfig(), bias_engine=None):
    """One jitted NEB iteration: (path, fire_state, it) -> ..."""
    opt = config.optimizer
    if opt not in ("fire", "afire", "quickmin", "lbfgs", "sd",
                   "rfo") and not (opt.startswith("cg")):
        raise ValueError(f"unknown NEB optimizer '{opt}' (choose from fire, "
                         f"afire, quickmin, lbfgs, sd, rfo, cg_pr, cg_fr, "
                         f"cg_hs, cg_dy, cg_hz)")
    base_variant = ("neb" if config.variant == "cineb"
                    else config.variant)

    def energy_grad_all(path):
        def one(x):
            e, g = calc.energy_and_gradient(x, z)
            if bias_engine is not None and len(bias_engine):
                be, bg = bias_engine.energy_and_gradient(x)
                e, g = e + be, g + bg
            return e, g
        return jax.vmap(one)(path)

    def step(path, fire_state, iteration):
        energies, grads = energy_grad_all(path)
        climbing = (config.variant == "cineb") & (iteration >= config.climbing_start)
        forces = neb_forces(path, energies, grads, config.k_spring,
                            base_variant, climbing,
                            config.optimize_endpoints, config.dmf_beta,
                            config.dmf_nsegs)
        # one optimizer clock for the whole path (treated as a single vector)
        if config.optimizer == "afire":
            mv, fire_new = afire_step(fire_state, forces,
                                      dt_max=config.dt_max,
                                      maxstep=config.max_move)
            move = mv.reshape(-1)
        elif config.optimizer == "fire":
            move, fire_new = fire_step(fire_state, -forces.reshape(-1),
                                       dt_max=config.dt_max)
        elif config.optimizer == "quickmin":
            # velocity projected onto the force direction (QuickMin,
            # ref: Optimizer/quickmin_neb)
            f = forces.reshape(-1)
            v = fire_state.velocity
            f_hat = f / (jnp.linalg.norm(f) + 1e-30)
            v_proj = jnp.maximum(jnp.dot(v, f_hat), 0.0) * f_hat
            v_new = v_proj + fire_state.dt * f
            move = fire_state.dt * v_new
            fire_new = fire_state._replace(velocity=v_new)
        elif config.optimizer == "lbfgs":
            from multioptpy_tpu.steppers.first_order import lbfgs_step
            move, lb_new = lbfgs_step(fire_state, path.reshape(-1),
                                      -forces.reshape(-1),
                                      delta=config.sd_step)
            fire_new = lb_new
        elif config.optimizer == "rfo":
            # blended FIRE + per-image quasi-Newton RFO (ref:
            # Optimizer/rfo_neb.py:95 RFOOptimizer): the band-projected
            # force drives FIRE, the RAW per-image gradient drives a
            # vmapped RS-RFO with FSB (endpoints) / Bofill (interior)
            # Hessians; interior move = (1-r) fire + r rfo, endpoints
            # pure RFO, with the reference's per-image step limits
            from multioptpy_tpu.hessian.updates import (bofill_delta,
                                                        fsb_delta)
            from multioptpy_tpu.steppers.rfo import rs_rfo_step
            n_img = path.shape[0]
            d = path.shape[1] * 3
            x_flat = path.reshape(n_img, d)
            g_raw = grads.reshape(n_img, d)
            endpoint = (jnp.arange(n_img) == 0) | \
                (jnp.arange(n_img) == n_img - 1)
            # secant pairs use the RAW per-image gradients (a consistent
            # gradient field — the reference also feeds total_force to its
            # per-image RSIRFO, rfo_neb.py:137)
            s_v = x_flat - fire_state.prev_x
            y_v = g_raw - fire_state.prev_g

            def upd(h, s_i, y_i, is_end):
                dh = jnp.where(is_end, fsb_delta(h, s_i, y_i),
                               bofill_delta(h, s_i, y_i))
                # band moves can stall to |s| ~ 0 (FIRE resets), where
                # secant updates degenerate — skip those, and reset any
                # image whose Hessian went non-finite to identity
                small = jnp.linalg.norm(s_i) < 1e-8
                h2 = h + jnp.where(small, 0.0, dh)
                ok = jnp.all(jnp.isfinite(h2))
                return jnp.where(ok, h2, jnp.eye(d, dtype=h.dtype))

            h_upd = jax.vmap(upd)(fire_state.hessians, s_v, y_v, endpoint)
            h_new = jnp.where(fire_state.have_prev, h_upd,
                              fire_state.hessians)
            # interior images move PERPENDICULAR to the path (the
            # reference's switch_NEB_mode / Ayala tangent handling,
            # rfo_neb.py:124,138): the solve sees the projected Hessian
            # P H P plus a stiff tangent penalty and the projected
            # gradient, so the RFO step cannot slide images along the
            # band into the minima
            tan = jnp.roll(x_flat, -1, axis=0) - jnp.roll(x_flat, 1, axis=0)
            tan = tan / (jnp.linalg.norm(tan, axis=1, keepdims=True)
                         + 1e-30)
            g_perp = g_raw - jnp.sum(g_raw * tan, axis=1,
                                     keepdims=True) * tan
            g_eff = jnp.where(endpoint[:, None], g_raw, g_perp)

            def project_h(h, t, is_end):
                p = jnp.eye(d, dtype=h.dtype) - jnp.outer(t, t)
                h_perp = p @ h @ p + 1.0 * jnp.outer(t, t)
                return jnp.where(is_end, h, h_perp)

            h_eff = jax.vmap(project_h)(h_new, tan, endpoint)
            # trust radii 0.5 endpoints / 0.2 interior (ref: rfo_neb.py:119)
            tr = jnp.where(endpoint, 0.5, 0.2).astype(path.dtype)

            def solve(g_i, h_i, tr_i):
                st, _ = rs_rfo_step(g_i, h_i, tr_i, saddle_order=0)
                return st

            rfo_mv = jax.vmap(solve)(g_eff, h_eff, tr)
            # per-image step limit 0.2 / 0.1 (ref: rfo_neb.py:81)
            lim = jnp.where(endpoint, 0.2, 0.1).astype(path.dtype)
            nrm = jnp.linalg.norm(rfo_mv, axis=1, keepdims=True)
            rfo_mv = rfo_mv * jnp.minimum(
                1.0, lim[:, None] / jnp.maximum(nrm, 1e-30))
            mv_f, fire_inner = fire_step(fire_state.fire,
                                         -forces.reshape(-1),
                                         dt_max=config.dt_max)
            mv_f = mv_f.reshape(n_img, d)
            r = config.rfo_ratio
            mv_all = jnp.where(endpoint[:, None], rfo_mv,
                               (1.0 - r) * mv_f + r * rfo_mv)
            move = mv_all.reshape(-1)
            fire_new = RFONEBState(fire=fire_inner, hessians=h_new,
                                   prev_x=x_flat, prev_g=g_raw,
                                   have_prev=jnp.asarray(True))
        elif config.optimizer.startswith("cg"):
            # conjugate-gradient band clock
            # (ref: Optimizer/conjugate_gradient_neb.py:6)
            from multioptpy_tpu.steppers.first_order import cg_step
            variant = (config.optimizer.split("_", 1)[1]
                       if "_" in config.optimizer else "pr")
            move, cg_new = cg_step(fire_state, -forces.reshape(-1),
                                   variant=variant, delta=config.sd_step)
            fire_new = cg_new
        else:  # sd
            move = config.sd_step * forces.reshape(-1)
            fire_new = fire_state
        mv = move.reshape(path.shape)
        if config.per_image_trust:
            # geometry-aware per-image clamp (ref: trust_radius_neb.py:4)
            mv = per_image_trust_clamp(path, forces, mv)
        else:
            # per-image norm clamp (see NEBConfig.max_move)
            mv_norm = jnp.sqrt(_image_dot(mv, mv) + 1e-30)
            mv = mv * jnp.minimum(1.0, config.max_move / mv_norm)
        path_new = path + mv
        if config.variant in ("qsm", "string"):
            # string-method reparametrization: equal arc-length respacing
            # every iteration (ref: neb.py:572 _align_geometries)
            from multioptpy_tpu.interpolation import linear_resample
            path_new = linear_resample(path_new, path.shape[0])
        fmax = jnp.max(jnp.abs(forces))
        return path_new, fire_new, energies, grads, fmax

    return step


def _neb_chunked(calc, z, config, bias_engine, path, fire_state):
    """Chunked-scan NEB driver: up to `config.scan_chunk` band steps per
    device dispatch, with segment boundaries cut exactly at the host-work
    iterations (in-loop redistribution, spline-CI insertion) so their
    per-iteration semantics are preserved. fmax early exit is detected
    from the per-step fmax history at chunk granularity. See
    NEBConfig.scan_chunk for why (dispatch-bound small-system pipelines).
    """
    from functools import lru_cache

    step_fn = make_neb_step(calc, z, config, bias_engine)
    chunk_cap = int(config.scan_chunk)

    @lru_cache(maxsize=None)
    def seg_runner(length):
        @jax.jit
        def run(p0, f0, its):
            def body(carry, it_):
                p, f = carry
                p, f, e, g, fm = step_fn(p, f, it_)
                return (p, f), (e, fm, g)
            (p, f), (e_h, fm_h, g_h) = jax.lax.scan(body, (p0, f0), its)
            return p, f, e_h, fm_h, g_h[-1]
        return run

    def _next_host_event(it):
        ends = [config.n_steps, it + chunk_cap]
        if config.redistribute and config.redistribute_every:
            ends.append(((it // config.redistribute_every) + 1)
                        * config.redistribute_every)
        if config.spline_ci_interval:
            start, iv = config.spline_ci_start, config.spline_ci_interval
            k = max(0, it - start) // iv + 1
            ends.append(start + k * iv)
        return min(e for e in ends if e > it)

    e_hist = []
    converged = False
    it = 0
    energies = grads = None
    while it < config.n_steps and not converged:
        seg_end = _next_host_event(it)
        length = seg_end - it
        its = jnp.arange(it + 1, seg_end + 1)
        p0, f0 = path, fire_state
        path, fire_state, e_h, fm_h, grads = seg_runner(length)(
            path, fire_state, its)
        # one blocking transfer per segment (each separate read pays a
        # ~1 s round trip on the tunneled single-chip setup)
        fm_np, e_h_np = jax.device_get((fm_h, e_h))
        hit = np.nonzero(fm_np < config.fmax)[0]
        if hit.size and int(hit[0]) + 1 < length:
            # converged mid-segment: rerun the exact prefix so the
            # returned band is the same one the per-step loop stops on
            length = int(hit[0]) + 1
            path, fire_state, e_h, fm_h, grads = seg_runner(length)(
                p0, f0, its[:length])
            e_h_np = jax.device_get(e_h)
        e_hist.extend(e_h_np)
        energies = e_h[-1]
        if hit.size:
            converged = True
            it += length
            break
        it = seg_end
        if (config.redistribute and config.redistribute_every
                and it % config.redistribute_every == 0
                and it < config.n_steps):
            from multioptpy_tpu.interpolation import redistribute_path
            path = redistribute_path(
                path, config.redistribute, energies=np.asarray(energies),
                gradients=np.asarray(grads), z=np.asarray(z),
                savgol_window=config.savgol_window,
                savgol_order=config.savgol_order)
        if (config.spline_ci_interval and it > config.spline_ci_start
                and (it - config.spline_ci_start)
                % config.spline_ci_interval == 0
                and it < config.n_steps):
            path = spline_climbing_insert(path, energies)

    e_np = np.asarray(energies)
    ts_index = int(np.argmax(e_np[1:-1])) + 1 if len(e_np) > 2 else 0
    return NEBResult(
        path=path, energies=energies, converged=jnp.asarray(converged),
        n_iterations=it, energy_history=np.asarray(e_hist),
        ts_index=ts_index,
    )


def neb(calc, path0, z, config=NEBConfig(), bias_engine=None, callback=None):
    """Run NEB on an (I,N,3) initial path. Host loop with early exit; the
    heavy step is one compiled program (3.2-equivalent stack)."""
    path = jnp.asarray(path0)
    z = jnp.asarray(z)
    n_dof = path.size
    step = jax.jit(make_neb_step(calc, z, config, bias_engine))

    if config.optimizer == "lbfgs":
        from multioptpy_tpu.steppers.first_order import lbfgs_init
        fire_state = lbfgs_init(n_dof, dtype=path.dtype)
    elif config.optimizer.startswith("cg"):
        from multioptpy_tpu.steppers.first_order import cg_init
        fire_state = cg_init(n_dof, path.dtype)
    elif config.optimizer == "afire":
        fire_state = afire_init(path.shape[0], path.shape[1], path.dtype,
                                dt0=config.dt0)
    elif config.optimizer == "rfo":
        fire_state = rfo_neb_init(path, dt0=config.dt0)
    else:
        fire_state = fire_init(n_dof, path.dtype, dt0=config.dt0)
    if config.scan_chunk and config.scan_chunk > 1 and callback is None:
        return _neb_chunked(calc, z, config, bias_engine, path, fire_state)

    e_hist = []
    converged = False
    it = 0
    energies = None
    for it in range(1, config.n_steps + 1):
        path_pre = path  # band the returned energies/grads belong to
        path, fire_state, energies, grads, fmax = step(
            path, fire_state, jnp.asarray(it))
        if (config.redistribute and config.redistribute_every
                and it % config.redistribute_every == 0
                and it < config.n_steps):
            # in-loop image redistribution between jitted steps
            # (ref: neb.py:572 _align_geometries every iteration)
            from multioptpy_tpu.interpolation import redistribute_path
            path = redistribute_path(
                path, config.redistribute, energies=np.asarray(energies),
                gradients=np.asarray(grads), z=np.asarray(z),
                savgol_window=config.savgol_window,
                savgol_order=config.savgol_order)
        if (config.spline_ci_interval and it > config.spline_ci_start
                and (it - config.spline_ci_start)
                % config.spline_ci_interval == 0
                and it < config.n_steps):
            # reference '-ci': spline-located maximum insertion
            # (ref: neb.py:562-564 -> calc_tools.py:865)
            path = spline_climbing_insert(path, energies)
        e_hist.append(np.asarray(energies))
        if callback is not None:
            # pre-step band + its matching energies/gradients so callers
            # can derive the reference's per-iteration diagnostics
            # (ref: neb.py:865 _save_analysis_data)
            callback(it, path_pre, energies, grads, fmax)
        if float(fmax) < config.fmax:
            converged = True
            break

    e_np = np.asarray(energies)
    ts_index = int(np.argmax(e_np[1:-1])) + 1 if len(e_np) > 2 else 0
    return NEBResult(
        path=path, energies=energies, converged=jnp.asarray(converged),
        n_iterations=it, energy_history=np.asarray(e_hist),
        ts_index=ts_index,
    )


def neb_scan(calc, path0, z, config=NEBConfig(), bias_engine=None):
    """Fully-on-device NEB: a fixed `config.n_steps`-iteration `lax.scan`
    with no host round-trips (no early exit). One dispatch for the whole
    band — use for throughput runs and ensembles; `neb()` (host loop with
    early exit and callbacks) remains the interactive driver.

    On the tunneled single-chip setup the host loop costs ~3 ms dispatch
    PER ITERATION; this variant pays it once per band.
    """
    path = jnp.asarray(path0)
    z = jnp.asarray(z)
    step = make_neb_step(calc, z, config, bias_engine)

    if config.optimizer == "lbfgs":
        from multioptpy_tpu.steppers.first_order import lbfgs_init
        fire_state = lbfgs_init(path.size, dtype=path.dtype)
    elif config.optimizer.startswith("cg"):
        from multioptpy_tpu.steppers.first_order import cg_init
        fire_state = cg_init(path.size, path.dtype)
    elif config.optimizer == "afire":
        fire_state = afire_init(path.shape[0], path.shape[1], path.dtype,
                                dt0=config.dt0)
    else:
        fire_state = fire_init(path.size, path.dtype, dt0=config.dt0)

    @jax.jit
    def run(p0, f0):
        def body(carry, it):
            p, f = carry
            p, f, energies, _, fmax = step(p, f, it)
            return (p, f), (energies, fmax)
        (p, _), (e_hist, fmax_hist) = jax.lax.scan(
            body, (p0, f0), jnp.arange(1, config.n_steps + 1))
        return p, e_hist, fmax_hist

    path, e_hist, fmax_hist = run(path, fire_state)
    energies = e_hist[-1]
    e_np = np.asarray(energies)
    ts_index = int(np.argmax(e_np[1:-1])) + 1 if len(e_np) > 2 else 0
    return NEBResult(
        path=path, energies=energies,
        converged=jnp.asarray(float(fmax_hist[-1]) < config.fmax),
        n_iterations=config.n_steps, energy_history=np.asarray(e_hist),
        ts_index=ts_index,
    )


# --------------------------------------------------------------------------
# sharded NEB: image axis over a device mesh, ppermute neighbor exchange
# --------------------------------------------------------------------------

_LBFGS_MEM = 8


class NEBState(NamedTuple):
    """Whole-band NEB state for the sharded step (pytree; coords/velocity/
    energies carry the image axis, scalars are replicated). The L-BFGS
    history fields carry the image axis SECOND (history index first) and
    stay zero-size-cost when the FIRE clock is used (they are only
    allocated with M > 0 by neb_init when the config asks for lbfgs)."""
    coords: jnp.ndarray     # (I,N,3)
    velocity: jnp.ndarray   # (I,N,3) FIRE velocity
    dt: jnp.ndarray         # scalar
    alpha: jnp.ndarray      # scalar
    n_good: jnp.ndarray     # int scalar
    iteration: jnp.ndarray  # int scalar
    energies: jnp.ndarray   # (I,) from the last step
    fmax: jnp.ndarray       # scalar max |force| from the last step
    s_hist: jnp.ndarray     # (M,I,N,3) L-BFGS displacement history
    y_hist: jnp.ndarray     # (M,I,N,3) L-BFGS gradient-difference history
    rho: jnp.ndarray        # (M,)
    hist_len: jnp.ndarray   # int scalar
    prev_grad: jnp.ndarray  # (I,N,3) band gradient (-force) of last step


def neb_init(path0, z, calc=None, config=NEBConfig()):
    """Initial NEBState for `neb_sharded_step` (z/calc accepted for symmetry
    with the other drivers; energies are filled by the first step)."""
    path0 = jnp.asarray(path0)
    dt = path0.dtype
    m = _LBFGS_MEM if config.optimizer == "lbfgs" else 0
    return NEBState(
        coords=path0,
        velocity=jnp.zeros_like(path0),
        dt=jnp.asarray(config.dt0, dt),
        alpha=jnp.asarray(0.1, dt),
        n_good=jnp.asarray(0, jnp.int32),
        iteration=jnp.asarray(0, jnp.int32),
        energies=jnp.zeros((path0.shape[0],), dt),
        fmax=jnp.asarray(jnp.inf, dt),
        s_hist=jnp.zeros((m,) + path0.shape, dt),
        y_hist=jnp.zeros((m,) + path0.shape, dt),
        rho=jnp.zeros((m,), dt),
        hist_len=jnp.asarray(0, jnp.int32),
        prev_grad=jnp.zeros_like(path0),
    )


def neb_sharded_step(calc, z, config=NEBConfig(), mesh=None, axis="batch",
                     bias_engine=None):
    """One NEB iteration with the IMAGE axis sharded over a device mesh.

    This is the one true NEB communication pattern (SURVEY §5.8 item 2,
    replacing the reference's sequential per-image loop at
    ref: Calculator/tblite_calculation_tools.py:312): each device holds a
    contiguous block of images, evaluates its QM energies/gradients locally,
    and exchanges the ±1 boundary images/energies with its ring neighbors
    via `lax.ppermute` to build tangents and springs. The climbing-image
    index comes from an `all_gather` of the (tiny) per-image energies; the
    FIRE clock's global reductions are `psum`s. The ring wraparound
    reproduces `jnp.roll`, so this matches the single-device
    `make_neb_step` numerically (see tests/test_neb_sharded.py).

    Supports the improved-tangent family ("neb"/"cineb") plus the
    Wilson-B per-atom family ("bneb"/"nesb") with the FIRE or global
    L-BFGS band clocks (the L-BFGS two-loop recursion runs on the local
    shard with `psum`'d inner products — the history stays sharded along
    the image axis, so memory also scales out).
    """
    from jax import lax

    if mesh is None:
        from multioptpy_tpu.parallel.mesh import ensemble_mesh
        mesh = ensemble_mesh(axis=axis)
    # halo variants exchange only +-1 neighbours over the ring; the rest
    # (whole-path force laws: qsm2's downhill-propagated tangents, dmf's
    # path action, ewbneb/om energy-weighted springs, dneb/lup/bneb2/
    # bneb3) all_gather the band and evaluate neb_forces replicated —
    # the band is tiny (I*N*3 floats) next to the sharded QM gradients,
    # and force-law parity with the single-device dispatch is exact by
    # construction. qsm/string need spline respacing (a host-side step)
    # and gpneb a GP fit; both stay single-device.
    _HALO = ("neb", "cineb", "bneb", "nesb")
    _GATHER = ("dneb", "lup", "om", "qsm2", "dmf", "ewbneb", "bneb2",
               "bneb3")
    if config.variant not in _HALO + _GATHER:
        raise ValueError("neb_sharded_step supports variants "
                         f"{'/'.join(_HALO + _GATHER)}")
    if config.optimizer not in ("fire", "lbfgs"):
        raise ValueError("neb_sharded_step supports the fire and lbfgs "
                         "optimizers")

    n_dev = int(mesh.shape[axis])
    z = jnp.asarray(z)

    def energy_grad_one(x):
        e, g = calc.energy_and_gradient(x, z)
        if bias_engine is not None and len(bias_engine):
            be, bg = bias_engine.energy_and_gradient(x)
            e, g = e + be, g + bg
        return e, g

    from jax.sharding import PartitionSpec as P
    img = P(axis)
    rep = P()
    hist = P(None, axis)
    in_specs = NEBState(coords=img, velocity=img, dt=rep, alpha=rep,
                        n_good=rep, iteration=rep, energies=img, fmax=rep,
                        s_hist=hist, y_hist=hist, rho=rep, hist_len=rep,
                        prev_grad=img)

    perm_from_next = [((d + 1) % n_dev, d) for d in range(n_dev)]
    perm_from_prev = [((d - 1) % n_dev, d) for d in range(n_dev)]

    def local_step(state):
        coords_l = state.coords          # (m,N,3) local block
        m = coords_l.shape[0]
        dev = lax.axis_index(axis)
        n_images = n_dev * m
        gidx = dev * m + jnp.arange(m)   # global image indices

        e_l, g_l = jax.vmap(energy_grad_one)(coords_l)

        if config.variant in _GATHER:
            # whole-path force law on the gathered (tiny) band, exact
            # parity with the single-device neb_forces dispatch; the
            # expensive QM gradients above stay sharded
            x_full = lax.all_gather(coords_l, axis).reshape(
                (n_images,) + coords_l.shape[1:])
            e_full = lax.all_gather(e_l, axis).reshape(-1)
            g_full = lax.all_gather(g_l, axis).reshape(x_full.shape)
            force_full = neb_forces(
                x_full, e_full, g_full, k_spring=config.k_spring,
                variant=config.variant, climbing=False,
                optimize_endpoints=config.optimize_endpoints)
            force = lax.dynamic_slice_in_dim(force_full, dev * m, m, 0)
        else:
            # ±1 halo exchange over the ring (wraparound == jnp.roll
            # semantics; the wrapped values only feed frozen endpoint rows).
            x_from_next = lax.ppermute(coords_l[0], axis, perm_from_next)
            x_from_prev = lax.ppermute(coords_l[-1], axis, perm_from_prev)
            e_from_next = lax.ppermute(e_l[0], axis, perm_from_next)
            e_from_prev = lax.ppermute(e_l[-1], axis, perm_from_prev)
            x_prev = jnp.concatenate([x_from_prev[None], coords_l[:-1]],
                                     axis=0)
            x_next = jnp.concatenate([coords_l[1:], x_from_next[None]],
                                     axis=0)
            e_prev = jnp.concatenate([e_from_prev[None], e_l[:-1]])
            e_next = jnp.concatenate([e_l[1:], e_from_next[None]])

            tau = _tangents_from_halo(coords_l, x_prev, x_next,
                                      e_l, e_prev, e_next)
            g_par = _image_dot(g_l, tau) * tau
            if config.variant in ("bneb", "nesb"):
                # Wilson-B per-atom family (ref:
                # MEP/pathopt_bneb_force.py:21): per-atom tangents from
                # the same halos
                t_atom = _per_atom_tangents_from_halo(
                    coords_l, x_prev, x_next, e_l, e_prev, e_next)
                g_par_atom = jnp.sum(g_l * t_atom, axis=-1,
                                     keepdims=True) * t_atom
                force = -(g_l - g_par_atom)
                if config.variant == "nesb":
                    dp_a = jnp.sqrt(jnp.sum((x_next - coords_l) ** 2,
                                            axis=-1, keepdims=True) + 1e-14)
                    dm_a = jnp.sqrt(jnp.sum((coords_l - x_prev) ** 2,
                                            axis=-1, keepdims=True) + 1e-14)
                    force = force + config.k_spring * (dp_a - dm_a) * t_atom
            else:
                g_perp = g_l - g_par
                d_plus_n = jnp.sqrt(
                    _image_dot(x_next - coords_l, x_next - coords_l)
                    + 1e-14)
                d_minus_n = jnp.sqrt(
                    _image_dot(coords_l - x_prev, coords_l - x_prev)
                    + 1e-14)
                force = (-g_perp
                         + config.k_spring * (d_plus_n - d_minus_n) * tau)

            # climbing image: global argmax of interior energies
            # (all_gather of I floats — negligible traffic)
            e_full = lax.all_gather(e_l, axis).reshape(-1)     # (I,)
            interior_full = ((jnp.arange(n_images) > 0)
                             & (jnp.arange(n_images) < n_images - 1))
            ci_idx = jnp.argmax(jnp.where(interior_full, e_full, -jnp.inf))
            climbing = jnp.asarray(
                (config.variant == "cineb"), bool
            ) & (state.iteration + 1 >= config.climbing_start)
            is_ci = ((gidx == ci_idx)[:, None, None]) & climbing
            force = jnp.where(is_ci, -g_l + 2.0 * g_par, force)

            is_end = ((gidx == 0) | (gidx == n_images - 1))[:, None, None]
            end_force = (-g_l if config.optimize_endpoints
                         else jnp.zeros_like(g_l))
            force = jnp.where(is_end, end_force, force)

        s_hist, y_hist, rho = state.s_hist, state.y_hist, state.rho
        hist_len = state.hist_len
        if config.optimizer == "lbfgs":
            # global L-BFGS band clock: IDENTICAL math to the single-
            # program steppers.first_order.lbfgs_step over the flattened
            # band (same circular buffer, admit rule, gamma clip and
            # delta = sd_step scale), with every jnp.dot replaced by a
            # psum'd local dot — the (M,I,N,3) history stays sharded along
            # the image axis, so optimizer memory also scales out
            # (ref counterpart: Optimizer/lbfgs_neb.py:6).
            def gdot(a, b):
                return lax.psum(jnp.sum(a * b), axis)

            grad_band = -force
            m_mem = s_hist.shape[0]
            # in lbfgs mode the velocity slot stores the previous APPLIED
            # move (s_k = x_k - x_{k-1}) and hist_len the admit counter
            initialized = state.iteration > 0
            s_vec = state.velocity
            y_vec = grad_band - state.prev_grad
            sy = gdot(s_vec, y_vec)
            admit = initialized & (jnp.abs(sy) > 1e-12)
            count = hist_len
            slot = count % m_mem
            s_hist = jnp.where(admit, s_hist.at[slot].set(s_vec), s_hist)
            y_hist = jnp.where(admit, y_hist.at[slot].set(y_vec), y_hist)
            rho = jnp.where(admit, rho.at[slot].set(
                1.0 / jnp.where(jnp.abs(sy) > 1e-12, sy, 1.0)), rho)
            count = jnp.where(admit, count + 1, count)
            n_avail = jnp.minimum(count, m_mem)
            ks = jnp.arange(m_mem)
            slots = (count - 1 - ks) % m_mem
            mask = ks < n_avail

            def backward(q, idx):
                i, valid = idx
                a = jnp.where(valid, rho[i] * gdot(s_hist[i], q), 0.0)
                return q - a * y_hist[i], a

            q, alpha_seq = lax.scan(backward, grad_band, (slots, mask))
            last = (count - 1) % m_mem
            yy = gdot(y_hist[last], y_hist[last])
            gamma = jnp.where(
                (n_avail > 0) & (yy > 1e-12),
                (1.0 / jnp.maximum(rho[last], 1e-30))
                / jnp.maximum(yy, 1e-30), 1.0)
            gamma = jnp.clip(gamma, 1e-3, 1e3)
            r = gamma * q

            def forward(r, idx):
                i, valid, a = idx
                b = rho[i] * gdot(y_hist[i], r)
                return r + jnp.where(valid, (a - b), 0.0) * s_hist[i], None

            r, _ = lax.scan(forward, r,
                            (slots[::-1], mask[::-1], alpha_seq[::-1]))
            mv = -config.sd_step * jnp.where(initialized, r, grad_band)
            hist_len = count
            v_new = mv          # updated post-clamp below
            dt_new, alpha_new, n_good = state.dt, state.alpha, state.n_good
        else:
            # FIRE with psum'd global reductions (same math/constants as
            # steppers/first_order.fire_step over the flattened band)
            v = state.velocity
            power = lax.psum(jnp.sum(v * force), axis)
            vnorm = jnp.sqrt(lax.psum(jnp.sum(v * v), axis))
            fnorm = jnp.sqrt(lax.psum(jnp.sum(force * force), axis))
            v_mix = (1.0 - state.alpha) * v \
                + state.alpha * vnorm * force / (fnorm + 1e-8)
            downhill = power > 0.0
            accelerate = downhill & (state.n_good > 5)
            dt_new = jnp.where(
                downhill,
                jnp.where(accelerate,
                          jnp.minimum(state.dt * 1.10, config.dt_max),
                          state.dt),
                state.dt * 0.50)
            alpha_new = jnp.where(
                downhill,
                jnp.where(accelerate, state.alpha * 0.99, state.alpha),
                jnp.asarray(0.1, v.dtype))
            v_new = jnp.where(downhill, v_mix,
                              jnp.zeros_like(v)) + dt_new * force
            n_good = jnp.where(downhill, state.n_good + 1, 0)
            mv = dt_new * v_new

        mv_norm = jnp.sqrt(_image_dot(mv, mv) + 1e-30)
        mv = mv * jnp.minimum(1.0, config.max_move / mv_norm)
        fmax = lax.pmax(jnp.max(jnp.abs(force)), axis)
        if config.optimizer == "lbfgs":
            v_new = mv   # the exact (clamped) move feeds the next s-vector

        return NEBState(coords=coords_l + mv, velocity=v_new, dt=dt_new,
                        alpha=alpha_new, n_good=n_good,
                        iteration=state.iteration + 1, energies=e_l,
                        fmax=fmax, s_hist=s_hist, y_hist=y_hist, rho=rho,
                        hist_len=hist_len, prev_grad=-force)

    return jax.shard_map(local_step, mesh=mesh, in_specs=(in_specs,),
                         out_specs=in_specs)


def neb_sharded(calc, path0, z, config=NEBConfig(), mesh=None, axis="batch",
                bias_engine=None):
    """Run sharded NEB to `config.n_steps` via lax.scan (one dispatch)."""
    from multioptpy_tpu.parallel.mesh import ensemble_mesh, shard_batch

    if mesh is None:
        mesh = ensemble_mesh(axis=axis)
    state = neb_init(path0, z, calc, config)
    state = shard_batch(state, mesh, axis)
    step = neb_sharded_step(calc, z, config, mesh, axis, bias_engine)

    @jax.jit
    def run(s0):
        def body(s, _):
            s = step(s)
            return s, (s.energies, s.fmax)
        return jax.lax.scan(body, s0, None, length=config.n_steps)

    state, (e_hist, fmax_hist) = run(state)
    e_np = np.asarray(state.energies)
    ts_index = int(np.argmax(e_np[1:-1])) + 1 if len(e_np) > 2 else 0
    return NEBResult(
        path=state.coords, energies=state.energies,
        converged=jnp.asarray(float(fmax_hist[-1]) < config.fmax),
        n_iterations=config.n_steps, energy_history=np.asarray(e_hist),
        ts_index=ts_index,
    )


def adaptive_neb(calc, path0, z, config=NEBConfig(), bias_engine=None,
                 n_rounds=3, growth=1.5, focus=2.0):
    """Adaptive NEB: after each converged round the path is REPARTITIONED
    with image density concentrated around the barrier (ref: neb.py:610
    _exec_adaptive_neb + the 15 redistribution schemes of interface.py:243).

    `growth` multiplies the image count each round; `focus` exponentiates
    the energy-based density weight (higher = tighter around the TS).
    Returns the final NEBResult.
    """
    from multioptpy_tpu.interpolation import linear_resample

    path = jnp.asarray(path0)
    res = None
    for round_idx in range(n_rounds):
        res = neb(calc, path, z, config, bias_engine=bias_engine)
        if round_idx == n_rounds - 1:
            break
        e = np.asarray(res.energies)
        n_img = int(np.ceil(len(e) * growth))
        # arc-length positions of current images
        flat = np.asarray(res.path).reshape(len(e), -1)
        seg = np.linalg.norm(np.diff(flat, axis=0), axis=1)
        s = np.concatenate([[0.0], np.cumsum(seg)])
        s = s / max(s[-1], 1e-30)
        # density weight from (normalized) energy, focused around the peak
        w = (e - e.min()) / max(e.max() - e.min(), 1e-30)
        w = 0.2 + w ** focus
        # cumulative density -> new arc positions (inverse-CDF sampling)
        cdf = np.concatenate([[0.0], np.cumsum(0.5 * (w[1:] + w[:-1]) * seg)])
        cdf = cdf / max(cdf[-1], 1e-30)
        targets = np.linspace(0.0, 1.0, n_img)
        s_new = np.interp(targets, cdf, s)
        # resample the path at the new arc positions
        dense = linear_resample(res.path, 512)
        s_dense = np.linspace(0.0, 1.0, 512)
        idx = np.clip(np.searchsorted(s_dense, s_new), 0, 511)
        path = jnp.asarray(np.asarray(dense)[idx])
        path = path.at[0].set(res.path[0]).at[-1].set(res.path[-1])
    return res


def aneb_insert(path, energies, interpolation_num):
    """The reference's ANEB insertion rule, exactly (pure numpy; oracle-
    pinned in tests/test_redistribution.py).

    Around each strict interior local maximum i of `energies`, insert
    `interpolation_num` points linearly between images i-1 and i at
    fractions (j+1)/(num+1), keep image i, then the same between i and
    i+1. Non-maximum images pass through unchanged, so the image count
    grows by 2*num per maximum (ref: neb.py:609-646 _exec_adaptive_neb;
    P. Maragakis et al., J. Chem. Phys. 117, 4651 (2002)).
    """
    path = np.asarray(path)
    e = np.asarray(energies)
    n = len(e)
    # scipy.signal.argrelmax(order=1) semantics: strict > both neighbors,
    # interior points only
    maxima = {i for i in range(1, n - 1) if e[i - 1] < e[i] > e[i + 1]}
    out = []
    for i in range(n):
        if i in maxima:
            for j in range(interpolation_num):
                alpha = (j + 1) / (interpolation_num + 1)
                out.append(path[i - 1] + alpha * (path[i] - path[i - 1]))
            out.append(path[i])
            for j in range(interpolation_num):
                alpha = (j + 1) / (interpolation_num + 1)
                out.append(path[i] + alpha * (path[i + 1] - path[i]))
        else:
            out.append(path[i])
    return np.asarray(out, dtype=path.dtype)


def aneb(calc, path0, z, config=NEBConfig(), bias_engine=None,
         interpolation_num=1, frequency=5, max_images=64):
    """Adaptive NEB with the reference's -aneb semantics: every
    `frequency` iterations, densify the band around each current energy
    maximum via `aneb_insert` and RESET the optimizer state (the
    reference clears its velocity/LBFGS memory at exactly this point,
    neb.py:580-588 — here each growth event starts a fresh `neb()`
    segment, which is also where the grown static shape recompiles).

    Usage mirrors `-aneb [interpolation_num] [frequency]`
    (ref: interface.py:263). `max_images` bounds the growth so a long
    run can't compile an unbounded ladder of shapes. Climbing-image
    scheduling stays GLOBAL across growth events (the reference gates CI
    on optimize_num, which does not reset with adaptive_neb_count).
    """
    from dataclasses import replace

    path = jnp.asarray(path0)
    res = None
    steps_done = 0
    while steps_done < config.n_steps:
        seg = min(frequency, config.n_steps - steps_done)
        seg_cfg = replace(
            config, n_steps=seg,
            climbing_start=max(0, config.climbing_start - steps_done))
        res = neb(calc, path, z, seg_cfg, bias_engine=bias_engine)
        steps_done += int(res.n_iterations)
        if bool(res.converged) or steps_done >= config.n_steps:
            break
        grown = aneb_insert(np.asarray(res.path), np.asarray(res.energies),
                            interpolation_num)
        if len(grown) == len(res.path) or len(grown) > max_images:
            path = res.path          # no maxima found / at capacity:
            continue                 # keep relaxing at this size
        path = jnp.asarray(grown)
    return res


def aneb_sharded(calc, path0, z, config=NEBConfig(), bias_engine=None,
                 interpolation_num=1, frequency=5, max_images=64,
                 mesh=None, axis="batch", round_to=None):
    """Adaptive NEB with the band sharded over a device mesh.

    Same `-aneb` semantics as `aneb()` (densify around energy maxima
    every `frequency` iterations with optimizer reset, ref: neb.py:610
    _exec_adaptive_neb), but each fixed-size segment runs through
    `neb_sharded` (image axis over the mesh, ppermute halos). The
    insertion itself is a host-side re-partition between sharded
    segments; because the image axis must divide the mesh, each grown
    band is arc-length resampled up to the next mesh multiple (the
    insertion counts are a densification heuristic, so the rounding
    keeps the physics while keeping shapes shardable).
    """
    from dataclasses import replace

    from multioptpy_tpu.interpolation import linear_resample
    from multioptpy_tpu.parallel.mesh import ensemble_mesh

    if mesh is None:
        mesh = ensemble_mesh(axis=axis)
    n_dev = int(mesh.shape[axis])
    # `round_to` pins the image-count rounding independently of the mesh
    # size (parity tests compare meshes of different sizes on identical
    # host control flow); default = the mesh size, the minimum that
    # keeps shapes shardable
    mult = int(round_to) if round_to else n_dev
    mult = max(mult, n_dev)

    def to_multiple(p):
        n = p.shape[0]
        target = max(-(-n // mult) * mult, mult)
        return p if target == n else linear_resample(p, target)

    path = to_multiple(jnp.asarray(path0))
    res = None
    steps_done = 0
    while steps_done < config.n_steps:
        seg = min(frequency, config.n_steps - steps_done)
        seg_cfg = replace(
            config, n_steps=seg,
            climbing_start=max(0, config.climbing_start - steps_done))
        res = neb_sharded(calc, path, z, seg_cfg, mesh=mesh, axis=axis,
                          bias_engine=bias_engine)
        steps_done += int(res.n_iterations)
        if bool(res.converged) or steps_done >= config.n_steps:
            break
        grown = aneb_insert(np.asarray(res.path), np.asarray(res.energies),
                            interpolation_num)
        if len(grown) == len(res.path) or len(grown) > max_images:
            path = res.path
            continue
        path = to_multiple(jnp.asarray(grown))
    return res
