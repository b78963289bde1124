"""Path interpolation & image redistribution for NEB and trajectory work.

ref: multioptpy/Interpolation/: natural cubic spline (interpolation.py:4-148),
linear, Bernstein/binomial (binomial_interpolation.py:7), geodesic
(geodesic_interpolation.py:484 Geodesic, morse-scaled internals :278) —
used by the NEB driver's image alignment (ref: neb.py:649 _align_geometries)
and the 15 redistribution schemes of the nebmain CLI (interface.py:243).

All interpolators take an (I, N, 3) path and return (J, N, 3); arc-length
parametrization uses cumulative RMS displacement between frames.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _arc_lengths(path):
    """(I,N,3) -> (I,) normalized cumulative arc length in [0, 1]."""
    seg = jnp.sqrt(jnp.sum((path[1:] - path[:-1]) ** 2, axis=(1, 2)) + 1e-30)
    s = jnp.concatenate([jnp.zeros((1,), path.dtype), jnp.cumsum(seg)])
    return s / s[-1]


def linear_resample(path, n_out):
    """Piecewise-linear resample to n_out equally-spaced-by-arc-length
    images (ref: Interpolation/linear_interpolation.py)."""
    s = _arc_lengths(path)
    t = jnp.linspace(0.0, 1.0, n_out)
    flat = path.reshape(path.shape[0], -1)
    out = jax.vmap(lambda col: jnp.interp(t, s, col), in_axes=1,
                   out_axes=1)(flat)
    return out.reshape(n_out, *path.shape[1:])


def cubic_spline_resample(path, n_out):
    """Natural cubic spline through the images, resampled uniformly in arc
    length (ref: Interpolation/interpolation.py:4-148). Solves the
    tridiagonal second-derivative system per coordinate."""
    s = np.asarray(_arc_lengths(path))
    y = np.asarray(path.reshape(path.shape[0], -1))  # (I, D)
    n = len(s)
    h = np.diff(s)  # (I-1,)

    # natural spline: tridiagonal system for second derivatives m
    a = np.zeros((n, n))
    b = np.zeros((n, y.shape[1]))
    a[0, 0] = a[-1, -1] = 1.0
    for i in range(1, n - 1):
        a[i, i - 1] = h[i - 1]
        a[i, i] = 2.0 * (h[i - 1] + h[i])
        a[i, i + 1] = h[i]
        b[i] = 6.0 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    m = np.linalg.solve(a, b)  # (I, D)

    t = np.linspace(0.0, 1.0, n_out)
    idx = np.clip(np.searchsorted(s, t) - 1, 0, n - 2)
    dt = t - s[idx]
    hi = h[idx][:, None]
    yi, yi1 = y[idx], y[idx + 1]
    mi, mi1 = m[idx], m[idx + 1]
    dtc = dt[:, None]
    out = (mi * (hi - dtc) ** 3 + mi1 * dtc ** 3) / (6.0 * hi) \
        + (yi / hi - mi * hi / 6.0) * (hi - dtc) \
        + (yi1 / hi - mi1 * hi / 6.0) * dtc
    return jnp.asarray(out.reshape(n_out, *path.shape[1:]),
                       dtype=path.dtype)


def bernstein_resample(path, n_out):
    """Bezier/Bernstein-polynomial smoothing through the control images
    (ref: Interpolation/binomial_interpolation.py:7)."""
    i = path.shape[0]
    t = jnp.linspace(0.0, 1.0, n_out)[:, None]
    k = jnp.arange(i)[None, :]
    from jax.scipy.special import gammaln
    log_binom = (gammaln(i) - gammaln(k + 1.0) - gammaln(i - k))
    # Bernstein basis B_{k,n-1}(t)
    eps = 1e-12
    log_b = log_binom + k * jnp.log(t + eps) + (i - 1 - k) * jnp.log(1 - t + eps)
    w = jnp.exp(log_b)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    flat = path.reshape(i, -1)
    out = w @ flat
    # pin the endpoints exactly
    out = out.at[0].set(flat[0]).at[-1].set(flat[-1])
    return out.reshape(n_out, *path.shape[1:])


def savitzky_golay_smooth(path, window=5, order=2):
    """Polynomial smoothing of the path, endpoints fixed
    (ref: Interpolation/savitzky_golay_interpolation.py)."""
    from scipy.signal import savgol_filter
    p = np.asarray(path)
    if p.shape[0] < window:
        return jnp.asarray(p)
    sm = savgol_filter(p, window, order, axis=0)
    sm[0], sm[-1] = p[0], p[-1]
    return jnp.asarray(sm, dtype=path.dtype)


def geodesic_resample(path, n_out, z=None, n_iter=60, alpha=1.7):
    """Geodesic-flavoured redistribution: resample, then relax interior
    images to minimize the sum of squared MORSE-scaled internal-coordinate
    jumps between neighbors (Zhu et al., JCTC 15 (2019) 5787;
    ref: Interpolation/geodesic_interpolation.py:278 morse-scaled internals).
    Pairwise exp(-alpha (r/r0 - 1)) + r0/r coordinates over all atom pairs.
    """
    from multioptpy_tpu.periodic import COVALENT_RADII_1

    path0 = linear_resample(path, n_out)
    n_atoms = path0.shape[1]
    if z is not None:
        radii = np.asarray(COVALENT_RADII_1)[np.asarray(z)]
        r0 = radii[:, None] + radii[None, :]
    else:
        r0 = np.full((n_atoms, n_atoms), 3.0)
    r0 = jnp.asarray(r0)
    iu = jnp.triu_indices(n_atoms, 1)

    def wcoords(x):
        d = x[:, None, :] - x[None, :, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        w = jnp.exp(-alpha * (r / r0 - 1.0)) + 0.1 * r0 / r
        return w[iu]

    def objective(interior):
        full = jnp.concatenate([path0[:1], interior, path0[-1:]], axis=0)
        qs = jax.vmap(wcoords)(full)
        return jnp.sum((qs[1:] - qs[:-1]) ** 2)

    grad_fn = jax.grad(objective)

    @jax.jit
    def run(interior):
        def body(carry, _):
            x, v, dt = carry
            g = grad_fn(x)
            power = jnp.sum(-g * v)
            v = jnp.where(power > 0, 0.9 * v - dt * g, -dt * g)
            dtn = jnp.where(power > 0, jnp.minimum(dt * 1.05, 0.2), dt * 0.5)
            return (x + dtn * v, v, dtn), None

        (x, _, _), _ = jax.lax.scan(
            body, (interior, jnp.zeros_like(interior),
                   jnp.asarray(0.02, path0.dtype)), None, length=n_iter)
        return x

    interior = run(path0[1:-1])
    return jnp.concatenate([path0[:1], interior, path0[-1:]], axis=0)


RESAMPLERS = {
    "linear": linear_resample,
    "spline": cubic_spline_resample,
    "bernstein": bernstein_resample,
    "geodesic": geodesic_resample,
}


def bernstein_energy_resample(path, energies, n_out=None, concentration=2.0):
    """Energy-weighted Bernstein redistribution (ref:
    Interpolation/binomial_interpolation distribute_geometry_by_energy
    _bernstein): Bezier-smooth the path, then place images by inverse-CDF
    sampling of an energy-concentrated density so images crowd the
    barrier."""
    path_np = np.asarray(path)
    energies = np.asarray(energies)
    n_old = len(path_np)
    n_out = n_old if n_out is None else int(n_out)
    flat = path_np.reshape(n_old, -1)
    seg = np.linalg.norm(np.diff(flat, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if s[-1] < 1e-12:
        return jnp.asarray(path_np)
    s /= s[-1]
    e_rng = energies.max() - energies.min()
    if e_rng > 1e-12:
        e_sc = np.interp(np.linspace(0, 1, 400), s,
                         (energies - energies.min()) / e_rng)
        w = 1.0 + concentration * (np.exp(2.0 * e_sc) - 1.0)
    else:
        w = np.ones(400)
    sf = np.linspace(0.0, 1.0, 400)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (w[1:] + w[:-1])
                                           * np.diff(sf))])
    cdf /= cdf[-1]
    t_new = np.interp(np.linspace(0.0, 1.0, n_out), cdf, sf)
    # Bernstein basis evaluated at the energy-concentrated parameters
    k = np.arange(n_old)
    from scipy.special import gammaln
    log_binom = gammaln(n_old) - gammaln(k + 1.0) - gammaln(n_old - k)
    eps = 1e-12
    log_b = (log_binom[None, :] + k[None, :] * np.log(t_new[:, None] + eps)
             + (n_old - 1 - k)[None, :] * np.log(1 - t_new[:, None] + eps))
    wgt = np.exp(log_b)
    wgt /= wgt.sum(axis=1, keepdims=True)
    out = (wgt @ flat).reshape(n_out, *path_np.shape[1:])
    out[0], out[-1] = path_np[0], path_np[-1]
    return jnp.asarray(out)


#: scheme-name registry for the IN-LOOP NEB image redistribution
#: (ref: neb.py:572 -> 649 _align_geometries and the nebmain -ad* flags,
#: interface.py:267-287). Every scheme keeps the image count fixed; the
#: -nd node-distance family (which changes the count) is handled at path
#: construction / round level instead.
REDISTRIBUTION_SCHEMES = (
    "linear",            # -ad    equal arc-length intervals
    "energy",            # -adene energy-weighted intervals
    "pred",              # -adpred cubic predicted (gradient-corrected)
    "ritz",              # -adrpred B-spline Ritz (gradient-corrected)
    "spline",            # -ads   cubic-spline equal intervals
    "spline2",           # -ads2  spline ver.2
    "geodesic",          # -adg   geodesic (morse-scaled internals)
    "bernstein",         # -adb   Bernstein smoothing
    "bernstein_energy",  # -adbene energy-weighted Bernstein
    "adaptive",          # -adadene adaptive geometry+energy (hidden TS)
    "savgol",            # -adsg  Savitzky-Golay smoothing
)


def redistribute_path(path, scheme, energies=None, gradients=None, z=None,
                      savgol_window=5, savgol_order=3):
    """Apply one in-loop redistribution scheme to an (I,N,3) path, keeping
    the image count. Dispatcher for the reference's `_align_geometries`
    strategies (ref: neb.py:649-770)."""
    n = path.shape[0]
    if scheme == "linear":
        return linear_resample(path, n)
    if scheme in ("spline", "spline2"):
        return cubic_spline_resample(path, n)
    if scheme == "bernstein":
        return bernstein_resample(path, n)
    if scheme == "geodesic":
        return geodesic_resample(path, n, z=z, n_iter=30)
    if scheme == "savgol":
        return savitzky_golay_smooth(path, window=savgol_window,
                                     order=savgol_order)
    if scheme == "energy":
        return ritz_resample(path, energies, n_out=n, gradients=None)
    if scheme in ("pred", "ritz"):
        return ritz_resample(path, energies, n_out=n, gradients=gradients)
    if scheme == "bernstein_energy":
        return bernstein_energy_resample(path, energies, n_out=n)
    if scheme == "adaptive":
        return adaptive_resample(path, energies, gradients, n_out=n)
    raise ValueError(f"unknown redistribution scheme '{scheme}' "
                     f"(choose from {REDISTRIBUTION_SCHEMES})")


def ritz_resample(path, energies, n_out=None, gradients=None,
                  concentration=2.0):
    """B-spline Ritz redistribution (ref:
    Interpolation/ritz_interpolation.py:77 distribute_geometry_bspline_ritz):
    cubic-spline the geometry AND the energy along normalized arc length,
    then place images by inverse-CDF sampling of the density
    w(s) = 1 + c (exp(2 E_scaled(s)) - 1) — concentrated around the barrier
    for c > 0, uniform arc spacing for c = 0. Host-side (used between NEB
    rounds, like the reference)."""
    path = np.asarray(path)
    energies = np.asarray(energies)
    n_old = len(path)
    n_out = n_old if n_out is None else int(n_out)
    flat = path.reshape(n_old, -1)
    seg = np.linalg.norm(np.diff(flat, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if s[-1] < 1e-12 or n_old < 4:
        return jnp.asarray(path)
    s = s / s[-1]

    from scipy.interpolate import CubicSpline
    geom_sp = CubicSpline(s, flat, axis=0)
    if gradients is not None:
        # gradient-corrected energy spline: Hermite with projected dE/ds
        g = np.asarray(gradients).reshape(n_old, -1)
        tan = np.gradient(flat, s, axis=0)
        tn = np.linalg.norm(tan, axis=1, keepdims=True)
        tn[tn < 1e-12] = 1.0
        dE_ds = np.sum(g * tan / tn, axis=1) * np.sum(seg)
        from scipy.interpolate import CubicHermiteSpline
        e_sp = CubicHermiteSpline(s, energies, dE_ds)
    else:
        e_sp = CubicSpline(s, energies)

    s_fine = np.linspace(0.0, 1.0, 1000)
    e_fine = e_sp(s_fine)
    e_rng = e_fine.max() - e_fine.min()
    if concentration > 1e-3 and e_rng > 1e-12:
        e_sc = (e_fine - e_fine.min()) / e_rng
        w = 1.0 + concentration * (np.exp(2.0 * e_sc) - 1.0)
    else:
        w = np.ones_like(s_fine)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (w[1:] + w[:-1])
                                           * np.diff(s_fine))])
    cdf /= cdf[-1]
    s_new = np.interp(np.linspace(0.0, 1.0, n_out), cdf, s_fine)
    out = geom_sp(s_new).reshape(n_out, *path.shape[1:])
    out[0], out[-1] = path[0], path[-1]
    return jnp.asarray(out)


def adaptive_resample(path, energies, gradients, n_out=None,
                      boost_factor=2.0):
    """Hidden-TS adaptive redistribution (ref:
    Interpolation/adaptive_interpolation.py:46 predict_hidden_ts_weights +
    :127): fit a cubic Hermite E(t) on each segment from endpoint energies
    and path-projected gradients; segments whose cubic has an INTERIOR local
    maximum (a TS the discrete images straddle) get their image-density
    weight boosted by `boost_factor`. Host-side."""
    path = np.asarray(path)
    energies = np.asarray(energies)
    gradients = np.asarray(gradients).reshape(len(path), -1)
    n_old = len(path)
    n_out = n_old if n_out is None else int(n_out)
    flat = path.reshape(n_old, -1)
    seg_vec = np.diff(flat, axis=0)
    seg_len = np.linalg.norm(seg_vec, axis=1)
    weights = np.ones(n_old - 1)
    for i in range(n_old - 1):
        L = seg_len[i]
        if L < 1e-8:
            continue
        u = seg_vec[i] / L
        e0, e1 = energies[i], energies[i + 1]
        d0 = np.dot(gradients[i], u) * L          # dE/dt at t=0
        d1 = np.dot(gradients[i + 1], u) * L
        # cubic Hermite h(t) = a3 t^3 + a2 t^2 + a1 t + a0 on t in [0,1]
        a3 = 2 * (e0 - e1) + d0 + d1
        a2 = -3 * (e0 - e1) - 2 * d0 - d1
        a1 = d0
        disc = a2 ** 2 - 3 * a3 * a1
        if disc <= 0:
            continue
        for root in ((-a2 + np.sqrt(disc)) / (3 * a3 + 1e-30),
                     (-a2 - np.sqrt(disc)) / (3 * a3 + 1e-30)):
            if 0.05 < root < 0.95:
                curv = 6 * a3 * root + 2 * a2
                if curv < 0:                       # interior local MAX
                    weights[i] += boost_factor
                    break
    # inverse-CDF over boosted segment density
    density = weights * seg_len
    cdf = np.concatenate([[0.0], np.cumsum(density)])
    cdf /= cdf[-1]
    s_cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    s_cum /= s_cum[-1]
    targets = np.linspace(0.0, 1.0, n_out)
    s_new = np.interp(targets, cdf, s_cum)
    # linear geometry interpolation at the new arc positions
    out = np.empty((n_out, flat.shape[1]))
    for d in range(flat.shape[1]):
        out[:, d] = np.interp(s_new, s_cum, flat[:, d])
    out = out.reshape(n_out, *path.shape[1:])
    out[0], out[-1] = path[0], path[-1]
    return jnp.asarray(out)
