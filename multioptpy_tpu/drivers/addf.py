"""ADDF — anharmonic-downward-distortion following (scaled hypersphere search).

ref: multioptpy/OtherMethod/addf.py:12 (1150 LoC) and twopshs.py:12: from an
equilibrium structure, reaction channels appear as anharmonic downward
distortions (ADDs) of the PES — directions where the true energy falls below
the harmonic reference. The SHS algorithm (Ohno & Maeda, CPL 384 (2004) 277)
finds them as minima of the scaled energy on growing hyperspheres around
the minimum and follows each outward until a transition state is crossed.

Implementation:
  1. Harmonic reference from the Hessian at the minimum; positions are
     scaled by sqrt of the harmonic eigenvalues so the reference becomes an
     isotropic paraboloid (the "scaled" in SHS).
  2. Channel seeds: +/- the softest vibrational eigenvectors.
  3. On each sphere |q| = r (scaled coords), minimize the energy with the
     radial direction projected out (fixed-iteration projected FIRE).
  4. Grow r; a channel has crossed its TS when the energy starts falling.

Returns per-channel paths and TS guesses ready for `refine_saddle`.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.geometry import project_hessian_tr_rot
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast


@dataclasses.dataclass(frozen=True)
class ADDFConfig:
    n_channels: int = 4          # follow the 2*k softest modes -> k pairs
    r_start: float = 0.3         # initial hypersphere radius (scaled coords)
    r_step: float = 0.15
    n_spheres: int = 40
    n_relax: int = 60            # on-sphere projected FIRE steps
    relax_rate: float = 0.4
    eig_floor: float = 1e-4      # vibrational-mode cutoff (TR/rot excluded)
    max_rise: float = 0.8        # Hartree above the minimum: abandon the
                                 # channel as a repulsive-wall escape


class ADDFChannel(NamedTuple):
    path: np.ndarray             # (S,N,3) cartesian
    energies: np.ndarray
    ts_guess: np.ndarray
    ts_energy: float
    crossed_ts: bool


def addf_search(calc, coords, z, config=ADDFConfig(), bias_engine=None):
    """-> list[ADDFChannel], one per followed ADD (3.x OtherMethod stack)."""
    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    n = coords.shape[0]
    dtype = coords.dtype

    def energy(x):
        e = calc.energy(x, z)
        if bias_engine is not None and len(bias_engine):
            e = e + bias_engine.total_energy(x)
        return e

    # scaled coordinates q = S Vvib^T (x - x0), S = diag(sqrt(w_vib)),
    # restricted to the VIBRATIONAL subspace (ref: addf.py scaled
    # hypersphere construction — the reference's SHS works in the 3N-6
    # normal coordinates; keeping TR/rot directions in the sphere lets the
    # on-sphere minimizer spend the whole radius on zero-cost rigid
    # motions amplified 1/sqrt(floor) in cartesians)
    h = calc.hessian(coords, z)
    if bias_engine is not None and len(bias_engine):
        h = h + bias_engine.hessian(coords)
    if n > 1:
        from multioptpy_tpu.geometry import tr_rot_projector
        from multioptpy_tpu.ops.eigh64 import eigh_deflated
        p = tr_rot_projector(coords)
        h = project_hessian_tr_rot(h, coords)
        w, v = eigh_deflated(0.5 * (h + h.T), p)
        # TR/rot removal is by MODE COUNT (rank of I - P: the deflated
        # modes sit at ~0 after eigh_deflated), not by an eigenvalue
        # cutoff — a cutoff would silently drop genuine soft vibrational
        # modes (low-frequency torsions), and for floppy molecules the
        # softest channels are often the reaction channels. eig_floor
        # only floors the SCALE below so soft modes don't blow up the
        # cartesian mapping.
        n_trrot = int(round(float(np.trace(np.eye(3 * n) - np.asarray(p)))))
        w_np, v_np = np.asarray(w), np.asarray(v)
        vib = np.zeros(3 * n, dtype=bool)
        vib[n_trrot:] = True                        # ascending order
    else:
        w, v = _eigh_fast(0.5 * (h + h.T))
        w_np, v_np = np.asarray(w), np.asarray(v)
        vib = w_np > config.eig_floor
    v_vib = jnp.asarray(v_np[:, vib])              # (3N, m)
    scale = jnp.sqrt(jnp.asarray(
        np.maximum(w_np[vib], config.eig_floor)))   # (m,) floored scale
    w_vib = w_np[vib]

    x0_flat = coords.reshape(-1)

    def to_cart(q):
        return (x0_flat + v_vib @ (q / scale)).reshape(n, 3)

    def energy_q(q):
        return energy(to_cart(q))

    grad_q = jax.grad(energy_q)

    @jax.jit
    def relax_on_sphere(q, r):
        """Projected FIRE on the sphere |q| = r."""
        def body(carry, _):
            q, vel, dt = carry
            g = grad_q(q)
            q_hat = q / (jnp.linalg.norm(q) + 1e-30)
            g_t = g - jnp.dot(g, q_hat) * q_hat  # tangential component
            power = jnp.sum(-g_t * vel)
            vel = jnp.where(power > 0, 0.9 * vel - dt * g_t, -dt * g_t)
            q = q + dt * vel
            q = q * (r / (jnp.linalg.norm(q) + 1e-30))  # retract to sphere
            return (q, vel, dt), None

        (q, _, _), _ = jax.lax.scan(
            body, (q, jnp.zeros_like(q), jnp.asarray(config.relax_rate, dtype)),
            None, length=config.n_relax)
        return q, energy_q(q)

    # seeds: softest vibrational modes, both signs (unit vectors in the
    # m-dimensional scaled vibrational space)
    order = np.argsort(w_vib)
    n_pairs = max(config.n_channels // 2, 1)
    seeds = []
    for k in range(min(n_pairs, len(w_vib))):
        e_k = jnp.zeros(len(w_vib), coords.dtype).at[
            int(order[k])].set(1.0)
        seeds.extend([e_k, -e_k])

    channels = []
    e0 = float(energy(coords))
    for seed in seeds[: config.n_channels]:
        q = seed * config.r_start
        path = [np.asarray(coords)]
        energies = [e0]
        crossed = False
        ts_guess, ts_energy = np.asarray(coords), e0
        r = config.r_start
        for _ in range(config.n_spheres):
            q, e_q = relax_on_sphere(q, jnp.asarray(r, dtype))
            path.append(np.asarray(to_cart(q)))
            energies.append(float(e_q))
            if len(energies) > 2 and energies[-1] < energies[-2]:
                # energy turned over: the channel crossed its TS
                crossed = True
                ts_idx = int(np.argmax(energies))
                ts_guess = path[ts_idx]
                ts_energy = energies[ts_idx]
                break
            if energies[-1] > e0 + config.max_rise:
                # repulsive-wall / dissociation escape, no TS this way
                break
            # grow the sphere, carrying the channel direction outward
            r += config.r_step
            q = q * (r / float(jnp.linalg.norm(q)))
        if not crossed:
            ts_idx = int(np.argmax(energies))
            ts_guess, ts_energy = path[ts_idx], energies[ts_idx]
        channels.append(ADDFChannel(
            path=np.stack(path), energies=np.asarray(energies),
            ts_guess=np.asarray(ts_guess), ts_energy=ts_energy,
            crossed_ts=crossed))
    return channels


class ADDFTransitionState(NamedTuple):
    coords: np.ndarray
    energy: float
    n_imaginary: int
    converged: bool
    channel: int                 # which ADD channel produced it


def addf_explore(calc, coords, z, config=ADDFConfig(), saddle_config=None,
                 bias_engine=None, dedupe_rmsd=0.2, refine_all=False):
    """Reference-style ADDF driver: multi-channel ADD following with
    per-channel TS refinement hand-off (ref: OtherMethod/addf.py:12 — the
    reference follows each ADD outward, re-optimizes the crossing as a
    saddle, and collects the distinct transition states; its 1150-LoC
    driver interleaves these phases per channel, here they pipeline:
    search all channels, refine each crossing, dedupe by aligned RMSD).

    Returns (ts_list, channels): `ts_list` holds distinct refined
    first-order saddles sorted by energy; `channels` is the raw
    `addf_search` output for inspection."""
    from multioptpy_tpu.analysis import normal_modes
    from multioptpy_tpu.analysis.vibrations import count_imaginary
    from multioptpy_tpu.geometry import align_to
    from multioptpy_tpu.workflows.autots import refine_saddle

    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    channels = addf_search(calc, coords, z, config=config,
                           bias_engine=bias_engine)
    ts_list = []
    for idx, ch in enumerate(channels):
        if not (ch.crossed_ts or refine_all):
            continue
        res = refine_saddle(calc, jnp.asarray(ch.ts_guess, coords.dtype),
                            z, config=saddle_config,
                            bias_engine=bias_engine)
        h = calc.hessian(res.coords, z)
        if bias_engine is not None and len(bias_engine):
            h = h + bias_engine.hessian(res.coords)
        n_imag = int(count_imaginary(
            normal_modes(h, res.coords, z).frequencies_cm1))
        cand = ADDFTransitionState(
            coords=np.asarray(res.coords), energy=float(res.energy),
            n_imaginary=n_imag, converged=bool(res.converged),
            channel=idx)
        # dedupe: aligned RMSD against the saddles already kept (the
        # reference dedupes revisited channels by structure comparison)
        dup = False
        for kept in ts_list:
            aligned = np.asarray(align_to(
                jnp.asarray(cand.coords), jnp.asarray(kept.coords)))
            rmsd = float(np.sqrt(np.mean(
                np.sum((aligned - kept.coords) ** 2, axis=1))))
            if rmsd < dedupe_rmsd and abs(cand.energy - kept.energy) < 1e-4:
                dup = True
                break
        if not dup:
            ts_list.append(cand)
    ts_list.sort(key=lambda t: t.energy)
    return ts_list, channels
