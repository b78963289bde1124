"""Normal-mode analysis and RRHO thermochemistry.

ref: multioptpy/Thermo/normal_mode_analyzer.py: MolecularVibrations :133,
mass-weighted modes :183, RRHO (ZPE/H/S/G) :250, rotational constants :357.
Pure jitted functions over (hessian, coords, z); frequencies follow the
quantum-chemistry convention (imaginary modes reported as negative cm^-1).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast

from multioptpy_tpu.geometry import (
    center_of_mass,
    masses_from_z,
    project_hessian_tr_rot,
)
from multioptpy_tpu.units import (
    AMU2KG,
    AU2SEC,
    BOHR2M,
    HARTREE2J,
    KB_HARTREE,
    LIGHT_SPEED_M_S,
    PLANCK_J_S,
)

# sqrt(Hartree / (Bohr^2 amu)) -> angular frequency (1/s)
_OMEGA_SI = np.sqrt(HARTREE2J / (BOHR2M ** 2 * AMU2KG))
# angular frequency -> wavenumber (cm^-1)
_TO_CM1 = 1.0 / (2.0 * np.pi * LIGHT_SPEED_M_S * 100.0)


class NormalModes(NamedTuple):
    frequencies_cm1: jnp.ndarray   # (3N,), TR/rot ~0, imaginary negative
    modes: jnp.ndarray             # (3N, N, 3) cartesian displacement modes
    eigenvalues: jnp.ndarray       # mass-weighted Hessian eigenvalues


def normal_modes(hessian, coords, z):
    """Mass-weighted, TR/rot-projected normal modes
    (ref: normal_mode_analyzer.py:183)."""
    masses = masses_from_z(jnp.asarray(z)).astype(coords.dtype)
    sm = jnp.repeat(jnp.sqrt(masses), 3)
    h_mw = hessian / sm[:, None] / sm[None, :]
    if coords.shape[0] > 1:
        # single-particle model surfaces live in the translation subspace;
        # deflate the projected zero block via the shifted eigh (the
        # 6-fold-degenerate block NaNs the TPU's emulated f64 QR —
        # ops/eigh64.py eigh_deflated)
        from multioptpy_tpu.geometry import tr_rot_projector
        from multioptpy_tpu.ops.eigh64 import eigh_deflated
        p = tr_rot_projector(coords, masses)
        h_mw = project_hessian_tr_rot(h_mw, coords, masses)
        w, v = eigh_deflated(h_mw, p)
    else:
        w, v = _eigh_fast(h_mw)
    freq = jnp.sign(w) * jnp.sqrt(jnp.abs(w)) * (_OMEGA_SI * _TO_CM1)
    n = coords.shape[0]
    cart_modes = (v / sm[:, None]).T.reshape(3 * n, n, 3)
    return NormalModes(frequencies_cm1=freq, modes=cart_modes, eigenvalues=w)


def count_imaginary(freqs_cm1, thresh=-5.0):
    """Number of true imaginary modes (below -5 cm^-1 to skip TR/rot noise)."""
    return int(jnp.sum(freqs_cm1 < thresh))


class ModeMetadata(NamedTuple):
    indices: np.ndarray          # into NormalModes arrays, sorted ascending
    frequencies_cm1: np.ndarray  # imaginary negative
    reduced_mass: np.ndarray     # amu
    force_const_dyne: np.ndarray # ref display units (normal_mode_analyzer:245)
    vib_temperature: np.ndarray  # K (|freq|; sign carried by frequency)


def mode_metadata(nm, cutoff_freq=10.0, include_imag=True):
    """Per-mode display quantities, filtered and sorted like the reference
    (ref: normal_mode_analyzer.py:236-245 metadata, :456-466 filtering:
    drop |freq| <= cutoff TR/rot residue, sort ascending so imaginary
    modes lead)."""
    freqs = np.asarray(nm.frequencies_cm1)
    if include_imag:
        keep = np.abs(freqs) > cutoff_freq
    else:
        keep = freqs > cutoff_freq
    idx = np.where(keep)[0][np.argsort(freqs[keep])]
    modes = np.asarray(nm.modes)[idx]          # (M, N, 3) cartesian
    red_mass = 1.0 / np.sum(modes * modes, axis=(1, 2))
    evals = np.asarray(nm.eigenvalues)[idx]
    dyne = 1e-2 * HARTREE2J / BOHR2M ** 2
    kb_j = KB_HARTREE * HARTREE2J
    vib_t = (np.abs(freqs[idx]) * 100.0 * LIGHT_SPEED_M_S *
             PLANCK_J_S / kb_j)
    return ModeMetadata(indices=idx, frequencies_cm1=freqs[idx],
                        reduced_mass=red_mass,
                        force_const_dyne=red_mass * evals * dyne,
                        vib_temperature=vib_t)


def write_normal_modes(nm, z, path, cutoff_freq=10.0, include_imag=True):
    """normal_modes.txt in the reference's chunked table layout
    (ref: normal_mode_analyzer.py:434-519 print_normal_modes): per chunk
    of 3 modes, rows Freq / Reduced mass / Force const / Char temp then
    per-atom x y z displacement columns."""
    from multioptpy_tpu.periodic import z_to_symbol

    meta = mode_metadata(nm, cutoff_freq, include_imag)
    modes = np.asarray(nm.modes)[meta.indices]
    syms = [z_to_symbol(int(zi)) for zi in np.asarray(z)]
    nfreq = len(meta.indices)
    lines = []
    for col0 in range(0, nfreq, 3):
        col1 = min(col0 + 3, nfreq)
        lines.append("Mode              " + "".join(
            "%20d" % i for i in range(col0, col1)))
        lines.append("Freq [cm^-1]          " + "".join(
            f"{meta.frequencies_cm1[i]:20.4f}" for i in range(col0, col1)))
        lines.append("Reduced mass [au]     " + "".join(
            f"{meta.reduced_mass[i]:20.4f}" for i in range(col0, col1)))
        lines.append("Force const [Dyne/A]  " + "".join(
            f"{meta.force_const_dyne[i]:20.4f}" for i in range(col0, col1)))
        lines.append("Char temp [K]         " + "".join(
            f"{meta.vib_temperature[i]:20.4f}" for i in range(col0, col1)))
        lines.append("Normal mode            " +
                     "       x         y         z     " * (col1 - col0))
        for j, sym in enumerate(syms):
            row = f"    {sym:>4s}               "
            for i in range(col0, col1):
                x, y, zz = modes[i, j]
                row += f"{x:10.5f}{y:10.5f}{zz:10.5f}    "
            lines.append(row)
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_mode_animations(nm, coords, z, output_dir, n_frames=20,
                          amplitude=0.5, cutoff_freq=10.0,
                          include_imag=True):
    """Per-mode vibration animation xyz files, reference naming and frame
    rule (ref: normal_mode_analyzer.py:688-737 create_animation,
    :739-769 create_all_animations): mode_{k}_{freq}_wave_number.xyz,
    sinusoidal displacement over n_frames, coordinates written in
    Angstrom. Imaginary modes get the '<mag>i' frequency tag."""
    import os

    from multioptpy_tpu.periodic import z_to_symbol
    from multioptpy_tpu.units import BOHR2ANGSTROM

    os.makedirs(output_dir, exist_ok=True)
    meta = mode_metadata(nm, cutoff_freq, include_imag)
    modes = np.asarray(nm.modes)[meta.indices]
    coords = np.asarray(coords)
    syms = [z_to_symbol(int(zi)) for zi in np.asarray(z)]
    paths = []
    for k, freq in enumerate(meta.frequencies_cm1):
        freq_str = (f"{abs(freq):.0f}i" if freq < 0.0 else f"{freq:.0f}")
        path = os.path.join(
            output_dir, f"mode_{k + 1}_{freq_str}_wave_number.xyz")
        vec = modes[k]
        with open(path, "w") as f:
            for frame in range(n_frames):
                phase = 2.0 * np.pi * frame / (n_frames - 1)
                disp = coords + amplitude * np.sin(phase) * vec
                f.write(f"{len(syms)}\n")
                f.write(f"Mode {k + 1}, Freq: {freq_str} cm-1, "
                        f"Frame: {frame + 1}/{n_frames}\n")
                for sym, (x, y, zz) in zip(syms, disp * BOHR2ANGSTROM):
                    f.write(f"{sym} {x:.6f} {y:.6f} {zz:.6f}\n")
        paths.append(path)
    return paths


def rotational_constants(coords, z):
    """Principal moments of inertia -> rotational constants (cm^-1)
    (ref: normal_mode_analyzer.py:357)."""
    masses = masses_from_z(jnp.asarray(z)).astype(coords.dtype)
    xyz = coords - center_of_mass(coords, masses)
    x, y, zz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    m = masses
    ixx = jnp.sum(m * (y * y + zz * zz))
    iyy = jnp.sum(m * (x * x + zz * zz))
    izz = jnp.sum(m * (x * x + y * y))
    ixy = -jnp.sum(m * x * y)
    ixz = -jnp.sum(m * x * zz)
    iyz = -jnp.sum(m * y * zz)
    inertia = jnp.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    moments = jnp.linalg.eigvalsh(inertia)  # amu Bohr^2
    moments_si = moments * AMU2KG * BOHR2M ** 2
    b = PLANCK_J_S / (8.0 * np.pi ** 2 * LIGHT_SPEED_M_S * 100.0 *
                      jnp.maximum(moments_si, 1e-60))
    return b, moments  # cm^-1, amu Bohr^2


class Thermochemistry(NamedTuple):
    zpe: float                 # Hartree
    e_thermal: float           # U_vib + U_rot + U_trans (incl. ZPE)
    enthalpy: float            # H = U + kT
    entropy: float             # Hartree/K
    gibbs: float               # G = H - T S
    frequencies_cm1: np.ndarray


def rrho_thermochemistry(hessian, coords, z, temperature=298.15,
                         pressure=101325.0, multiplicity=1, sigma_rot=1,
                         freq_cutoff=10.0):
    """Rigid-rotor harmonic-oscillator thermochemistry
    (ref: normal_mode_analyzer.py:250). Returns Hartree quantities.
    Modes below `freq_cutoff` cm^-1 (TR/rot residue) are dropped."""
    nm = normal_modes(hessian, coords, z)
    freqs = np.asarray(nm.frequencies_cm1)
    vib = freqs[freqs > freq_cutoff]

    kT = KB_HARTREE * temperature
    # vibrational: hbar w in Hartree = freq_cm1 * c * 100 * h / HARTREE2J
    hw = vib * LIGHT_SPEED_M_S * 100.0 * PLANCK_J_S / HARTREE2J
    zpe = float(0.5 * np.sum(hw))
    x = hw / kT
    u_vib = float(np.sum(hw * (0.5 + 1.0 / np.expm1(np.clip(x, 1e-12, 700)))))
    s_vib = float(KB_HARTREE * np.sum(
        x / np.expm1(np.clip(x, 1e-12, 700)) - np.log1p(-np.exp(-np.clip(x, 1e-12, 700)))))

    n_atoms = coords.shape[0]
    masses = np.asarray(masses_from_z(jnp.asarray(z)))
    m_total_kg = np.sum(masses) * AMU2KG

    # translation (Sackur-Tetrode)
    u_trans = 1.5 * kT
    q_trans = ((2.0 * np.pi * m_total_kg * (KB_HARTREE * HARTREE2J) *
                temperature) / PLANCK_J_S ** 2) ** 1.5 * \
        (KB_HARTREE * HARTREE2J * temperature / pressure)
    s_trans = KB_HARTREE * (np.log(q_trans) + 2.5)

    # rotation
    if n_atoms == 1:
        u_rot, s_rot = 0.0, 0.0
    else:
        b_cm, moments = rotational_constants(jnp.asarray(coords), z)
        moments = np.sort(np.asarray(moments))
        linear = moments[0] < 1e-3 * moments[2]
        b_joule = np.asarray(b_cm) * LIGHT_SPEED_M_S * 100.0 * PLANCK_J_S
        kT_j = KB_HARTREE * HARTREE2J * temperature
        if linear:
            u_rot = kT
            # the finite rotational constant belongs to the two large
            # moments; the near-zero moment's B diverges — take the min
            q_rot = kT_j / (np.min(b_joule) * sigma_rot)
            s_rot = KB_HARTREE * (np.log(q_rot) + 1.0)
        else:
            u_rot = 1.5 * kT
            q_rot = (np.sqrt(np.pi) / sigma_rot) * np.sqrt(
                kT_j ** 3 / np.prod(b_joule))
            s_rot = KB_HARTREE * (np.log(q_rot) + 1.5)

    s_elec = KB_HARTREE * np.log(max(multiplicity, 1))

    u_total = u_vib + u_rot + u_trans
    h_total = u_total + kT
    s_total = s_vib + s_rot + s_trans + s_elec
    g_total = h_total - temperature * s_total

    return Thermochemistry(
        zpe=zpe, e_thermal=u_total, enthalpy=h_total, entropy=s_total,
        gibbs=g_total, frequencies_cm1=freqs)
