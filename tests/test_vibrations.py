"""Normal modes and RRHO thermochemistry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.analysis import (
    normal_modes,
    rotational_constants,
    rrho_thermochemistry,
)
from multioptpy_tpu.analysis.vibrations import count_imaginary
from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.periodic import MASS_AMU, UFF_VDW_EPS, UFF_VDW_R
from multioptpy_tpu.units import (
    AMU2KG,
    BOHR2M,
    HARTREE2J,
    LIGHT_SPEED_M_S,
)

RMIN = float(UFF_VDW_R[18])


@pytest.fixture(scope="module")
def ar2():
    coords = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, RMIN]])
    z = jnp.array([18, 18])
    calc = LennardJones()
    h = calc.hessian(coords, z)
    return calc, coords, z, h


class TestNormalModes:
    def test_ar2_single_stretch_frequency(self, ar2):
        calc, coords, z, h = ar2
        nm = normal_modes(h, coords, z)
        freqs = np.asarray(nm.frequencies_cm1)
        # 3N = 6; 5 TR/rot zeros + 1 stretch
        assert np.sum(np.abs(freqs) < 1.0) == 5
        stretch = freqs[np.abs(freqs) >= 1.0]
        assert len(stretch) == 1
        # analytic: nu = sqrt(k/mu)/(2 pi c); k from 1-D second difference
        eps_b = 1e-4
        r = RMIN
        e = lambda rr: float(calc.energy(
            jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, rr]]), z))
        k = (e(r + eps_b) - 2 * e(r) + e(r - eps_b)) / eps_b ** 2  # Ha/Bohr^2
        mu = MASS_AMU[18] / 2.0
        omega = np.sqrt(k * HARTREE2J / (BOHR2M ** 2) / (mu * AMU2KG))
        nu_cm1 = omega / (2 * np.pi * LIGHT_SPEED_M_S * 100.0)
        assert float(stretch[0]) == pytest.approx(nu_cm1, rel=1e-3)

    def test_imaginary_mode_detection(self, ar2):
        calc, coords, z, h = ar2
        # compressed dimer: inside the inflection the stretch is still real;
        # flip the Hessian sign to fabricate an imaginary mode
        nm = normal_modes(-h, coords, z)
        assert count_imaginary(nm.frequencies_cm1) == 1

    def test_rotational_constants_ar2(self, ar2):
        calc, coords, z, h = ar2
        b, moments = rotational_constants(coords, z)
        m = np.sort(np.asarray(moments))
        # linear molecule: one ~zero moment, two equal
        assert m[0] < 1e-8
        assert m[1] == pytest.approx(m[2], rel=1e-10)
        mu = MASS_AMU[18] / 2.0
        assert m[1] == pytest.approx(mu * RMIN ** 2, rel=1e-10)


class TestModeArtifacts:
    """normal_modes.txt + per-mode animation xyz (ref
    normal_mode_analyzer.py:434 print_normal_modes, :688 animations)."""

    def test_mode_metadata_ar2(self, ar2):
        from multioptpy_tpu.analysis.vibrations import (
            mode_metadata, normal_modes)
        calc, coords, z, h = ar2
        nm = normal_modes(h, coords, z)
        meta = mode_metadata(nm)
        # TR/rot filtered: only the stretch survives
        assert len(meta.indices) == 1
        # the reference's convention mu = 1/sum|l_cart|^2
        # (normal_mode_analyzer.py:236) gives m (not the physical m/2)
        # for a homonuclear diatomic stretch
        assert meta.reduced_mass[0] == pytest.approx(
            MASS_AMU[18], rel=1e-6)
        assert meta.vib_temperature[0] > 0.0
        assert meta.force_const_dyne[0] > 0.0

    def test_write_artifacts(self, ar2, tmp_path):
        from multioptpy_tpu.analysis.vibrations import (
            normal_modes, write_mode_animations, write_normal_modes)
        calc, coords, z, h = ar2
        nm = normal_modes(h, coords, z)
        txt = write_normal_modes(nm, z, tmp_path / "normal_modes.txt")
        body = open(txt).read()
        assert "Freq [cm^-1]" in body and "Reduced mass [au]" in body
        assert body.count("Ar") == 2
        paths = write_mode_animations(nm, coords, z,
                                      tmp_path / "anim", n_frames=5)
        assert len(paths) == 1
        assert "_wave_number.xyz" in paths[0]
        frames = open(paths[0]).read().strip().split("\n")
        assert len(frames) == 5 * 4  # natoms line + comment + 2 atoms
        # first frame is the undisplaced geometry (sin 0 = 0)
        x0 = [float(v) for v in frames[2].split()[1:]]
        assert x0 == pytest.approx([0.0, 0.0, 0.0], abs=1e-9)

    def test_imaginary_mode_animation_named_i(self, ar2, tmp_path):
        from multioptpy_tpu.analysis.vibrations import (
            normal_modes, write_mode_animations)
        calc, coords, z, h = ar2
        nm = normal_modes(-h, coords, z)
        paths = write_mode_animations(nm, coords, z, tmp_path / "anim",
                                      n_frames=3)
        assert any("i_wave_number.xyz" in p for p in paths)


class TestThermochemistry:
    def test_argon_atom_sackur_tetrode(self):
        coords = jnp.zeros((1, 3))
        z = jnp.array([18])
        h = jnp.zeros((3, 3))
        th = rrho_thermochemistry(h, coords, z)
        # Sackur-Tetrode for Ar at 298.15 K, 1 atm: S = 154.85 J/mol/K
        s_jmol = th.entropy * 2625500.0
        assert s_jmol == pytest.approx(154.85, rel=2e-3)
        assert th.zpe == 0.0

    def test_ar2_rrho_consistency(self, ar2):
        calc, coords, z, h = ar2
        th = rrho_thermochemistry(h, coords, z, sigma_rot=2)
        assert th.zpe > 0.0
        assert th.gibbs < th.enthalpy
        assert th.entropy > 0.0
        assert np.isfinite(th.e_thermal)
