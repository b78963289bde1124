"""Extra file formats, PBC utilities, QSM string method, MD SHAKE."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.io.formats import read_any, read_gjf, read_mol, read_mol2
from multioptpy_tpu.pbc import (
    minimum_image_displacement,
    pairwise_distances_pbc,
    wrap_coordinates,
)


class TestFormats:
    def test_gjf(self, tmp_path):
        p = tmp_path / "m.gjf"
        p.write_text("""#p b3lyp/6-31g* opt

title line

0 1
O  0.0 0.0 0.0
H  0.0 0.0 0.96
H  0.93 0.0 -0.24

""")
        s, c, q, m = read_gjf(str(p))
        assert s == ["O", "H", "H"]
        assert q == 0 and m == 1
        assert c.shape == (3, 3)

    def test_mol(self, tmp_path):
        p = tmp_path / "m.mol"
        p.write_text("""water
  prog
 comment
  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 O   0  0
    0.0000    0.0000    0.9600 H   0  0
    0.9300    0.0000   -0.2400 H   0  0
  1  2  1  0
  1  3  1  0
M  END
""")
        s, c, q, m = read_mol(str(p))
        assert s == ["O", "H", "H"]
        np.testing.assert_allclose(c[1, 2], 0.96)

    def test_mol2(self, tmp_path):
        p = tmp_path / "m.mol2"
        p.write_text("""@<TRIPOS>MOLECULE
water
 3 2
SMALL
@<TRIPOS>ATOM
      1 O1   0.0000 0.0000 0.0000 O.3   1 WAT -0.8
      2 H1   0.0000 0.0000 0.9600 H     1 WAT  0.4
      3 H2   0.9300 0.0000 -0.240 H     1 WAT  0.4
@<TRIPOS>BOND
     1 1 2 1
     2 1 3 1
""")
        s, c, q, m = read_mol2(str(p))
        assert s == ["O", "H", "H"]

    def test_read_any_orca_inp(self, tmp_path):
        p = tmp_path / "m.inp"
        p.write_text("""! B3LYP def2-SVP
* xyz -1 2
O 0.0 0.0 0.0
H 0.0 0.0 0.96
*
""")
        s, c, q, m = read_any(str(p))
        assert s == ["O", "H"]
        assert q == -1 and m == 2


class TestPBC:
    def test_wrap_and_minimum_image(self):
        cell = jnp.eye(3) * 10.0
        coords = jnp.array([[11.0, -1.0, 5.0]])
        wrapped = wrap_coordinates(coords, cell)
        np.testing.assert_allclose(np.asarray(wrapped), [[1.0, 9.0, 5.0]])
        d = jnp.array([[9.0, 0.0, 0.0]])
        mic = minimum_image_displacement(d, cell)
        np.testing.assert_allclose(np.asarray(mic), [[-1.0, 0.0, 0.0]])

    def test_pbc_distances(self):
        cell = jnp.eye(3) * 8.0
        coords = jnp.array([[0.5, 0.0, 0.0], [7.5, 0.0, 0.0]])
        d = pairwise_distances_pbc(coords, cell)
        assert float(d[0, 1]) == pytest.approx(1.0, abs=1e-10)


def test_string_method_on_muller_brown():
    from multioptpy_tpu.calculators.model_surfaces import MB_MIN_A, MB_MIN_C, MullerBrown
    from multioptpy_tpu.drivers.neb import NEBConfig, interpolate_linear, neb

    calc = MullerBrown()
    start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    res = neb(calc, interpolate_linear(start, end, 12), jnp.array([1]),
              NEBConfig(variant="qsm", n_steps=200, dt0=0.03, dt_max=0.2,
                        fmax=5e-4))
    e = np.asarray(res.energies)
    assert e[res.ts_index] > max(e[0], e[-1])
    # images stay equally spaced (string reparametrization)
    seg = np.linalg.norm(np.diff(np.asarray(res.path).reshape(12, -1),
                                 axis=0), axis=1)
    assert seg.std() / seg.mean() < 0.1


def test_md_with_shake_constraint():
    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.constraints import Constraints
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.periodic import UFF_VDW_R

    rmin = float(UFF_VDW_R[18])
    coords = jnp.array([[0.0, 0.0, 0.0], [rmin, 0.0, 0.0],
                        [rmin / 2, rmin, 0.0]])
    z = jnp.array([18, 18, 18])
    r_fix_ang = rmin * 0.52917721067
    cons = Constraints(bonds=[(1, 2, r_fix_ang)], n_atoms=3)
    res = run_md(LennardJones(), coords, z, MDConfig(
        timestep_fs=2.0, n_steps=200, temperature=40.0,
        thermostat="langevin", seed=4), constraints=cons)
    # constrained bond stays at its target along the whole trajectory
    d = np.linalg.norm(res.trajectory[:, 0] - res.trajectory[:, 1], axis=1)
    np.testing.assert_allclose(d, rmin, atol=1e-6)


def test_read_xyz_reference_internal_format(tmp_path):
    """The reference's internal headerless format — "charge mult" first
    line, atom lines directly after (e.g. test/aldol_rxn/_0.xyz) — parses
    alongside standard xyz."""
    from multioptpy_tpu.io import read_xyz

    p = tmp_path / "frame.xyz"
    p.write_text("0 1\nC 0.0 0.0 0.0\nO 1.2 0.0 0.0\n")
    s, c = read_xyz(str(p))
    assert s == ["C", "O"]
    assert c.shape == (2, 3)
    # the reference's own fixture
    s2, c2 = read_xyz("/root/reference/test/aldol_rxn/_0.xyz")
    assert len(s2) == 11 and c2.shape == (11, 3)
