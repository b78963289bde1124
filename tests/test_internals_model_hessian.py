"""Internal coordinates (autodiff Wilson B) and model Hessians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.coords import InternalCoordinates, auto_internals, detect_primitives
from multioptpy_tpu.hessian.model import (
    MODEL_HESSIAN_KINDS,
    model_hessian,
    smooth_eigenvalues,
)
from multioptpy_tpu.units import ANGSTROM2BOHR


@pytest.fixture(scope="module")
def water():
    coords = jnp.asarray(np.array([
        [0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692], [0.0, -0.7572, -0.4692],
    ]) * ANGSTROM2BOHR)
    z = np.array([8, 1, 1])
    return coords, z


@pytest.fixture(scope="module")
def h2o2():
    # non-planar H2O2: includes a torsion primitive
    coords = jnp.asarray(np.array([
        [0.0, 0.73, -0.05], [0.0, -0.73, -0.05],
        [0.83, 0.88, 0.44], [-0.83, -0.88, 0.44],
    ]) * ANGSTROM2BOHR)
    z = np.array([8, 8, 1, 1])
    return coords, z


class TestPrimitives:
    def test_water_detection(self, water):
        coords, z = water
        bonds, angles, torsions = detect_primitives(np.asarray(coords), z)
        assert len(bonds) == 2
        assert len(angles) == 1
        assert len(torsions) == 0

    def test_h2o2_has_torsion(self, h2o2):
        coords, z = h2o2
        bonds, angles, torsions = detect_primitives(np.asarray(coords), z)
        assert len(bonds) == 3
        assert len(angles) == 2
        assert len(torsions) == 1

    def test_q_values(self, water):
        coords, z = water
        ic = auto_internals(np.asarray(coords), z)
        q = ic.q(coords)
        oh = 0.9572 * ANGSTROM2BOHR
        np.testing.assert_allclose(np.asarray(q[:2]), oh, rtol=1e-3)
        assert float(q[2]) == pytest.approx(104.52 * np.pi / 180.0, rel=1e-3)

    def test_fragment_linking(self):
        # two He atoms far apart: link bond still created
        coords = np.array([[0.0, 0.0, 0.0], [8.0, 0.0, 0.0]])
        bonds, _, _ = detect_primitives(coords, np.array([2, 2]))
        assert len(bonds) == 1


class TestWilsonB:
    def test_b_matrix_matches_fd(self, h2o2):
        coords, z = h2o2
        ic = auto_internals(np.asarray(coords), z)
        b = ic.b_matrix(coords)
        assert b.shape == (ic.n_primitives, 12)
        x = np.asarray(coords).reshape(-1)
        eps = 1e-6
        for col in range(12):
            xp, xm = x.copy(), x.copy()
            xp[col] += eps
            xm[col] -= eps
            fd = (np.asarray(ic.q_flat(jnp.asarray(xp)))
                  - np.asarray(ic.q_flat(jnp.asarray(xm)))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(b[:, col]), fd, atol=1e-6)

    def test_gradient_roundtrip(self, h2o2, rng):
        coords, z = h2o2
        ic = auto_internals(np.asarray(coords), z)
        # gradient of a function expressible in internals: sum of q^2
        fn = lambda c: jnp.sum(ic.q(c) ** 2)
        g_cart = jax.grad(fn)(coords)
        g_q = ic.cart_to_internal_gradient(g_cart, coords)
        g_back = ic.internal_to_cart_gradient(g_q, coords)
        np.testing.assert_allclose(np.asarray(g_back), np.asarray(g_cart),
                                   atol=1e-8)

    def test_hessian_transform_consistency(self, h2o2):
        coords, z = h2o2
        ic = auto_internals(np.asarray(coords), z)
        fn = lambda c: jnp.sum(ic.q(c) ** 2) + jnp.sum(jnp.cos(ic.q(c)))
        h_x = jax.hessian(lambda x: fn(x.reshape(4, 3)))(coords.reshape(-1))
        g_cart = jax.grad(fn)(coords)
        h_q = ic.internal_hessian_from_cart(h_x, g_cart, coords)
        g_q = ic.cart_to_internal_gradient(g_cart, coords)
        h_back = ic.cart_hessian_from_internal(h_q, g_q, coords)
        # roundtrip reproduces H_x on the non-TR/rot subspace
        from multioptpy_tpu.geometry import project_hessian_tr_rot
        np.testing.assert_allclose(
            np.asarray(project_hessian_tr_rot(h_back, coords)),
            np.asarray(project_hessian_tr_rot(h_x, coords)), atol=1e-6)

    def test_back_transform(self, h2o2):
        coords, z = h2o2
        ic = auto_internals(np.asarray(coords), z)
        q0 = ic.q(coords)
        q_target = q0.at[0].add(0.1)  # stretch one O-O/O-H bond by 0.1 Bohr
        x_new = ic.to_cartesian(q_target, coords)
        np.testing.assert_allclose(np.asarray(ic.q(x_new)),
                                   np.asarray(q_target), atol=1e-8)


class TestModelHessians:
    @pytest.mark.parametrize("kind", MODEL_HESSIAN_KINDS)
    def test_symmetric_projected_finite(self, h2o2, kind):
        coords, z = h2o2
        h = model_hessian(coords, z, kind=kind)
        h = np.asarray(h)
        assert h.shape == (12, 12)
        assert np.all(np.isfinite(h))
        np.testing.assert_allclose(h, h.T, atol=1e-10)
        w = np.linalg.eigvalsh(h)
        assert np.sum(np.abs(w) < 1e-8) >= 6  # TR/rot projected out
        # vibrational modes should be overwhelmingly positive for a minimum
        assert np.sum(w > 1e-6) >= 5

    def test_lindh_bond_scale(self, water):
        # near-equilibrium O-H stretch force constant should be O(0.1-1)
        coords, z = water
        h = np.asarray(model_hessian(coords, z, kind="lindh"))
        w = np.linalg.eigvalsh(h)
        assert 0.05 < np.max(w) < 3.0

    def test_smooth_eigenvalues(self, rng):
        m = rng.normal(size=(6, 6))
        h = jnp.asarray(m @ m.T) * 10.0
        hs = smooth_eigenvalues(h)
        assert float(jnp.max(jnp.linalg.eigvalsh(hs))) < 2.0


class TestDispersionCorrection:
    def test_d2_energy_and_hessian(self, h2o2):
        import jax.numpy as jnp
        from multioptpy_tpu.hessian.dispersion import (
            d2_energy, d2_gradient, d2_hessian)

        coords, z = h2o2
        e = float(d2_energy(coords, z))
        assert e < 0.0  # attractive
        g = d2_gradient(coords, z)
        # FD check of one component
        eps = 1e-6
        cp = coords.at[0, 1].add(eps)
        cm = coords.at[0, 1].add(-eps)
        fd = (float(d2_energy(cp, z)) - float(d2_energy(cm, z))) / (2 * eps)
        assert float(g[0, 1]) == pytest.approx(fd, abs=1e-9)
        h = d2_hessian(coords, z)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h).T,
                                   atol=1e-14)

    def test_lindh_d2_model_hessian(self, h2o2):
        coords, z = h2o2
        h_plain = np.asarray(model_hessian(coords, z, kind="lindh"))
        h_disp = np.asarray(model_hessian(coords, z, kind="lindh2007d2"))
        diff = np.abs(h_disp - h_plain).max()
        assert diff > 1e-8            # dispersion changed the guess
        assert np.all(np.isfinite(h_disp))
        w = np.linalg.eigvalsh(h_disp)
        assert np.sum(np.abs(w) < 1e-8) >= 6


def test_z_matrix_roundtrip_values():
    """cartesian_to_z_matrix (ref: redundant_coordinate.py:503) on a known
    butane-like chain."""
    import jax.numpy as jnp
    from multioptpy_tpu.coords.internals import cartesian_to_z_matrix

    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [2.9, 0.0, 0.0], [3.9, 2.7, 0.0],
         [6.8, 3.0, 1.5]]))
    zm = np.asarray(cartesian_to_z_matrix(coords))
    # r12, r23, th123, then (r34, th234, phi1234)
    assert zm.shape == (6,)
    np.testing.assert_allclose(zm[0], 2.9, rtol=1e-12)
    np.testing.assert_allclose(zm[1], np.linalg.norm([1.0, 2.7, 0.0]),
                               rtol=1e-12)
    v1 = np.array([2.9, 0, 0])
    v2 = np.array([3.9, 2.7, 0.0])
    th = np.degrees(np.arccos(v1 @ v2 / (np.linalg.norm(v1)
                                         * np.linalg.norm(v2))))
    np.testing.assert_allclose(zm[2], th, rtol=1e-10)
    np.testing.assert_allclose(zm[3], np.linalg.norm([2.9, 0.3, 1.5]),
                               rtol=1e-10)
    assert 0 < zm[4] < 180
    assert -180 <= zm[5] <= 180


def test_local_force_constants_diatomic():
    """For a diatomic harmonic bond, the local stretch constant must equal
    the spring constant (both compliance and projection routes;
    ref: redundant_coordinate.py:480-501)."""
    import jax.numpy as jnp
    from multioptpy_tpu.coords.internals import (
        InternalCoordinates, local_force_constants)

    k_true = 0.37
    r = 2.0
    coords = jnp.asarray(np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]]))
    # analytic Hessian of E = 0.5 k (|x1-x0| - r0)^2 at r = r0:
    u = np.array([1.0, 0.0, 0.0])
    blk = k_true * np.outer(u, u)
    h = np.zeros((6, 6))
    h[:3, :3] = blk
    h[3:, 3:] = blk
    h[:3, 3:] = -blk
    h[3:, :3] = -blk
    ic = InternalCoordinates(np.array([[0, 1]]), np.zeros((0, 3), int),
                             np.zeros((0, 4), int), n_atoms=2)
    b = ic.b_matrix(coords)
    k_comp = np.asarray(local_force_constants(jnp.asarray(h), b,
                                              method="compliance"))
    np.testing.assert_allclose(k_comp[0], k_true, rtol=1e-8)
    k_proj = np.asarray(local_force_constants(jnp.asarray(h), b,
                                              method="projection"))
    np.testing.assert_allclose(k_proj[0, 0], k_true, rtol=1e-8)


class TestLinearBends:
    """Near-linear triples must NOT enter the regular bend list — the bend
    Wilson row diverges as 1/sin(theta) at 180 deg (an exactly collinear
    O-H...O fixture produced |B| ~ 1e16, which annihilated the DIC active
    space and froze the optimizer). They come back as smooth orthogonal
    linear-bend pairs instead."""

    def test_co2_linear_pair_spans_3n_minus_5(self):
        co2 = np.array([[0.0, 0.0, 0.0], [1.16, 0.0, 0.0],
                        [-1.16, 0.0, 0.0]]) * ANGSTROM2BOHR
        z = np.array([6, 8, 8])
        bonds, angles, torsions, linear = detect_primitives(
            co2, z, with_linear=True)
        assert len(angles) == 0 and len(torsions) == 0
        assert len(linear) == 1          # the O-C-O triple
        ic = auto_internals(co2, z)
        assert ic.n_primitives == len(bonds) + 2
        b = np.asarray(ic.b_matrix(jnp.asarray(co2)))
        assert np.abs(b).max() < 1e2     # no 1/sin blow-up
        _, keep = ic.delocalized_basis(jnp.asarray(co2))
        assert int(np.sum(np.asarray(keep))) == 4   # 3N-5 for linear CO2

    def test_two_fragment_complex_full_active_space(self):
        # the aldol fixture has H10 exactly on the O2..O7 line: before the
        # linear-bend split its G-matrix had ~1e32 eigenvalues and only 2
        # surviving basis vectors (should be 3N-6 = 27)
        from multioptpy_tpu.io.fixtures import aldol_reactant
        rc, z = aldol_reactant()
        ic = auto_internals(rc, np.asarray(z))
        b = np.asarray(ic.b_matrix(jnp.asarray(rc)))
        assert np.abs(b).max() < 1e2
        _, keep = ic.delocalized_basis(jnp.asarray(rc))
        assert int(np.sum(np.asarray(keep))) == 27

    def test_dic_moves_a_two_fragment_complex(self):
        # regression: DIC on the complex must actually move (it froze at
        # the starting energy before the fix); LJ keeps the test cheap
        from multioptpy_tpu.calculators import LennardJones
        from multioptpy_tpu.drivers.optimize import (OptimizeConfig,
                                                     optimize)
        from multioptpy_tpu.io.fixtures import aldol_reactant
        rc, z = aldol_reactant()
        calc = LennardJones()
        e0 = float(calc.energy(jnp.asarray(rc), jnp.asarray(z)))
        r = optimize(calc, jnp.asarray(rc), jnp.asarray(z),
                     config=OptimizeConfig(method="dic_rsirfo_fsb",
                                           nsteps=30))
        assert float(r.energy) < e0 - 1e-4
