"""Morse / TS-reflection / short-range model Hessians."""

import jax.numpy as jnp
import numpy as np
import pytest


def test_morse_model_hessian_physics():
    from multioptpy_tpu.hessian.model import model_hessian
    from multioptpy_tpu.periodic import COVALENT_RADII_1

    # H2 at its covalent-radii equilibrium: positive curvature along bond
    r_eq = 2 * float(COVALENT_RADII_1[1])
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r_eq]])
    z = np.array([1, 1])
    h = np.asarray(model_hessian(coords, z, kind="morse", project=False))
    assert h.shape == (6, 6)
    np.testing.assert_allclose(h, h.T, atol=1e-12)
    # d2V/dr2 at r_eq = 2 De a^2 > 0; zz block curvature positive
    assert h[2, 2] > 0
    assert h[2, 5] == pytest.approx(-h[2, 2], abs=1e-12)


def test_ts_model_hessian_injects_one_negative_mode(rng):
    from multioptpy_tpu.hessian.model import ts_model_hessian

    a = rng.normal(size=(6, 6))
    h = jnp.asarray(a @ a.T + 6 * np.eye(6))   # PD
    h_ts = np.asarray(ts_model_hessian(h))
    w = np.linalg.eigvalsh(h_ts)
    assert np.sum(w < -1e-8) == 1              # exactly one downhill mode
    # already-indefinite Hessians pass through unchanged
    h2 = jnp.asarray(h_ts)
    np.testing.assert_allclose(np.asarray(ts_model_hessian(h2)),
                               np.asarray(h2), atol=1e-12)


def test_short_range_hessian_excludes_bonded():
    from multioptpy_tpu.hessian.model import short_range_hessian

    # three atoms: 1-2 bonded (close), 3 far -> only 1-3, 2-3 contribute
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0],
                          [0.0, 5.0, 1.0]])
    # heteroatoms: the reference's Pauling-EN charge estimate q_i =
    # 0.2 (mean EN - EN_i) is identically zero for a homonuclear system,
    # and the correction carries q_i q_j (shortrange.py:213-216)
    z = np.array([8, 6, 1])
    h = np.asarray(short_range_hessian(coords, z, bonds=[(0, 1)]))
    assert h.shape == (9, 9)
    np.testing.assert_allclose(h, h.T, atol=1e-12)
    assert np.max(np.abs(h)) > 0
    # with ALL pairs bonded the correction vanishes
    h0 = np.asarray(short_range_hessian(
        coords, z, bonds=[(0, 1), (0, 2), (1, 2)]))
    np.testing.assert_allclose(h0, 0.0, atol=1e-14)


def test_ts_suffix_drives_saddle_search():
    """A lindh_ts initial Hessian biases P-RFO toward the MB saddle."""
    from multioptpy_tpu.hessian.model import model_hessian, ts_model_hessian

    h = model_hessian(
        jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0],
                     [1.8, 0.0, 0.1]]),
        np.array([8, 1, 1]), kind="lindh_ts")
    w = np.linalg.eigvalsh(np.asarray(h))
    assert np.sum(w < -1e-8) == 1


def test_d3_bj_dispersion_physics():
    from multioptpy_tpu.hessian.dispersion import (d3_energy, d3_gradient,
                                                   d3_hessian)

    z = np.array([18, 18])
    def e(r):
        return float(d3_energy(jnp.asarray([[0.0, 0.0, 0.0],
                                            [0.0, 0.0, r]]), z))
    # attractive, decaying, BJ-damped (finite at r->0)
    assert e(7.0) < 0
    assert abs(e(14.0)) < abs(e(7.0))
    assert np.isfinite(e(0.5))
    # C8 term makes D3 stronger than bare C6/r^6 at mid-range
    g = np.asarray(d3_gradient(jnp.asarray([[0.0, 0.0, 0.0],
                                            [0.0, 0.0, 7.0]]), z))
    assert g[1, 2] > 0  # pulls the pair together
    h = np.asarray(d3_hessian(jnp.asarray([[0.0, 0.0, 0.0],
                                           [0.0, 0.0, 7.0]]), z))
    np.testing.assert_allclose(h, h.T, atol=1e-12)


def test_model_hessian_d3_suffix():
    from multioptpy_tpu.hessian.model import model_hessian

    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.1],
                          [1.8, 0.0, -0.4]])
    z = np.array([8, 1, 1])
    h2 = np.asarray(model_hessian(coords, z, kind="lindh2007d2"))
    h3 = np.asarray(model_hessian(coords, z, kind="lindh2007d3"))
    assert np.max(np.abs(h3 - h2)) > 0  # the corrections differ
    assert np.all(np.isfinite(h3))


def test_gfn0_gfnff_model_hessians():
    from multioptpy_tpu.hessian.model import model_hessian

    # ethylene-ish: short C=C gets the double-bond factor
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.51],   # C=C ~1.33 ang
                          [1.76, 0.0, -1.0], [-1.76, 0.0, -1.0],
                          [1.76, 0.0, 3.5], [-1.76, 0.0, 3.5]])
    z = np.array([6, 6, 1, 1, 1, 1])
    h0 = np.asarray(model_hessian(coords, z, kind="gfn0", project=False))
    hf = np.asarray(model_hessian(coords, z, kind="gfnff", project=False))
    for h in (h0, hf):
        assert h.shape == (18, 18)
        np.testing.assert_allclose(h, h.T, atol=1e-12)
        assert np.all(np.isfinite(h))
        w = np.linalg.eigvalsh(h)
        assert w.min() > -1e-8          # a PSD guess
    # gfnff differs from gfn0 only via the EN term on C-H bonds
    assert np.max(np.abs(hf - h0)) > 1e-4


def test_gfn0_double_bond_stiffer_than_single():
    from multioptpy_tpu.coords.internals import InternalCoordinates
    from multioptpy_tpu.hessian.model import _primitive_constants

    z = np.array([6, 6])
    bonds = np.array([[0, 1]])
    angles = np.zeros((0, 3), int)
    tors = np.zeros((0, 4), int)
    k_single = _primitive_constants(
        "gfn0", jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.89]]),  # 1.53 ang
        z, bonds, angles, tors, 2)
    k_double = _primitive_constants(
        "gfn0", jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.51]]),  # 1.33 ang
        z, bonds, angles, tors, 2)
    assert float(k_double[0]) > float(k_single[0])


def test_dynamic_d3_distinct_from_static():
    """The reference's current fischerd3 scales C6 by coordination-number
    deviation (fischerd3.py:235 clip(1-0.05(CN-CN_ref), .75, 1.25));
    fischerd3old and lindh2007d3 keep the static D2-C6 form."""
    import jax.numpy as jnp

    from multioptpy_tpu.hessian.dispersion import d3_coordination_numbers
    from multioptpy_tpu.hessian.model import model_hessian

    # methane-ish: C with 4 H at ~2.05 Bohr
    d = 2.05
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [d, d, d], [d, -d, -d], [-d, d, -d],
         [-d, -d, d]]) / np.sqrt(3.0))
    z = jnp.array([6, 1, 1, 1, 1])
    cn = np.asarray(d3_coordination_numbers(coords, z))
    # carbon sees ~4 neighbors, each H ~1
    assert cn[0] == pytest.approx(4.0, abs=0.3)
    assert cn[1] == pytest.approx(1.0, abs=0.3)

    h_dyn = np.asarray(model_hessian(coords, z, kind="fischerd3"))
    h_old = np.asarray(model_hessian(coords, z, kind="fischerd3old"))
    assert np.all(np.isfinite(h_dyn))
    assert np.abs(h_dyn - h_old).max() > 1e-12
    # at typical valency (CN ~ CN_ref) the scaling is weak: the two stay
    # close in relative terms
    assert np.abs(h_dyn - h_old).max() < 0.05 * np.abs(h_old).max()
