"""LIVE parity wave 23: ONIOM layer utilities and the periodic-boundary
fragment wrap — the reference's actual host code executed side by side
with our composite ONIOM calculator and MD PBC wrap.

Conventions learned by execution (ref: Utils/oniom.py, Utils/pbc.py):

  * specify_link_atom_pairs assigns each boundary (link) atom to its
    NEAREST high-layer atom — pinned live.
  * separate_high_layer_and_low_layer places the hydrogen cap at a FIXED
    distance rcov(inner) + rcov(H) along the cut bond (oniom.py:94),
    independent of the actual bond length; ours uses the standard
    Morokuma g-RATIO placement r_in + g (r_out - r_in) with g = 0.709.
    Both conventions coincide when the cut bond has length
    (rcov_in + rcov_H)/g; the live test pins the reference's rule
    exactly and the two calculators' caps at that coincidence length.
  * apply_periodic_boundary_condition with fragm_check translates whole
    covalent fragments so the COM lands in [0, box) — exactly our
    make_fragment_pbc_wrap's -floor(com/box)*box shift (pinned to
    1e-10 on a multi-fragment fixture, including fragments several
    boxes away and negative). With fragm_check=False it is a plain
    per-coordinate modulo — our wrap_coordinates.
  * The reference mutates its input geometry array IN PLACE and returns
    it (pbc.py:6) — callers must copy; ours is pure.

Ref anchors: Utils/oniom.py:4-120, Utils/pbc.py:6-47,
calculators/oniom.py (ours), drivers/md.py:69 (ours).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


# ==========================================================================
# ONIOM utilities
# ==========================================================================

def _ethanol_like():
    """Propane-ish chain: C-C-C with H's, high layer = first CH3."""
    coords = np.array([
        [0.0, 0.0, 0.0],      # C1 (high)
        [2.8, 0.0, 0.0],      # C2 (low, boundary)
        [5.6, 0.3, 0.0],      # C3 (low)
        [-0.7, 1.9, 0.0],     # H on C1
        [-0.7, -1.0, 1.6],    # H on C1
    ])
    elements = ["C", "C", "C", "H", "H"]
    return coords, elements


def test_link_atom_pair_assignment_live():
    oni = _ref_module("multioptpy.Utils.oniom")
    coords, elements = _ethanol_like()
    pairs = oni.specify_link_atom_pairs(coords, elements,
                                        high_layer_atom_num=[1, 4, 5],
                                        link_atom_num=[2])
    assert pairs == [[1, 2]]   # nearest high-layer atom to C2 is C1
    assert oni.specify_link_atom_pairs(coords, elements, [1], "none") == []

    r2h, h2r = oni.link_number_high_layer_and_low_layer([3, 1, 5])
    assert r2h == {3: 1, 1: 2, 5: 3}
    assert h2r == {1: 3, 2: 1, 3: 5}


def test_link_atom_placement_live_fixed_length_vs_our_ratio():
    oni = _ref_module("multioptpy.Utils.oniom")
    par = _ref_module("multioptpy.Parameters.parameter")
    from multioptpy_tpu.calculators.oniom import ONIOM
    from multioptpy_tpu.calculators import LennardJones

    coords, elements = _ethanol_like()
    high = [1, 4, 5]
    geom_h, elem_h = oni.separate_high_layer_and_low_layer(
        coords, [[1, 2]], high, elements)
    assert elem_h == ["C", "H", "H", "H"]   # 3 high atoms + 1 H cap
    # the cap sits at EXACTLY rcov(C)+rcov(H) from C1 along the C1->C2 bond
    d_fixed = par.covalent_radii_lib("C") + par.covalent_radii_lib("H")
    u = (coords[1] - coords[0]) / np.linalg.norm(coords[1] - coords[0])
    np.testing.assert_allclose(geom_h[-1], coords[0] + u * d_fixed,
                               atol=1e-12)
    # ...independent of the actual bond length (stretch C2 2x: same cap)
    coords2 = coords.copy()
    coords2[1] *= 2.0
    geom_h2, _ = oni.separate_high_layer_and_low_layer(
        coords2, [[1, 2]], high, elements)
    np.testing.assert_allclose(geom_h2[-1], geom_h[-1], atol=1e-12)

    # ours: g-ratio placement; at bond length (rcov_C+rcov_H)/g the two
    # conventions coincide
    g = 0.709
    coords3 = coords.copy()
    coords3[1] = coords[0] + u * (d_fixed / g)
    calc = ONIOM(LennardJones(), LennardJones(), high_atoms=high,
                 link_bonds=[(1, 2)], link_scale=g)
    model_coords, model_z = calc._model_system(jnp.asarray(coords3),
                                               jnp.asarray([6, 6, 6, 1, 1]))
    geom_h3, _ = oni.separate_high_layer_and_low_layer(
        coords3, [[1, 2]], high, elements)
    np.testing.assert_allclose(np.asarray(model_coords)[-1], geom_h3[-1],
                               atol=1e-10)
    assert list(np.asarray(model_z)) == [6, 1, 1, 1]


# ==========================================================================
# PBC fragment wrap
# ==========================================================================

def test_pbc_fragment_wrap_live_vs_ours():
    pbc_ref = _ref_module("multioptpy.Utils.pbc")
    from multioptpy_tpu.drivers.md import make_fragment_pbc_wrap
    from multioptpy_tpu.units import BOHR2ANGSTROM

    # three Ar2 fragments: inside, far positive (3 boxes), negative
    box = np.array([10.0, 12.0, 9.0])  # Bohr
    base = np.array([[1.0, 2.0, 3.0], [3.4, 2.0, 3.0]])
    frags = [base,
             base + np.array([31.0, 0.0, 0.0]),
             base + np.array([0.0, -25.0, 4.0])]
    coords = np.concatenate(frags, axis=0)
    elements = ["Ar"] * 6
    z = np.array([18] * 6)

    wrapped_ref = pbc_ref.apply_periodic_boundary_condition(
        coords.copy(), elements, box, fragm_check=True)

    wrap = make_fragment_pbc_wrap(jnp.asarray(coords), jnp.asarray(z),
                                  box * BOHR2ANGSTROM)  # ours takes Ang
    wrapped_ours = np.asarray(wrap(jnp.asarray(coords)))

    np.testing.assert_allclose(wrapped_ours, wrapped_ref, atol=1e-10)
    # every fragment COM is now inside the box on both sides
    for k in range(3):
        com = wrapped_ours[2 * k:2 * k + 2].mean(axis=0)
        assert np.all(com >= 0.0) and np.all(com <= box)
    # intra-fragment geometry untouched
    for k in range(3):
        d0 = np.linalg.norm(frags[k][1] - frags[k][0])
        d1 = np.linalg.norm(wrapped_ours[2 * k + 1] - wrapped_ours[2 * k])
        np.testing.assert_allclose(d1, d0, atol=1e-12)


def test_pbc_plain_modulo_live_vs_ours():
    pbc_ref = _ref_module("multioptpy.Utils.pbc")
    from multioptpy_tpu.pbc import wrap_coordinates

    rng = np.random.default_rng(230)
    box = np.array([7.0, 8.0, 9.0])
    coords = rng.standard_normal((5, 3)) * 15.0
    wrapped_ref = pbc_ref.apply_periodic_boundary_condition(
        coords.copy(), ["H"] * 5, box, fragm_check=False)
    cell = np.diag(box)
    wrapped_ours = np.asarray(wrap_coordinates(jnp.asarray(coords), cell))
    np.testing.assert_allclose(wrapped_ours, wrapped_ref, atol=1e-10)

    # the reference MUTATES its input in place (callers must copy)
    coords_mut = coords.copy()
    out = pbc_ref.apply_periodic_boundary_condition(
        coords_mut, ["H"] * 5, box, fragm_check=False)
    assert out is coords_mut
    assert not np.allclose(coords_mut, coords)
