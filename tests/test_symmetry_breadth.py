"""LIVE parity: point-group breadth vs the reference's symmetry analyzer.

VERDICT r3 item 8: improper axes (S2n), icosahedral Ih, cubic Oh/Td and
sigma_v/sigma_d counting, pinned against the reference's own
analyze_symmetry (ref: Utils/symmetry_analyzer.py:403) executed live on a
fixture set spanning the families: benzene D6h, CH4 Td, SF6 Oh, H2O2 C2,
staggered ethane D3d, allene D2d, B12 icosahedron Ih, ferrocene-like
staggered sandwich D5d, trans-N2H2 C2h, S8 crown D4d.
"""

import os
import sys
import types

import numpy as np
import pytest

from multioptpy_tpu.analysis.symmetry import analyze_symmetry
from multioptpy_tpu.units import ANGSTROM2BOHR

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


def _ring(n, radius, z_offset=0.0, phase=0.0):
    ang = 2 * np.pi * np.arange(n) / n + phase
    return np.stack([radius * np.cos(ang), radius * np.sin(ang),
                     np.full(n, z_offset)], axis=1)


def benzene():
    return (["C"] * 6 + ["H"] * 6,
            np.vstack([_ring(6, 1.397), _ring(6, 2.481)]))


def methane():
    t = 1.087 / np.sqrt(3.0)
    return (["C", "H", "H", "H", "H"],
            np.array([[0, 0, 0], [t, t, t], [-t, -t, t],
                      [t, -t, -t], [-t, t, -t]]))


def sf6():
    r = 1.561
    return (["S"] + ["F"] * 6,
            np.array([[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0],
                      [0, -r, 0], [0, 0, r], [0, 0, -r]]))


def h2o2():
    # skewed C2: dihedral ~111.5 deg
    d, roh, ang = 1.475, 0.95, np.radians(94.8)
    tors = np.radians(111.5)
    o1 = np.array([0, 0, d / 2])
    o2 = np.array([0, 0, -d / 2])
    h1 = o1 + roh * np.array([np.sin(ang) * np.cos(tors / 2),
                              np.sin(ang) * np.sin(tors / 2), np.cos(ang)])
    h2 = o2 + roh * np.array([np.sin(ang) * np.cos(tors / 2),
                              -np.sin(ang) * np.sin(tors / 2),
                              -np.cos(ang)])
    return ["O", "O", "H", "H"], np.stack([o1, o2, h1, h2])


def ethane_staggered():
    cc, ch, a = 1.536, 1.09, np.radians(111.2)
    c0, c1 = np.array([0, 0, 0.0]), np.array([0, 0, cc])
    rows = [c0, c1]
    for phi in (0, 2 * np.pi / 3, 4 * np.pi / 3):
        rows.append(c0 + ch * np.array([np.cos(phi) * np.sin(a),
                                        np.sin(phi) * np.sin(a),
                                        -np.cos(a)]))
    for phi in (np.pi / 3, np.pi, 5 * np.pi / 3):
        rows.append(c1 + ch * np.array([np.cos(phi) * np.sin(a),
                                        np.sin(phi) * np.sin(a),
                                        np.cos(a)]))
    return ["C", "C"] + ["H"] * 6, np.stack(rows)


def allene():
    # H2C=C=CH2, terminal CH2 planes perpendicular -> D2d
    cc, ch, a = 1.308, 1.087, np.radians(118.2 / 2)
    rows = [np.array([0, 0, 0.0]), np.array([0, 0, cc]),
            np.array([0, 0, -cc])]
    for sgn in (1, -1):
        rows.append(rows[1] + ch * np.array([sgn * np.sin(a), 0,
                                             np.cos(a)]))
        rows.append(rows[2] + ch * np.array([0, sgn * np.sin(a),
                                             -np.cos(a)]))
    return ["C", "C", "C", "H", "H", "H", "H"], np.stack(rows)


def b12_icosahedron():
    phi = (1 + np.sqrt(5)) / 2
    verts = []
    for s1 in (1, -1):
        for s2 in (1, -1):
            verts.append([0, s1, s2 * phi])
            verts.append([s1, s2 * phi, 0])
            verts.append([s2 * phi, 0, s1])
    v = np.array(verts, dtype=float)
    v *= 1.77 / np.linalg.norm(v[0] - v[2])  # B-B ~ 1.77 A
    return ["B"] * 12, v


def sandwich_d5d():
    # two parallel C5 rings, staggered (36 deg twist) around a central Fe
    top = _ring(5, 1.21, z_offset=1.66)
    bot = _ring(5, 1.21, z_offset=-1.66, phase=np.pi / 5)
    return (["Fe"] + ["C"] * 10,
            np.vstack([np.zeros((1, 3)), top, bot]))


def trans_n2h2():
    nn, nh, a = 1.25, 1.03, np.radians(106.9)
    n1, n2 = np.array([0, 0, nn / 2]), np.array([0, 0, -nn / 2])
    h1 = n1 + nh * np.array([np.sin(a), 0, np.cos(a)])
    h2 = n2 - nh * np.array([np.sin(a), 0, np.cos(a)])
    return ["N", "N", "H", "H"], np.stack([n1, n2, h1, h2])


def s8_crown():
    # D4d crown: 8 S alternating up/down on a ring
    r, h = 2.34 / (2 * np.sin(np.pi / 8)) * np.sin(np.radians(54) / 2), 0.49
    ang = 2 * np.pi * np.arange(8) / 8
    rows = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                     h * (-1.0) ** np.arange(8)], axis=1)
    return ["S"] * 8, rows


FIXTURES = [
    ("benzene", benzene, "D6h"),
    ("methane", methane, "Td"),
    ("sf6", sf6, "Oh"),
    ("h2o2", h2o2, "C2"),
    ("ethane_staggered", ethane_staggered, "D3d"),
    ("allene", allene, "D2d"),
    ("b12_icosahedron", b12_icosahedron, "Ih"),
    ("sandwich_d5d", sandwich_d5d, "D5d"),
    ("trans_n2h2", trans_n2h2, "C2h"),
    ("s8_crown", s8_crown, "D4d"),
]


@pytest.mark.parametrize("name,fix,expected", FIXTURES,
                         ids=[f[0] for f in FIXTURES])
def test_point_group_breadth(name, fix, expected):
    symbols, xyz = fix()
    from multioptpy_tpu.periodic import symbols_to_z

    z = np.asarray(symbols_to_z(symbols))
    ours = analyze_symmetry(xyz * ANGSTROM2BOHR, z)
    assert ours.point_group == expected, (
        f"{name}: ours {ours.point_group} != textbook {expected}")


# Reference deviations pinned by live execution (not copied): on the
# ideal B12 icosahedron the reference reports Th — its census finds the
# ten C3 axes but misses the six C5 vertex axes at its default tolerances
# (symmetry_analyzer.py:386 needs >= 6 C5s), so the icosahedron falls
# through to the tetrahedral branch. Ours resolves the C5s and returns Ih.
_REF_LIVE = {"b12_icosahedron": "Th"}


@pytest.mark.parametrize("name,fix,expected", FIXTURES,
                         ids=[f[0] for f in FIXTURES])
def test_point_group_live_parity(name, fix, expected):
    """The reference's own analyzer on the same fixture — parity where it
    is right; known deviations assert its actual live output so any
    upstream drift is caught."""
    sym = _ref_module("multioptpy.Utils.symmetry_analyzer")
    symbols, xyz = fix()
    label_ref = sym.analyze_symmetry(symbols, xyz)
    assert label_ref == _REF_LIVE.get(name, expected), (
        f"{name}: reference live output {label_ref} changed — "
        "re-pin the deviation instead of assuming parity")
