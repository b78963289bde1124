"""LIVE parity wave 49: the top-level fileio parsing layer executed on
shared fixture files, side by side with our io/xyz.py + io/formats.py.

Conventions learned by execution (ref: fileio.py):

  * xyz2list (:53-70) is a pure REGEX SCAN with no count-based framing:
    the natoms header is ignored and ANY line shaped like
    "<letters> <num> <num> <num>" is an atom — a comment line
    "Etot 1.0 2.0 3.0" becomes a spurious atom "Etot" (pinned). Our
    read_xyz frames by the atom count and is immune.
  * charge/multiplicity come from any "<int> <int>"-looking line
    anywhere in the file (get_pattern_cs), with LAST match winning in
    xyz2list; absent, the caller's default is returned verbatim.
  * traj2list (:254-287) flushes a frame only when it hits a
    NON-matching line: a trajectory whose final line is an atom line
    (every normal multi-frame xyz) has its LAST FRAME SILENTLY DROPPED
    (pinned) — the reference's own writers avoid this only because the
    next frame's count line flushes the previous one mid-file. Our
    read_trajectory returns all frames.
  * mol2list (:191-218) takes the element from the atom-block's 4th
    column (symbol) like ours; mol22list (:220-252) derives the element
    from the ATOM NAME column instead of the Tripos atom TYPE: a
    calcium-lookalike name "CA1" typed "C.3" parses as element "CA"
    upstream while ours reads the type column -> "C" (pinned
    divergence).
  * write_xyz_file (:653-659) writes count/comment/atom lines; ours
    round-trips it.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax

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


def _quiet(fn, *a, **k):
    with contextlib.redirect_stdout(io.StringIO()):
        return fn(*a, **k)


def test_xyz2list_live_regex_scan_eats_comment_lines(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    p = tmp_path / "m.xyz"
    p.write_text("2\n"
                 "Etot 1.0 2.0 3.0\n"
                 "O 0.0 0.0 0.0\n"
                 "H 0.0 0.0 0.96\n")
    geoms, elems, cs = fio.xyz2list(str(p), ["0", "1"])
    # the comment line was parsed as an atom
    assert elems == ["Etot", "O", "H"]
    assert geoms[0] == ["1.0", "2.0", "3.0"]
    assert cs == ["0", "1"]                    # fallback default

    # ours frames by the count header: exactly 2 atoms
    from multioptpy_tpu.io.xyz import read_xyz
    symbols, coords = read_xyz(str(p))
    assert symbols == ["O", "H"]
    assert coords.shape == (2, 3)


def test_xyz2list_live_charge_line_last_match_wins(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    p = tmp_path / "c.xyz"
    p.write_text("1\n"
                 "0 1\n"
                 "H 0.0 0.0 0.0\n"
                 "-1 2\n")
    _, _, cs = fio.xyz2list(str(p), ["9", "9"])
    assert cs[:2] == ["-1", "2"]               # LAST cs-like line wins


def test_traj2list_live_drops_last_frame_without_trailing_line(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    frame = "2\nstep {i}\nO 0.0 0.0 {z}\nH 0.0 0.0 1.0\n"
    # 3 frames, file ends right after the last atom line
    text = "".join(frame.format(i=i, z=0.1 * i) for i in range(3))
    p = tmp_path / "t.xyz"
    p.write_text(text.rstrip("\n"))
    geoms, elems, _ = fio.traj2list(str(p), ["0", "1"])
    assert len(geoms) == 2                     # last frame LOST

    # a trailing blank line rescues it
    p2 = tmp_path / "t2.xyz"
    p2.write_text(text + "\n")
    geoms2, _, _ = fio.traj2list(str(p2), ["0", "1"])
    assert len(geoms2) == 3

    # ours returns all frames either way
    from multioptpy_tpu.io.xyz import read_trajectory
    frames = read_trajectory(str(p))
    assert len(frames) == 3


def test_mol_live_parity_with_ours(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    p = tmp_path / "m.mol"
    p.write_text("water\n  prog\n\n"
                 "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
                 "    0.0000    0.0000    0.1173 O   0  0\n"
                 "    0.0000    0.7572   -0.4692 H   0  0\n"
                 "    0.0000   -0.7572   -0.4692 H   0  0\n"
                 "M  END\n")
    geoms, elems, _ = fio.mol2list(str(p), ["0", "1"])
    assert elems == ["O", "H", "H"]
    from multioptpy_tpu.io.formats import read_mol
    symbols, coords, _, _ = read_mol(str(p))
    assert symbols == elems
    np.testing.assert_allclose(coords,
                               np.array(geoms, dtype=np.float64),
                               atol=1e-12)


def test_mol2_live_element_from_name_vs_our_type_column(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    p = tmp_path / "m.mol2"
    p.write_text("@<TRIPOS>MOLECULE\nm\n 2 1\nSMALL\nNO_CHARGES\n"
                 "@<TRIPOS>ATOM\n"
                 "  1 CA1   0.0000  0.0000  0.0000 C.3  1 LIG 0.0\n"
                 "  2 H1    0.0000  0.0000  1.0900 H    1 LIG 0.0\n"
                 "@<TRIPOS>BOND\n  1 1 2 1\n")
    geoms, elems, _ = fio.mol22list(str(p), ["0", "1"])
    assert elems[0] == "CA"                    # name-derived: calcium!
    from multioptpy_tpu.io.formats import read_mol2
    symbols, coords, _, _ = read_mol2(str(p))
    assert symbols[0] == "C"                   # type-derived: carbon
    assert symbols[1] == "H" and elems[1] == "H"
    np.testing.assert_allclose(coords,
                               np.array(geoms, dtype=np.float64),
                               atol=1e-12)


def test_write_xyz_live_roundtrips_through_ours(tmp_path):
    fio = _ref_module("multioptpy.fileio")
    coords = np.array([[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                       [0.0, -0.7572, -0.4692]])
    p = tmp_path / "w.xyz"
    _quiet(fio.write_xyz_file, ["O", "H", "H"], coords, str(p))
    from multioptpy_tpu.io.xyz import read_xyz
    symbols, got = read_xyz(str(p))
    assert symbols == ["O", "H", "H"]
    np.testing.assert_allclose(got, coords, atol=1e-10)
