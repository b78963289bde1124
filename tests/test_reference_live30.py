"""LIVE parity wave 30: conformation-search internals — the reference's
nested selection/dedup/connectivity functions (defined INSIDE
run_confsearch, extracted via their code objects and executed) side by
side with our workflows/confsearch.py.

Conventions learned by execution (ref: Entrypoints/conformation_search.py):

  * calc_boltzmann_distribution (:22): weights exp(-(E-Emin)*627.509 /
    (0.0019872041 T)) — i.e. kT in kcal/mol with R = 1.9872041e-3; the
    effective Hartree kT constant 0.0019872041/627.509 = 3.16683e-6
    matches our KB_HARTREE to <1e-5 relative. Our single-exponent
    exp(-dE/kT - alpha*N) (confsearch.py:182) equals their
    boltzmann * exp(-alpha*N) product exactly (same algebra); pinned on
    a shared energy/visit fixture to 1e-4 relative (constant rounding).
  * calc_penalized_boltzmann_distribution (:34): the tabu penalty is
    exp(-alpha * N_i) multiplying the UN-normalized Boltzmann weights,
    then one normalization — pinned exactly.
  * get_index_from_distribution (:66): inverse-CDF sampling off
    `random.random()`, raising ValueError when |sum p - 1| >= 1e-8 —
    both pinned (the ValueError text says "the sum of probabilities").
  * check_identical (:99): permutation/rotation-invariant dedup via
    SORTED pair-distance vectors with an ALL(|d1-d2| < threshold)
    test — equivalent to our max-abs fingerprint test
    (confsearch.py:65-74); pinned on a rotated+permuted copy
    (identical) and a stretched copy (distinct).
  * get_bond_connectivity_table (:129): BondConnectivity on
    Bohr-converted geometry, table as sorted 0-indexed tuples;
    check_bond_connectivity_preserved (:144) returns
    (preserved, added, removed) sets — both pinned on water + a
    stretched variant; our detect_primitives finds the same bond set.
  * make_tgt_atom_pair (:339): candidate AFIR pairs are gated by a
    covalent-radius-normalized distance window (1.0, 8.0) — each
    surviving (i, j) emits BOTH a push ("p") and a pull ("m") task.
    TWO DEFECTS pinned by execution: (a) return_pair_idx (:508-511) is
    one less than the combinations-order index, so each pair's gate
    reads the PREVIOUS pair's distance and the first pair wraps to the
    last (a truly-in-window pair is rejected while a 21x-covalent pair
    is accepted on its neighbor's distance); (b) the window divides the
    call site's ANGSTROM geometry (read_xyz) by BOHR covalent sums
    (covalent_radii_lib), so in consistent units the window is really
    (1.89, 15.1) — genuinely bonded pairs can never be AFIR targets.
    Ours samples uniform random pairs from the target pool without the
    normalized-distance gate (confsearch.py:168-196) — a recorded
    difference (our kicks are signed AFIR gammas, equivalent coverage).

Extraction note: these functions are nested in run_confsearch and never
importable; we rebuild them with types.FunctionType from
run_confsearch.__code__.co_consts, supplying closure cells (their
defaults are lost — every argument is passed explicitly).

Ref anchors: Entrypoints/conformation_search.py:22-167, :339-397;
ours: workflows/confsearch.py.
"""

import contextlib
import io
import os
import random
import sys
import types

import numpy as np
import pytest

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")

_A2B = 1.8897261254578281


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    if name.startswith("multioptpy.Entrypoints") and \
            "multioptpy.Entrypoints" not in sys.modules:
        # Entrypoints/__init__ imports autots which sys.exit()s without
        # the QM stack — load submodules directly through a path stub
        ep = types.ModuleType("multioptpy.Entrypoints")
        ep.__path__ = [_REF + "/Entrypoints"]
        sys.modules["multioptpy.Entrypoints"] = ep
    import importlib

    return importlib.import_module(name)


def _nested(outer_fn, name, closure_values=()):
    """Rebuild a nested function from its code object (no defaults)."""
    code = next(c for c in outer_fn.__code__.co_consts
                if isinstance(c, types.CodeType) and c.co_name == name)
    cells = tuple(types.CellType(v) for v in closure_values)
    assert len(cells) == len(code.co_freevars), (name, code.co_freevars)
    return types.FunctionType(code, outer_fn.__globals__, name, None, cells)


def _confsearch_fns():
    cs = _ref_module("multioptpy.Entrypoints.conformation_search")
    run = cs.run_confsearch
    fns = {}
    fns["boltzmann"] = _nested(run, "calc_boltzmann_distribution")
    fns["tabu"] = _nested(run, "calc_penalized_boltzmann_distribution")
    fns["pick"] = _nested(run, "get_index_from_distribution")
    fns["dmat"] = _nested(run, "calc_distance_matrix")
    fns["dsort"] = _nested(run, "sort_distance_matrix")
    fns["identical"] = _nested(run, "check_identical",
                               (fns["dmat"], fns["dsort"]))
    fns["bond_table"] = _nested(run, "get_bond_connectivity_table", (_A2B,))
    fns["preserved"] = _nested(run, "check_bond_connectivity_preserved")
    fns["pair_idx"] = _nested(run, "return_pair_idx")
    fns["tgt_pairs"] = _nested(run, "make_tgt_atom_pair",
                               (fns["pair_idx"],))
    return fns


def test_boltzmann_and_tabu_selection_live():
    fns = _confsearch_fns()
    from multioptpy_tpu.units import KB_HARTREE

    # the reference's effective Hartree kT constant matches ours
    ref_k = 0.0019872041 / 627.509
    assert abs(ref_k - KB_HARTREE) / KB_HARTREE < 1e-5

    energies = [-10.0, -9.9992, -9.998, -10.0005]
    visits = [3, 0, 1, 5]
    t = 400.0
    p_ref = fns["boltzmann"](energies, t)
    assert p_ref.sum() == pytest.approx(1.0, abs=1e-12)

    # our single-exponent form with the reference's constants == their
    # two-factor product, exactly
    e = np.asarray(energies)
    alpha = 0.5
    w_ours = np.exp(-(e - e.min()) / (ref_k * t) - alpha * np.asarray(visits))
    p_tabu_ref = fns["tabu"](energies, visits, t, alpha)
    assert np.allclose(w_ours / w_ours.sum(), p_tabu_ref, atol=1e-12)
    # and with OUR Boltzmann constant the distributions agree to 1e-4
    w_k = np.exp(-(e - e.min()) / (KB_HARTREE * t))
    assert np.allclose(w_k / w_k.sum(), p_ref, rtol=1e-4)


def test_inverse_cdf_sampler_live():
    fns = _confsearch_fns()
    probs = [0.2, 0.5, 0.3]
    random.seed(30)
    draws = [fns["pick"](probs) for _ in range(500)]
    counts = np.bincount(draws, minlength=3) / 500.0
    assert np.allclose(counts, probs, atol=0.06)
    # manual inverse-CDF check at a pinned seed
    random.seed(42)
    r = random.random()
    random.seed(42)
    idx = fns["pick"](probs)
    cum = np.cumsum(probs)
    assert idx == int(np.argmax(r < cum))
    with pytest.raises(ValueError, match="sum of probabilities"):
        fns["pick"]([0.5, 0.4])


def test_sorted_distance_dedup_live():
    fns = _confsearch_fns()
    from multioptpy_tpu.workflows.confsearch import (
        _is_duplicate, _sorted_distance_fingerprint)

    rng = np.random.default_rng(30)
    a = rng.normal(size=(5, 3))
    # rotated + permuted copy: identical under the sorted-distance metric
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1.0]])
    b = (a @ rot.T)[[3, 1, 4, 0, 2]] + 0.2
    with contextlib.redirect_stdout(io.StringIO()):
        assert fns["identical"](a, b, 1e-6) is True
    c = a * 1.05
    with contextlib.redirect_stdout(io.StringIO()):
        assert fns["identical"](a, c, 1e-3) is False

    # ours agrees on both (max-abs vs all(<) are the same predicate)
    fp_a = _sorted_distance_fingerprint(a)
    assert _is_duplicate(_sorted_distance_fingerprint(b), [fp_a], 1e-6)
    assert not _is_duplicate(_sorted_distance_fingerprint(c), [fp_a], 1e-3)
    # and the reference's vector equals ours entry for entry
    assert np.allclose(fns["dsort"](fns["dmat"](a)), fp_a, atol=1e-12)


def test_bond_connectivity_table_live():
    fns = _confsearch_fns()
    from multioptpy_tpu.coords.internals import detect_primitives

    # water, Angstrom
    geom = np.array([[0.0, 0.0, 0.0],
                     [0.96, 0.0, 0.0],
                     [-0.24, 0.93, 0.0]])
    elements = ["O", "H", "H"]
    with contextlib.redirect_stdout(io.StringIO()):
        table = fns["bond_table"](geom, elements)
    assert table == [(0, 1), (0, 2)]

    # ours detects the same bond set (Bohr input, 1-indexed-free)
    bonds = detect_primitives(geom * _A2B, np.array([8, 1, 1]))[0]
    ours = sorted(tuple(sorted(b)) for b in bonds)
    assert ours == table

    # preservation check: stretching one O-H past the cutoff is reported
    # as exactly that removed bond
    far = geom.copy()
    far[2] *= 3.0
    with contextlib.redirect_stdout(io.StringIO()):
        table_far = fns["bond_table"](far, elements)
        ok, added, removed = fns["preserved"](table, table_far)
    assert ok is False and added == [] and removed == [(0, 2)]
    with contextlib.redirect_stdout(io.StringIO()):
        ok2, a2, r2 = fns["preserved"](table, list(table))
    assert ok2 is True and a2 == [] and r2 == []


def test_make_tgt_atom_pair_window_live():
    fns = _confsearch_fns()

    # three atoms on a line (coordinates in the Angstrom the call site
    # passes): pair (0,1) at 5.0 A sits inside the mixed-unit window,
    # pairs to atom 2 (55-60 A) are far outside
    geom = np.array([[0.0, 0.0, 0.0],
                     [5.0, 0.0, 0.0],
                     [60.0, 0.0, 0.0]])
    elements = ["C", "C", "C"]
    with contextlib.redirect_stdout(io.StringIO()):
        pairs = fns["tgt_pairs"](geom, elements, [0, 1, 2])
    kinds = {(tuple(p[0]), p[1]) for p in pairs}

    # DEFECT (off-by-one): return_pair_idx = ii(ii-1)/2 - (ii-jj) - 1
    # is one LESS than the combinations-order index, so every pair's
    # window test reads the PREVIOUS pair's normalized distance and the
    # first pair wraps to the LAST (Python index -1). Executed: pair
    # (0,1) — truly inside the window at 1.76 — is REJECTED because it
    # reads (1,2)'s 19.4; pair (0,2) — truly outside at 21.2 — is
    # ACCEPTED (with both its p/m tasks) because it reads (0,1)'s 1.76.
    assert ((0, 2), "p") in kinds and ((0, 2), "m") in kinds
    assert not any(tuple(p[0]) == (0, 1) for p in pairs)

    # QUIRK (unit mixup): the window divides ANGSTROM distances by BOHR
    # covalent-radius sums (covalent_radii_lib is Bohr, read_xyz is A),
    # so a pair at 1.2x its covalent sum — inside the stated (1, 8)
    # window in consistent units — is REJECTED (used ratio 1.2/1.8897
    # = 0.63 < 1); in effect only pairs beyond ~1.9 covalent sums are
    # AFIR targets
    # (for n=2 the -1 wraparound maps the single pair to itself, so the
    # unit quirk is observable in isolation)
    cc_sum_bohr = 2.0 * 1.4172945
    cc_sum_ang = cc_sum_bohr / _A2B
    geom2 = np.array([[0.0, 0.0, 0.0],
                      [1.2 * cc_sum_ang, 0.0, 0.0]])
    with contextlib.redirect_stdout(io.StringIO()):
        pairs2 = fns["tgt_pairs"](geom2, ["C", "C"], [0, 1])
    assert pairs2 == []
    geom2b = np.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    with contextlib.redirect_stdout(io.StringIO()):
        pairs2b = fns["tgt_pairs"](geom2b, ["C", "C"], [0, 1])
    assert {(tuple(p[0]), p[1]) for p in pairs2b} == {((0, 1), "p"),
                                                      ((0, 1), "m")}
