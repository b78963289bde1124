"""LIVE parity wave 11: the REST of the bias-potential library, executed
through the actual reference torch classes side by side with ours
(waves 1 covered AFIR/keep/keep_angle/IDPP; this closes the remaining
driveable classes in multioptpy/Potential/).

Conventions learned by execution (not visible in signatures):

  * flux_potential.py:24 applies NO 1/p factor even though the -fp help
    string promises "k/p*(x-x_0)^p" (interface.py:213) — behavior parity
    follows the code; our FluxPotential was aligned to it in this wave.
  * void_point_potential.py and switching_potential.py WellPotentialVP
    never convert their reference POINT coordinates Angstrom->Bohr even
    though the parser documents them as Angstrom (interface.py:1060
    "#ang") and the companion limit/target distances ARE converted.
    Ours converts (the documented unit); the live tests therefore feed
    the reference the pre-converted Bohr point.
  * mechano_force_potential.py ships pN->a.u. as the rounded 1.213e-5
    (the exact conversion is 1.21378e-5, 6.4e-4 relative away) — pinned
    with rtol 1e-3 instead of degrading our constant.
  * the reference's out-of-plane atom order is [center, probe, p1, p2]
    (keep_outofplain_angle_potential.py:75-78); ours is
    [probe, center, p1, p2] and cli.py:441 reorders — mirrored here.
  * StructKeepPotentialAniso is DEAD upstream (no CLI flag or
    potential.py registration constructs it); our keep_aniso is a
    reachable atom-pair generalization, deliberately not compared.

Ref anchors: Potential/{keep,anharmonic_keep,keep_angle,
keep_dihedral_angle,keep_outofplain_angle,LJ_repulsive,switching,
void_point,universal,flux,value_range,mechano_force,electrostatic,
gaussian}_potential.py.
"""

import contextlib
import io
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

SYMBOLS = ["C", "H", "O", "N", "C", "H", "O", "H"]
Z = [6, 1, 8, 7, 6, 1, 8, 1]
_A2B = 1.8897261254578281


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _coords(seed=21, n=8, spread=2.0, shift=3.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3)) * spread + shift


def _ref_e_g(pot, coords_bohr):
    import torch

    g = torch.tensor(coords_bohr, dtype=torch.float64, requires_grad=True)
    with contextlib.redirect_stdout(io.StringIO()):
        e = pot.calc_energy(g)
    e.backward()
    # inside the flat well the reference returns a fresh constant tensor
    # disconnected from the graph -> grad is None; the true gradient is 0
    grad = (g.grad.numpy() if g.grad is not None
            else np.zeros_like(coords_bohr))
    return float(e.detach()), grad


def _ours_e_g(ours, coords_bohr):
    p = jnp.asarray(ours.init_params())
    c = jnp.asarray(coords_bohr)
    e = float(ours.energy(c, p))
    g = np.asarray(jax.grad(lambda cc: ours.energy(cc, p))(c))
    return e, g


def _cmp(ref_pot, ours, coords, rel=2e-6, atol=1e-10, grad_rtol=None):
    e_ref, g_ref = _ref_e_g(ref_pot, coords)
    e, g = _ours_e_g(ours, coords)
    assert e == pytest.approx(e_ref, rel=rel, abs=atol)
    np.testing.assert_allclose(g, g_ref, rtol=grad_rtol or max(rel * 10, 2e-5),
                               atol=atol)


# ==========================================================================
# keep family
# ==========================================================================

def test_keep_v2_fragment_centroids_live():
    mod = _ref_module("multioptpy.Potential.keep_potential")
    from multioptpy_tpu.potentials.keep import KeepPotentialV2

    coords = _coords(31)
    ref = mod.StructKeepPotentialv2(keep_pot_v2_spring_const=1.7,
                                    keep_pot_v2_distance=2.1,
                                    keep_pot_v2_fragm1=[1, 2, 3],
                                    keep_pot_v2_fragm2=[5, 6])
    ours = KeepPotentialV2(spring_const=1.7, distance=2.1,
                           fragm_1=[1, 2, 3], fragm_2=[5, 6])
    _cmp(ref, ours, coords)


def test_anharmonic_keep_morse_live():
    mod = _ref_module("multioptpy.Potential.anharmonic_keep_potential")
    from multioptpy_tpu.potentials.keep import AnharmonicKeepPotential

    coords = _coords(32)
    ref = mod.StructAnharmonicKeepPotential(
        anharmonic_keep_pot_spring_const=1.1,
        anharmonic_keep_pot_potential_well_depth=0.25,
        anharmonic_keep_pot_distance=1.4,
        anharmonic_keep_pot_atom_pairs=[2, 7])
    ours = AnharmonicKeepPotential(spring_const=1.1, well_depth=0.25,
                                   distance=1.4, atom_pair=[2, 7])
    _cmp(ref, ours, coords)


def test_keep_angle_v2_fragment_centroids_live():
    mod = _ref_module("multioptpy.Potential.keep_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepAnglePotentialV2

    coords = _coords(33)
    ref = mod.StructKeepAnglePotentialv2(keep_angle_v2_spring_const=0.9,
                                         keep_angle_v2_angle=95.0,
                                         keep_angle_v2_fragm1=[1, 2],
                                         keep_angle_v2_fragm2=[4],
                                         keep_angle_v2_fragm3=[6, 7, 8])
    ours = KeepAnglePotentialV2(spring_const=0.9, angle=95.0,
                                fragm_1=[1, 2], fragm_2=[4],
                                fragm_3=[6, 7, 8])
    _cmp(ref, ours, coords)


# ==========================================================================
# dihedral / out-of-plane family
# ==========================================================================

def test_keep_dihedral_live():
    mod = _ref_module("multioptpy.Potential.keep_dihedral_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepDihedralPotential

    coords = _coords(34)
    ref = mod.StructKeepDihedralAnglePotential(
        keep_dihedral_angle_spring_const=1.3,
        keep_dihedral_angle_angle=60.0,
        keep_dihedral_angle_atom_pairs=[1, 3, 5, 7])
    ours = KeepDihedralPotential(spring_const=1.3, angle=60.0,
                                 atoms=[1, 3, 5, 7])
    _cmp(ref, ours, coords)


def test_keep_dihedral_v2_live():
    mod = _ref_module("multioptpy.Potential.keep_dihedral_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepDihedralPotentialV2

    coords = _coords(35)
    ref = mod.StructKeepDihedralAnglePotentialv2(
        keep_dihedral_angle_v2_spring_const=0.8,
        keep_dihedral_angle_v2_angle=-45.0,
        keep_dihedral_angle_v2_fragm1=[1, 2],
        keep_dihedral_angle_v2_fragm2=[3],
        keep_dihedral_angle_v2_fragm3=[5, 6],
        keep_dihedral_angle_v2_fragm4=[7, 8])
    ours = KeepDihedralPotentialV2(spring_const=0.8, angle=-45.0,
                                   fragm_1=[1, 2], fragm_2=[3],
                                   fragm_3=[5, 6], fragm_4=[7, 8])
    _cmp(ref, ours, coords)


def test_keep_dihedral_cos_live():
    mod = _ref_module("multioptpy.Potential.keep_dihedral_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepDihedralPotentialCos

    coords = _coords(36)
    ref = mod.StructKeepDihedralAnglePotentialCos(
        keep_dihedral_angle_cos_potential_const=0.6,
        keep_dihedral_angle_cos_angle_const=3.0,
        keep_dihedral_angle_cos_angle=30.0,
        keep_dihedral_angle_cos_fragm1=[1],
        keep_dihedral_angle_cos_fragm2=[3, 4],
        keep_dihedral_angle_cos_fragm3=[5],
        keep_dihedral_angle_cos_fragm4=[7, 8])
    ours = KeepDihedralPotentialCos(potential_const=0.6, angle=30.0,
                                    multiplicity=3.0, fragm_1=[1],
                                    fragm_2=[3, 4], fragm_3=[5],
                                    fragm_4=[7, 8])
    _cmp(ref, ours, coords)


def test_keep_out_of_plane_live():
    """Ref order [center, probe, p1, p2] -> ours [probe, center, p1, p2]
    (the cli.py:441 reordering)."""
    mod = _ref_module("multioptpy.Potential.keep_outofplain_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepOutOfPlanePotential

    coords = _coords(37)
    ref = mod.StructKeepOutofPlainAnglePotential(
        keep_out_of_plain_angle_spring_const=1.2,
        keep_out_of_plain_angle_angle=20.0,
        keep_out_of_plain_angle_atom_pairs=[2, 1, 5, 8])
    ours = KeepOutOfPlanePotential(spring_const=1.2, angle=20.0,
                                   atoms=[1, 2, 5, 8])
    _cmp(ref, ours, coords)


def test_keep_out_of_plane_v2_live():
    mod = _ref_module("multioptpy.Potential.keep_outofplain_angle_potential")
    from multioptpy_tpu.potentials.angles import KeepOutOfPlanePotentialV2

    coords = _coords(38)
    ref = mod.StructKeepOutofPlainAnglePotentialv2(
        keep_out_of_plain_angle_v2_spring_const=0.7,
        keep_out_of_plain_angle_v2_angle=10.0,
        keep_out_of_plain_angle_v2_fragm1=[2, 3],
        keep_out_of_plain_angle_v2_fragm2=[1],
        keep_out_of_plain_angle_v2_fragm3=[5, 6],
        keep_out_of_plain_angle_v2_fragm4=[7, 8])
    ours = KeepOutOfPlanePotentialV2(spring_const=0.7, angle=10.0,
                                     fragm_1=[1], fragm_2=[2, 3],
                                     fragm_3=[5, 6], fragm_4=[7, 8])
    _cmp(ref, ours, coords)


# ==========================================================================
# LJ repulsive family
# ==========================================================================

def test_lj_repulsive_scale_live():
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveScale

    coords = _coords(39, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialScale(
        repulsive_potential_well_scale=1.2,
        repulsive_potential_dist_scale=0.9,
        repulsive_potential_Fragm_1=[1, 2, 3],
        repulsive_potential_Fragm_2=[5, 6, 7],
        element_list=SYMBOLS)
    ours = LJRepulsiveScale(well_scale=1.2, dist_scale=0.9,
                            fragm_1=[1, 2, 3], fragm_2=[5, 6, 7],
                            element_z=Z)
    _cmp(ref, ours, coords)


def test_lj_repulsive_value_live():
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveValue

    coords = _coords(40, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialValue(
        repulsive_potential_well_value=6.0,
        repulsive_potential_dist_value=3.2,
        repulsive_potential_Fragm_1=[1, 4],
        repulsive_potential_Fragm_2=[6, 8],
        element_list=SYMBOLS)
    ours = LJRepulsiveValue(well_value_kjmol=6.0, dist_value_ang=3.2,
                            fragm_1=[1, 4], fragm_2=[6, 8], element_z=Z)
    _cmp(ref, ours, coords)


def test_lj_repulsive_v2_scale_probe_live():
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveV2Probe

    coords = _coords(41, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialv2Scale(
        repulsive_potential_v2_well_scale=1.1,
        repulsive_potential_v2_dist_scale=0.8,
        repulsive_potential_v2_length=1.5,
        repulsive_potential_v2_const_rep=2.0,
        repulsive_potential_v2_const_attr=1.0,
        repulsive_potential_v2_order_rep=12,
        repulsive_potential_v2_order_attr=6,
        repulsive_potential_v2_center=[1, 2],
        repulsive_potential_v2_target=[5, 6, 7],
        element_list=SYMBOLS)
    ours = LJRepulsiveV2Probe(well=1.1, dist=0.8, length_ang=1.5,
                              const_rep=2.0, const_attr=1.0, order_rep=12,
                              order_attr=6, center=[1, 2],
                              target=[5, 6, 7], element_z=Z, mode="scale")
    _cmp(ref, ours, coords)


def test_lj_repulsive_v2_value_probe_live():
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveV2Probe

    coords = _coords(42, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialv2Value(
        repulsive_potential_v2_well_value=5.0,
        repulsive_potential_v2_dist_value=2.8,
        repulsive_potential_v2_length=1.0,
        repulsive_potential_v2_const_rep=1.5,
        repulsive_potential_v2_const_attr=0.5,
        repulsive_potential_v2_order_rep=10,
        repulsive_potential_v2_order_attr=4,
        repulsive_potential_v2_center=[2, 3],
        repulsive_potential_v2_target=[6, 8],
        element_list=SYMBOLS)
    ours = LJRepulsiveV2Probe(well=5.0, dist=2.8, length_ang=1.0,
                              const_rep=1.5, const_attr=0.5, order_rep=10,
                              order_attr=4, center=[2, 3], target=[6, 8],
                              element_z=Z, mode="value")
    _cmp(ref, ours, coords)


def test_lj_repulsive_gaussian_live():
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import LJRepulsiveGaussian

    coords = _coords(43, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialGaussian(
        repulsive_potential_gaussian_LJ_well_depth=4.0,
        repulsive_potential_gaussian_LJ_dist=3.0,
        repulsive_potential_gaussian_gau_well_depth=8.0,
        repulsive_potential_gaussian_gau_dist=2.5,
        repulsive_potential_gaussian_gau_range=1.0,
        repulsive_potential_gaussian_fragm_1=[1, 2],
        repulsive_potential_gaussian_fragm_2=[5, 7],
        element_list=SYMBOLS)
    ours = LJRepulsiveGaussian(well_depth=4.0, dist=3.0, gau_well_depth=8.0,
                               gau_dist=2.5, gau_range=1.0,
                               fragm_1=[1, 2], fragm_2=[5, 7])
    _cmp(ref, ours, coords)


def test_lj_repulsive_cone_live():
    """The reference builds cone_angle as a float32 tensor
    (LJ_repulsive_potential.py:326) -> parity at the f32 floor."""
    mod = _ref_module("multioptpy.Potential.LJ_repulsive_potential")
    from multioptpy_tpu.potentials.repulsive import ConePotential

    coords = _coords(44, spread=3.0, shift=4.0)
    ref = mod.LJRepulsivePotentialCone(
        cone_potential_well_value=5.0,
        cone_potential_dist_value=3.0,
        cone_potential_cone_angle=100.0,
        cone_potential_center=1,
        cone_potential_three_atoms=[2, 3, 4],
        cone_potential_target=[6, 7, 8],
        element_list=SYMBOLS)
    ours = ConePotential(well_value=5.0, dist_value=3.0, cone_angle=100.0,
                         center=1, three_atoms=[2, 3, 4], target=[6, 7, 8],
                         element_z=Z)
    _cmp(ref, ours, coords, rel=1e-5, grad_rtol=1e-4)


# ==========================================================================
# well / wall family (quintic switching)
# ==========================================================================

def _well_coords(r_bohr):
    """Two atoms at controlled distance + spectators (fragments = single
    atoms so the centroid distance IS r)."""
    c = _coords(45, spread=0.5, shift=6.0)
    c[0] = [0.0, 0.0, 0.0]
    c[1] = [r_bohr, 0.0, 0.0]
    return c


@pytest.mark.parametrize("r_ang", [0.7, 1.55, 3.5, 6.6, 8.5])
def test_well_potential_all_branches_live(r_ang):
    """One point in each of the 5 piecewise regions of the quintic well
    (limits a,b,c,d = 1,2,6,8 ang; ref: switching_potential.py:38-61)."""
    mod = _ref_module("multioptpy.Potential.switching_potential")
    from multioptpy_tpu.potentials.well import WellPotential

    coords = _well_coords(r_ang * _A2B)
    ref = mod.WellPotential(well_pot_wall_energy=20.0,
                            well_pot_limit_dist=["1.0", "2.0", "6.0", "8.0"],
                            well_pot_fragm_1=[1], well_pot_fragm_2=[2])
    ours = WellPotential(wall_energy=20.0, limits=[1.0, 2.0, 6.0, 8.0],
                         fragm_1=[1], fragm_2=[2])
    _cmp(ref, ours, coords, atol=1e-12)


def test_well_wall_live():
    mod = _ref_module("multioptpy.Potential.switching_potential")
    from multioptpy_tpu.potentials.well import WellPotentialWall

    coords = _coords(46, spread=2.5, shift=5.0)
    ref = mod.WellPotentialWall(
        wall_well_pot_wall_energy=15.0,
        wall_well_pot_direction="y",
        wall_well_pot_limit_dist=["0.5", "1.5", "4.0", "5.5"],
        wall_well_pot_target=[1, 3, 5])
    ours = WellPotentialWall(wall_energy=15.0, limits=[0.5, 1.5, 4.0, 5.5],
                             axis="y", atoms=[1, 3, 5])
    _cmp(ref, ours, coords)


def test_well_vp_live():
    """Ref never converts the point to Bohr (switching_potential.py:115)
    -> feed it the Bohr value ours derives from the documented Angstrom."""
    mod = _ref_module("multioptpy.Potential.switching_potential")
    from multioptpy_tpu.potentials.well import WellPotentialVP

    coords = _coords(47, spread=2.5, shift=5.0)
    point_ang = [1.2, 2.0, 2.5]
    point_bohr = [v * _A2B for v in point_ang]
    ref = mod.WellPotentialVP(
        void_point_well_pot_wall_energy=12.0,
        void_point_well_pot_coordinate=point_bohr,
        void_point_well_pot_limit_dist=["1.0", "2.0", "5.0", "7.0"],
        void_point_well_pot_target=[2, 4, 6])
    ours = WellPotentialVP(wall_energy=12.0, limits=[1.0, 2.0, 5.0, 7.0],
                           point=point_ang, atoms=[2, 4, 6])
    _cmp(ref, ours, coords, rel=1e-5, grad_rtol=1e-4)


def test_well_around_live():
    mod = _ref_module("multioptpy.Potential.switching_potential")
    from multioptpy_tpu.potentials.well import WellPotentialAround

    coords = _coords(48, spread=2.5, shift=5.0)
    ref = mod.WellPotentialAround(
        around_well_pot_wall_energy=18.0,
        around_well_pot_center=[1, 2],
        around_well_pot_limit_dist=["1.0", "2.0", "5.0", "7.0"],
        around_well_pot_target=[5, 6, 7])
    ours = WellPotentialAround(wall_energy=18.0, limits=[1.0, 2.0, 5.0, 7.0],
                               center_fragm=[1, 2], atoms=[5, 6, 7])
    _cmp(ref, ours, coords)


def test_void_point_live():
    """Same missing Angstrom->Bohr conversion for the point
    (void_point_potential.py:20, parser comment interface.py:1060)."""
    import torch
    mod = _ref_module("multioptpy.Potential.void_point_potential")
    from multioptpy_tpu.potentials.well import VoidPointPotential

    coords = _coords(49, spread=2.0, shift=4.0)
    point_ang = [2.0, 2.0, 2.0]
    ref = mod.VoidPointPotential(
        void_point_pot_spring_const=1.5,
        void_point_pot_atoms=3,
        void_point_pot_coord=torch.tensor([v * _A2B for v in point_ang],
                                          dtype=torch.float64),
        void_point_pot_distance=1.8,
        void_point_pot_order=4)
    ours = VoidPointPotential(spring_const=1.5, distance=1.8, order=4,
                              point=point_ang, atom=3)
    _cmp(ref, ours, coords)


# ==========================================================================
# universal / flux / value-range
# ==========================================================================

def test_universal_potential_live():
    mod = _ref_module("multioptpy.Potential.universal_potential")
    from multioptpy_tpu.potentials.extra import UniversalPotential

    coords = _coords(50)
    ref = mod.UniversalPotential(universal_pot_const=30.0,
                                 universal_pot_target=[1, 3, 5, 7])
    ours = UniversalPotential(const=30.0, atoms=[1, 3, 5, 7])
    _cmp(ref, ours, coords)


def test_flux_potential_no_order_division_live():
    """Pins the reference's code-over-help behavior: E = k (x-d)^p with NO
    1/p (flux_potential.py:24 vs the help string's k/p at
    interface.py:213)."""
    mod = _ref_module("multioptpy.Potential.flux_potential")
    from multioptpy_tpu.potentials.extra import FluxPotential

    coords = _coords(51)
    direction = np.array([1.0, 1.5, 2.0])
    ref = mod.FluxPotential(flux_pot_const=0.05,
                            flux_pot_order=2.0,
                            flux_pot_direction=direction,
                            flux_pot_target=[2, 4, 6])
    ours = FluxPotential(const=0.05, order=2.0, direction=direction,
                         atoms=[2, 4, 6])
    _cmp(ref, ours, coords)


def test_value_range_softplus_live():
    mod = _ref_module("multioptpy.Potential.value_range_potential")
    from multioptpy_tpu.potentials.misc import ValueRangePotential

    coords = _coords(52)
    ref = mod.ValueRangePotential(value_range_upper_const=3.0,
                                  value_range_lower_const=2.0,
                                  value_range_upper_distance=3.5,
                                  value_range_lower_distance=1.5,
                                  value_range_fragm_1=[1, 2],
                                  value_range_fragm_2=[5, 6])
    ours = ValueRangePotential(upper_const=3.0, lower_const=2.0,
                               upper_distance=3.5, lower_distance=1.5,
                               fragm_1=[1, 2], fragm_2=[5, 6])
    _cmp(ref, ours, coords)


# ==========================================================================
# mechano force / electrostatics / metadynamics
# ==========================================================================

def test_mechano_force_live():
    """rtol 1e-3: the reference rounds pN->a.u. to 1.213e-5
    (mechano_force_potential.py:11); exact is 1.21378e-5."""
    mod = _ref_module("multioptpy.Potential.mechano_force_potential")
    from multioptpy_tpu.potentials.misc import LinearMechanoForce

    coords = _coords(53)
    ref = mod.LinearMechanoForcePotential(linear_mechano_force=500.0,
                                          linear_mechano_force_atoms_1=[1, 3],
                                          linear_mechano_force_atoms_2=[5, 7])
    ours = LinearMechanoForce(force_pn=500.0, atoms_1=[1, 3], atoms_2=[5, 7])
    _cmp(ref, ours, coords, rel=1e-3, grad_rtol=1e-3, atol=1e-12)


def test_mechano_force_v2_live():
    mod = _ref_module("multioptpy.Potential.mechano_force_potential")
    from multioptpy_tpu.potentials.misc import LinearMechanoForceV2

    coords = _coords(54)
    ref = mod.LinearMechanoForcePotentialv2(
        linear_mechano_force=800.0,
        linear_mechano_force_atom_v2=[2, 6])
    ours = LinearMechanoForceV2(force_pn=800.0, atom_pair=[2, 6])
    _cmp(ref, ours, coords, rel=1e-3, grad_rtol=1e-3, atol=1e-12)


def test_electrostatic_fragment_live():
    mod = _ref_module("multioptpy.Potential.electrostatic_potential")
    from multioptpy_tpu.potentials.misc import ElectrostaticFragment

    coords = _coords(55, spread=2.5, shift=4.0)
    ref = mod.ElectroStaticPotentialFragment(es_charge_scale=0.8,
                                             es_Fragm_1=[1, 2, 3],
                                             es_Fragm_2=[5, 6],
                                             element_list=SYMBOLS)
    ours = ElectrostaticFragment(charge_scale=0.8, fragm_1=[1, 2, 3],
                                 fragm_2=[5, 6], element_z=Z)
    _cmp(ref, ours, coords)


def test_electrostatic_atom_pair_live():
    mod = _ref_module("multioptpy.Potential.electrostatic_potential")
    from multioptpy_tpu.potentials.misc import ElectrostaticAtomPair

    coords = _coords(56, spread=2.5, shift=4.0)
    ref = mod.ElectroStaticPotentialAtomPair(es_charge_scale=1.2,
                                             es_atoms=[1, 3, 5, 7],
                                             element_list=SYMBOLS)
    ours = ElectrostaticAtomPair(charge_scale=1.2, atoms=[1, 3, 5, 7],
                                 element_z=Z)
    _cmp(ref, ours, coords)


def test_gaussian_metadynamics_hills_live():
    """Three deposited hills on a bond CV: the reference keeps a python
    history list (gaussian_potential.py:30-40); ours a padded static
    buffer — energies and gradients must agree hill-for-hill."""
    import torch
    mod = _ref_module("multioptpy.Potential.gaussian_potential")
    from multioptpy_tpu.potentials.misc import GaussianBiasPotential

    coords = _coords(57)
    hills = [2.4, 2.6, 2.9]  # CV history, Bohr
    height, width = 5.0, 0.3  # kJ/mol, Angstrom

    ref = mod.GaussianPotential(gaussian_potential_height=[height],
                                gaussian_potential_width=[width],
                                gaussian_potential_target=["bond"],
                                gaussian_potential_tgt_atom=[[1, 4]])
    ref.history_list = [list(hills)]
    g = torch.tensor(coords, dtype=torch.float64, requires_grad=True)
    with contextlib.redirect_stdout(io.StringIO()):
        e = ref.calc_energy_for_metadyn(g)
    e.backward()
    e_ref, g_ref = float(e.detach()), g.grad.numpy()

    ours = GaussianBiasPotential(height_kjmol=height, width_ang=width,
                                 atom_pair=[1, 4])
    for h in hills:
        ours.deposit(h)
    e_o, g_o = _ours_e_g(ours, coords)
    assert e_o == pytest.approx(e_ref, rel=2e-6)
    np.testing.assert_allclose(g_o, g_ref, rtol=2e-5, atol=1e-12)
