"""Command-line entry points (ref: multioptpy/interface.py argparse builders
:40-341, Entrypoints/core.py:4-33, pyproject console scripts).

One shared parser carries the flags common to every workload (input file,
backend, charge/multiplicity, bias potentials, constraints); each entry
point adds its own. Atom selections accept the reference's "1,2,4-7"
syntax (ref: interface.py:408 num_parse).
"""

import argparse
import json
import os
import sys

import numpy as np


def num_parse(spec):
    """'1,2,4-7' -> [1, 2, 4, 5, 6, 7] (1-based, ref: interface.py:408)."""
    out = []
    for tok in str(spec).split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok:
            a, b = tok.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(tok))
    return out


def _base_parser(description):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("input", help="xyz input file")
    p.add_argument("-bs", "--basisset", default="6-31G*")
    p.add_argument("-func", "--functional", default="B3LYP")
    p.add_argument("-c", "--charge", type=int, default=0)
    p.add_argument("-m", "--multiplicity", type=int, default=1)
    p.add_argument("-xtb", "--xtb", default=None,
                   help="use tblite backend with this method (GFN2-xTB)")
    p.add_argument("-pyscf", "--usepyscf", action="store_true")
    p.add_argument("-calc", "--calculator", default=None,
                   help="explicit backend: lj | emt | tersoff | sqm | sqm2 "
                        "| tblite | pyscf | psi4 | muller_brown")
    p.add_argument("-ns", "--NSTEP", type=int, default=1000)
    p.add_argument("-o", "--opt_method", nargs="*", default=["rfo_fsb"])
    p.add_argument("-fc", "--fc_count", type=int, default=-1)
    p.add_argument("-mfc", "--mfc_count", type=int, default=-1)
    p.add_argument("-mh", "--model_hessian", default=None,
                   help="lindh | fischer | schlegel | swart")
    p.add_argument("-order", "--saddle_order", type=int, default=0)
    p.add_argument("-diis", "--diis_variant", default=None,
                   choices=["gdiis", "gediis", "kdiis", "ediis", "adiis",
                            "c2diis"],
                   help="DIIS extrapolation chained onto quasi-Newton steps")
    p.add_argument("-tight", "--tight_convergence_criteria",
                   action="store_true")
    p.add_argument("-loose", "--loose_convergence_criteria",
                   action="store_true")
    p.add_argument("-tr", "--trust_radius", type=float, default=None)
    p.add_argument("-delta", "--delta", type=float, default=1.0,
                   help="first-order step scale (mwsd needs ~1e3)")
    p.add_argument("-es", "--excited_state", type=int, default=0,
                   help="TDA excited-state index for the pyscf backend")
    p.add_argument("-srb", "--srb", action="store_true",
                   help="enable the GFN0 short-range bond correction in "
                        "the sqm backend")
    # bias potentials (full ref: interface.py:205-240 parser_for_biasforce
    # surface, identical flag names and argument orders)
    p.add_argument("-ma", "--manual_AFIR", nargs="*", default=[],
                   help="gamma(kJ/mol) fragm1 fragm2 (repeatable triplets)")
    p.add_argument("-rp", "--repulsive_potential", nargs="*", default=[],
                   help="well_scale dist_scale fragm1 fragm2 scale|value "
                        "(repeatable quintets; UFF LJ)")
    p.add_argument("-rpv2", "--repulsive_potential_v2", nargs="*",
                   default=[],
                   help="well dist length(ang) const_rep const_attr "
                        "order_rep order_attr center(1,2) target(3-5) "
                        "scale|value (repeatable 10-lets; probe-point LJ)")
    p.add_argument("-rpg", "--repulsive_potential_gaussian", nargs="*",
                   default=[],
                   help="LJ_well(kJ/mol) LJ_dist(ang) gau_well(kJ/mol) "
                        "gau_dist(ang) gau_range(ang) fragm1 fragm2 "
                        "(repeatable 7-lets)")
    p.add_argument("-cp", "--cone_potential", nargs="*", default=[],
                   help="well(kJ/mol) dist(ang) cone_angle(deg) center "
                        "three_atoms(2,3,4) target(5-9) (repeatable 6-lets)")
    p.add_argument("-fp", "--flux_potential", nargs="*", default=[],
                   help="kx,ky,kz px,py,pz x,y,z(ang) fragm "
                        "(repeatable quadruplets)")
    p.add_argument("-kp", "--keep_pot", nargs="*", default=[],
                   help="k r0(ang) atom1,atom2 (repeatable triplets)")
    p.add_argument("-kpv2", "--keep_pot_v2", nargs="*", default=[],
                   help="k r0(ang) fragm1 fragm2 (repeatable quadruplets)")
    p.add_argument("-akp", "--anharmonic_keep_pot", nargs="*", default=[],
                   help="De(a.u.) k(a.u.) r0(ang) atom1,atom2 "
                        "(repeatable quadruplets; Morse)")
    p.add_argument("-ka", "--keep_angle", nargs="*", default=[],
                   help="k angle(deg) a1,a2,a3")
    p.add_argument("-kav2", "--keep_angle_v2", nargs="*", default=[],
                   help="k angle(deg) fragm1 fragm2 fragm3 "
                        "(repeatable quintets)")
    p.add_argument("-up", "--universal_potential", nargs="*", default=[],
                   help="potential(kJ/mol) target_atoms (repeatable pairs)")
    p.add_argument("-kda", "--keep_dihedral_angle", nargs="*", default=[],
                   help="k angle(deg) a1,a2,a3,a4")
    p.add_argument("-kdav2", "--keep_dihedral_angle_v2", nargs="*",
                   default=[],
                   help="k angle(deg) f1 f2 f3 f4 (repeatable 6-lets)")
    p.add_argument("-kdac", "--keep_dihedral_angle_cos", nargs="*",
                   default=[],
                   help="k n angle(deg) f1 f2 f3 f4 (repeatable 7-lets)")
    p.add_argument("-kopa", "--keep_out_of_plain_angle", nargs="*",
                   default=[],
                   help="k angle(deg) a1,a2,a3,a4 (repeatable triplets)")
    p.add_argument("-kopav2", "--keep_out_of_plain_angle_v2", nargs="*",
                   default=[],
                   help="k angle(deg) f1 f2 f3 f4 (repeatable 6-lets)")
    p.add_argument("-vpp", "--void_point_pot", nargs="*", default=[],
                   help="k r0(ang) x,y,z(ang) atoms order "
                        "(repeatable quintets)")
    p.add_argument("-brp", "--bond_range_potential", nargs="*", default=[],
                   help="k_upper k_lower upper(ang) lower(ang) fragm1 "
                        "fragm2 (repeatable 6-lets)")
    p.add_argument("-wp", "--well_pot", nargs="*", default=[],
                   help="wall(kJ/mol) fragm1 fragm2 a,b,c,d(ang) "
                        "(repeatable quadruplets)")
    p.add_argument("-wwp", "--wall_well_pot", nargs="*", default=[],
                   help="wall(kJ/mol) x|y|z a,b,c,d(ang) atoms "
                        "(repeatable quadruplets)")
    p.add_argument("-vpwp", "--void_point_well_pot", nargs="*", default=[],
                   help="wall(kJ/mol) x,y,z(ang) a,b,c,d(ang) atoms "
                        "(repeatable quadruplets)")
    p.add_argument("-awp", "--around_well_pot", nargs="*", default=[],
                   help="wall(kJ/mol) center_fragm a,b,c,d(ang) atoms "
                        "(repeatable quadruplets)")
    p.add_argument("-metad", "--metadynamics", nargs="*", default=[],
                   help="bond height(kJ/mol) width(ang) a1,a2 "
                        "(repeatable quadruplets; gaussian hills)")
    p.add_argument("-lmefp", "--linear_mechano_force_pot", nargs="*",
                   default=[],
                   help="force(pN) atoms1 atoms2 (repeatable triplets)")
    p.add_argument("-lmefpv2", "--linear_mechano_force_pot_v2", nargs="*",
                   default=[],
                   help="force(pN) atom_pair (repeatable pairs)")
    p.add_argument("-aerpv2", "--asym_ellipsoid_v2", nargs="*", default=[],
                   help="same syntax as -aerp (free-parameter variant)")
    p.add_argument("-nrp", "--nano_reactor_potential", nargs="*",
                   default=[],
                   help="inner(ang) outer(ang) t_contract(ps) t_expand(ps) "
                        "k_contract(kcal/mol/A^2) k_expand (one 6-let)")
    p.add_argument("-esp", "--electrostatic_potential", nargs="*",
                   default=[],
                   help="charge_scale fragm1 fragm2 (repeatable triplets; "
                        "UFF effective charges)")
    p.add_argument("-espap", "--electrostatic_potential_atom_pair",
                   nargs="*", default=[],
                   help="charge_scale atoms (repeatable pairs)")
    p.add_argument("-aerp", "--asym_ellipsoid", nargs="*", default=[],
                   help="eps(kJ/mol) sig_xp,xm,yp,ym,zp,zm(ang) dist(ang) "
                        "root,lj offtgt|none (repeatable quintets; GNB "
                        "asymmetric ellipsoidal LJ)")
    p.add_argument("-smp", "--spacer_model_potential", nargs="*", default=[],
                   help="depth(kJ/mol) sigma(ang) cavity_scaling n_particles "
                        "target_atoms (repeatable quintets)")
    p.add_argument("-fix", "--fix_atoms", default="",
                   help="frozen atoms, e.g. 1,2,5-8")
    p.add_argument("-pc", "--projection_constrain", nargs="*", default=[],
                   help="bond i,j [value_ang] | angle i,j,k [deg] | "
                        "dihedral i,j,k,l [deg]")
    p.add_argument("-gi", "--geom_info", nargs="*", default=[],
                   help="track internal parameters per step: bond i,j | "
                        "angle i,j,k | dihedral i,j,k,l (repeatable pairs; "
                        "ref: optimization.py:1415)")
    p.add_argument("-x64", "--float64", action="store_true", default=True)
    p.add_argument("-out", "--output_dir", default=None)
    return p


def _load_system(args):
    import jax

    if args.float64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR

    symbols, coords_ang = read_xyz(args.input)
    z = symbols_to_z(symbols)
    coords = jnp.asarray(coords_ang * ANGSTROM2BOHR)
    return symbols, coords, jnp.asarray(z)


def _make_calculator(args):
    from multioptpy_tpu.calculators import get_calculator

    if args.calculator:
        name, kw = args.calculator, {}
        if name == "sqm" and getattr(args, "srb", False):
            kw["srb"] = True
    elif args.xtb:
        name, kw = "tblite", {"method": args.xtb}
    elif args.usepyscf:
        name, kw = "pyscf", {"method": args.functional,
                             "basis": args.basisset,
                             "excited_state": getattr(args, "excited_state",
                                                      0)}
    else:
        name, kw = "lj", {}
    return get_calculator(name, charge=args.charge,
                          multiplicity=args.multiplicity, **kw)


def _make_bias(args, z):
    """flags -> BiasEngine (ref: interface.py:407 force_data_parser)."""
    from multioptpy_tpu.potentials import BiasEngine, get_potential

    pots = []
    ma = args.manual_AFIR
    for i in range(0, len(ma), 3):
        pots.append(get_potential(
            "afir", gamma=float(ma[i]), fragm_1=num_parse(ma[i + 1]),
            fragm_2=num_parse(ma[i + 2]), element_z=np.asarray(z)))
    kp = args.keep_pot
    for i in range(0, len(kp), 3):
        pots.append(get_potential(
            "keep", spring_const=float(kp[i]), distance=float(kp[i + 1]),
            atom_pair=num_parse(kp[i + 2])))
    ka = args.keep_angle
    for i in range(0, len(ka), 3):
        pots.append(get_potential(
            "keep_angle", spring_const=float(ka[i]), angle=float(ka[i + 1]),
            atoms=num_parse(ka[i + 2])))
    kda = args.keep_dihedral_angle
    for i in range(0, len(kda), 3):
        pots.append(get_potential(
            "keep_dihedral", spring_const=float(kda[i]),
            angle=float(kda[i + 1]), atoms=num_parse(kda[i + 2])))

    def chunks(flag, n, vals=None):
        vals = vals if vals is not None else getattr(args, flag, []) or []
        if len(vals) % n:
            raise SystemExit(f"error: -{flag} takes groups of {n} arguments")
        for i in range(0, len(vals), n):
            yield vals[i:i + n]

    zz = np.asarray(z)
    for ws, ds, f1, f2, mode in chunks("repulsive_potential", 5):
        # ref: interface.py:206 -rp ... scale|value
        name = ("lj_repulsive_scale" if mode == "scale"
                else "lj_repulsive_value")
        kwargs = (dict(well_scale=float(ws), dist_scale=float(ds))
                  if mode == "scale"
                  else dict(well_value_kjmol=float(ws),
                            dist_value_ang=float(ds)))
        pots.append(get_potential(name, fragm_1=num_parse(f1),
                                  fragm_2=num_parse(f2), element_z=zz,
                                  **kwargs))
    for (w, d, ln, cr, ca, orp, oat, ctr, tgt,
         mode) in chunks("repulsive_potential_v2", 10):
        pots.append(get_potential(
            "lj_repulsive_v2_probe", well=float(w), dist=float(d),
            length_ang=float(ln), const_rep=float(cr), const_attr=float(ca),
            order_rep=float(orp), order_attr=float(oat),
            center=num_parse(ctr), target=num_parse(tgt), element_z=zz,
            mode=mode))
    for (lw, ld, gw, gd, gr, f1,
         f2) in chunks("repulsive_potential_gaussian", 7):
        pots.append(get_potential(
            "lj_repulsive_gaussian", well_depth=float(lw), dist=float(ld),
            gau_well_depth=float(gw), gau_dist=float(gd),
            gau_range=float(gr), fragm_1=num_parse(f1),
            fragm_2=num_parse(f2), element_z=zz))
    for w, d, ang, ctr, three, tgt in chunks("cone_potential", 6):
        pots.append(get_potential(
            "cone", well_value=float(w), dist_value=float(d),
            cone_angle=float(ang), center=num_parse(ctr)[0],
            three_atoms=num_parse(three), target=num_parse(tgt),
            element_z=zz))
    for ks, ps, xyz, frag in chunks("flux_potential", 4):
        pots.append(get_potential(
            "flux", const=[float(v) for v in ks.split(",")],
            order=[float(v) for v in ps.split(",")],
            direction=[float(v) for v in xyz.split(",")],
            atoms=num_parse(frag)))
    for k, r0, f1, f2 in chunks("keep_pot_v2", 4):
        pots.append(get_potential(
            "keep_v2", spring_const=float(k), distance=float(r0),
            fragm_1=num_parse(f1), fragm_2=num_parse(f2)))
    for de, k, r0, pair in chunks("anharmonic_keep_pot", 4):
        pots.append(get_potential(
            "keep_anharmonic", well_depth=float(de), spring_const=float(k),
            distance=float(r0), atom_pair=num_parse(pair)))
    for k, ang, f1, f2, f3 in chunks("keep_angle_v2", 5):
        pots.append(get_potential(
            "keep_angle_v2", spring_const=float(k), angle=float(ang),
            fragm_1=num_parse(f1), fragm_2=num_parse(f2),
            fragm_3=num_parse(f3)))
    for const, atoms in chunks("universal_potential", 2):
        pots.append(get_potential("universal", const=float(const),
                                  atoms=num_parse(atoms)))
    for k, ang, f1, f2, f3, f4 in chunks("keep_dihedral_angle_v2", 6):
        pots.append(get_potential(
            "keep_dihedral_v2", spring_const=float(k), angle=float(ang),
            fragm_1=num_parse(f1), fragm_2=num_parse(f2),
            fragm_3=num_parse(f3), fragm_4=num_parse(f4)))
    for k, n, ang, f1, f2, f3, f4 in chunks("keep_dihedral_angle_cos", 7):
        pots.append(get_potential(
            "keep_dihedral_cos", potential_const=float(k),
            multiplicity=float(n), angle=float(ang), fragm_1=num_parse(f1),
            fragm_2=num_parse(f2), fragm_3=num_parse(f3),
            fragm_4=num_parse(f4)))
    for k, ang, atoms in chunks("keep_out_of_plain_angle", 3):
        # reference order: CENTER first (ref: keep_outofplain_angle_
        # potential.py:42 "Center atom: i (index 0)"); the class convention
        # here is center-second, so reorder (c, n1, n2, n3) -> (n1, c, n2, n3)
        a = num_parse(atoms)
        pots.append(get_potential(
            "keep_out_of_plane", spring_const=float(k), angle=float(ang),
            atoms=[a[1], a[0], a[2], a[3]]))
    for k, ang, f1, f2, f3, f4 in chunks("keep_out_of_plain_angle_v2", 6):
        # same center-first -> center-second reordering as -kopa
        pots.append(get_potential(
            "keep_out_of_plane_v2", spring_const=float(k), angle=float(ang),
            fragm_1=num_parse(f2), fragm_2=num_parse(f1),
            fragm_3=num_parse(f3), fragm_4=num_parse(f4)))
    for k, r0, xyz, atoms, order in chunks("void_point_pot", 5):
        pots.append(get_potential(
            "void_point", spring_const=float(k), distance=float(r0),
            order=float(order), point=[float(v) for v in xyz.split(",")],
            atom=num_parse(atoms)))
    for ku, kl, up, lo, f1, f2 in chunks("bond_range_potential", 6):
        pots.append(get_potential(
            "value_range", upper_const=float(ku), lower_const=float(kl),
            upper_distance=float(up), lower_distance=float(lo),
            fragm_1=num_parse(f1), fragm_2=num_parse(f2)))
    for w, f1, f2, lims in chunks("well_pot", 4):
        pots.append(get_potential(
            "well", wall_energy=float(w),
            limits=[float(v) for v in lims.split(",")],
            fragm_1=num_parse(f1), fragm_2=num_parse(f2)))
    for w, axis, lims, atoms in chunks("wall_well_pot", 4):
        pots.append(get_potential(
            "well_wall", wall_energy=float(w),
            limits=[float(v) for v in lims.split(",")], axis=axis,
            atoms=num_parse(atoms)))
    for w, xyz, lims, atoms in chunks("void_point_well_pot", 4):
        pots.append(get_potential(
            "well_vp", wall_energy=float(w),
            limits=[float(v) for v in lims.split(",")],
            point=[float(v) for v in xyz.split(",")],
            atoms=num_parse(atoms)))
    for w, ctr, lims, atoms in chunks("around_well_pot", 4):
        pots.append(get_potential(
            "well_around", wall_energy=float(w),
            limits=[float(v) for v in lims.split(",")],
            center_fragm=num_parse(ctr), atoms=num_parse(atoms)))
    for kind, h, wd, atoms in chunks("metadynamics", 4):
        if kind != "bond":
            raise SystemExit("error: -metad supports the 'bond' collective "
                             "variable (gaussian hills on a pair distance)")
        pots.append(get_potential(
            "gaussian_metadyn", height_kjmol=float(h), width_ang=float(wd),
            atom_pair=num_parse(atoms)))
    for f, a1, a2 in chunks("linear_mechano_force_pot", 3):
        pots.append(get_potential(
            "mechano_force", force_pn=float(f), atoms_1=num_parse(a1),
            atoms_2=num_parse(a2)))
    for f, pair in chunks("linear_mechano_force_pot_v2", 2):
        pots.append(get_potential(
            "mechano_force_v2", force_pn=float(f), atom_pair=num_parse(pair)))
    for s, f1, f2 in chunks("electrostatic_potential", 3):
        pots.append(get_potential(
            "electrostatic_fragment", charge_scale=float(s),
            fragm_1=num_parse(f1), fragm_2=num_parse(f2), element_z=zz))
    for s, atoms in chunks("electrostatic_potential_atom_pair", 2):
        pots.append(get_potential(
            "electrostatic_atom_pair", charge_scale=float(s),
            atoms=num_parse(atoms), element_z=zz))
    nrp = getattr(args, "nano_reactor_potential", []) or []
    for inner, outer, tc, te, kc, ke in chunks("nano_reactor_potential", 6,
                                               nrp):
        pots.append(get_potential(
            "nanoreactor", inner_wall_ang=float(inner),
            outer_wall_ang=float(outer), contraction_time=float(tc),
            expansion_time=float(te), contraction_k=float(kc),
            expansion_k=float(ke), element_z=zz))
    # asymmetric ellipsoidal LJ probes (ref: interface.py:238 -aerp):
    # eps(kJ/mol) sig_xp,xm,yp,ym,zp,zm(ang) dist(ang) root,lj offtgt
    aerp = getattr(args, "asym_ellipsoid", []) or []
    if aerp and len(aerp) % 5 != 0:
        raise SystemExit("error: -aerp takes quintets: eps sig6 dist "
                         "root,lj offtgt|none")
    smp_check = getattr(args, "spacer_model_potential", []) or []
    if smp_check and len(smp_check) % 5 != 0:
        raise SystemExit("error: -smp takes quintets: depth sigma scaling "
                         "n_particles target_atoms")
    if aerp:
        atoms, offtgt, eps_l, sig_l, dist_l = [], [], [], [], []
        for i in range(0, len(aerp), 5):
            eps_l.append(float(aerp[i]))
            sig_l.append([float(s) for s in aerp[i + 1].split(",")])
            dist_l.append(float(aerp[i + 2]))
            pair = num_parse(aerp[i + 3])
            atoms.append((pair[0], pair[1]))
            off = aerp[i + 4]
            offtgt.append(num_parse(off) if off not in ("0", "none") else [])
        pots.append(get_potential(
            "asym_ellipsoid", atoms=atoms, offtgt=offtgt, eps=eps_l,
            sig=sig_l, dist=dist_l, element_z=np.asarray(z)))
    aerp2 = getattr(args, "asym_ellipsoid_v2", []) or []
    if aerp2:
        # free-parameter variant, same syntax (ref: interface.py:239 -aerpv2)
        atoms, offtgt, eps_l, sig_l, dist_l = [], [], [], [], []
        for i in range(0, len(aerp2), 5):
            eps_l.append(float(aerp2[i]))
            sig_l.append([float(s) for s in aerp2[i + 1].split(",")])
            dist_l.append(float(aerp2[i + 2]))
            pair = num_parse(aerp2[i + 3])
            atoms.append((pair[0], pair[1]))
            off = aerp2[i + 4]
            offtgt.append(num_parse(off) if off not in ("0", "none") else [])
        pots.append(get_potential(
            "asym_ellipsoid", atoms=atoms, offtgt=offtgt, eps=eps_l,
            sig=sig_l, dist=dist_l, element_z=np.asarray(z)))
    # spacer implicit-solvent particles (ref: interface.py:234 -smp):
    # depth(kJ/mol) sigma(ang) cavity_scaling n_particles target_atoms
    smp = getattr(args, "spacer_model_potential", []) or []
    for i in range(0, len(smp), 5):
        pots.append(get_potential(
            "spacer", depth_kjmol=float(smp[i]), sigma_ang=float(smp[i + 1]),
            cavity_scaling=float(smp[i + 2]), n_particles=int(smp[i + 3]),
            target=num_parse(smp[i + 4]), element_z=np.asarray(z)))
    return BiasEngine(pots) if pots else None


def _make_constraints(args):
    from multioptpy_tpu.constraints import Constraints

    fixed = num_parse(args.fix_atoms) if args.fix_atoms else []
    bonds, angles, dihedrals, fbonds = [], [], [], []
    pc = list(args.projection_constrain)
    i = 0
    while i < len(pc):
        kind = pc[i]
        if kind == "fbond":
            # fragment-centroid distance: fbond f1_atoms f2_atoms [value]
            # (ref: constraint_condition.py:385)
            f1 = num_parse(pc[i + 1])
            f2 = num_parse(pc[i + 2])
            val = None
            if i + 3 < len(pc) and _is_number(pc[i + 3]):
                val = float(pc[i + 3])
                i += 4
            else:
                i += 3
            fbonds.append((f1, f2, val))
            continue
        atoms = num_parse(pc[i + 1])
        val = None
        if i + 2 < len(pc) and _is_number(pc[i + 2]):
            val = float(pc[i + 2])
            i += 3
        else:
            i += 2
        if kind == "bond":
            bonds.append((atoms[0], atoms[1], val))
        elif kind == "angle":
            angles.append((atoms[0], atoms[1], atoms[2], val))
        elif kind == "dihedral":
            dihedrals.append((atoms[0], atoms[1], atoms[2], atoms[3], val))
        else:
            raise SystemExit(f"error: unknown -pc kind '{kind}' (choose "
                             f"from bond, fbond, angle, dihedral)")
    if not (fixed or bonds or angles or dihedrals or fbonds):
        return None
    return Constraints(bonds=bonds, angles=angles, dihedrals=dihedrals,
                       fbonds=fbonds, fixed_atoms=fixed)


def _is_number(s):
    try:
        float(s)
        return True
    except ValueError:
        return False


def _opt_config(args):
    from multioptpy_tpu.drivers.optimize import OptimizeConfig

    # `-o high_force_engine quasi_newton` enables sigmoid RMS-force
    # switching (ref: optimizer.py:582; e.g. `-o fire rfo_fsb`)
    method = (args.opt_method[1] if len(args.opt_method) > 1
              else args.opt_method[0])
    switch = args.opt_method[0] if len(args.opt_method) > 1 else None
    kw = dict(method=method, switch_method=switch, nsteps=args.NSTEP,
              saddle_order=args.saddle_order, fc_count=args.fc_count,
              mfc_count=args.mfc_count, trust_radius_ang=args.trust_radius,
              diis_variant=getattr(args, "diis_variant", None),
              delta=getattr(args, "delta", 1.0))
    if args.model_hessian:
        kw["init_hessian"] = f"model:{args.model_hessian}"
    if args.tight_convergence_criteria:
        kw.update(max_force=1.5e-5, rms_force=1e-5, max_displacement=6e-5,
                  rms_displacement=4e-5)
    elif args.loose_convergence_criteria:
        kw.update(max_force=3e-3, rms_force=2e-3, max_displacement=1e-2,
                  rms_displacement=7e-3)
    return OptimizeConfig(**kw)


def _outdir(args, suffix):
    base = args.output_dir or (os.path.splitext(args.input)[0] + suffix)
    os.makedirs(base, exist_ok=True)
    return base


# --------------------------------------------------------------------------
# entry points
# --------------------------------------------------------------------------

def run_optmain(argv=None):
    """Geometry optimization (ref: Entrypoints/core.py:4 run_optmain)."""
    args = _base_parser("multioptpy_tpu geometry optimization").parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    bias = _make_bias(args, z)
    cons = _make_constraints(args)
    from multioptpy_tpu.drivers.optimize import optimize
    from multioptpy_tpu.io import write_trajectory, write_xyz
    from multioptpy_tpu.units import BOHR2ANGSTROM

    out = _outdir(args, "_opt")
    from multioptpy_tpu.logging_utils import RunLogger, snapshot_config

    tracked = []
    gi = list(args.geom_info)
    i = 0
    while i + 1 < len(gi):
        tracked.append((gi[i], num_parse(gi[i + 1])))
        i += 2
    logger = RunLogger(out, tracked_params=tracked)
    log_cb = logger.make_callback()

    # per-step dE/dparam for every bias potential (ref: potential.py:137-144
    # logs jacrev wrt bias_pot_params each step)
    pgrad_rows = []

    def cb(it, st):
        print(f"# iter {it:4d}  E = {float(st.energy):+.10f}  "
              f"max|g| = {float(abs(st.gradient).max()):.3e}  "
              f"trust = {float(st.trust_radius):.4f}")
        log_cb(it, st)
        if bias is not None and len(bias):
            pg = bias.compute(st.coords).param_grads
            pgrad_rows.append(np.concatenate(
                [np.atleast_1d(np.asarray(g)).ravel() for g in pg])
                if pg else np.zeros(0))

    cfg = _opt_config(args)
    snapshot_config(out, cfg, extra={"input": args.input})
    res = optimize(calc, coords, z, bias_engine=bias, config=cfg,
                   constraints=cons, record_trajectory=True, callback=cb)
    logger.flush()
    write_xyz(os.path.join(out, "optimized.xyz"), symbols,
              np.asarray(res.coords) * BOHR2ANGSTROM,
              f"E = {float(res.energy):.10f}")
    write_trajectory(os.path.join(out, "trajectory.xyz"), symbols,
                     res.coords_history * BOHR2ANGSTROM)
    np.savetxt(os.path.join(out, "energies.csv"), res.energy_history,
               header="energy_hartree")
    if pgrad_rows and pgrad_rows[0].size:
        names = []
        for pot in bias.potentials:
            n_p = len(np.atleast_1d(pot.init_params()))
            names += [f"{pot.name}_p{k}" for k in range(n_p)]
        np.savetxt(os.path.join(out, "bias_param_grads.csv"),
                   np.vstack(pgrad_rows), header=" ".join(names))
    print(f"converged: {bool(res.converged)} after {res.n_iterations} steps; "
          f"E = {float(res.energy):.10f} Ha -> {out}/")
    return 0 if bool(res.converged) else 1


def run_nebmain(argv=None):
    """NEB path optimization (ref: Entrypoints/core.py:28)."""
    p = _base_parser("multioptpy_tpu NEB")
    p.add_argument("-i2", "--end_input", default=None,
                   help="product xyz (else `input` must be a trajectory)")
    p.add_argument("-nimg", "--n_images", type=int, default=12)
    p.add_argument("-nebv", "--neb_variant", default=None,
                   help="variant by name: neb cineb dneb lup om qsm qsm2 "
                        "string bneb bneb2 bneb3 nesb dmf ewbneb")
    # reference-syntax variant switches (ref: interface.py:243
    # call_nebparser -om/-lup/-bneb/...; each maps onto neb_variant)
    for flag, variant in (("-om", "om"), ("-lup", "lup"), ("-bneb", "bneb"),
                          ("-bneb2", "bneb2"), ("-bneb3", "bneb3"),
                          ("-dneb", "dneb"), ("-nesb", "nesb"),
                          ("-dmf", "dmf"), ("-ewbneb", "ewbneb"),
                          ("-qsm", "qsm"), ("-qsmv2", "qsm2"),
                          ("-cineb", "cineb")):
        p.add_argument(flag, dest="variant_flags", action="append_const",
                       const=variant, default=None,
                       help=f"use the {variant} force law")
    # reference-syntax band-optimizer switches (ref: -sd/-cg/-lbfgs)
    p.add_argument("-sdneb", "-sd2", dest="opt_flags", action="append_const",
                   const="sd", default=None)
    p.add_argument("-cgneb", dest="opt_flags", action="append_const",
                   const="cg_pr")
    p.add_argument("-lbfgsneb", dest="opt_flags", action="append_const",
                   const="lbfgs")
    p.add_argument("-afneb", dest="opt_flags", action="append_const",
                   const="afire", help="per-image adaptive FIRE clocks")
    p.add_argument("-aneb", "--adaptive_neb", action="store_true",
                   help="adaptive repartitioning rounds (ref: -aneb)")
    p.add_argument("-pitr", "--per_image_trust", action="store_true",
                   help="per-image trust radii (ref: trust_radius_neb.py)")
    p.add_argument("-spng", "--spring_const_alias", type=float, default=None,
                   help="spring constant (reference -spng alias of -k)")
    p.add_argument("-k", "--spring_const", type=float, default=0.01)
    p.add_argument("-cist", "--ci_start", type=int, default=20)
    p.add_argument("-idpp", "--use_idpp", action="store_true")
    p.add_argument("-nebopt", "--neb_optimizer", default="fire",
                   help="band clock: fire | quickmin | lbfgs | sd | cg_pr | "
                        "cg_fr | cg_hs | cg_dy | cg_hz")
    p.add_argument("-dmfb", "--dmf_beta", type=float, default=10.0,
                   help="MaxFlux reciprocal temperature (1/Hartree)")
    p.add_argument("-dmfn", "--dmf_nsegs", type=int, default=4,
                   help="MaxFlux action-quadrature subdivision per segment")
    args = p.parse_args(argv)
    import jax.numpy as jnp

    from multioptpy_tpu.drivers.neb import (
        NEBConfig, idpp_path, interpolate_linear, neb)
    from multioptpy_tpu.io import read_trajectory, read_xyz, write_trajectory
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    if args.end_input:
        symbols, start_ang = read_xyz(args.input)
        _, end_ang = read_xyz(args.end_input)
        start = jnp.asarray(start_ang * ANGSTROM2BOHR)
        end = jnp.asarray(end_ang * ANGSTROM2BOHR)
        path0 = (idpp_path(start, end, args.n_images) if args.use_idpp
                 else interpolate_linear(start, end, args.n_images))
    else:
        symbols, frames, _ = read_trajectory(args.input)
        path0 = jnp.asarray(frames * ANGSTROM2BOHR)
    z = jnp.asarray(symbols_to_z(symbols))
    calc = _make_calculator(args)
    bias = _make_bias(args, z)
    variant = (args.neb_variant or (args.variant_flags or ["cineb"])[-1])
    optimizer = ((args.opt_flags or [args.neb_optimizer])[-1]
                 if args.neb_optimizer == "fire" else args.neb_optimizer)
    k_spring = (args.spring_const_alias if args.spring_const_alias
                is not None else args.spring_const)
    cfg = NEBConfig(variant=variant, n_steps=args.NSTEP,
                    k_spring=k_spring, climbing_start=args.ci_start,
                    optimizer=optimizer,
                    per_image_trust=args.per_image_trust,
                    dmf_beta=args.dmf_beta, dmf_nsegs=args.dmf_nsegs)

    def cb(it, path, energies, fmax):
        print(f"# neb iter {it:4d}  max|F| = {float(fmax):.3e}  "
              f"E_max = {float(energies.max()):+.8f}")

    if args.adaptive_neb:
        from multioptpy_tpu.drivers.neb import adaptive_neb
        res = adaptive_neb(calc, path0, z, cfg, bias_engine=bias)
    else:
        res = neb(calc, path0, z, cfg, bias_engine=bias, callback=cb)
    out = _outdir(args, "_neb")
    write_trajectory(os.path.join(out, "neb_path.xyz"), symbols,
                     np.asarray(res.path) * BOHR2ANGSTROM,
                     [f"E = {e:.10f}" for e in np.asarray(res.energies)])
    np.savetxt(os.path.join(out, "energy_plot.csv"),
               np.asarray(res.energies), header="energy_hartree")
    print(f"converged: {bool(res.converged)}; TS guess = image "
          f"{res.ts_index}; E = {float(res.energies[res.ts_index]):.8f}")
    return 0


def run_mdmain(argv=None):
    """Molecular dynamics (ref: Entrypoints/core.py run_mdmain)."""
    p = _base_parser("multioptpy_tpu molecular dynamics")
    p.add_argument("-temp", "--temperature", type=float, default=300.0)
    p.add_argument("-dt", "--timestep", type=float, default=0.5)
    p.add_argument("-thermo", "--thermostat", default="nosehoover")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    bias = _make_bias(args, z)
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM

    res = run_md(calc, coords, z, MDConfig(
        timestep_fs=args.timestep, n_steps=args.NSTEP,
        temperature=args.temperature, thermostat=args.thermostat),
        bias_engine=bias)
    out = _outdir(args, "_md")
    write_trajectory(os.path.join(out, "md_traj.xyz"), symbols,
                     res.trajectory * BOHR2ANGSTROM)
    np.savetxt(os.path.join(out, "md_energies.csv"),
               np.stack([res.energies, res.temperatures], 1),
               header="potential_hartree temperature_K")
    print(f"MD finished: {args.NSTEP} steps; "
          f"<T> = {float(res.temperatures.mean()):.1f} K -> {out}/")
    return 0


def run_ircmain(argv=None):
    """IRC from a saddle point (ref: irc.py driver via optmain -irc)."""
    p = _base_parser("multioptpy_tpu IRC")
    p.add_argument("-im", "--irc_method", default="lqa")
    p.add_argument("-is", "--irc_step", type=float, default=0.05)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.drivers.irc import IRCConfig, irc
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM

    res = irc(calc, coords, z, config=IRCConfig(
        method=args.irc_method, step_size=args.irc_step,
        n_steps=args.NSTEP if args.NSTEP < 1000 else 200))
    out = _outdir(args, "_irc")
    write_trajectory(os.path.join(out, "irc_forward.xyz"), symbols,
                     res.forward_path * BOHR2ANGSTROM)
    write_trajectory(os.path.join(out, "irc_backward.xyz"), symbols,
                     res.backward_path * BOHR2ANGSTROM)
    np.savetxt(os.path.join(out, "irc_energies.csv"),
               np.stack([res.forward_energies, res.backward_energies], 1),
               header="forward backward")
    print(f"IRC done; TS E = {res.ts_energy:.8f} -> {out}/")
    return 0


def run_confsearch(argv=None):
    """Conformer search (ref: Entrypoints/conformation_search.py:13)."""
    p = _base_parser("multioptpy_tpu conformer search")
    p.add_argument("-bf", "--base_force", type=float, default=200.0)
    p.add_argument("-nsample", "--max_samples", type=int, default=8)
    p.add_argument("-bsize", "--batch_size", type=int, default=16)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows.confsearch import (
        ConfSearchConfig, conformer_search)

    res = conformer_search(calc, coords, z, ConfSearchConfig(
        n_rounds=args.max_samples, batch_size=args.batch_size,
        base_gamma=args.base_force))
    out = _outdir(args, "_confsearch")
    write_trajectory(os.path.join(out, "conformers.xyz"), symbols,
                     res.conformers * BOHR2ANGSTROM,
                     [f"E = {e:.10f}" for e in res.energies])
    np.savetxt(os.path.join(out, "EQ_energy.csv"), res.energies,
               header="energy_hartree")
    print(f"{len(res.energies)} unique conformers "
          f"({res.n_generated} candidates) -> {out}/")
    return 0


def run_relaxedscan(argv=None):
    """Relaxed PES scan (ref: Entrypoints/relaxed_scan.py:10)."""
    p = _base_parser("multioptpy_tpu relaxed scan")
    p.add_argument("-sk", "--scan_kind", default="bond")
    p.add_argument("-sa", "--scan_atoms", required=True,
                   help="e.g. 1,2 for a bond")
    p.add_argument("-sr", "--scan_range", required=True,
                   help="start,stop,npoints")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    start, stop, npts = args.scan_range.split(",")
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows import relaxed_scan

    res = relaxed_scan(calc, coords, z, args.scan_kind,
                       num_parse(args.scan_atoms), float(start), float(stop),
                       int(npts), config=_opt_config(args))
    out = _outdir(args, "_scan")
    write_trajectory(os.path.join(out, "scan.xyz"), symbols,
                     res.geometries * BOHR2ANGSTROM,
                     [f"{v:.4f} -> E = {e:.10f}"
                      for v, e in zip(res.values, res.energies)])
    np.savetxt(os.path.join(out, "scan_profile.csv"),
               np.stack([res.values, res.energies], 1),
               header="value energy_hartree")
    print(f"scan done ({int(npts)} points) -> {out}/")
    return 0


def run_autots_cli(argv=None):
    """AutoTS pipeline (ref: Entrypoints/autots.py:10)."""
    p = _base_parser("multioptpy_tpu AutoTS")
    p.add_argument("-cfg", "--config", default=None, help="JSON config")
    p.add_argument("-prod", "--product", default=None, help="product xyz")
    p.add_argument("-nimg", "--n_images", type=int, default=12)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import read_xyz, write_xyz
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM
    from multioptpy_tpu.workflows.autots import AutoTSConfig, autots
    import jax.numpy as jnp

    kw = {"n_images": args.n_images}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
        if "workflow" in cfg:
            # v2 dynamic workflow engine (ref: Entrypoints/autots.py:70)
            from multioptpy_tpu.workflows.autots_v2 import run_autots_v2
            engine, reports = run_autots_v2(calc, coords, z, cfg)
            out = _outdir(args, "_autots")
            with open(os.path.join(out, "workflow_report.json"), "w") as f:
                json.dump(reports, f, indent=1, default=str)
            if engine.ctx.get("ts") is not None:
                from multioptpy_tpu.io import write_xyz
                from multioptpy_tpu.units import BOHR2ANGSTROM
                write_xyz(os.path.join(out, "ts.xyz"), symbols,
                          np.asarray(engine.ctx["ts"]) * BOHR2ANGSTROM)
            print(f"AutoTS v2: {len(reports)} steps -> {out}/")
            return 0
        kw.update(cfg.get("autots", {}))
    if args.manual_AFIR:
        kw["afir_gamma"] = float(args.manual_AFIR[0])
        kw["afir_fragm_1"] = num_parse(args.manual_AFIR[1])
        kw["afir_fragm_2"] = num_parse(args.manual_AFIR[2])
    product = None
    if args.product:
        _, prod_ang = read_xyz(args.product)
        product = jnp.asarray(prod_ang * ANGSTROM2BOHR)
    res = autots(calc, coords, z, AutoTSConfig(**kw), product_coords=product)
    out = _outdir(args, "_autots")
    write_xyz(os.path.join(out, "ts.xyz"), symbols,
              np.asarray(res.ts_coords) * BOHR2ANGSTROM,
              f"E = {res.ts_energy:.10f}, n_imag = {res.n_imaginary}")
    write_xyz(os.path.join(out, "irc_end_1.xyz"), symbols,
              np.asarray(res.reactant_coords) * BOHR2ANGSTROM)
    write_xyz(os.path.join(out, "irc_end_2.xyz"), symbols,
              np.asarray(res.product_coords) * BOHR2ANGSTROM)
    print(f"AutoTS: TS E = {res.ts_energy:.8f} ({res.n_imaginary} imaginary)"
          f"; barriers {res.barrier_forward:.6f} / "
          f"{res.barrier_backward:.6f} Ha -> {out}/")
    return 0


def run_orientsearch(argv=None):
    """Orientation sampling (ref: Entrypoints/orientation_search.py:10)."""
    p = _base_parser("multioptpy_tpu orientation search")
    p.add_argument("-part", "--fragment", required=True,
                   help="atoms of the mobile fragment, e.g. 5-9")
    p.add_argument("-nsample", "--n_samples", type=int, default=16)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows.orientsearch import orientation_search

    res = orientation_search(calc, coords, z, num_parse(args.fragment),
                             n_samples=args.n_samples,
                             config=_opt_config(args))
    out = _outdir(args, "_orient")
    write_trajectory(os.path.join(out, "orientations.xyz"), symbols,
                     res.geometries * BOHR2ANGSTROM,
                     [f"E = {e:.10f}" for e in res.energies])
    print(f"{len(res.energies)} orientations -> {out}/")
    return 0


def run_ieipmain(argv=None):
    """Double-ended TS search (ref: ieip.py:191)."""
    p = _base_parser("multioptpy_tpu iEIP / double-ended methods")
    p.add_argument("-i2", "--end_input", required=True)
    p.add_argument("-em", "--engine", default="eip",
                   help="eip | dimer | spring_pair")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    import jax.numpy as jnp

    from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip
    from multioptpy_tpu.io import read_xyz, write_xyz
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    _, end_ang = read_xyz(args.end_input)
    end = jnp.asarray(end_ang * ANGSTROM2BOHR)
    res = ieip(calc, coords, end, z, IEIPConfig(engine=args.engine,
                                                n_steps=args.NSTEP))
    out = _outdir(args, "_ieip")
    write_xyz(os.path.join(out, "ts_guess.xyz"), symbols,
              np.asarray(res.ts_guess) * BOHR2ANGSTROM,
              f"E = {res.ts_energy:.10f}")
    print(f"iEIP ({args.engine}): TS guess E = {res.ts_energy:.8f} -> {out}/")
    return 0


def run_mapper_cli(argv=None):
    """Reaction-network mapping (ref: Wrapper/mapper.py:1220)."""
    p = _base_parser("multioptpy_tpu reaction network mapper")
    p.add_argument("-cfg", "--config", default=None)
    p.add_argument("-maxnodes", "--max_nodes", type=int, default=10)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.workflows.mapper import MapperConfig, map_network

    kw = {}
    if args.config:
        with open(args.config) as f:
            kw.update(json.load(f).get("mapper", {}))
    res = map_network(calc, coords, z, MapperConfig(
        max_nodes=args.max_nodes, **kw))
    out = _outdir(args, "_mapper")
    res.save(os.path.join(out, "network.json"), symbols)
    print(f"network: {len(res.nodes)} EQ nodes, {len(res.edges)} TS edges "
          f"-> {out}/network.json")
    return 0
