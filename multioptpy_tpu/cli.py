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
    p.add_argument("-o", "-opt", "--opt_method", nargs="*",
                   default=["rfo_fsb"])
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
    # ---- reference-syntax backend/selection flags (ref: interface.py
    # call_optimizeparser :140-201) ------------------------------------
    p.add_argument("-sqm1", "--sqm1", action="store_true",
                   help="on-device semiempirical backend (ref -sqm1)")
    p.add_argument("-sqm2", "--sqm2", action="store_true",
                   help="on-device semiempirical backend v2 (d shells)")
    p.add_argument("-dxtb", "--usedxtb", default=None,
                   help="dxtb host bridge, e.g. GFN1-xTB (ref -dxtb)")
    p.add_argument("-os", "--othersoft", default=None,
                   help="external code via the ASE bridge (ref -os): orca, "
                        "gaussian, nwchem, gamessus, mopac, mace_mp, uma")
    p.add_argument("-osp", "--software_path_file",
                   default="./software_path.conf",
                   help="path map for -os backends (ref -osp)")
    p.add_argument("-cpcm", "--cpcm_solv_model", default=None,
                   help="CPCM implicit solvent for the tblite bridge "
                        "(ref interface.py:110; e.g. water)")
    p.add_argument("-alpb", "--alpb_solv_model", default=None,
                   help="ALPB implicit solvent for the tblite bridge "
                        "(ref interface.py:111)")
    p.add_argument("-sub_bs", "--sub_basisset", nargs="*", default=[],
                   help="per-element basis overrides, e.g. I LanL2DZ "
                        "(ref -sub_bs; PySCF bridge)")
    p.add_argument("-ecp", "--effective_core_potential", nargs="*",
                   default=[], help="per-element ECPs (ref -ecp)")
    p.add_argument("-u", "--unrestrict", action="store_true",
                   help="unrestricted SCF (ref -u)")
    p.add_argument("-grid", "--dft_grid", type=int, default=3,
                   help="DFT grid fineness (ref -grid; PySCF bridge)")
    p.add_argument("-core", "--N_THREAD", type=int, default=8,
                   help="host-backend intra-op threads (ref -core)")
    p.add_argument("-mem", "--SET_MEMORY", default="2GB",
                   help="host-backend memory (ref -mem)")
    p.add_argument("-elec", "--electronic_charge", type=int, default=None,
                   help="alias of -c (ref -elec)")
    p.add_argument("-spin", "--spin_multiplicity", type=int, default=None,
                   help="alias of -m (ref -spin)")
    p.add_argument("-d", "--DELTA", default=None,
                   help="move-step scale (ref -d; alias of -delta)")
    p.add_argument("-mintr", "--min_trust_radius", type=float, default=0.01,
                   help="trust-radius floor in ang (ref -mintr)")
    p.add_argument("-modelhess", "--use_model_hessian", nargs="?",
                   const="fischerd3old", default=None,
                   help="alias of -mh; bare flag = fischerd3old, the "
                        "reference's bare-flag default "
                        "(ref interface.py:187 ModelhessAction)")
    p.add_argument("-tcc", dest="tight_convergence_criteria",
                   action="store_true", help="alias of -tight (ref -tcc)")
    p.add_argument("-lcc", dest="loose_convergence_criteria",
                   action="store_true", help="alias of -loose (ref -lcc)")
    p.add_argument("-dc", "--dissociate_check", default="10",
                   help="abort when fragments separate beyond this many "
                        "ang (ref -dc)")
    p.add_argument("-sc", "--shape_conditions", nargs="*", default=[],
                   help="abort unless gt/lt bond-angle-torsion conditions "
                        "hold (ref -sc), e.g. 2.0 gt 1,2")
    p.add_argument("-gfix", "--gradient_fix_atoms", nargs="*", default=[],
                   help="zero internal-coordinate gradients between atoms "
                        "(ref -gfix)")
    p.add_argument("-of", "--opt_fragment", nargs="*", default=[],
                   help="fragment-averaged gradients (ref -of)")
    p.add_argument("-negeigval", "--detect_negative_eigenvalues",
                   action="store_true",
                   help="abort saddle runs without negative eigenvalue "
                        "(ref -negeigval)")
    p.add_argument("-mi", "--microiter", type=int, default=0,
                   help="micro-iterations for path-relaxation potentials "
                        "(ref -mi)")
    p.add_argument("-beta", "--BETA", type=float, default=1.0,
                   help="force scale for optimization (ref -beta)")
    p.add_argument("-mf", "--model_function", nargs="*", default=[],
                   help="2-state model function: [kind charge2 mult2], kind "
                        "in seam/avoiding/conical/mesx/mesx2/meci (ref -mf)")
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

    charge = args.charge
    mult = args.multiplicity
    # reference aliases -elec/-spin override -c/-m when given
    if getattr(args, "electronic_charge", None) is not None:
        charge = args.electronic_charge
    if getattr(args, "spin_multiplicity", None) is not None:
        mult = args.spin_multiplicity

    if args.calculator:
        name, kw = args.calculator, {}
        if name == "sqm" and getattr(args, "srb", False):
            kw["srb"] = True
    elif getattr(args, "sqm2", False):
        name, kw = "sqm2", {}
    elif getattr(args, "sqm1", False):
        name, kw = "sqm", {}
    elif args.xtb:
        name, kw = "tblite", {"method": args.xtb}
        # solvation passthrough (ref: tblite_calculation_tools.py:58-61;
        # the bridge forwards options["solvation"]=(model, solvent) to
        # tblite's Calculator.add)
        if getattr(args, "cpcm_solv_model", None):
            kw["solvation"] = ("cpcm", args.cpcm_solv_model)
        elif getattr(args, "alpb_solv_model", None):
            kw["solvation"] = ("alpb", args.alpb_solv_model)
    elif getattr(args, "usedxtb", None):
        name, kw = "dxtb", {"method": args.usedxtb}
    elif getattr(args, "othersoft", None):
        name, kw = "ase", {"software_type": args.othersoft,
                           "conf_path": args.software_path_file}
    elif args.usepyscf:
        name, kw = "pyscf", {"method": args.functional,
                             "basis": args.basisset,
                             "excited_state": getattr(args, "excited_state",
                                                      0)}
        # per-element basis / ECP overrides (ref: interface.py:88-89 -sub_bs
        # / -ecp; pyscf bridge consumes dicts of element -> basis name)
        sb = list(getattr(args, "sub_basisset", []) or [])
        if sb:
            kw["sub_basis"] = {sb[i]: sb[i + 1]
                               for i in range(0, len(sb) - 1, 2)}
        ecp = list(getattr(args, "effective_core_potential", []) or [])
        if ecp:
            kw["ecp"] = {ecp[i]: ecp[i + 1]
                         for i in range(0, len(ecp) - 1, 2)}
        if getattr(args, "unrestrict", False):
            kw["unrestricted"] = True
        kw["grid"] = getattr(args, "dft_grid", 3)
    else:
        name, kw = "lj", {}
    if name == "psi4":
        # host resource hints (ref: -mem/-core -> psi4 set_memory /
        # set_num_threads, psi4_calculation_tools.py)
        if getattr(args, "SET_MEMORY", None):
            kw.setdefault("memory", args.SET_MEMORY)
        if getattr(args, "N_THREAD", None):
            kw.setdefault("n_threads", args.N_THREAD)
    return get_calculator(name, charge=charge, multiplicity=mult, **kw)


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
    fixed_coords, atoms_pairs, eigvec_modes = [], [], []
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
        if kind == "rot":
            # overall-rotation projection (ref: constraint_condition.py:411
            # "rot") — the optimize driver already projects translation +
            # rotation out of every step, so the flag is satisfied as-is
            i += 1
            continue
        if kind == "eigvec":
            # Hessian-eigenvector constraint: mode index, resolved against
            # the initial Hessian by the caller
            # (ref: constraint_condition.py:414)
            eigvec_modes.append(int(pc[i + 1]))
            i += 2
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
        elif kind in ("x", "y", "z"):
            # freeze the given Cartesian component of the listed atoms
            # (ref: constraint_condition.py:405-410)
            fixed_coords.extend((a, kind) for a in atoms)
        elif kind == "atoms_pair":
            # project out the mutual approach/retreat direction
            # (ref: constraint_condition.py:425)
            atoms_pairs.append((atoms[0], atoms[1]))
        else:
            raise SystemExit(f"error: unknown -pc kind '{kind}' (choose "
                             f"from bond, fbond, angle, dihedral, x, y, z, "
                             f"rot, eigvec, atoms_pair)")
    if not (fixed or bonds or angles or dihedrals or fbonds or fixed_coords
            or atoms_pairs or eigvec_modes):
        return None
    return Constraints(bonds=bonds, angles=angles, dihedrals=dihedrals,
                       fbonds=fbonds, fixed_atoms=fixed,
                       fixed_coords=fixed_coords, atoms_pairs=atoms_pairs,
                       eigvec_modes=eigvec_modes)


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
    # reference -d/--DELTA ('x' sentinel = per-method default,
    # interface.py:150); explicit values feed the first-order step scale
    big_d = getattr(args, "DELTA", None)
    if big_d not in (None, "x") and kw["delta"] == 1.0:
        kw["delta"] = float(big_d)
    kw["trust_radius_min_ang"] = getattr(args, "min_trust_radius", 0.01)
    mh = args.model_hessian or getattr(args, "use_model_hessian", None)
    if mh:
        kw["init_hessian"] = f"model:{mh}"
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
    p = _base_parser("multioptpy_tpu geometry optimization")
    # post-optimization analysis / chaining flags
    # (ref: interface.py:173-201 call_optimizeparser)
    p.add_argument("-freq", "--frequency_analysis", action="store_true",
                   help="normal-mode + RRHO thermochemistry after "
                        "convergence (ref -freq)")
    p.add_argument("-force_freq", "--force_frequency_analysis",
                   action="store_true",
                   help="frequency analysis regardless of convergence "
                        "(ref -force_freq)")
    p.add_argument("-temp", "--temperature", type=float, default=298.15)
    p.add_argument("-press", "--pressure", type=float, default=101325.0)
    p.add_argument("-irc", "--intrinsic_reaction_coordinates", nargs="*",
                   default=None,
                   help="chain an IRC after optimization: [step_size "
                        "max_steps method] (ref -irc, optimization.py:2173)")
    p.add_argument("-cmds", "--cmds", action="store_true",
                   help="CMDS embedding of the optimization path (ref -cmds)")
    p.add_argument("-pca", "--pca", action="store_true",
                   help="PCA embedding of the optimization path (ref -pca)")
    p.add_argument("-km", "--koopman", action="store_true",
                   help="Koopman convergence analysis (ref -km)")
    p.add_argument("-nosymm", "--no_symmetry_analyzer", action="store_true",
                   help="skip point-group detection after convergence "
                        "(ref -nosymm)")
    p.add_argument("-oniom", "--oniom_flag", nargs="*", default=[],
                   help="2-layer ONIOM: [high_layer_atoms low_calc] "
                        "(ref -oniom)")
    p.add_argument("-pbc", "--pbc", nargs="*", default=[],
                   help="periodic cell lengths in ang: [a b c] (ref -pbc)")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    if getattr(args, "opt_fragment", None):
        # -of: rigid-fragment gradient averaging (ref: optimization.py:1228)
        from multioptpy_tpu.calculators.base import FragmentGradWrapper
        calc = FragmentGradWrapper(
            calc, [num_parse(s) for s in args.opt_fragment],
            int(coords.shape[0]))
    if getattr(args, "gradient_fix_atoms", None):
        # -gfix: zero the bond-stretch gradient between each listed pair
        # (ref: interface.py:90)
        from multioptpy_tpu.calculators.base import BondGradProjWrapper
        pairs = []
        for s in args.gradient_fix_atoms:
            a = num_parse(s)
            if len(a) != 2:
                raise SystemExit("-gfix expects atom pairs like 1,2")
            pairs.append((a[0], a[1]))
        calc = BondGradProjWrapper(calc, pairs)
    if args.oniom_flag:
        # 2-layer ONIOM wrapper (ref: Utils/oniom.py + ONIOMHandler,
        # optimization.py:597): high layer keeps `calc`, low layer defaults
        # to the lj model unless a calculator name is given
        from multioptpy_tpu.calculators import get_calculator as _getc
        from multioptpy_tpu.calculators.oniom import ONIOM, MicroiterONIOM
        high_atoms = num_parse(args.oniom_flag[0])
        low_name = (args.oniom_flag[1] if len(args.oniom_flag) > 1
                    else "lj")
        mi = int(getattr(args, "microiter", 0) or 0)
        if mi > 0:
            # -mi: low-layer microiterations per macro step (ref:
            # optimization.py:716 ONIOMHandler)
            calc = MicroiterONIOM(high_calc=calc, low_calc=_getc(low_name),
                                  high_atoms=high_atoms, microiter=mi)
        else:
            calc = ONIOM(high_calc=calc, low_calc=_getc(low_name),
                         high_atoms=high_atoms)
    if args.model_function:
        # 2-state model-function optimization (ref: interface.py:200 -mf;
        # ModelFunction/*.py seam/avoiding/conical/MESX/MECI): state 2 is
        # the same backend at [charge2 mult2]
        import copy as _copy
        from multioptpy_tpu.calculators.two_state import TwoStateModelFunction
        spec = list(args.model_function)
        kind = spec[0] if spec else "seam"
        kind = {"avoid": "avoiding", "mesx": "mesx", "meci": "meci"}.get(
            kind, kind)
        args2 = _copy.copy(args)
        if len(spec) > 1:
            args2.charge = int(spec[1])
            args2.electronic_charge = None
        if len(spec) > 2:
            args2.multiplicity = int(spec[2])
            args2.spin_multiplicity = None
        calc = TwoStateModelFunction(calc, _make_calculator(args2),
                                     kind=kind)
    bias = _make_bias(args, z)
    cons = _make_constraints(args)
    if cons is not None and cons.eigvec_modes:
        cons.resolve_eigvecs(calc.hessian(coords, z))
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
    from multioptpy_tpu.units import ANGSTROM2BOHR as _A2B
    dc = args.dissociate_check
    if isinstance(dc, (list, tuple)):
        dc = dc[0] if dc else "10"
    res = optimize(calc, coords, z, bias_engine=bias, config=cfg,
                   constraints=cons, record_trajectory=True, callback=cb,
                   dissociation_limit=float(dc) * _A2B,
                   shape_conditions=list(args.shape_conditions or []),
                   detect_negative_eigenvalues=getattr(
                       args, "detect_negative_eigenvalues", False))
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

    # ---- post-optimization analysis & chaining (ref: optimization.py
    # :2111 freq, :2135-2171 CMDS/PCA/Koopman, :2173 -irc) -------------
    if args.frequency_analysis or args.force_frequency_analysis:
        if bool(res.converged) or args.force_frequency_analysis:
            from multioptpy_tpu.analysis.vibrations import (
                count_imaginary, normal_modes, rrho_thermochemistry,
                write_mode_animations, write_normal_modes)
            h = calc.hessian(res.coords, z)
            nm = normal_modes(h, res.coords, z)
            freqs = np.asarray(nm.frequencies_cm1)
            thermo = rrho_thermochemistry(
                h, res.coords, z, temperature=args.temperature,
                pressure=args.pressure)
            np.savetxt(os.path.join(out, "frequencies_cm1.csv"), freqs,
                       header="frequency_cm1")
            # ref optimization.py:2311-2316: normal_modes.txt + per-mode
            # animation xyz files next to thermochemistry.txt
            write_normal_modes(nm, z, os.path.join(out, "normal_modes.txt"))
            write_mode_animations(nm, res.coords, z,
                                  os.path.join(out, "vibration_animation"))
            with open(os.path.join(out, "thermochemistry.txt"), "w") as f:
                for k in ("zpe", "e_thermal", "enthalpy", "entropy",
                          "gibbs"):
                    v = getattr(thermo, k)
                    f.write(f"{k}: {v}\n")
                    print(f"  {k}: {v}")
            print(f"  imaginary modes: {count_imaginary(freqs)}")
    if not args.no_symmetry_analyzer:
        try:
            from multioptpy_tpu.analysis.symmetry import analyze_symmetry
            pg = analyze_symmetry(np.asarray(res.coords), np.asarray(z))
            print(f"point group: {pg}")
        except Exception as e:  # symmetry analysis must never kill a run
            print(f"symmetry analysis skipped: {e}")
    traj = np.asarray(res.coords_history)
    if args.cmds:
        from multioptpy_tpu.analysis.pes import cmds_path_analysis
        emb = cmds_path_analysis(traj)
        np.savetxt(os.path.join(out, "cmds_path.csv"),
                   np.asarray(emb.coords_2d), header="cmds_2d")
    if args.pca:
        from multioptpy_tpu.analysis.pes import pca_path_analysis
        emb = pca_path_analysis(traj)
        np.savetxt(os.path.join(out, "pca_path.csv"),
                   np.asarray(emb.coords_2d), header="pca_2d")
    if args.koopman:
        from multioptpy_tpu.analysis.pes import koopman_convergence_analysis
        km = koopman_convergence_analysis(np.asarray(res.energy_history))
        with open(os.path.join(out, "koopman.txt"), "w") as f:
            f.write(repr(km) + "\n")
    if args.intrinsic_reaction_coordinates is not None:
        # chained IRC (ref: optimization.py:2173-2197): [step max method]
        from multioptpy_tpu.drivers.irc import IRCConfig, irc, meta_irc
        from multioptpy_tpu.io import write_trajectory as _wt
        spec = list(args.intrinsic_reaction_coordinates)
        irc_cfg = IRCConfig(
            step_size=float(spec[0]) if len(spec) > 0 else 0.05,
            n_steps=int(spec[1]) if len(spec) > 1 else 200,
            method=spec[2] if len(spec) > 2 else "lqa")
        # auto-select: true IRC needs an imaginary mode; from a
        # non-stationary or minimum structure run the downhill meta-IRC
        # (ref: irc.py:195-206 saddle_check -> :328 _run_meta_irc)
        h_irc = calc.hessian(res.coords, z)
        w_irc = np.linalg.eigvalsh(np.asarray(h_irc))
        if (w_irc < -1e-6).any():
            irc_res = irc(calc, res.coords, z, hessian=h_irc,
                          config=irc_cfg, bias_engine=bias)
        else:
            print("no imaginary mode -> meta-IRC (downhill relaxation)")
            irc_res = meta_irc(calc, res.coords, z, config=irc_cfg,
                               bias_engine=bias)
        both = np.concatenate([np.asarray(irc_res.backward_path)[::-1],
                               np.asarray(irc_res.forward_path)])
        _wt(os.path.join(out, "irc_path.xyz"), symbols,
            both * BOHR2ANGSTROM)
        e_both = np.concatenate([np.asarray(irc_res.backward_energies)[::-1],
                                 np.asarray(irc_res.forward_energies)])
        np.savetxt(os.path.join(out, "irc_energies.csv"), e_both,
                   header="energy_hartree")
        _write_irc_curvature(out, irc_res, z, irc_cfg.step_size)
        print(f"IRC: {len(both)} points -> {out}/irc_path.xyz")
    return 0 if bool(res.converged) else 1


def _write_irc_curvature(out, irc_res, z, step_size):
    """Per-step IRC curvature properties + path bending angles, the
    artifacts the reference's euler/rk4 integrators write/print per step
    (ref: IRC/euler.py:367-373,411-425 -> irc_curvature_properties.csv
    via PESAnalyzer/calc_irc_curvature.py:107)."""
    if irc_res.forward_gradients is None or irc_res.ts_hessian is None:
        return
    from multioptpy_tpu.analysis.pes import (irc_branch_curvature_table,
                                             path_bending_angles)
    from multioptpy_tpu.geometry import masses_from_z
    masses = np.asarray(masses_from_z(np.asarray(z)))
    for name, grads, path in (
            ("forward", irc_res.forward_gradients, irc_res.forward_path),
            ("backward", irc_res.backward_gradients, irc_res.backward_path)):
        if grads is None or len(grads) < 2:
            continue
        table = irc_branch_curvature_table(grads, masses,
                                           irc_res.ts_hessian, step_size)
        header = ",".join(["Scalar_Curvature"] +
                          [f"Curvature_Coupling_{i + 1}"
                           for i in range(table.shape[1] - 1)])
        np.savetxt(os.path.join(
            out, f"irc_curvature_properties_{name}.csv"),
            table, delimiter=",", header=header, comments="")
        mw_path = np.asarray(path) * np.sqrt(masses)[None, :, None]
        bends = path_bending_angles(mw_path)
        if len(bends):
            np.savetxt(os.path.join(out, f"path_bending_angle_{name}.csv"),
                       bends, header="bending_angle_deg")


def run_nebmain(argv=None):
    """NEB path optimization (ref: Entrypoints/core.py:28)."""
    p = _base_parser("multioptpy_tpu NEB")
    p.add_argument("-i2", "--end_input", default=None,
                   help="product xyz (else `input` must be a trajectory)")
    p.add_argument("-nimg", "--n_images", type=int, default=12)
    p.add_argument("-p", "--partition", type=int, default=0,
                   help="number of interpolation nodes (ref -p; overrides "
                        "-nimg when > 0)")
    p.add_argument("-nebv", "--neb_variant", default=None,
                   help="variant by name: neb cineb dneb lup om qsm qsm2 "
                        "string bneb bneb2 bneb3 nesb dmf ewbneb")
    # reference-syntax variant switches (ref: interface.py:243
    # call_nebparser -om/-lup/-bneb/...; each maps onto neb_variant)
    for flag, variant in (("-om", "om"), ("-lup", "lup"), ("-bneb", "bneb"),
                          ("-bneb2", "bneb2"), ("-bneb3", "bneb3"),
                          ("-dneb", "dneb"), ("-nesb", "nesb"),
                          ("-dmf", "dmf"), ("-ewbneb", "ewbneb"),
                          ("-qsm", "qsm"), ("-qsmv2", "qsm2")):
        p.add_argument(flag, dest="variant_flags", action="append_const",
                       const=variant, default=None,
                       help=f"use the {variant} force law")
    # reference-syntax band-optimizer switches (ref: -sd/-cg/-lbfgs,
    # interface.py:292-304)
    p.add_argument("-sd", "--steepest_descent", type=int, default=None,
                   nargs="?", const=0,
                   help="use the steepest-descent band clock (ref -sd)")
    p.add_argument("-cg", "--conjugate_gradient", nargs="?", const="hs",
                   default=None,
                   help="conjugate-gradient band clock; optional update "
                        "scheme FR/PR/HS/DY/HZ (ref -cg)")
    p.add_argument("-lbfgs", "--memory_limited_BFGS", action="store_true",
                   help="L-BFGS band clock (ref -lbfgs)")
    p.add_argument("-gqnt", "--global_quasi_newton", action="store_true",
                   help="global quasi-Newton band clock (ref -gqnt; maps "
                        "to the L-BFGS whole-band clock)")
    p.add_argument("-sdneb", "-sd2", dest="opt_flags", action="append_const",
                   const="sd", default=None)
    p.add_argument("-cgneb", dest="opt_flags", action="append_const",
                   const="cg_pr")
    p.add_argument("-lbfgsneb", dest="opt_flags", action="append_const",
                   const="lbfgs")
    p.add_argument("-afneb", dest="opt_flags", action="append_const",
                   const="afire", help="per-image adaptive FIRE clocks")
    p.add_argument("-aneb", "--adaptive_neb", nargs="*", default=None,
                   help="adaptive NEB [interp_num frequency] (ref -aneb)")
    p.add_argument("-pitr", "--per_image_trust", action="store_true",
                   help="per-image trust radii (ref: trust_radius_neb.py)")
    p.add_argument("-k", "--spring_const", type=float, default=0.01)
    p.add_argument("-cineb", "--apply_CI_NEB", type=int, default=None,
                   help="climbing-image start iteration (ref -cineb)")
    p.add_argument("-ci", "--climbing_image", type=int, nargs="*",
                   default=None,
                   help="climbing image [start interval] (ref -ci)")
    p.add_argument("-cist", "--ci_start", type=int, default=20)
    p.add_argument("-notsopt", "--not_ts_optimization", action="store_true",
                   help="disable the climbing image (ref -notsopt)")
    p.add_argument("-aconv", "--apply_convergence_criteria",
                   action="store_true",
                   help="accepted for reference parity; this NEB always "
                        "checks max|F| < fmax (ref -aconv)")
    p.add_argument("-fe", "--fixedges", type=int, default=None,
                   help="0 relax both endpoints, 3 freeze both (1/2 treated "
                        "as 3) (ref -fe)")
    p.add_argument("-rrs", "--ratio_of_rfo_step", type=float, default=0.5,
                   help="accepted for reference parity (ref -rrs)")
    p.add_argument("-spng", "--save_pict", action="store_true",
                   help="save the band energy-profile plot (ref -spng)")
    p.add_argument("-idpp", "--use_idpp", action="store_true")
    p.add_argument("-cfbenm", "--use_cfb_enm", action="store_true",
                   help="correlated flat-bottom elastic-network "
                        "preprocessing of the initial path (ref -cfbenm)")
    # ---- in-loop image redistribution (ref: interface.py:267-287; each
    # int is the apply-every-N-iterations interval, 0 = off) -----------
    for flag, name, scheme in (
            ("-ad", "align_distances", "linear"),
            ("-adene", "align_distances_energy", "energy"),
            ("-adpred", "align_distances_energy_predicted", "pred"),
            ("-adrpred", "align_distances_ritz_energy_predicted", "ritz"),
            ("-ads", "align_distances_spline", "spline"),
            ("-ads2", "align_distances_spline_ver2", "spline2"),
            ("-adg", "align_distances_geodesic", "geodesic"),
            ("-adb", "align_distances_bernstein", "bernstein"),
            ("-adbene", "align_distances_bernstein_energy",
             "bernstein_energy"),
            ("-adadene", "align_distances_adaptive_energy", "adaptive")):
        p.add_argument(flag, "--" + name, type=int, default=0,
                       help=f"in-loop '{scheme}' redistribution interval")
    p.add_argument("-adsg", "--align_distances_savgol", default="0,0,0",
                   help="Savitzky-Golay redistribution: interval,window,"
                        "polyorder (ref -adsg)")
    p.add_argument("-nd", "--node_distance", type=float, default=None,
                   help="initial-path node spacing in ang, linear "
                        "interpolation (ref -nd; sets the image count)")
    p.add_argument("-nds", "--node_distance_spline", type=float,
                   default=None, help="as -nd via spline (ref -nds)")
    p.add_argument("-ndb", "--node_distance_bernstein", type=float,
                   default=None, help="as -nd via Bernstein (ref -ndb)")
    p.add_argument("-ndsg", "--node_distance_savgol", default=None,
                   help="as -nd via Savitzky-Golay: dist,window,order "
                        "(ref -ndsg)")
    p.add_argument("-nebopt", "--neb_optimizer", default="fire",
                   help="band clock: fire | quickmin | lbfgs | sd | cg_pr | "
                        "cg_fr | cg_hs | cg_dy | cg_hz")
    p.add_argument("-dmfb", "--dmf_beta", type=float, default=10.0,
                   help="MaxFlux reciprocal temperature (1/Hartree)")
    p.add_argument("-dmfn", "--dmf_nsegs", type=int, default=4,
                   help="MaxFlux action-quadrature subdivision per segment")
    args = p.parse_args(argv)
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.drivers.neb import (
        NEBConfig, idpp_path, interpolate_linear, neb, neb_forces)
    from multioptpy_tpu.io import read_trajectory, read_xyz, write_trajectory
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    if args.end_input:
        symbols, start_ang = read_xyz(args.input)
        _, end_ang = read_xyz(args.end_input)
        start = jnp.asarray(start_ang * ANGSTROM2BOHR)
        end = jnp.asarray(end_ang * ANGSTROM2BOHR)
        nimg = args.partition if args.partition > 0 else args.n_images
        path0 = (idpp_path(start, end, nimg) if args.use_idpp
                 else interpolate_linear(start, end, nimg))
    elif os.path.isdir(args.input):
        # reference folder input (ref: neb.py:1008): a directory of
        # *_0.xyz .. *_N.xyz images, numerically ordered, is the path
        import glob as _glob
        files = sum([sorted(_glob.glob(os.path.join(
            args.input, "*_" + "[0-9]" * i + ".xyz")))
            for i in range(1, 7)], [])
        if len(files) < 3:
            raise SystemExit(f"{args.input}: found {len(files)} *_N.xyz "
                             "images (need >= 3)")
        frames = []
        for f in files:
            symbols, c_ang = read_xyz(f)
            frames.append(c_ang)
        path0 = jnp.asarray(np.stack(frames) * ANGSTROM2BOHR)
    else:
        symbols, frames, _ = read_trajectory(args.input)
        path0 = jnp.asarray(frames * ANGSTROM2BOHR)
    z = jnp.asarray(symbols_to_z(symbols))

    # -nd family: resample the INITIAL path so neighbor images sit
    # `node_distance` ang apart (sets the image count; ref -nd/-nds/-ndb/
    # -ndsg interface.py:284-287)
    nd_spec = [(args.node_distance, "linear"),
               (args.node_distance_spline, "spline"),
               (args.node_distance_bernstein, "bernstein"),
               (args.node_distance_savgol, "savgol")]
    for dist, scheme in nd_spec:
        if dist is None:
            continue
        from multioptpy_tpu.interpolation import (
            cubic_spline_resample, linear_resample, bernstein_resample,
            savitzky_golay_smooth, _arc_lengths)
        if scheme == "savgol":
            parts = str(dist).split(",")
            dist = float(parts[0])
        seg = np.asarray(_arc_lengths(path0))
        total_bohr = float(np.sqrt(np.sum(
            (np.asarray(path0[1:]) - np.asarray(path0[:-1])) ** 2,
            axis=(1, 2))).sum())
        n_new = max(3, int(np.ceil(total_bohr * BOHR2ANGSTROM
                                   / float(dist))) + 1)
        if scheme == "linear":
            path0 = linear_resample(path0, n_new)
        elif scheme == "spline":
            path0 = cubic_spline_resample(path0, n_new)
        elif scheme == "bernstein":
            path0 = bernstein_resample(path0, n_new)
        else:
            path0 = linear_resample(savitzky_golay_smooth(path0), n_new)
        break
    if args.use_cfb_enm:
        # flat-bottom elastic-network relaxation of the initial path
        # (ref: Potential/idpp.py:186 CFB_ENM preprocessing)
        from multioptpy_tpu.potentials import BiasEngine, get_potential
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
        enm = BiasEngine([get_potential(
            "cfb_enm", reference_coords=np.asarray(path0[0]),
            element_z=np.asarray(z))])
        relaxed = [path0[0]]
        for img in path0[1:-1]:
            r = optimize(_make_calculator(args), img, z, bias_engine=enm,
                         config=OptimizeConfig(method="fire", nsteps=20))
            relaxed.append(r.coords)
        relaxed.append(path0[-1])
        path0 = jnp.stack(relaxed)

    calc = _make_calculator(args)
    bias = _make_bias(args, z)
    variant = (args.neb_variant or (args.variant_flags or ["cineb"])[-1])
    optimizer = ((args.opt_flags or [args.neb_optimizer])[-1]
                 if args.neb_optimizer == "fire" else args.neb_optimizer)
    if args.fc_count > 0 or (args.mfc_count > 0
                             and (args.model_hessian
                                  or args.use_model_hessian)):
        # Hessian-based band optimizer (ref: neb.py:797 _setup_optimizer:
        # FC_COUNT/MFC_COUNT+modelhess -> RFOOptimizer)
        optimizer = "rfo"
    elif args.memory_limited_BFGS or args.global_quasi_newton:
        optimizer = "lbfgs"
    elif args.conjugate_gradient is not None:
        optimizer = "cg_" + str(args.conjugate_gradient).lower()
    elif args.steepest_descent is not None:
        optimizer = "sd"
    ci_start = args.ci_start
    if args.apply_CI_NEB is not None:
        ci_start = args.apply_CI_NEB
    if args.not_ts_optimization:
        ci_start = 10 ** 9
    # reference -ci [start interval]: periodic spline-maximum insertion
    # (interface.py:320 -> calc_tools.py:865 apply_climbing_image) —
    # distinct from the -cineb climbing-image FORCE
    sci_start, sci_interval = 0, 0
    if args.climbing_image:
        sci_start = int(args.climbing_image[0])
        sci_interval = (int(args.climbing_image[1])
                        if len(args.climbing_image) > 1 else 1)
    # redistribution flags -> (scheme, interval); last one given wins
    redist, redist_every = "", 0
    for name, scheme in (("align_distances", "linear"),
                         ("align_distances_energy", "energy"),
                         ("align_distances_energy_predicted", "pred"),
                         ("align_distances_ritz_energy_predicted", "ritz"),
                         ("align_distances_spline", "spline"),
                         ("align_distances_spline_ver2", "spline2"),
                         ("align_distances_geodesic", "geodesic"),
                         ("align_distances_bernstein", "bernstein"),
                         ("align_distances_bernstein_energy",
                          "bernstein_energy"),
                         ("align_distances_adaptive_energy", "adaptive")):
        interval = getattr(args, name, 0)
        if interval and interval > 0:
            redist, redist_every = scheme, interval
    sg = str(args.align_distances_savgol).split(",")
    sg_window, sg_order = 5, 3
    if len(sg) >= 1 and sg[0].strip() and int(sg[0]) > 0:
        redist, redist_every = "savgol", int(sg[0])
        if len(sg) >= 3:
            sg_window, sg_order = int(sg[1]), int(sg[2])
    # the reference only stops on force criteria when -aconv is given
    # (interface.py call_nebparser apply_convergence_criteria; default =
    # run every NSTEP iteration)
    fmax = (NEBConfig().fmax if args.apply_convergence_criteria else 0.0)
    cfg = NEBConfig(variant=variant, n_steps=args.NSTEP,
                    k_spring=args.spring_const, climbing_start=ci_start,
                    optimizer=optimizer, fmax=fmax,
                    optimize_endpoints=(args.fixedges == 0),
                    per_image_trust=args.per_image_trust,
                    dmf_beta=args.dmf_beta, dmf_nsegs=args.dmf_nsegs,
                    rfo_ratio=args.ratio_of_rfo_step,
                    redistribute=redist, redistribute_every=redist_every,
                    savgol_window=sg_window, savgol_order=sg_order,
                    spline_ci_start=sci_start, spline_ci_interval=sci_interval)

    out = _outdir(args, "_neb")
    # per-iteration diagnostics, reference file-for-file (ref: neb.py:865
    # _save_analysis_data; path lengths per Utils/calc_tools.py:853):
    # band force via the same force law the step uses, jitted once
    _base_variant = "neb" if cfg.variant == "cineb" else cfg.variant
    _force_fn = jax.jit(lambda p_, e_, g_, c_: neb_forces(
        p_, e_, g_, cfg.k_spring, _base_variant, c_,
        cfg.optimize_endpoints, cfg.dmf_beta, cfg.dmf_nsegs))

    def cb(it, path, energies, grads, fmax):
        print(f"# neb iter {it:4d}  max|F| = {float(fmax):.3e}  "
              f"E_max = {float(energies.max()):+.8f}")
        climbing = (cfg.variant == "cineb") and it >= cfg.climbing_start
        n_img = path.shape[0]
        forces = np.asarray(_force_fn(path, energies, grads,
                                      jnp.asarray(climbing)))
        f2 = forces.reshape(n_img, -1)
        g2 = np.asarray(grads).reshape(n_img, -1)
        centered = np.asarray(path) - np.asarray(path).mean(
            axis=1, keepdims=True)
        seg = np.linalg.norm(
            np.diff(centered, axis=0).reshape(n_img - 1, -1), axis=1)
        pl = np.concatenate([[0.0], np.cumsum(seg)]) * BOHR2ANGSTROM
        fn, gn = np.linalg.norm(f2, axis=1), np.linalg.norm(g2, axis=1)
        cos = np.where((fn > 1e-10) & (gn > 1e-10),
                       np.sum(f2 * g2, axis=1) / np.maximum(fn * gn, 1e-30),
                       0.0)
        rows = {"path_length.csv": pl,
                "energy_plot.csv": np.asarray(energies),
                "bias_force_rms.csv": np.sqrt(np.mean(g2 ** 2, axis=1)),
                "orthogonality.csv": cos,
                "perp_rms_gradient.csv": np.sqrt(np.mean(f2 ** 2, axis=1)),
                "perp_max_gradient.csv": np.max(np.abs(f2), axis=1)}
        for name, vals in rows.items():
            with open(os.path.join(out, name), "a") as f:
                f.write(",".join(str(float(v)) for v in vals) + "\n")

    if args.adaptive_neb is not None:
        # reference -aneb semantics: [interpolation_num frequency] ->
        # in-run densification around energy maxima (interface.py:263)
        from multioptpy_tpu.drivers.neb import aneb
        aneb_kw = {}
        if len(args.adaptive_neb) >= 1 and args.adaptive_neb[0]:
            aneb_kw["interpolation_num"] = int(args.adaptive_neb[0])
        if len(args.adaptive_neb) >= 2:
            aneb_kw["frequency"] = int(args.adaptive_neb[1])
        res = aneb(calc, path0, z, cfg, bias_engine=bias, **aneb_kw)
    else:
        res = neb(calc, path0, z, cfg, bias_engine=bias, callback=cb)
    write_trajectory(os.path.join(out, "neb_path.xyz"), symbols,
                     np.asarray(res.path) * BOHR2ANGSTROM,
                     [f"E = {e:.10f}" for e in np.asarray(res.energies)])
    if not os.path.exists(os.path.join(out, "energy_plot.csv")):
        # aneb path runs without the per-iteration callback
        np.savetxt(os.path.join(out, "energy_plot.csv"),
                   np.asarray(res.energies), header="energy_hartree")
    if args.save_pict:
        from multioptpy_tpu.analysis.visualization import plot_energy_profile
        plot_energy_profile(np.asarray(res.energies),
                            os.path.join(out, "energy_profile.png"))
    print(f"converged: {bool(res.converged)}; TS guess = image "
          f"{res.ts_index}; E = {float(res.energies[res.ts_index]):.8f}")
    return 0


def run_mdmain(argv=None):
    """Molecular dynamics (ref: Entrypoints/core.py run_mdmain)."""
    p = _base_parser("multioptpy_tpu molecular dynamics")
    p.add_argument("-temp", "--temperature", type=float, default=300.0)
    p.add_argument("-dt", "--timestep", type=float, default=0.5,
                   help="time step in fs")
    p.add_argument("-thermo", "-mt", "--thermostat", default="nosehoover",
                   help="thermostat (ref -mt mdtype): none | nosehoover | "
                        "nosehooverchain | langevin | berendsen | "
                        "velocityverlet")
    p.add_argument("-time", "--md_nstep", type=int, default=None,
                   help="number of MD steps (ref -time; overrides -ns)")
    p.add_argument("-ts", "--timestep_au", type=float, default=None,
                   help="time step in atomic units (ref -ts; overrides -dt)")
    p.add_argument("-press", "--pressure", type=float, default=101.3,
                   help="pressure in kPa (ref -press; recorded only — no "
                        "barostat, as in the reference NVT drivers)")
    p.add_argument("-ntraj", "--n_trajectories", type=int, default=1,
                   help="independent trajectories, vmapped (ref -traj)")
    p.add_argument("-ct", "--change_temperature", nargs="*", default=[],
                   help="temperature schedule [time1 T1 time2 T2 ...] "
                        "(ref -ct)")
    p.add_argument("-cc", "--constraint_condition", nargs="*", default=[],
                   help="SHAKE distance/angle/dihedral constraints "
                        "(ref -cc): [value atoms ...]")
    p.add_argument("-pbc", "--pbc", nargs="*", default=[],
                   help="periodic cell lengths in ang (ref -pbc)")
    p.add_argument("-cmds", "--cmds", action="store_true",
                   help="CMDS embedding of the trajectory (ref -cmds)")
    p.add_argument("-pca", "--pca", action="store_true",
                   help="PCA embedding of the trajectory (ref -pca)")
    args = p.parse_args(argv)
    if args.md_nstep is not None:
        args.NSTEP = args.md_nstep
    if args.timestep_au is not None:
        args.timestep = args.timestep_au * 2.4188843265857e-2  # a.u. -> fs
    if args.thermostat == "velocityverlet":
        args.thermostat = "none"
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    bias = _make_bias(args, z)
    from multioptpy_tpu.drivers.md import MDConfig, run_md
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM

    # -cc SHAKE constraints (ref: interface.py:373 — [value atoms ...],
    # kind inferred from the atom count: 2=distance, 3=angle, 4=dihedral)
    cons = None
    cc = list(args.constraint_condition)
    if cc:
        from multioptpy_tpu.constraints import Constraints
        bonds, angles, dihedrals = [], [], []
        i = 0
        while i + 1 < len(cc):
            val = float(cc[i])
            atoms = num_parse(cc[i + 1])
            if len(atoms) == 2:
                bonds.append((atoms[0], atoms[1], val))
            elif len(atoms) == 3:
                angles.append((atoms[0], atoms[1], atoms[2], val))
            else:
                dihedrals.append((atoms[0], atoms[1], atoms[2], atoms[3],
                                  val))
            i += 2
        cons = Constraints(bonds=bonds, angles=angles, dihedrals=dihedrals)

    # -ct temperature schedule (ref: interface.py:372): [t1 T1 t2 T2 ...]
    # -> chunked runs at piecewise-constant temperature, velocities carried
    schedule = [(0, args.temperature)]
    ct = list(args.change_temperature)
    for i in range(0, len(ct) - 1, 2):
        schedule.append((int(float(ct[i])), float(ct[i + 1])))
    schedule.append((args.NSTEP, None))

    out = _outdir(args, "_md")
    all_traj, all_e, all_t = [], [], []
    for itraj in range(max(1, args.n_trajectories)):
        vel = None
        x = coords
        trajs, es, ts_ = [], [], []
        for (t0, temp), (t1, _) in zip(schedule, schedule[1:]):
            n = t1 - t0
            if n <= 0:
                continue
            res = run_md(calc, x, z, MDConfig(
                timestep_fs=args.timestep, n_steps=n,
                temperature=temp, thermostat=args.thermostat,
                seed=itraj,
                pbc_box_ang=tuple(float(v) for v in (args.pbc or []))),
                bias_engine=bias, velocities=vel,
                constraints=cons)
            x, vel = res.final.coords, res.final.velocities
            trajs.append(np.asarray(res.trajectory))
            es.append(np.asarray(res.energies))
            ts_.append(np.asarray(res.temperatures))
        traj = np.concatenate(trajs)
        suffix = f"_{itraj}" if args.n_trajectories > 1 else ""
        write_trajectory(os.path.join(out, f"md_traj{suffix}.xyz"), symbols,
                         traj * BOHR2ANGSTROM)
        np.savetxt(os.path.join(out, f"md_energies{suffix}.csv"),
                   np.stack([np.concatenate(es), np.concatenate(ts_)], 1),
                   header="potential_hartree temperature_K")
        all_traj.append(traj)
        all_e.append(np.concatenate(es))
        all_t.append(np.concatenate(ts_))
    if args.cmds:
        from multioptpy_tpu.analysis.pes import cmds_path_analysis
        emb = cmds_path_analysis(all_traj[0])
        np.savetxt(os.path.join(out, "cmds_traj.csv"),
                   np.asarray(emb.coords_2d), header="cmds_2d")
    if args.pca:
        from multioptpy_tpu.analysis.pes import pca_path_analysis
        emb = pca_path_analysis(all_traj[0])
        np.savetxt(os.path.join(out, "pca_traj.csv"),
                   np.asarray(emb.coords_2d), header="pca_2d")
    print(f"MD finished: {args.NSTEP} steps x {max(1, args.n_trajectories)} "
          f"traj; <T> = {float(np.mean(all_t[0])):.1f} K -> {out}/")
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
    _write_irc_curvature(out, res, z, args.irc_step)
    print(f"IRC done; TS E = {res.ts_energy:.8f} -> {out}/")
    return 0


def run_confsearch(argv=None):
    """Conformer search (ref: Entrypoints/conformation_search.py:13)."""
    p = _base_parser("multioptpy_tpu conformer search")
    # reference flag surface (ref: conformation_search.py:205-214)
    p.add_argument("-bf", "--base_force", type=float, default=100.0,
                   help="AFIR kick strength [kJ/mol] (ref -bf)")
    p.add_argument("-ms", "-nsample", "--max_samples", type=int, default=50,
                   help="max sampling rounds (ref -ms)")
    p.add_argument("-bsize", "--batch_size", type=int, default=16)
    p.add_argument("-nl", "--number_of_lowest", type=int, default=5,
                   help="stop after this many rounds without a lowest-"
                        "energy-list update (ref -nl)")
    p.add_argument("-nr", "--number_of_rank", type=int, default=10,
                   help="length of the watched lowest-energy list (ref -nr)")
    p.add_argument("-tgta", "--target_atoms", nargs="*", default=None,
                   help="restrict AFIR kicks to these atoms, e.g. 1-3,7 "
                        "(ref -tgta)")
    p.add_argument("-st", "--sampling_temperature", type=float,
                   default=298.15,
                   help="Boltzmann seed-selection temperature [K] (ref -st)")
    p.add_argument("-nost", "--no_stochastic", action="store_true",
                   help="always kick from the initial EQ (ref -nost)")
    p.add_argument("-pbc", "--preserve_bond_connectivity",
                   action="store_true",
                   help="reject conformers whose bond connectivity differs "
                        "from the seed (ref -pbc)")
    p.add_argument("-tabu", "--tabu_search", action="store_true",
                   help="frequency-penalized seed selection (ref -tabu)")
    p.add_argument("-alpha", "--tabu_alpha", type=float, default=0.5,
                   help="tabu visit-count penalty coefficient (ref -alpha)")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows.confsearch import (
        ConfSearchConfig, conformer_search)

    tgt = None
    if args.target_atoms:
        tgt = tuple(num_parse(args.target_atoms[0]))
    res = conformer_search(calc, coords, z, ConfSearchConfig(
        n_rounds=args.max_samples, batch_size=args.batch_size,
        base_gamma=args.base_force,
        temperature=args.sampling_temperature,
        preserve_bonds=args.preserve_bond_connectivity,
        tabu_weight=args.tabu_alpha if args.tabu_search else 0.0,
        target_atoms=tgt, stochastic=not args.no_stochastic,
        number_of_rank=args.number_of_rank,
        number_of_lowest=args.number_of_lowest))
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
    p.add_argument("-sa", "--scan_atoms", default=None,
                   help="e.g. 1,2 for a bond")
    p.add_argument("-sr", "--scan_range", default=None,
                   help="start,stop,npoints")
    # reference syntax (ref: Entrypoints/relaxed_scan.py:15-17): repeated
    # [kind atoms v1,v2] triples scanned simultaneously
    p.add_argument("-scan", "--scan_tgt", nargs="*", default=None,
                   help="repeated [kind atoms start,stop] triples, e.g. "
                        "-scan bond 1,2 1.0,1.8 angle 1,2,3 100,120 "
                        "(ref -scan)")
    p.add_argument("-nsample", "--number_of_samples", type=int, default=10,
                   help="scan points (ref -nsample)")
    p.add_argument("-fo", "--first_only", action="store_true",
                   help="seed every point from the input structure "
                        "(ref -fo)")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows import relaxed_scan
    from multioptpy_tpu.workflows.relaxed_scan import relaxed_scan_multi

    if args.scan_tgt:
        spec = list(args.scan_tgt)
        if len(spec) % 3:
            raise SystemExit("-scan expects repeated [kind atoms v1,v2] "
                             "triples")
        targets = []
        for i in range(0, len(spec), 3):
            v1, v2 = spec[i + 2].split(",")
            targets.append((spec[i], num_parse(spec[i + 1]),
                            float(v1), float(v2)))
        res = relaxed_scan_multi(calc, coords, z, targets,
                                 args.number_of_samples,
                                 config=_opt_config(args),
                                 first_only=args.first_only)
        out = _outdir(args, "_scan")
        write_trajectory(os.path.join(out, "scan.xyz"), symbols,
                         res.geometries * BOHR2ANGSTROM,
                         [f"E = {e:.10f}" for e in res.energies])
        header = ",".join(t[0] for t in targets) + ",energy"
        np.savetxt(os.path.join(out, "energy_profile.csv"),
                   np.column_stack([res.values, res.energies]),
                   header=header, delimiter=",")
        print(f"{len(res.energies)} scan points ({len(targets)} targets) "
              f"-> {out}/")
        return 0
    if not (args.scan_atoms and args.scan_range):
        raise SystemExit("give either -scan triples or -sa/-sr")
    start, stop, npts = args.scan_range.split(",")
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
    p.add_argument("-p", "--partition", type=int, default=0,
                   help="number of interpolation nodes (ref -p; overrides "
                        "-nimg when > 0)")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import read_xyz, write_xyz
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM
    from multioptpy_tpu.workflows.autots import AutoTSConfig, autots
    import jax.numpy as jnp

    n_images = args.partition if args.partition > 0 else args.n_images
    kw = {"n_images": n_images}
    ts_config = None
    flow = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
        if "workflow" in cfg:
            # v2 dynamic workflow engine (ref: Entrypoints/autots.py:70)
            from multioptpy_tpu.workflows.autots_v2 import run_autots_v2
            prod_v2 = None
            if args.product:
                _, prod_ang = read_xyz(args.product)
                prod_v2 = jnp.asarray(prod_ang * ANGSTROM2BOHR)
            engine, reports = run_autots_v2(calc, coords, z, cfg,
                                            product_coords=prod_v2)
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
        if any(f"step{i}_settings" in cfg for i in range(1, 5)) or \
                any(k in cfg for k in ("skip_step1", "skip_to_step4",
                                       "run_step4")):
            # reference v1 legacy config (ref: Entrypoints/autots.py:17;
            # the format of test/config_autots_run_xtb_test.json)
            from multioptpy_tpu.workflows.autots import autots_config_from_v1
            ts_config, flow = autots_config_from_v1(
                cfg, n_images_default=n_images)
        else:
            kw.update(cfg.get("autots", {}))
    if ts_config is None:
        if args.manual_AFIR:
            kw["afir_gamma"] = float(args.manual_AFIR[0])
            kw["afir_fragm_1"] = num_parse(args.manual_AFIR[1])
            kw["afir_fragm_2"] = num_parse(args.manual_AFIR[2])
        ts_config = AutoTSConfig(**kw)
    elif args.manual_AFIR:
        # CLI -ma overrides the config's step1 AFIR (ref autots.py:343)
        import dataclasses as _dc
        ts_config = _dc.replace(
            ts_config, afir_gamma=float(args.manual_AFIR[0]),
            afir_fragm_1=num_parse(args.manual_AFIR[1]),
            afir_fragm_2=num_parse(args.manual_AFIR[2]), afir_list=())
    product = None
    if args.product:
        _, prod_ang = read_xyz(args.product)
        product = jnp.asarray(prod_ang * ANGSTROM2BOHR)
    if flow.get("skip_to_step4"):
        # v1 flow: the input IS the TS guess — refine + IRC only
        # (ref: Entrypoints/autots.py:78, Wrapper/autots.py skip_to_step4)
        from multioptpy_tpu.analysis import normal_modes
        from multioptpy_tpu.analysis.vibrations import count_imaginary
        from multioptpy_tpu.drivers.irc import irc as _irc
        from multioptpy_tpu.drivers.optimize import optimize as _optimize
        from multioptpy_tpu.workflows.autots import refine_saddle
        res3 = refine_saddle(calc, coords, z, ts_config.saddle)
        h_ts = calc.hessian(res3.coords, z)
        ni = count_imaginary(
            normal_modes(h_ts, res3.coords, z).frequencies_cm1)
        irc_res = _irc(calc, res3.coords, z, hessian=h_ts,
                       config=ts_config.irc)
        end_f = _optimize(calc, irc_res.forward_path[-1], z,
                          config=ts_config.endpoint_opt).coords
        end_b = _optimize(calc, irc_res.backward_path[-1], z,
                          config=ts_config.endpoint_opt).coords
        out = _outdir(args, "_autots")
        write_xyz(os.path.join(out, "ts.xyz"), symbols,
                  np.asarray(res3.coords) * BOHR2ANGSTROM,
                  f"E = {float(res3.energy):.10f}, n_imag = {ni}")
        write_xyz(os.path.join(out, "irc_end_1.xyz"), symbols,
                  np.asarray(end_f) * BOHR2ANGSTROM)
        write_xyz(os.path.join(out, "irc_end_2.xyz"), symbols,
                  np.asarray(end_b) * BOHR2ANGSTROM)
        print(f"AutoTS (skip_to_step4): TS E = {float(res3.energy):.8f} "
              f"({ni} imaginary) -> {out}/")
        return 0
    res = autots(calc, coords, z, ts_config, product_coords=product)
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
    p.add_argument("-dist", "--distance", type=float, default=None,
                   help="fragment-center separation [Angstrom] before "
                        "orientation sampling (ref -dist)")
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.io import write_trajectory
    from multioptpy_tpu.units import BOHR2ANGSTROM
    from multioptpy_tpu.workflows.orientsearch import orientation_search

    res = orientation_search(calc, coords, z, num_parse(args.fragment),
                             n_samples=args.n_samples,
                             config=_opt_config(args),
                             distance_ang=args.distance)
    out = _outdir(args, "_orient")
    write_trajectory(os.path.join(out, "orientations.xyz"), symbols,
                     res.geometries * BOHR2ANGSTROM,
                     [f"E = {e:.10f}" for e in res.energies])
    print(f"{len(res.energies)} orientations -> {out}/")
    return 0


def run_ieipmain(argv=None):
    """Double-ended TS search (ref: ieip.py:191) + OtherMethod engines."""
    p = _base_parser("multioptpy_tpu iEIP / double-ended methods")
    p.add_argument("-i2", "--end_input", default=None,
                   help="product xyz (required except for -addf)")
    p.add_argument("-em", "--engine", default=None,
                   help="eip | dimer | spring_pair | gnt | addf | 2pshs")
    # reference-syntax engine switches (ref: interface.py:117-136
    # call_ieipparser -use_dimer/-addf/-gnt/-2pshs/-use_spm)
    p.add_argument("-use_dimer", "--use_dimer", action="store_true",
                   help="dimer method for the TS direction (ref -use_dimer)")
    p.add_argument("-dimer_sep", "--dimer_separation", type=float,
                   default=1e-4)
    p.add_argument("-dimer_trial_angle", "--dimer_trial_angle", type=float,
                   default=np.pi / 32.0)
    p.add_argument("-dimer_maxiter", "--dimer_max_iterations", type=int,
                   default=1000)
    p.add_argument("-use_spm", "--use_spm", action="store_true",
                   help="spring-pair method (ref -use_spm)")
    p.add_argument("-gnt", "--use_gnt", action="store_true",
                   help="growing Newton trajectory (ref -gnt)")
    p.add_argument("-gnt_vec", "--gnt_vec", default=None,
                   help="atoms defining the GNT direction, e.g. 1,2,3 "
                        "(default: reactant->product vector) (ref -gnt_vec)")
    p.add_argument("-gnt_step", "--gnt_step_len", type=float, default=0.5)
    p.add_argument("-gnt_mi", "--gnt_microiter", type=int, default=25)
    p.add_argument("-addf", "--use_addf", action="store_true",
                   help="ADDF-like anharmonic-downward-distortion search "
                        "(ref -addf; single-ended, -i2 not needed)")
    p.add_argument("-addf_step", "--addf_step_size", type=float, default=0.1)
    p.add_argument("-addf_num", "--addf_step_num", type=int, default=300)
    p.add_argument("-addf_nadd", "--number_of_add", type=int, default=5)
    p.add_argument("-2pshs", "--use_2pshs", action="store_true",
                   help="2PSHS-like double-ended sphere search (ref -2pshs)")
    p.add_argument("-2pshs_step", "--twoPshs_step_size", type=float,
                   default=0.05)
    p.add_argument("-2pshs_num", "--twoPshs_step_num", type=int, default=300)
    args = p.parse_args(argv)
    if not os.path.isfile(args.input):
        # reference input discovery (ref: ieip.py:250
        # glob(START_FILE + "*_[A-Z].xyz")): the positional argument may
        # be a prefix or a directory holding the *_A.xyz / *_B.xyz pair
        import glob as _glob
        matches = sorted(
            m for pat in (os.path.join(args.input, "*_[A-Z].xyz"),
                          args.input + "*_[A-Z].xyz")
            for m in _glob.glob(pat))
        if len(matches) >= 2:
            args.input = matches[0]
            if args.end_input is None:
                args.end_input = matches[1]
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    import jax.numpy as jnp

    from multioptpy_tpu.io import read_xyz, write_xyz
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    engine = args.engine
    if engine is None:
        if args.use_addf:
            engine = "addf"
        elif args.use_gnt:
            engine = "gnt"
        elif getattr(args, "use_2pshs"):
            engine = "2pshs"
        elif args.use_dimer:
            engine = "dimer"
        elif args.use_spm:
            engine = "spring_pair"
        else:
            engine = "eip"
    out = _outdir(args, "_ieip")

    end = None
    if args.end_input:
        _, end_ang = read_xyz(args.end_input)
        end = jnp.asarray(end_ang * ANGSTROM2BOHR)

    if engine == "addf":
        # full reference-driver flow: multi-channel ADD following with
        # per-channel saddle refinement + dedupe (ref: OtherMethod/
        # addf.py:12); falls back to the best raw crossing when no
        # channel refines
        from multioptpy_tpu.drivers.addf import ADDFConfig, addf_explore
        ts_list, channels = addf_explore(calc, coords, z, ADDFConfig(
            n_channels=args.number_of_add, r_step=args.addf_step_size,
            n_spheres=args.addf_step_num))
        if ts_list:
            ts_guess, ts_e = jnp.asarray(ts_list[0].coords), ts_list[0].energy
        elif not channels:
            raise SystemExit(
                "addf: no ADD channels explored (check -na > 0 and that the "
                "system has vibrational modes)")
        else:
            # Prefer genuine barrier crossings (lowest crossing energy)
            # over abandoned repulsive-wall channels capped near
            # e0 + max_rise, which would win a max-energy tie-break.
            crossed = [c for c in channels if getattr(c, "crossed_ts", False)]
            if crossed:
                best = min(crossed, key=lambda c: c.ts_energy)
            else:
                best = max(channels, key=lambda c: c.ts_energy)
            ts_guess, ts_e = jnp.asarray(best.ts_guess), float(best.ts_energy)
    elif engine == "gnt":
        from multioptpy_tpu.drivers.newton_traj import (GNTConfig,
                                                        newton_trajectory)
        direction = None
        if args.gnt_vec:
            idx = [a - 1 for a in num_parse(args.gnt_vec)]
            d = np.zeros_like(np.asarray(coords))
            d[idx] = 1.0
            direction = jnp.asarray(d)
        elif end is None:
            raise SystemExit("gnt needs -i2 or -gnt_vec")
        res = newton_trajectory(
            calc, coords, z, direction=direction, product_coords=end,
            config=GNTConfig(step_size=args.gnt_step_len,
                             n_corrector=args.gnt_microiter))
        ts_guess, ts_e = res.ts_guess, float(res.ts_energy)
    elif engine == "2pshs":
        from multioptpy_tpu.drivers.twopshs import TwoPSHSConfig, twopshs
        if end is None:
            raise SystemExit("2pshs needs -i2")
        res = twopshs(calc, coords, end, z, TwoPSHSConfig(
            r_step=args.twoPshs_step_size,
            n_spheres=args.twoPshs_step_num))
        ts_guess, ts_e = res.ts_guess, float(res.ts_energy)
    else:
        from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip
        if end is None:
            raise SystemExit(f"{engine} needs -i2 (a product geometry)")
        ikw = {"engine": engine, "n_steps": args.NSTEP}
        if getattr(args, "BETA", 1.0) != 1.0:
            # -beta scales the image-pair attraction (ref: ieip.py:147,
            # elastic_image_pair.py:458 X = BETA/|u| - ...)
            ikw["pull_strength"] = IEIPConfig().pull_strength * args.BETA
        if getattr(args, "dimer_separation", None) not in (None, 1e-4):
            ikw["dimer_separation"] = args.dimer_separation
        if engine == "dimer":
            # -dimer_maxiter caps the dimer loop; -dimer_trial_angle
            # scales the rotation step relative to the reference's pi/32
            # default (interface.py call_ieipparser)
            if getattr(args, "dimer_max_iterations", None):
                ikw["n_steps"] = int(args.dimer_max_iterations)
            ta = getattr(args, "dimer_trial_angle", None)
            if ta is not None:
                ikw["dimer_rot_step"] = 0.5 * float(ta) / (np.pi / 32.0)
        res = ieip(calc, coords, end, z, IEIPConfig(**ikw))
        ts_guess, ts_e = res.ts_guess, float(res.ts_energy)

    write_xyz(os.path.join(out, "ts_guess.xyz"), symbols,
              np.asarray(ts_guess) * BOHR2ANGSTROM, f"E = {ts_e:.10f}")
    print(f"iEIP ({engine}): TS guess E = {ts_e:.8f} -> {out}/")
    return 0


def run_mapper_cli(argv=None):
    """Reaction-network mapping (ref: Wrapper/mapper.py:1220)."""
    p = _base_parser("multioptpy_tpu reaction network mapper")
    p.add_argument("-cfg", "--config", default=None)
    p.add_argument("-maxnodes", "--max_nodes", type=int, default=10)
    p.add_argument("--resume", nargs="?", const="", default=None,
                   help="restart from a persisted network JSON (default: "
                        "<out>/network.json) (ref: Entrypoints/mapper.py:21)")
    # reference mapper CLI surface (ref: Entrypoints/mapper.py:150-310;
    # precedence CLI > mapper_settings > defaults, :352 resolve)
    p.add_argument("--temperature", type=float, default=None,
                   help="Boltzmann temperature [K]")
    p.add_argument("--rmsd_threshold", type=float, default=None)
    p.add_argument("--max_iter", type=int, default=None,
                   help="max exploration tasks")
    p.add_argument("--afir_gamma", type=float, default=None,
                   help="AFIR gamma [kJ/mol]")
    p.add_argument("--max_pairs", type=int, default=None)
    p.add_argument("--dist_lower", type=float, default=None)
    p.add_argument("--dist_upper", type=float, default=None)
    p.add_argument("--rng_seed", type=int, default=None)
    p.add_argument("--active_atoms", nargs="*", type=int, default=None,
                   help="restrict AFIR pairs to these 1-indexed atoms")
    p.add_argument("--negative_gamma", action="store_true",
                   help="also push fragments apart (negative gamma)")
    p.add_argument("--exclude_nodes", nargs="*", type=int, default=None,
                   help="EQ node ids never explored further")
    p.add_argument("--exclude_bond_rearrangement", action="store_true",
                   help="auto-exclude EQs whose bond topology differs "
                        "from the seed (EQ0)")
    p.add_argument("--use_rcmc", action="store_true",
                   help="kinetics-driven RCMC priority queue")
    p.add_argument("--rcmc_temperature", type=float, default=None)
    p.add_argument("--rcmc_time", type=float, default=None,
                   help="RCMC reaction time [s]")
    p.add_argument("--rcmc_start_node", type=int, default=None)
    args = p.parse_args(argv)
    symbols, coords, z = _load_system(args)
    calc = _make_calculator(args)
    from multioptpy_tpu.workflows.mapper import (
        MapperConfig, map_network, mapper_config_from_v1)

    overrides = dict(
        max_nodes=args.max_nodes,
        temperature_k=(args.rcmc_temperature if args.use_rcmc
                       and args.rcmc_temperature is not None
                       else args.temperature),
        rmsd_threshold_ang=args.rmsd_threshold,
        max_explorations=args.max_iter, afir_gamma=args.afir_gamma,
        max_pairs_per_node=args.max_pairs,
        dist_lower_ang=args.dist_lower, dist_upper_ang=args.dist_upper,
        seed=args.rng_seed,
        active_atoms=tuple(args.active_atoms) if args.active_atoms else None,
        include_negative_gamma=args.negative_gamma or None,
        excluded_node_ids=(tuple(args.exclude_nodes)
                           if args.exclude_nodes else None),
        exclude_bond_rearrangement=args.exclude_bond_rearrangement or None,
        queue="rcmc" if args.use_rcmc else None,
        rcmc_reaction_time_s=args.rcmc_time,
        rcmc_start_node=args.rcmc_start_node)
    cfg_json = {}
    if args.config:
        with open(args.config) as f:
            cfg_json = json.load(f)
    if "mapper_settings" in cfg_json or \
            any(f"step{i}_settings" in cfg_json for i in range(1, 5)):
        # reference-format config (ref: Entrypoints/mapper.py:28-55)
        mcfg = mapper_config_from_v1(cfg_json, **overrides)
    else:
        kw = dict(cfg_json.get("mapper", {}))
        kw.update({k: v for k, v in overrides.items() if v is not None})
        mcfg = MapperConfig(**kw)
    resume = args.resume
    if resume == "":
        resume = os.path.join(_outdir(args, "_mapper"), "network.json")
    res = map_network(calc, coords, z, mcfg, resume=resume)
    out = _outdir(args, "_mapper")
    res.save(os.path.join(out, "network.json"), symbols)
    print(f"network: {len(res.nodes)} EQ nodes, {len(res.edges)} TS edges "
          f"-> {out}/network.json")
    return 0
