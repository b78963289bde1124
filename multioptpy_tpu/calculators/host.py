"""Host-side QM backends bridged into jitted device code via `jax.pure_callback`.

The reference drives tblite/PySCF/Psi4/ASE through per-step xyz files on disk
(ref: multioptpy/Calculator/{tblite,pyscf,psi4,ase}_calculation_tools.py). Here
the QM library call is a host callback with static output shapes, so the whole
optimization step — bias potentials, Hessian update, RFO solve — stays inside
one jitted function, and batched/ensemble drivers call the backend once per
step with a whole batch of geometries (the host fans out with threads).

All host backends are import-gated: constructing one raises ImportError with
a clear message when the library is absent (this image ships none of them).
"""

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator, register_calculator
from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM


class HostCalculator(Calculator):
    """Base for backends whose energy/gradient is computed on the host.

    Subclasses implement `_host_energy_gradient(coords_bohr np, z np) ->
    (float, (N,3) np)`. `energy_and_gradient` wraps it in `pure_callback`
    so drivers can jit/vmap over it; vmapped calls are fanned out across a
    thread pool (QM libraries release the GIL in their compute kernels).
    """

    on_device = False
    _pool = None
    max_workers = 8

    def _host_energy_gradient(self, coords, z):
        raise NotImplementedError

    def _host_batched(self, coords_b, z):
        coords_b = np.asarray(coords_b, dtype=np.float64)
        if coords_b.ndim == 2:
            e, g = self._host_energy_gradient(coords_b, np.asarray(z))
            return np.float64(e), np.asarray(g, dtype=np.float64)
        if HostCalculator._pool is None:
            HostCalculator._pool = ThreadPoolExecutor(self.max_workers)
        futs = [HostCalculator._pool.submit(self._host_energy_gradient, c, np.asarray(z))
                for c in coords_b]
        results = [f.result() for f in futs]
        e = np.array([r[0] for r in results], dtype=np.float64)
        g = np.stack([r[1] for r in results]).astype(np.float64)
        return e, g

    def energy_and_gradient(self, coords, z):
        out_shapes = (
            jax.ShapeDtypeStruct((), coords.dtype),
            jax.ShapeDtypeStruct(coords.shape, coords.dtype),
        )

        def cb(c, zz):
            e, g = self._host_batched(c, zz)
            return (np.asarray(e, dtype=coords.dtype),
                    np.asarray(g, dtype=coords.dtype))

        return jax.pure_callback(cb, out_shapes, coords, z, vmap_method="broadcast_all")

    def energy(self, coords, z):
        return self.energy_and_gradient(coords, z)[0]

    def hessian(self, coords, z):
        return self.numerical_hessian(coords, z)


@register_calculator("tblite")
class TBLite(HostCalculator):
    """GFN1-/GFN2-xTB via the tblite python API
    (ref: Calculator/tblite_calculation_tools.py:25-138).

    options: method ("GFN2-xTB"/"GFN1-xTB"), solvation (cpcm/alpb, solvent).
    """

    def __init__(self, method="GFN2-xTB", charge=0, multiplicity=1, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            from tblite.interface import Calculator as _TBCalc  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "tblite is not installed; install `tblite` to use the xTB backend"
            ) from e
        self.method = method

    def _host_energy_gradient(self, coords, z):
        from tblite.interface import Calculator as TBCalc
        calc = TBCalc(self.method, np.asarray(z, dtype=int), coords,
                      charge=self.charge,
                      uhf=self.multiplicity - 1)
        solvation = self.options.get("solvation")
        if solvation:
            calc.add(solvation[0], solvation[1])
        calc.set("verbosity", 0)
        res = calc.singlepoint()
        return float(res.get("energy")), np.asarray(res.get("gradient"))


@register_calculator("pyscf")
class PySCF(HostCalculator):
    """HF/DFT via PySCF (ref: Calculator/pyscf_calculation_tools.py:25-152).

    options: method ("B3LYP", "HF", ...), basis ("6-31G*", ...).
    """

    def __init__(self, method="B3LYP", basis="6-31G*", charge=0,
                 multiplicity=1, sub_basis=None, ecp=None, excited_state=0,
                 **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import pyscf  # noqa: F401
        except ImportError as e:
            raise ImportError("pyscf is not installed") from e
        self.method = method
        self.basis = basis
        # per-element basis overrides / ECPs / TDA excited state index
        # (ref: pyscf_calculation_tools.py:53 excited_state, :88 ecp,
        # sub-basis dict)
        self.sub_basis = sub_basis or {}
        self.ecp = ecp
        self.excited_state = int(excited_state)

    def _build_mf(self, coords, z):
        from pyscf import gto, dft, scf
        basis = (dict(self.sub_basis, default=self.basis)
                 if self.sub_basis else self.basis)
        mol = gto.M(
            atom=[(int(zi), tuple(c * BOHR2ANGSTROM)) for zi, c in zip(z, coords)],
            basis=basis, ecp=self.ecp,
            charge=self.charge, spin=self.multiplicity - 1,
            unit="Angstrom",
        )
        if self.method.upper() in ("HF", "RHF", "UHF"):
            mf = scf.UHF(mol) if self.multiplicity > 1 else scf.RHF(mol)
        else:
            mf = dft.UKS(mol) if self.multiplicity > 1 else dft.RKS(mol)
            mf.xc = self.method
        return mf

    def _host_wavefunction(self, coords, z):
        """(eps, C, S, occ) for NRO analysis (ref: the reference's NRO
        consumes consecutive Psi4/PySCF wavefunctions,
        WFAnalyzer/MO_analysis.py:66-79); consumed by
        analysis/mo.py host_orbitals."""
        mf = self._build_mf(coords, z)
        mf.kernel()
        return (np.asarray(mf.mo_energy), np.asarray(mf.mo_coeff),
                np.asarray(mf.get_ovlp()), np.asarray(mf.mo_occ))

    def _host_energy_gradient(self, coords, z):
        mf = self._build_mf(coords, z)
        e = mf.kernel()
        if self.excited_state > 0:
            # TDA excited-state gradient (ref: pyscf_calculation_tools.py:126)
            from pyscf import tdscf
            td = tdscf.TDA(mf)
            td.nstates = max(3, self.excited_state)
            td.kernel()
            g = td.nuc_grad_method().kernel(state=self.excited_state)
            e = float(mf.e_tot + td.e[self.excited_state - 1])
            return float(e), np.asarray(g)
        g = mf.nuc_grad_method().kernel()
        return float(e), np.asarray(g)


@register_calculator("psi4")
class Psi4(HostCalculator):
    """Psi4 backend (ref: Calculator/psi4_calculation_tools.py:22)."""

    def __init__(self, method="b3lyp/6-31g*", charge=0, multiplicity=1, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import psi4  # noqa: F401
        except ImportError as e:
            raise ImportError("psi4 is not installed") from e
        self.method = method

    def _host_energy_gradient(self, coords, z):
        import psi4
        from multioptpy_tpu.periodic import z_to_symbol
        # host resource hints (ref: psi4_calculation_tools.py set_memory/
        # set_num_threads from -mem / -core)
        if self.options.get("memory"):
            psi4.set_memory(str(self.options["memory"]))
        if self.options.get("n_threads"):
            psi4.set_num_threads(int(self.options["n_threads"]))
        lines = [f"{self.charge} {self.multiplicity}"]
        for zi, c in zip(z, coords * BOHR2ANGSTROM):
            lines.append(f"{z_to_symbol(zi)} {c[0]:.12f} {c[1]:.12f} {c[2]:.12f}")
        mol = psi4.geometry("\n".join(lines))
        psi4.core.be_quiet()
        g, wfn = psi4.gradient(self.method, molecule=mol, return_wfn=True)
        return float(wfn.energy()), np.asarray(g)

    def _host_wavefunction(self, coords, z):
        """(eps, C, S, occ) for NRO analysis (ref:
        WFAnalyzer/MO_analysis.py:66-79; consumed by analysis/mo.py)."""
        import psi4
        from multioptpy_tpu.periodic import z_to_symbol
        lines = [f"{self.charge} {self.multiplicity}"]
        for zi, c in zip(z, coords * BOHR2ANGSTROM):
            lines.append(
                f"{z_to_symbol(zi)} {c[0]:.12f} {c[1]:.12f} {c[2]:.12f}")
        mol = psi4.geometry("\n".join(lines))
        psi4.core.be_quiet()
        _e, wfn = psi4.energy(self.method, molecule=mol, return_wfn=True)
        s = psi4.core.MintsHelper(wfn.basisset()).ao_overlap()
        occ = np.zeros(wfn.nmo())
        occ[:wfn.nalpha()] += 1.0
        occ[:wfn.nbeta()] += 1.0
        return (np.asarray(wfn.epsilon_a()), np.asarray(wfn.Ca()),
                np.asarray(s), occ)


@register_calculator("ase")
class ASEBridge(HostCalculator):
    """Bridge to any ASE calculator (orca/gaussian/MACE/fairchem...)
    (ref: Calculator/ase_calculation_tools.py:67,354). Pass a constructed
    ase calculator as `ase_calc=`, OR a `software_type=` name which is
    resolved through `setup_ase_calculator` + software_path.conf (the
    reference's full factory path)."""

    def __init__(self, ase_calc=None, software_type=None, charge=0,
                 multiplicity=1, **kw):
        factory_kw = {k: kw.pop(k) for k in
                      ("software_path_dict", "functional", "basis_set",
                       "memory", "conf_path") if k in kw}
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import ase  # noqa: F401
        except ImportError as e:
            raise ImportError("ase is not installed") from e
        if ase_calc is None and software_type is not None:
            ase_calc = setup_ase_calculator(
                software_type, charge=charge, multiplicity=multiplicity,
                **factory_kw)
        if ase_calc is None:
            raise ValueError("pass ase_calc=<constructed ASE calculator> "
                             "or software_type=<orca|gaussian|...>")
        self.ase_calc = ase_calc

    def _host_energy_gradient(self, coords, z):
        import ase
        from ase import units as aseu
        atoms = ase.Atoms(numbers=np.asarray(z, int),
                          positions=coords * BOHR2ANGSTROM)
        atoms.calc = self.ase_calc
        e_ev = atoms.get_potential_energy()
        f_ev_ang = atoms.get_forces()
        e = e_ev / aseu.Hartree
        g = -f_ev_ang / aseu.Hartree / ANGSTROM2BOHR
        return float(e), np.asarray(g)


def read_software_path(path="./software_path.conf"):
    """External QM binary paths for the ASE bridge (ref: fileio.py:32
    read_software_path). Accepts the reference's `name::path` lines plus
    `name = path` for convenience."""
    import os

    paths = {}
    if not os.path.exists(path):
        return paths
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "::" in line:
                key, val = line.split("::", 1)
            elif "=" in line:
                key, val = line.split("=", 1)
            else:
                continue
            paths[key.strip().lower()] = val.strip()
    return paths


def setup_ase_calculator(software_type, charge=0, multiplicity=1,
                         software_path_dict=None, functional="b3lyp",
                         basis_set="def2-SVP", memory=None, conf_path=None,
                         **kw):
    """Factory resolving a named external code to a constructed ASE
    calculator (ref: Calculator/ase_calculation_tools.py:354
    setup_calculator): orca / gaussian / nwchem / gamessus / mopac /
    mace_mp / mace_off / uma-* (fairchem). Binary paths come from
    `software_path_dict` or `software_path.conf` (ref: fileio.py:32).

    Returns the ASE calculator object — pass it (or just the
    `software_type` string) to `ASEBridge`.
    """
    if software_path_dict is None:
        software_path_dict = read_software_path(conf_path
                                                or "./software_path.conf")
    st = software_type.lower()
    spin = multiplicity

    if st == "orca":
        from ase.calculators.orca import ORCA, OrcaProfile
        path = software_path_dict.get("orca")
        profile = OrcaProfile(command=path) if path else None
        return ORCA(profile=profile, charge=charge, mult=spin,
                    orcasimpleinput=f"{functional} {basis_set} EnGrad",
                    **kw)
    if st == "gaussian":
        from ase.calculators.gaussian import Gaussian
        path = software_path_dict.get("gaussian")
        extra = {"command": f"{path} < PREFIX.com > PREFIX.log"} if path else {}
        if memory:
            extra["mem"] = memory
        return Gaussian(method=functional, basis=basis_set, charge=charge,
                        mult=spin, **extra, **kw)
    if st == "nwchem":
        from ase.calculators.nwchem import NWChem
        return NWChem(xc=functional, basis=basis_set, charge=charge, **kw)
    if st == "gamessus":
        from ase.calculators.gamess_us import GAMESSUS
        path = software_path_dict.get("gamessus")
        extra = {"command": path} if path else {}
        return GAMESSUS(xc=functional, basis=basis_set, charge=charge,
                        mult=spin, **extra, **kw)
    if st == "mopac":
        from ase.calculators.mopac import MOPAC
        return MOPAC(charge=charge, **kw)
    if st in ("mace_mp", "mace_off"):
        # foundation ML potentials (ref: ase_calculation_tools.py ASE_MACE)
        if st == "mace_mp":
            from mace.calculators import mace_mp as _mk
        else:
            from mace.calculators import mace_off as _mk
        model = software_path_dict.get(st) or kw.pop("model", "medium")
        return _mk(model=model, **kw)
    if st.startswith("uma"):
        # fairchem UMA checkpoints (ref: ase_calculation_tools.py
        # ASE_FAIRCHEM; device left to the library default)
        from fairchem.core import FAIRChemCalculator
        path = software_path_dict.get(st)
        return FAIRChemCalculator(checkpoint_path=path, **kw)
    if st == "gfn0-xtb":
        # standalone GFN0 library (ref: ase_tools/pygfn0.py ASE_GFN0)
        import pygfn0
        return pygfn0.GFN0(charge=charge, **kw)
    if st == "gfn-ff":
        # standalone GFN-FF library (ref: ase_tools/pygfnff.py ASE_GFNFF;
        # the upstream wrapper ignores charge for the force field too)
        import pygfnff
        return pygfnff.GFNFF(**kw)
    if st == "gxtb_dev":
        # preliminary g-xTB (ref: ase_tools/gxtb_dev.py ASE_gxTB_Dev)
        from pygxtb import PygxTB
        return PygxTB(charge=charge, **kw)
    raise ValueError(f"unsupported software type: {software_type}")


@register_calculator("dxtb")
class DXTB(HostCalculator):
    """torch-autograd xTB via dxtb (ref: Calculator/dxtb_calculation_tools.py).
    Analytic gradients come from torch autodiff on the host; the rest of the
    step stays on device like every HostCalculator."""

    def __init__(self, method="GFN1-xTB", charge=0, multiplicity=1, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import dxtb  # noqa: F401
            import torch  # noqa: F401
        except ImportError as e:
            raise ImportError("dxtb (and torch) are required for the dxtb "
                              "backend") from e
        self.method = method

    def _host_energy_gradient(self, coords, z):
        import dxtb
        import torch
        numbers = torch.tensor(np.asarray(z, dtype=int))
        positions = torch.tensor(coords, dtype=torch.float64,
                                 requires_grad=True)
        calc = dxtb.Calculator(numbers, dxtb.GFN1_XTB, opts={"verbosity": 0})
        e = calc.get_energy(positions, chrg=self.charge)
        (g,) = torch.autograd.grad(e, positions)
        return float(e.detach()), g.detach().numpy()


@register_calculator("gpaw")
class GPAW(HostCalculator):
    """GPAW periodic-DFT bridge (ref: Calculator/gpaw_calculation_tools.py).
    options: mode ("lcao"/"pw"), xc, kpts."""

    def __init__(self, mode="lcao", xc="PBE", charge=0, multiplicity=1, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import gpaw  # noqa: F401
            import ase  # noqa: F401
        except ImportError as e:
            raise ImportError("gpaw is not installed") from e
        self.mode = mode
        self.xc = xc

    def _host_energy_gradient(self, coords, z):
        import ase
        from ase import units as aseu
        from gpaw import GPAW as _GPAW
        atoms = ase.Atoms(numbers=np.asarray(z, int),
                          positions=coords * BOHR2ANGSTROM)
        atoms.center(vacuum=4.0)
        atoms.calc = _GPAW(mode=self.mode, xc=self.xc, txt=None,
                           **self.options.get("gpaw_kwargs", {}))
        e = atoms.get_potential_energy() / aseu.Hartree
        g = -atoms.get_forces() / aseu.Hartree / ANGSTROM2BOHR
        return float(e), np.asarray(g)


@register_calculator("pwscf")
class PWSCF(HostCalculator):
    """Quantum-ESPRESSO pw.x bridge through ASE
    (ref: Calculator/pwscf_calculation_tools.py; binary path from
    software_path.conf like the reference's read_software_path)."""

    def __init__(self, pseudopotentials=None, charge=0, multiplicity=1, **kw):
        super().__init__(charge=charge, multiplicity=multiplicity, **kw)
        try:
            import ase  # noqa: F401
            from ase.calculators.espresso import Espresso  # noqa: F401
        except ImportError as e:
            raise ImportError("ase (with espresso support) is not "
                              "installed") from e
        self.pseudopotentials = pseudopotentials or {}

    def _host_energy_gradient(self, coords, z):
        import ase
        from ase import units as aseu
        from ase.calculators.espresso import Espresso
        cmd = read_software_path().get("pwscf")
        atoms = ase.Atoms(numbers=np.asarray(z, int),
                          positions=coords * BOHR2ANGSTROM)
        atoms.center(vacuum=5.0)
        kw = dict(pseudopotentials=self.pseudopotentials,
                  **self.options.get("espresso_kwargs", {}))
        if cmd:
            kw["command"] = cmd
        atoms.calc = Espresso(**kw)
        e = atoms.get_potential_energy() / aseu.Hartree
        g = -atoms.get_forces() / aseu.Hartree / ANGSTROM2BOHR
        return float(e), np.asarray(g)
