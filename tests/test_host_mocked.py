"""Mock-library contract tests for the host QM bridges (VERDICT weak #5).

None of tblite/pyscf/psi4/ase/dxtb exist in this image, so each test
injects a minimal FAKE module into sys.modules that mimics the library's
public API shape, then drives the bridge through the real
`energy_and_gradient` path — pure_callback plumbing, unit conversions,
thread-pooled vmap batching — against a known analytic surface.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

WATER = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.81], [1.75, 0.0, -0.48]])
Z = np.array([8, 1, 1])


def _harmonic(coords_bohr):
    """Known analytic surface: E = 0.5 sum |r|^2 (Bohr), g = r."""
    c = np.asarray(coords_bohr, dtype=np.float64)
    return 0.5 * float(np.sum(c * c)), c.copy()


@pytest.fixture
def cleanup_modules():
    added = []
    yield added
    for name in added:
        sys.modules.pop(name, None)


def _install(cleanup, name, module):
    sys.modules[name] = module
    cleanup.append(name)


# --------------------------------------------------------------------------
# tblite
# --------------------------------------------------------------------------

def _fake_tblite(cleanup, record):
    class FakeRes:
        def __init__(self, e, g):
            self._d = {"energy": e, "gradient": g}

        def get(self, key):
            return self._d[key]

    class FakeTBCalc:
        def __init__(self, method, numbers, positions, charge=0, uhf=0):
            record.update(method=method, numbers=np.asarray(numbers),
                          charge=charge, uhf=uhf)
            self.positions = np.asarray(positions)
            self.settings = {}
            self.additions = []

        def add(self, *a):
            self.additions.append(a)

        def set(self, k, v):
            self.settings[k] = v

        def singlepoint(self):
            e, g = _harmonic(self.positions)
            return FakeRes(e, g)

    mod = types.ModuleType("tblite")
    iface = types.ModuleType("tblite.interface")
    iface.Calculator = FakeTBCalc
    mod.interface = iface
    _install(cleanup, "tblite", mod)
    _install(cleanup, "tblite.interface", iface)


def test_tblite_bridge_contract(cleanup_modules):
    record = {}
    _fake_tblite(cleanup_modules, record)
    from multioptpy_tpu.calculators.host import TBLite

    calc = TBLite(method="GFN2-xTB", charge=1, multiplicity=2)
    coords = jnp.asarray(WATER)
    e, g = jax.jit(calc.energy_and_gradient)(coords, jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-12)
    assert record["method"] == "GFN2-xTB"
    assert record["charge"] == 1 and record["uhf"] == 1
    np.testing.assert_array_equal(record["numbers"], Z)


def test_tblite_bridge_vmap_batching(cleanup_modules):
    record = {}
    _fake_tblite(cleanup_modules, record)
    from multioptpy_tpu.calculators.host import TBLite

    calc = TBLite()
    batch = jnp.asarray(np.stack([WATER, WATER * 1.05, WATER * 0.95]))
    e, g = jax.vmap(lambda c: calc.energy_and_gradient(c, jnp.asarray(Z)))(
        batch)
    for i, c in enumerate(np.asarray(batch)):
        e_ref, g_ref = _harmonic(c)
        np.testing.assert_allclose(float(e[i]), e_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g[i]), g_ref, rtol=1e-12)


# --------------------------------------------------------------------------
# psi4 (method string, quiet mode, Hartree units passthrough)
# --------------------------------------------------------------------------

def test_psi4_bridge_contract(cleanup_modules):
    record = {}

    class FakeWfn:
        def __init__(self, e):
            self._e = e

        def energy(self):
            return self._e

    mod = types.ModuleType("psi4")
    core = types.SimpleNamespace(be_quiet=lambda: record.update(quiet=True),
                                 clean=lambda: None)
    mod.core = core
    mod.set_memory = lambda *a: None
    mod.set_num_threads = lambda *a: None
    mod.set_options = lambda *a, **k: None

    def geometry(text):
        record["geom_text"] = text
        lines = [l.split() for l in text.splitlines()
                 if len(l.split()) == 4]
        pos_ang = np.array([[float(x) for x in l[1:]] for l in lines])
        return pos_ang

    def gradient(method, molecule=None, return_wfn=False):
        record["method"] = method
        e, g_bohr = _harmonic(molecule * ANGSTROM2BOHR)
        return np.asarray(g_bohr), FakeWfn(e)

    mod.geometry = geometry
    mod.gradient = gradient
    _install(cleanup_modules, "psi4", mod)

    from multioptpy_tpu.calculators.host import Psi4

    calc = Psi4(method="b3lyp/6-31g*")
    e, g = calc.energy_and_gradient(jnp.asarray(WATER), jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)
    assert record["method"] == "b3lyp/6-31g*"
    assert record.get("quiet", False)


# --------------------------------------------------------------------------
# ase (eV/Angstrom -> Hartree/Bohr conversion, forces sign)
# --------------------------------------------------------------------------

def test_ase_bridge_units_and_sign(cleanup_modules):
    HARTREE_EV = 27.211386245988

    class FakeAtoms:
        def __init__(self, numbers=None, positions=None):
            self.numbers = np.asarray(numbers)
            self.positions = np.asarray(positions)   # Angstrom
            self.calc = None

        def get_potential_energy(self):
            e_ha, _ = _harmonic(self.positions * ANGSTROM2BOHR)
            return e_ha * HARTREE_EV

        def get_forces(self):
            _, g_bohr = _harmonic(self.positions * ANGSTROM2BOHR)
            # forces in eV/Angstrom: -dE/dx_ang = -g_bohr*HARTREE_EV/BOHR2ANG
            return -g_bohr * HARTREE_EV / BOHR2ANGSTROM

    mod = types.ModuleType("ase")
    mod.Atoms = FakeAtoms
    units = types.ModuleType("ase.units")
    units.Hartree = HARTREE_EV
    units.Bohr = BOHR2ANGSTROM
    mod.units = units
    _install(cleanup_modules, "ase", mod)
    _install(cleanup_modules, "ase.units", units)

    from multioptpy_tpu.calculators.host import ASEBridge

    calc = ASEBridge(ase_calc=object())
    e, g = calc.energy_and_gradient(jnp.asarray(WATER), jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)


def test_ase_factory_resolves_software_type(cleanup_modules, tmp_path):
    """setup_ase_calculator wires software_path.conf paths into the right
    ASE calculator class (ref: ase_calculation_tools.py:354)."""
    captured = {}

    class FakeORCA:
        def __init__(self, profile=None, charge=0, mult=1,
                     orcasimpleinput=""):
            captured.update(profile=profile, charge=charge, mult=mult,
                            simple=orcasimpleinput)

    class FakeProfile:
        def __init__(self, command=None):
            captured["command"] = command

    mod = types.ModuleType("ase")
    calcs = types.ModuleType("ase.calculators")
    orca_mod = types.ModuleType("ase.calculators.orca")
    orca_mod.ORCA = FakeORCA
    orca_mod.OrcaProfile = FakeProfile
    units = types.ModuleType("ase.units")
    units.Hartree = 27.2114
    mod.units = units
    _install(cleanup_modules, "ase", mod)
    _install(cleanup_modules, "ase.units", units)
    _install(cleanup_modules, "ase.calculators", calcs)
    _install(cleanup_modules, "ase.calculators.orca", orca_mod)

    conf = tmp_path / "software_path.conf"
    conf.write_text("orca::/opt/orca/orca\n")

    from multioptpy_tpu.calculators.host import setup_ase_calculator

    calc = setup_ase_calculator("orca", charge=-1, multiplicity=3,
                                conf_path=str(conf), functional="wb97x",
                                basis_set="def2-TZVP")
    assert isinstance(calc, FakeORCA)
    assert captured["command"] == "/opt/orca/orca"
    assert captured["charge"] == -1 and captured["mult"] == 3
    assert "wb97x" in captured["simple"] and "def2-TZVP" in captured["simple"]


def test_ase_factory_standalone_xtb_family(cleanup_modules, tmp_path):
    """The GFN0-xTB / GFN-FF / gxtb_dev branches resolve to the standalone
    pip libraries the reference's ase_tools adapters import
    (ref: ase_tools/pygfn0.py:17, pygfnff.py:20, gxtb_dev.py:13) with the
    charge passthrough the upstream wrappers apply."""
    import types

    captured = {}

    gfn0_mod = types.ModuleType("pygfn0")

    class FakeGFN0:
        def __init__(self, charge=0):
            captured["gfn0_charge"] = charge
    gfn0_mod.GFN0 = FakeGFN0

    gfnff_mod = types.ModuleType("pygfnff")

    class FakeGFNFF:
        def __init__(self):
            captured["gfnff"] = True
    gfnff_mod.GFNFF = FakeGFNFF

    gxtb_mod = types.ModuleType("pygxtb")

    class FakePygxTB:
        def __init__(self, charge=0):
            captured["gxtb_charge"] = charge
    gxtb_mod.PygxTB = FakePygxTB

    _install(cleanup_modules, "pygfn0", gfn0_mod)
    _install(cleanup_modules, "pygfnff", gfnff_mod)
    _install(cleanup_modules, "pygxtb", gxtb_mod)

    conf = tmp_path / "software_path.conf"
    conf.write_text("")

    from multioptpy_tpu.calculators.host import setup_ase_calculator

    c0 = setup_ase_calculator("GFN0-xTB", charge=-1, conf_path=str(conf))
    assert isinstance(c0, FakeGFN0) and captured["gfn0_charge"] == -1
    cff = setup_ase_calculator("GFN-FF", conf_path=str(conf))
    assert isinstance(cff, FakeGFNFF)
    cg = setup_ase_calculator("gxtb_dev", charge=1, conf_path=str(conf))
    assert isinstance(cg, FakePygxTB) and captured["gxtb_charge"] == 1


def test_read_software_path_reference_format(tmp_path):
    from multioptpy_tpu.calculators.host import read_software_path
    conf = tmp_path / "software_path.conf"
    conf.write_text("# comment\norca::/opt/orca\ngaussian = /usr/bin/g16\n"
                    "malformed line\n")
    paths = read_software_path(str(conf))
    assert paths == {"orca": "/opt/orca", "gaussian": "/usr/bin/g16"}


# --------------------------------------------------------------------------
# pyscf (RKS/UKS selection, gradient passthrough)
# --------------------------------------------------------------------------

def test_pyscf_bridge_contract(cleanup_modules):
    record = {}

    class FakeMF:
        def __init__(self, mol):
            self.mol = mol
            self.xc = None

        def kernel(self):
            record["xc"] = self.xc
            e, self._g = _harmonic(self.mol.coords_bohr)
            self.e_tot = e
            return e

        def nuc_grad_method(self):
            outer = self

            class G:
                def kernel(self):
                    record["grad_called"] = True
                    return outer._g
            return G()

    class FakeMol:
        pass

    def fake_m(atom=None, basis=None, ecp=None, charge=0, spin=0, unit=None):
        record.update(basis=basis, charge=charge, spin=spin, unit=unit)
        pos = np.array([list(a[1]) for a in atom])   # Angstrom (unit says)
        mol = FakeMol()
        mol.coords_bohr = (pos if str(unit).lower().startswith("b")
                           else pos * ANGSTROM2BOHR)
        return mol

    mod = types.ModuleType("pyscf")
    mod.gto = types.SimpleNamespace(M=fake_m, Mole=FakeMol)
    mod.dft = types.SimpleNamespace(RKS=lambda mol: FakeMF(mol),
                                    UKS=lambda mol: FakeMF(mol))
    mod.scf = types.SimpleNamespace(RHF=lambda mol: FakeMF(mol),
                                    UHF=lambda mol: FakeMF(mol))
    _install(cleanup_modules, "pyscf", mod)

    from multioptpy_tpu.calculators.host import PySCF

    calc = PySCF(method="B3LYP", basis="6-31G*", charge=0, multiplicity=1)
    e, g = calc.energy_and_gradient(jnp.asarray(WATER), jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)
    assert record["basis"] == "6-31G*"
    assert record.get("grad_called", False)


# --------------------------------------------------------------------------
# dxtb (torch autograd on the host; torch IS in the image, dxtb is mocked)
# --------------------------------------------------------------------------

def test_dxtb_bridge_contract(cleanup_modules):
    import torch

    class FakeDxtbCalc:
        def __init__(self, numbers, par, opts=None):
            self.numbers = numbers

        def get_energy(self, positions, chrg=0):
            return 0.5 * (positions ** 2).sum()

    mod = types.ModuleType("dxtb")
    mod.Calculator = FakeDxtbCalc
    mod.GFN1_XTB = object()
    _install(cleanup_modules, "dxtb", mod)

    from multioptpy_tpu.calculators.host import DXTB

    calc = DXTB()
    e, g = calc.energy_and_gradient(jnp.asarray(WATER), jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)


# --------------------------------------------------------------------------
# gpaw (ASE-style interface; eV/Angstrom conversion + vacuum centering)
# --------------------------------------------------------------------------

def test_gpaw_bridge_contract(cleanup_modules):
    HARTREE_EV = 27.211386245988

    class FakeAtoms:
        def __init__(self, numbers=None, positions=None):
            self.numbers = np.asarray(numbers)
            self.positions = np.asarray(positions)
            self.calc = None
            self._offset = 0.0

        def center(self, vacuum=None):
            self._offset = 7.5   # shifts positions; forces are invariant

        def get_potential_energy(self):
            e_ha, _ = _harmonic(self.positions * ANGSTROM2BOHR)
            return e_ha * HARTREE_EV

        def get_forces(self):
            _, g_bohr = _harmonic(self.positions * ANGSTROM2BOHR)
            return -g_bohr * HARTREE_EV / BOHR2ANGSTROM

    ase_mod = types.ModuleType("ase")
    ase_mod.Atoms = FakeAtoms
    units = types.ModuleType("ase.units")
    units.Hartree = HARTREE_EV
    ase_mod.units = units
    gpaw_mod = types.ModuleType("gpaw")
    created = {}

    class FakeGPAW:
        def __init__(self, mode=None, xc=None, txt=None, **kw):
            created.update(mode=mode, xc=xc)

    gpaw_mod.GPAW = FakeGPAW
    _install(cleanup_modules, "ase", ase_mod)
    _install(cleanup_modules, "ase.units", units)
    _install(cleanup_modules, "gpaw", gpaw_mod)

    from multioptpy_tpu.calculators.host import GPAW

    calc = GPAW(mode="pw", xc="PBE")
    e, g = calc.energy_and_gradient(jnp.asarray(WATER), jnp.asarray(Z))
    e_ref, g_ref = _harmonic(WATER)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)
    assert created == {"mode": "pw", "xc": "PBE"}
