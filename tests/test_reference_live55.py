"""LIVE parity wave 55: the reference's ENTIRE optmain driver executed
end to end in-image (its own torch SQM2 backend needs no external QM
library), and cross-checked against our optimizer driving the SAME
torch SQM2 PES through the host bridge — the shared-backend
minimization-parity anchor BASELINE.md defines (there with GFN2-xTB,
which this image lacks; SQM2 is the backend both sides can share).

Conventions learned by execution (ref: Entrypoints/core.py:4
run_optmain -> optimization.py Optimize.run):

  * `optmain water.xyz -sqm2 -opt rsirfo_fsb` runs fully headless in
    ~13 s: geometry collection, per-step SQM2 energies/gradients,
    RSIRFO steps, convergence ("converged!!!"), symmetry detection
    (C2v), and a dated work directory
    {cwd}/{YYYY_MM_DD}/{name}_OPT_SQM2_.../ holding
    *_optimized.xyz + *_traj.xyz. Importing the multioptpy package
    requires ASE at import time (Calculator/ase_tools/* import
    ase.calculators.* unconditionally) — the subprocess stubs the ase
    module tree; the reference cannot even be imported without ASE
    although SQM2 never uses it.
  * The reference's SQM2 water minimum: r(OH) = 0.8259 Angstrom,
    symmetric (its own parameterization; see
    test_host_bridge_live.py).
  * CROSS-DRIVER PARITY: our drivers/optimize.py (rfo_fsb, identity
    seed) driving the reference's OWN torch SQM2 through the
    pure_callback host bridge lands on the same minimum: r(OH) match
    to < 1e-3 A, torch-SQM2 energies at the two final geometries agree
    to < 1e-7 Ha. Different step engines, same PES, same stationary
    point — the BASELINE.md optmain-parity anchor discharged on the
    shared in-image backend.
"""

import contextlib
import io
import os
import subprocess
import sys
import types

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")

BOHR2ANG = 0.52917721067
WATER_ANG = np.array([[0.0, 0.0, 0.15],
                      [0.0, 0.8, -0.45],
                      [0.0, -0.8, -0.45]])
Z = np.array([8, 1, 1])

_RUNNER = r"""
import sys
from unittest.mock import MagicMock
for name in ['ase', 'ase.calculators', 'ase.calculators.espresso',
             'ase.calculators.gamess_us', 'ase.calculators.gaussian',
             'ase.calculators.mopac', 'ase.calculators.nwchem',
             'ase.calculators.orca', 'ase.data', 'ase.vibrations',
             'ase.io', 'ase.units']:
    sys.modules[name] = MagicMock()
sys.argv = ['optmain', 'water.xyz', '-sqm2', '-ns', '300',
            '-opt', 'rsirfo_fsb']
import multioptpy
from multioptpy.Entrypoints.core import run_optmain
run_optmain()
"""


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _geom_of(path):
    rows = []
    with open(path) as f:
        for line in f.read().splitlines()[2:]:
            w = line.split()
            if len(w) == 4:
                rows.append([float(x) for x in w[1:]])
    return np.array(rows)


def _sqm2_energy(xyz_ang):
    core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")
    with contextlib.redirect_stdout(io.StringIO()):
        calc = core.SQM2Calculator(xyz=xyz_ang, element_list=Z,
                                   charge=0, spin=0)
        return calc.total_energy(xyz_ang)


def test_reference_optmain_end_to_end_matches_our_driver(tmp_path):
    # --- reference optmain, full driver, subprocess-isolated ---------
    with open(tmp_path / "water.xyz", "w") as f:
        f.write("3\nwater\n")
        for el, row in zip(["O", "H", "H"], WATER_ANG):
            f.write(f"{el} {row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n")
    env = dict(os.environ, PYTHONPATH="/root/reference")
    proc = subprocess.run([sys.executable, "-c", _RUNNER],
                          cwd=str(tmp_path), env=env,
                          capture_output=True, text=True, timeout=400)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "converged!!!" in proc.stdout

    opt_files = [os.path.join(dp, fn)
                 for dp, _, fns in os.walk(tmp_path)
                 for fn in fns if fn.endswith("_optimized.xyz")]
    assert len(opt_files) == 1
    ref_geom = _geom_of(opt_files[0])
    r_ref_1 = np.linalg.norm(ref_geom[1] - ref_geom[0])
    r_ref_2 = np.linalg.norm(ref_geom[2] - ref_geom[0])
    assert r_ref_1 == pytest.approx(0.8259, abs=2e-3)
    assert abs(r_ref_1 - r_ref_2) < 1e-6

    # --- our driver on the SAME torch SQM2 PES via the host bridge ---
    from multioptpy_tpu.calculators.host import HostCalculator
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")

    class TorchSQM2Host(HostCalculator):
        def _host_energy_gradient(self, coords, z):
            xyz_ang = np.asarray(coords) * BOHR2ANG
            with contextlib.redirect_stdout(io.StringIO()):
                calc = core.SQM2Calculator(xyz=xyz_ang, element_list=Z,
                                           charge=0, spin=0)
                e, g = calc.total_gradient(xyz_ang)
            return float(e), np.asarray(g, dtype=np.float64)

    calc = TorchSQM2Host()
    x0 = jnp.asarray(WATER_ANG / BOHR2ANG, jnp.float64)
    res = optimize(calc, x0, jnp.asarray(Z),
                   config=OptimizeConfig(method="rfo_fsb", nsteps=80,
                                         init_hessian="identity"))
    assert bool(res.converged)
    ours = np.asarray(res.coords) * BOHR2ANG
    r_our_1 = np.linalg.norm(ours[1] - ours[0])
    r_our_2 = np.linalg.norm(ours[2] - ours[0])

    # same stationary point of the shared PES
    assert abs(r_our_1 - r_ref_1) < 1e-3
    assert abs(r_our_2 - r_ref_2) < 1e-3
    e_ref = _sqm2_energy(ref_geom)
    e_our = _sqm2_energy(ours)
    assert abs(e_ref - e_our) < 1e-7
