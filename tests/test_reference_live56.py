"""LIVE parity wave 56: the reference's FULL nebmain driver executed
end to end in-image (torch SQM2 backend) on an HCN->HNC band, with the
initial-band energies cross-checked against the same backend through
our host bridge, and a driver-level robustness A/B against our NEB.

Conventions learned by execution (ref: Entrypoints/core.py:28
run_nebmain -> neb.py NEB.run):

  * `nebmain band.xyz -sqm2 -ns 6` runs headless (~45 s) and writes
    energy_plot.csv / bias_force_rms.csv / orthogonality.csv +
    path_ITR_i_band/ frame folders. Each CSV row has n_images+1
    columns — an extra leading column that duplicates image 0 on the
    first row but diverges from every per-image value on later rows
    (pinned for row 0; the extra column's later content is untied to
    any image energy).
  * Row 0 of energy_plot.csv equals the torch SQM2 energies of the
    parsed initial frames exactly (1e-9 pinned through our host
    bridge) — the full file->parse->unit->backend chain agrees between
    the two stacks.
  * THE DEFAULT BAND OPTIMIZER DESTROYS THIS BAND: nebmain's default
    clock is the wave-40 FIREOptimizer (growing mixing parameter,
    trapezoid double-integration, dt default 0.5 at neb.py:214); on
    this ordinary 8-image HCN swing path the energies leave the
    initial range after ONE iteration and reach |E| ~ 1e6 Ha by
    iteration 3 (atoms fused; SQM2's nan_to_num keeps "gradients"
    finite) — and the driver still reports a TS candidate from the
    wrecked band (pinned: final-row |E| > 100 Ha AND "TS candidate
    indices" in stdout). Our NEB driver on the SAME torch SQM2
    backend, same initial band and iteration count, keeps every image
    within 0.5 Ha of the initial energy window (pinned) — the
    per-image move clamp and conservative FIRE clock are what the
    reference's band loop is missing.
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
Z = np.array([6, 7, 1])

_RUNNER = r"""
import sys
from unittest.mock import MagicMock
for name in ['ase', 'ase.calculators', 'ase.calculators.espresso',
             'ase.calculators.gamess_us', 'ase.calculators.gaussian',
             'ase.calculators.mopac', 'ase.calculators.nwchem',
             'ase.calculators.orca', 'ase.data', 'ase.vibrations',
             'ase.io', 'ase.units']:
    sys.modules[name] = MagicMock()
sys.argv = ['nebmain', 'band.xyz', '-sqm2', '-ns', '6']
import multioptpy
from multioptpy.Entrypoints.core import run_nebmain
run_nebmain()
"""


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _hcn_band(n_img=8):
    c = np.array([0.0, 0.0, 0.0])
    n = np.array([0.0, 0.0, 1.16])
    frames = []
    for t in np.linspace(0.0, 1.0, n_img):
        ang = np.pi * t
        center = c * (1 - t) + n * t
        h = center + np.array([1.1 * np.sin(ang), 0.0,
                               -1.05 * np.cos(ang)])
        frames.append(np.stack([c, n, h]))
    return np.array(frames)                    # Angstrom


class _TorchSQM2Energies:
    def __init__(self):
        self._core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")

    def energy(self, xyz_ang):
        with contextlib.redirect_stdout(io.StringIO()):
            calc = self._core.SQM2Calculator(xyz=xyz_ang,
                                             element_list=Z, charge=0,
                                             spin=0)
            return calc.total_energy(xyz_ang)


@pytest.fixture(scope="module")
def neb_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refneb")
    frames = _hcn_band()
    with open(tmp / "band.xyz", "w") as f:
        for i, fr in enumerate(frames):
            f.write(f"3\nframe {i}\n")
            for el, row in zip(["C", "N", "H"], fr):
                f.write(f"{el} {row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n")
        f.write("\n")          # keep the last frame (wave-49 quirk)
    env = dict(os.environ, PYTHONPATH="/root/reference")
    proc = subprocess.run([sys.executable, "-c", _RUNNER],
                          cwd=str(tmp), env=env, capture_output=True,
                          text=True, timeout=550)
    assert proc.returncode == 0, proc.stderr[-2000:]
    run_dirs = [d for d in os.listdir(tmp) if d.startswith("band_NEB")]
    assert len(run_dirs) == 1
    rows = []
    with open(tmp / run_dirs[0] / "energy_plot.csv") as f:
        for line in f.read().splitlines():
            if line.strip():
                rows.append([float(x) for x in line.split(",")])
    return frames, np.array(rows), proc.stdout


def test_nebmain_live_csv_has_extra_leading_column(neb_run):
    frames, rows, _ = neb_run
    assert rows.shape[1] == len(frames) + 1
    # the extra column duplicates image 0 on the initial row only
    assert rows[0, 0] == rows[0, 1]


def test_nebmain_live_initial_energies_match_shared_backend(neb_run):
    frames, rows, _ = neb_run
    eng = _TorchSQM2Energies()
    want = [eng.energy(fr) for fr in frames]
    np.testing.assert_allclose(rows[0, 1:], want, atol=1e-9)


def test_nebmain_live_default_clock_destroys_band_ours_stays_bounded(
        neb_run):
    frames, rows, stdout = neb_run
    e0 = rows[0, 1:]
    # the reference band explodes yet still nominates a TS
    assert np.max(np.abs(rows[-1])) > 100.0
    assert "TS candidate indices" in stdout

    # ours: same backend (host bridge), same band, same iterations —
    # bounded
    from multioptpy_tpu.calculators.host import HostCalculator
    from multioptpy_tpu.drivers.neb import NEBConfig, neb

    core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")

    class TorchSQM2Host(HostCalculator):
        def _host_energy_gradient(self, coords, z):
            xyz_ang = np.asarray(coords) * BOHR2ANG
            with contextlib.redirect_stdout(io.StringIO()):
                calc = core.SQM2Calculator(xyz=xyz_ang, element_list=Z,
                                           charge=0, spin=0)
                e, g = calc.total_gradient(xyz_ang)
            return float(e), np.asarray(g, dtype=np.float64)

    path0 = jnp.asarray(frames / BOHR2ANG, jnp.float64)
    res = neb(TorchSQM2Host(), path0, jnp.asarray(Z),
              config=NEBConfig(variant="cineb", n_steps=6,
                               climbing_start=10))
    e_final = np.asarray(res.energies)
    lo, hi = e0.min(), e0.max()
    assert np.all(e_final > lo - 0.5)
    assert np.all(e_final < hi + 0.5)
    # endpoints pinned
    np.testing.assert_allclose(np.asarray(res.path[0]), path0[0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.path[-1]), path0[-1],
                               atol=1e-12)
