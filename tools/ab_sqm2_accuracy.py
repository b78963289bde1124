"""Geometry-accuracy A/B: our SQM2 vs the reference's torch SQM2 vs
experiment (VERDICT r3 item 3).

Optimizes a fixture battery with BOTH SQM2 implementations — ours through
our RFO driver, the reference's (imported in-image as an external library,
nothing copied) through scipy L-BFGS on its own total_gradient — and
tabulates bond lengths / angles against experimental values. Output:
a markdown table on stdout (committed to docs/SQM2_AB.md).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/ab_sqm2_accuracy.py
"""

import contextlib
import io
import sys
import types

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multioptpy_tpu.calculators.sqm import SQM2  # noqa: E402
from multioptpy_tpu.drivers.optimize import (  # noqa: E402
    OptimizeConfig, optimize)

A2B = 1.0 / 0.52917721067
B2A = 0.52917721067


def _ref_sqm2():
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = ["/root/reference/multioptpy"]
        sys.modules["multioptpy"] = pkg
    from multioptpy.SQM.sqm2.sqm2_core import SQM2Calculator
    return SQM2Calculator


def ref_optimize(coords_ang, z):
    """Minimize the reference's torch SQM2 with scipy L-BFGS-B."""
    from scipy.optimize import minimize
    SQM2Calculator = _ref_sqm2()
    z = np.asarray(z)

    def eg(x):
        xyz = x.reshape(-1, 3)
        with contextlib.redirect_stdout(io.StringIO()):
            calc = SQM2Calculator(xyz=xyz, element_list=z, charge=0, spin=0)
            e, g = calc.total_gradient(xyz)
        # the reference's sqm2_core returns the gradient in Hartree/Bohr;
        # L-BFGS-B steps in the Angstrom input frame, so convert:
        # dE/dAng = dE/dBohr * (Bohr per Angstrom)^-1... i.e. * ANG2BOHR
        ang2bohr = 1.0 / 0.529177210903
        g = np.asarray(g, dtype=np.float64).reshape(-1) * ang2bohr
        return float(e), g

    res = minimize(eg, np.asarray(coords_ang, np.float64).reshape(-1),
                   jac=True, method="L-BFGS-B",
                   options={"maxiter": 400, "gtol": 1e-6})
    return res.x.reshape(-1, 3), float(res.fun)


def our_optimize(coords_ang, z):
    calc = SQM2()
    cfg = OptimizeConfig(method="rfo_fsb", nsteps=250, fc_count=10)
    res = optimize(calc, jnp.asarray(np.asarray(coords_ang) * A2B),
                   jnp.asarray(np.asarray(z)), config=cfg)
    return np.asarray(res.coords) * B2A, float(res.energy)


def _angle(c, i, j, k):
    a = c[i] - c[j]
    b = c[k] - c[j]
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


# (name, symbols->z, start coords Angstrom, measurements, experimental)
# measurement: ("r", i, j, exp_A) or ("a", i, j, k, exp_deg)
def battery():
    def eth(r=1.6):
        ch, a = 1.087, np.radians(111.2)
        rows = [np.zeros(3), np.array([0, 0, r])]
        for phi in (0.0, 2 * np.pi / 3, 4 * np.pi / 3):
            rows.append(rows[0] + ch * np.array(
                [np.cos(phi) * np.sin(a), np.sin(phi) * np.sin(a),
                 -np.cos(a)]))
        for phi in (np.pi / 3, np.pi, 5 * np.pi / 3):
            rows.append(rows[1] + ch * np.array(
                [np.cos(phi) * np.sin(a), np.sin(phi) * np.sin(a),
                 np.cos(a)]))
        return np.stack(rows)

    def ety(r=1.35):
        # H-C-C angle 121.3 deg measured from the +z (C-C) axis: cos(a)
        # is negative, so c0's hydrogens use +cos(a) (pointing away from
        # c1) and c1's use -cos(a)
        ch, a = 1.086, np.radians(121.3)
        rows = [np.zeros(3), np.array([0, 0, r])]
        for sgn in (1, -1):
            rows.append(rows[0] + ch * np.array([0, sgn * np.sin(a),
                                                 np.cos(a)]))
            rows.append(rows[1] + ch * np.array([0, sgn * np.sin(a),
                                                 -np.cos(a)]))
        return np.stack(rows)

    return [
        ("H2O", [8, 1, 1],
         np.array([[0, 0, 0], [0, 0.99, 0.2], [0, -0.95, 0.25]]),
         [("r", 0, 1, 0.958), ("a", 1, 0, 2, 104.5)]),
        ("NH3", [7, 1, 1, 1],
         np.array([[0, 0, 0.1], [0.95, 0, -0.3], [-0.47, 0.82, -0.3],
                   [-0.47, -0.82, -0.3]]),
         [("r", 0, 1, 1.012), ("a", 1, 0, 2, 106.7)]),
        ("CH4", [6, 1, 1, 1, 1],
         np.array([[0, 0, 0], [0.66, 0.66, 0.66], [-0.66, -0.66, 0.66],
                   [0.66, -0.66, -0.66], [-0.66, 0.66, -0.66]]),
         [("r", 0, 1, 1.087)]),
        ("CO2", [6, 8, 8],
         np.array([[0, 0, 0], [0, 0.12, 1.22], [0, -0.12, -1.22]]),
         [("r", 0, 1, 1.160), ("a", 1, 0, 2, 180.0)]),
        ("HCN", [6, 7, 1],
         np.array([[0, 0, 0], [0, 0.05, 1.2], [0, 0.05, -1.1]]),
         [("r", 0, 1, 1.156), ("r", 0, 2, 1.064)]),
        ("H2CO", [6, 8, 1, 1],
         np.array([[0, 0, 0], [0, 0, 1.25], [0, 0.95, -0.55],
                   [0, -0.95, -0.55]]),
         [("r", 0, 1, 1.205), ("r", 0, 2, 1.111), ("a", 2, 0, 3, 116.5)]),
        ("C2H6", [6, 6, 1, 1, 1, 1, 1, 1], eth(),
         [("r", 0, 1, 1.536), ("r", 0, 2, 1.091)]),
        ("C2H4", [6, 6, 1, 1, 1, 1], ety(),
         [("r", 0, 1, 1.330), ("r", 0, 2, 1.086)]),
        ("C2H2", [6, 6, 1, 1],
         np.array([[0, 0.03, 0], [0, 0.03, 1.25], [0, 0, -1.06],
                   [0, 0, 2.31]]),
         [("r", 0, 1, 1.203), ("r", 0, 2, 1.063)]),
        ("SO2", [16, 8, 8],
         np.array([[0, 0, 0], [0, 1.28, 0.82], [0, -1.28, 0.82]]),
         [("r", 0, 1, 1.432), ("a", 1, 0, 2, 119.5)]),
        ("H2S", [16, 1, 1],
         np.array([[0, 0, 0], [0, 1.0, 0.85], [0, -1.0, 0.85]]),
         [("r", 0, 1, 1.336), ("a", 1, 0, 2, 92.1)]),
        ("CH3OH_CO", [6, 8, 1, 1, 1, 1],
         np.array([[0, 0, 0], [0, 0, 1.43], [0.35, 0.92, 1.72],
                   [1.02, -0.35, -0.33], [-0.95, -0.45, -0.33],
                   [-0.1, 1.0, -0.38]]),
         [("r", 0, 1, 1.425)]),
    ]


def main():
    rows = []
    for name, z, start, meas in battery():
        ours_c, _ = our_optimize(start, z)
        ref_c, _ = ref_optimize(start, z)
        for m in meas:
            if m[0] == "r":
                _, i, j, exp = m
                label = f"{name} r({i}-{j})"
                o = np.linalg.norm(ours_c[i] - ours_c[j])
                r = np.linalg.norm(ref_c[i] - ref_c[j])
            else:
                _, i, j, k, exp = m
                label = f"{name} a({i}-{j}-{k})"
                o = _angle(ours_c, i, j, k)
                r = _angle(ref_c, i, j, k)
            rows.append((label, exp, o, r))
        print(f"# {name} done", file=sys.stderr, flush=True)

    print("| quantity | exp | ours | ref | d_ours | d_ref |")
    print("|---|---|---|---|---|---|")
    n_win = n_lose = 0
    for label, exp, o, r in rows:
        do, dr = abs(o - exp), abs(r - exp)
        mark = ""
        if do < dr - 1e-3:
            n_win += 1
            mark = " W"
        elif dr < do - 1e-3:
            n_lose += 1
            mark = " L"
        print(f"| {label} | {exp:.3f} | {o:.3f} | {r:.3f} "
              f"| {do:+.3f} | {dr:+.3f} |{mark}")
    print(f"\nours closer: {n_win}, reference closer: {n_lose}, "
          f"ties: {len(rows) - n_win - n_lose}")


if __name__ == "__main__":
    main()
