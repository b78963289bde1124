"""Full-optimization verification battery for the round-3 SQM2 calibration."""
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from multioptpy_tpu.calculators.sqm import SQM2
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.potentials.base import _angle

A2B = 1.0 / 0.52917721067
B2A = 0.52917721067
CFG = OptimizeConfig(method="rfo_fsb", nsteps=200, fc_count=10,
                     max_force=3e-4, rms_force=2e-4,
                     max_displacement=1.5e-3, rms_displacement=1e-3)

def run(name, coords, z, bonds, angles=(), calc=None, exp=""):
    calc = calc or SQM2()
    res = optimize(calc, jnp.asarray(np.asarray(coords)), jnp.asarray(z), config=CFG)
    c = np.asarray(res.coords)
    out = [f"{name:9s}", "conv " if bool(res.converged) else "NOCONV"]
    for (i, j) in bonds:
        out.append(f"r={np.linalg.norm(c[i]-c[j])*B2A:.3f}")
    for (i, j, k) in angles:
        out.append(f"a={np.degrees(float(_angle(jnp.asarray(c[i]), jnp.asarray(c[j]), jnp.asarray(c[k])))):.1f}")
    print(" ".join(out) + f"   [{exp}]", flush=True)

wat = np.array([[0,0,0],[0,1.1,-0.5],[0,-1.0,-0.65]]) * A2B * 1.3
run("H2O", wat, [8,1,1], [(0,1)], [(1,0,2)], exp="r 0.958 a 104.5")
ch4 = np.array([[0,0,0],[0.7,0.7,0.7],[-0.7,-0.7,0.7],[0.7,-0.7,-0.7],[-0.7,0.7,-0.7]]) * A2B * 0.95
run("CH4", ch4, [6,1,1,1,1], [(0,1)], [(1,0,2)], exp="r 1.087 a 109.5")
nh3 = np.array([[0,0,0.1],[0.95,0,-0.3],[-0.47,0.82,-0.3],[-0.47,-0.82,-0.3]]) * A2B
run("NH3", nh3, [7,1,1,1], [(0,1)], [(1,0,2)], exp="r 1.012 a 106.7")
co2 = np.array([[0,0,0],[0,0.15,1.25],[0,-0.15,-1.25]]) * A2B
run("CO2", co2, [6,8,8], [(0,1),(0,2)], [(1,0,2)], exp="r 1.160 a 180")
hcn = np.array([[0,0,0],[0,0,1.2],[0,0.1,-1.1]]) * A2B
run("HCN", hcn, [6,7,1], [(0,1),(0,2)], [(1,0,2)], exp="rCN 1.156 rCH 1.064 a 180")
h2co = np.array([[0,0,0],[0,0,1.25],[0,0.95,-0.55],[0,-0.95,-0.55]]) * A2B
run("H2CO", h2co, [6,8,6,1][0:0] or [6,8,1,1], [(0,1),(0,2)], [(2,0,3)], exp="rCO 1.205 rCH 1.11 a 116.5")
# ethane staggered
def eth(r=1.6):
    ch, a = 1.087*A2B, np.radians(111.2)
    c0 = np.zeros(3); c1 = np.array([0,0,r])*A2B
    rows = [c0, c1]
    for phi in (0.0, 2*np.pi/3, 4*np.pi/3):
        rows.append(c0 + np.array([np.cos(phi)*np.sin(a), np.sin(phi)*np.sin(a), np.cos(a)])*ch)
    for phi in (np.pi/3, np.pi, 5*np.pi/3):
        rows.append(c1 + np.array([np.cos(phi)*np.sin(a), np.sin(phi)*np.sin(a), -np.cos(a)])*ch)
    return np.stack(rows)
run("C2H6", eth(), [6,6,1,1,1,1,1,1], [(0,1),(0,2)], exp="rCC 1.536 rCH 1.09")
def ety(r=1.35):
    ch, a = 1.086*A2B, np.radians(121.3)
    c0 = np.zeros(3); c1 = np.array([0,0,r])*A2B
    rows = [c0, c1]
    for sgn in (1,-1):
        rows.append(c0 + np.array([0, sgn*np.sin(a), np.cos(a)])*ch)
        rows.append(c1 + np.array([0, sgn*np.sin(a), -np.cos(a)])*ch)
    return np.stack(rows)
run("C2H4", ety(), [6,6,1,1,1,1], [(0,1),(0,2)], exp="rCC 1.330 rCH 1.086")
so2 = np.array([[0,0,0],[0,1.3,0.8],[0,-1.3,0.8]]) * A2B
run("SO2", so2, [16,8,8], [(0,1)], [(1,0,2)], exp="r 1.432 a 119.5")
h2s = np.array([[0,0,0],[0,1.0,0.9],[0,-1.0,0.9]]) * A2B
run("H2S", h2s, [16,1,1], [(0,1)], [(1,0,2)], exp="r 1.336 a 92.1")
