"""Round-3 SQM2 calibration scans (run on CPU; one compile per molecule).

Rigid heavy-heavy stretch curves vs srb_k_heavy: the minimum of E(r) locates
the equilibrium bond length for each candidate pair-resolved SRB strength.
Targets (exp): CO2 r(CO) 1.16, H2CO r(CO) 1.21, C2H6 r(CC) 1.54,
C2H4 r(CC) 1.33 Angstrom."""
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from multioptpy_tpu.calculators.sqm import SQM2

A2B = 1.0 / 0.52917721067

def co2(r):
    return jnp.stack([jnp.zeros(3),
                      jnp.array([0.0, 0.0, 1.0]) * r,
                      jnp.array([0.0, 0.0, -1.0]) * r]) * A2B

def h2co(r):
    ch, a = 1.11 * A2B, np.radians(116.5 / 2)
    return jnp.stack([jnp.zeros(3),
                      jnp.array([0.0, 0.0, 1.0]) * r * A2B,
                      jnp.array([0.0, np.sin(a), -np.cos(a)]) * ch,
                      jnp.array([0.0, -np.sin(a), -np.cos(a)]) * ch])

def ethane(r):
    ch, a = 1.087 * A2B, np.radians(111.2)
    c0 = jnp.zeros(3); c1 = jnp.array([0.0, 0.0, 1.0]) * r * A2B
    up, dn = [], []
    for phi in (0.0, 2 * np.pi / 3, 4 * np.pi / 3):
        up.append(c0 + jnp.array([np.cos(phi) * np.sin(a),
                                  np.sin(phi) * np.sin(a), np.cos(a)]) * ch)
    for phi in (np.pi / 3, np.pi, 5 * np.pi / 3):  # staggered
        dn.append(c1 + jnp.array([np.cos(phi) * np.sin(a),
                                  np.sin(phi) * np.sin(a), -np.cos(a)]) * ch)
    return jnp.stack([c0, c1] + up + dn)

def ethylene(r):
    ch, a = 1.086 * A2B, np.radians(121.3)
    c0 = jnp.zeros(3); c1 = jnp.array([0.0, 0.0, 1.0]) * r * A2B
    h = []
    for sgn in (1, -1):
        h.append(c0 + jnp.array([0.0, sgn * np.sin(a), np.cos(a)]) * ch)
        h.append(c1 + jnp.array([0.0, sgn * np.sin(a), -np.cos(a)]) * ch)
    return jnp.stack([c0, c1] + h)

MOLS = {
    "CO2 (1.16)":  (co2,      [8, 6, 8][1:2] and [6, 8, 8], np.linspace(1.00, 1.35, 71)),
    "H2CO (1.21)": (h2co,     [6, 8, 1, 1], np.linspace(1.05, 1.40, 71)),
    "C2H6 (1.54)": (ethane,   [6, 6, 1, 1, 1, 1, 1, 1], np.linspace(1.30, 1.80, 101)),
    "C2H4 (1.33)": (ethylene, [6, 6, 1, 1, 1, 1], np.linspace(1.15, 1.60, 91)),
}
K_GRID = jnp.array([0.42, 0.36, 0.30, 0.26, 0.22, 0.18])

for name, (builder, z, rgrid) in MOLS.items():
    z = jnp.array(z)
    geoms = jnp.stack([builder(float(r)) for r in rgrid])
    def e_one(k, c):
        return SQM2(rep_r0_heavy_scale=k).energy(c, z)
    e = jax.jit(jax.vmap(jax.vmap(e_one, (None, 0)), (0, None)))(K_GRID, geoms)
    e = np.asarray(e)   # (nk, nr)
    mins = rgrid[np.argmin(e, axis=1)]
    print(name, " ".join(f"k={float(k):+.3f}:r={m:.3f}" for k, m in zip(K_GRID, mins)), flush=True)
