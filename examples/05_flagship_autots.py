"""Flagship end-to-end: 4-step AutoTS on a real organic cycloaddition.

Butadiene + acrolein (18 atoms, C/H/O) on the on-device SQM2 backend in
f64: AFIR scan (two pairwise forces, one per forming C-C bond) -> NEB on
the AFIR trajectory -> top-N saddle refinement with exact SQM Hessians ->
IRC + endpoint optimization. Equivalent reference recipe:
`run_autots <xyz> -cfg config.json` with the 4-step v1 workflow
(ref: Wrapper/autots.py:477, test/README.md:37-40).

Run:  PYTHONPATH=. python examples/05_flagship_autots.py
(~11 min single-core CPU; minutes on a TPU chip once compiled.)
"""

import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multioptpy_tpu.calculators.sqm import SQM2  # noqa: E402
from multioptpy_tpu.drivers.irc import IRCConfig  # noqa: E402
from multioptpy_tpu.drivers.neb import NEBConfig  # noqa: E402
from multioptpy_tpu.drivers.optimize import OptimizeConfig  # noqa: E402
from multioptpy_tpu.io.fixtures import diels_alder_reactant  # noqa: E402
from multioptpy_tpu.workflows.autots import AutoTSConfig, autots  # noqa: E402

HARTREE2KCAL = 627.5094740631


def main():
    coords, z = diels_alder_reactant()
    cfg = AutoTSConfig(
        afir_list=[(300.0, [1], [11]), (300.0, [4], [12])],
        afir_opt=OptimizeConfig(method="rfo_fsb", nsteps=300,
                                init_hessian="model:lindh2007d3_raw",
                                fc_count=-1, mfc_count=30),
        n_images=16,
        neb=NEBConfig(variant="cineb", n_steps=250, k_spring=0.01,
                      climbing_start=80, fmax=5e-4, dt0=0.05, dt_max=0.2,
                      redistribute="linear", redistribute_every=25),
        top_n_candidates=2,
        saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                              nsteps=120, fc_count=5,
                              init_hessian="exact"),
        irc=IRCConfig(method="lqa", step_size=0.1, n_steps=70),
        endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=150,
                                    init_hessian="model:lindh2007d3_raw"),
    )
    t0 = time.time()
    res = autots(SQM2(), jnp.asarray(coords), jnp.asarray(z), cfg)
    wall = time.time() - t0

    print(f"wall-clock          : {wall:.1f} s")
    print(f"TS energy           : {res.ts_energy:.6f} Ha "
          f"({res.n_imaginary} imaginary mode)")
    print(f"barrier (fwd / bwd) : {res.barrier_forward * HARTREE2KCAL:.1f} "
          f"/ {res.barrier_backward * HARTREE2KCAL:.1f} kcal/mol")
    ca, cb = np.asarray(res.reactant_coords), np.asarray(res.product_coords)
    print(f"endpoint RMSD       : "
          f"{float(np.sqrt(np.mean((ca - cb) ** 2))):.2f} Bohr")
    return res


if __name__ == "__main__":
    main()
