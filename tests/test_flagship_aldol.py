"""Flagship end-to-end on the reference's LITERAL AutoTS anchor reaction.

The reference's own documented correctness anchor is AutoTS on
`aldol_rxn.xyz` — formaldehyde + vinyl alcohol -> 3-hydroxypropanal, 11
atoms C/H/O (ref: test/aldol_rxn.xyz, test/README.md:37-40,
test/config_autots_run_xtb_test.json: manual_AFIR on the C-C-forming pair
(1,5) and the proton-transfer pair (3,11); Wrapper/autots.py:477 is the
4-step driver). This test runs the same reaction through the repo's full
pipeline (endpoint relaxation -> basin-to-basin CI-NEB with in-loop
redistribution -> top-N saddle refinement with exact SQM Hessians -> LQA
IRC + endpoint optimization) on the on-device SQM2 backend in f64.

On the SQM2 surface the reaction is STEPWISE: a hydroxyl-proton shuttle
from O7 to the carbonyl O2 (TS1, the rate-limiting NEB maximum), then
C-C coupling from the transferred intermediate (TS2, ~ -340 cm^-1 mode).
Top-N candidate refinement recovers BOTH saddles from one NEB — the
multi-maximum case the reference's top-N filtering exists for
(ref: Wrapper/autots.py:152 _filter_candidates_by_energy).

Runtime ~3 min single-core CPU with a warm compile cache (33-DOF system,
exact 66-gradient numerical Hessians in the refinement loop).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.sqm import SQM2
from multioptpy_tpu.drivers.irc import IRCConfig
from multioptpy_tpu.drivers.neb import NEBConfig
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.io.fixtures import aldol_adduct, aldol_reactant
from multioptpy_tpu.workflows.autots import AutoTSConfig, autots

B2A = 0.52917721067


@pytest.mark.slow
def test_flagship_aldol_autots():
    calc = SQM2()
    rc, z = aldol_reactant()
    pc, z2 = aldol_adduct()
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    zj = jnp.asarray(z)

    relax = OptimizeConfig(method="rfo_fsb", nsteps=250,
                           init_hessian="model:lindh2007d3_raw")
    r0 = optimize(calc, jnp.asarray(rc), zj, config=relax)
    r1 = optimize(calc, jnp.asarray(pc), zj, config=relax)

    # the adduct fixture relaxes into the aldol-product basin: C0-C4
    # bonded, hydroxyl proton on O2, well below the separated reactants
    c1 = np.asarray(r1.coords) * B2A
    assert bool(r1.converged)
    assert np.linalg.norm(c1[0] - c1[4]) < 1.8          # C0-C4 bond
    assert np.linalg.norm(c1[2] - c1[10]) < 1.1         # O2-H10 hydroxyl
    assert float(r1.energy) < float(r0.energy) - 0.05   # exothermic

    cfg = AutoTSConfig(
        n_images=16, use_idpp=True,
        neb=NEBConfig(variant="cineb", n_steps=250, k_spring=0.01,
                      climbing_start=80, fmax=5e-4, dt0=0.05, dt_max=0.2,
                      redistribute="linear", redistribute_every=25),
        top_n_candidates=3,
        saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                              nsteps=120, fc_count=5,
                              init_hessian="exact"),
        irc=IRCConfig(method="lqa", step_size=0.1, n_steps=70),
        endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=150,
                                    init_hessian="model:lindh2007d3_raw"),
    )
    res = autots(calc, r0.coords, zj, cfg, product_coords=r1.coords)

    # the selected (rate-limiting) TS is a converged first-order saddle
    # with a positive barrier on both sides
    assert res.n_imaginary == 1
    assert res.barrier_forward > 1e-3
    assert res.barrier_backward > 1e-3

    # IRC endpoints are DISTINCT minima, both below the TS
    ca = np.asarray(res.reactant_coords)
    cb = np.asarray(res.product_coords)
    assert np.sqrt(np.mean((ca - cb) ** 2)) > 0.05
    assert res.reactant_energy < res.ts_energy
    assert res.product_energy < res.ts_energy

    # stepwise mechanism fully recovered: every refined candidate is a
    # converged true saddle, and the two mechanistic steps are both there
    assert len(res.candidates) >= 2
    assert all(c["converged"] and c["n_imaginary"] == 1
               for c in res.candidates)

    def dist(c, i, j):
        x = c["coords"] * B2A
        return float(np.linalg.norm(x[i] - x[j]))

    # TS1 — proton shuttle: H10 midway between the oxygens, C-C not formed
    assert any(1.1 < dist(c, 2, 10) < 1.7 and dist(c, 0, 4) > 3.5
               for c in res.candidates), \
        "proton-transfer TS missing from refined candidates"
    # TS2 — C-C coupling: forming C0-C4 bond, proton already on O2
    assert any(1.9 < dist(c, 0, 4) < 3.2 and dist(c, 2, 10) < 1.15
               for c in res.candidates), \
        "C-C coupling TS missing from refined candidates"
