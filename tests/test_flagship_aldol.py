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

On the round-5 SQM2 surface the reaction is STEPWISE: a rate-limiting
C-C approach saddle with the hydroxyl proton still on the donor O7
(TS-A), then a late coupling/transfer saddle with the proton on the
carbonyl O2 and the C0-C4 bond forming (TS-B). Top-N candidate
refinement recovers BOTH saddles from one NEB — the multi-maximum case
the reference's top-N filtering exists for
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
    # the round-5 SQM2 PES has a shallow pre-complex directly below the
    # rate-limiting proton-shuttle TS on the backward side (~3e-4 Ha
    # deep, n_imag = 0, verified stationary) — the backward barrier is
    # positive but small
    assert res.barrier_backward > 1e-4

    # IRC endpoints are DISTINCT minima, both below the TS
    ca = np.asarray(res.reactant_coords)
    cb = np.asarray(res.product_coords)
    assert np.sqrt(np.mean((ca - cb) ** 2)) > 0.05
    assert res.reactant_energy < res.ts_energy
    assert res.product_energy < res.ts_energy

    # stepwise mechanism fully recovered: BOTH mechanistic saddles refine
    # to converged first-order TSs. (A third shoulder maximum between
    # them may refine to a non-saddle — that is exactly the case the
    # tiered top-N selection exists for, ref: autots.py:152.)
    good = [c for c in res.candidates
            if c["converged"] and c["n_imaginary"] == 1]
    assert len(good) >= 2

    def dist(c, i, j):
        x = c["coords"] * B2A
        return float(np.linalg.norm(x[i] - x[j]))

    # Mechanistic signatures on the round-5 SQM2 PES (re-derived after
    # the CN-form recalibration shifted the stepwise pathway):
    # TS-A — rate-limiting C-C approach: hydroxyl proton still on the
    # donor O7, carbons pre-coupling distance
    assert any(c["n_imaginary"] == 1 and dist(c, 7, 10) < 1.1
               and 1.9 < dist(c, 0, 4) < 3.5
               for c in res.candidates), \
        "C-C approach TS missing from refined candidates"
    # TS-B — late coupling/transfer: proton already on the carbonyl O2,
    # C0-C4 bond forming
    assert any(c["n_imaginary"] == 1 and dist(c, 2, 10) < 1.15
               and 1.3 < dist(c, 0, 4) < 3.2
               for c in res.candidates), \
        "coupling/transfer TS missing from refined candidates"
