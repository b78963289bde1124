"""AutoTS top-N TS-candidate refinement (ref: Wrapper/autots.py:40,152,935).

Fixture: a distance-based two-barrier surface whose HIGHER NEB maximum
(r12 ~ 5, where the r13 direction is also unstable -> not a true first-order
saddle) hides the true TS at the LOWER maximum (r12 ~ 7.5). The round-1
single-guess AutoTS refined only the global NEB maximum and landed in the
wrong basin; refining the top-N local maxima and keeping the lowest
one-imaginary-mode candidate finds the true TS.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.base import Calculator
from multioptpy_tpu.drivers.irc import IRCConfig
from multioptpy_tpu.drivers.neb import NEBConfig
from multioptpy_tpu.drivers.optimize import OptimizeConfig
from multioptpy_tpu.workflows.autots import AutoTSConfig, autots


class DoubleBarrier(Calculator):
    """E = f(r12) + 0.1 u^2 + h(r12) exp(-u^2), u = r13 - 6.

    f has barriers at r12 = 5 (high) and 7.5 (low). The bump h > 0.1 near
    r12 = 5 makes the u curvature NEGATIVE there, so the high barrier is a
    symmetry-protected SECOND-order saddle: the u = 0 plane is a mirror
    plane (only even powers of u), the NEB path built below lies exactly in
    it, and saddle refinement started on it converges to the 2-imaginary
    point instead of the true TS."""

    def energy(self, coords, z):
        r12 = jnp.linalg.norm(coords[1] - coords[0])
        r13 = jnp.linalg.norm(coords[2] - coords[0])
        u = r13 - 6.0
        f = (0.02 * (r12 - 6.0) ** 2
             + 0.5 * jnp.exp(-2.0 * (r12 - 5.0) ** 2)
             + 0.2 * jnp.exp(-2.0 * (r12 - 7.5) ** 2))
        h = 0.3 * jnp.exp(-2.0 * (r12 - 5.0) ** 2)
        return f + 0.1 * u ** 2 + h * jnp.exp(-u ** 2)


def _geom(r12):
    # atoms 1 and 3 are IDENTICAL in every endpoint, so linear NEB
    # interpolation keeps r13 = 6 (u = 0) along the whole path
    return jnp.asarray(np.array([[0.0, 0.0, 0.0], [r12, 0.0, 0.0],
                                 [0.0, 6.0, 0.0]]))


def _run(top_n):
    cfg = AutoTSConfig(
        top_n_candidates=top_n,
        n_images=14,
        neb=NEBConfig(variant="neb", n_steps=60, k_spring=2e-3, dt0=0.05,
                      dt_max=0.3),
        saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1, nsteps=25,
                              fc_count=5, init_hessian="exact",
                              trust_radius_ang=0.1),
        irc=IRCConfig(n_steps=10),
        endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=60))
    return autots(DoubleBarrier(), _geom(4.0), jnp.array([6, 6, 6]), cfg,
                  product_coords=_geom(8.6))


def test_topn_finds_true_ts_where_single_guess_fails():
    res1 = _run(top_n=1)
    res3 = _run(top_n=3)

    r12_1 = float(jnp.linalg.norm(res1.ts_coords[1] - res1.ts_coords[0]))
    r12_3 = float(jnp.linalg.norm(res3.ts_coords[1] - res3.ts_coords[0]))

    # single-guess refines the (false, higher) global NEB maximum into the
    # second-order saddle — provably the wrong TS
    assert res1.n_imaginary == 2
    assert r12_1 < 6.0
    # top-3 falls through the invalid candidate to the true TS
    assert res3.n_imaginary == 1
    assert r12_3 == pytest.approx(7.5, abs=0.4)
    assert res3.ts_energy < res1.ts_energy - 0.05


def test_select_candidate_tiers():
    """Tiered TS selection (ref: autots.py:193,:935 keys on the
    imaginary-mode count): converged+1-imag > any 1-imag (even
    unconverged) > any converged > rate-limiting first entry."""
    from multioptpy_tpu.workflows.autots import _select_candidate

    def r(n_imag, converged, tag):
        return (tag, 0.0, n_imag, None, converged, 0)

    # an unconverged 1-imag candidate beats a wrong-curvature one
    refined = [r(2, False, "bad"), r(1, False, "ts_uncv")]
    assert _select_candidate(refined)[0] == "ts_uncv"
    # a converged 1-imag wins outright, regardless of order
    refined = [r(1, False, "ts_uncv"), r(1, True, "ts_conv")]
    assert _select_candidate(refined)[0] == "ts_conv"
    # no 1-imag anywhere: prefer a converged stationary point
    refined = [r(2, False, "bad"), r(0, True, "min_conv")]
    assert _select_candidate(refined)[0] == "min_conv"
    # nothing qualifies: rate-limiting (first) candidate
    refined = [r(2, False, "first"), r(3, False, "second")]
    assert _select_candidate(refined)[0] == "first"
