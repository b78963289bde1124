"""Hessian updates, RS-RFO secular solve, first-order engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.hessian.updates import (
    UPDATE_RULES,
    bfgs_delta,
    double_damping,
    psb_delta,
    sr1_delta,
    update_hessian,
)
from multioptpy_tpu.steppers.rfo import (
    rfo_classic_step,
    rs_rfo_step,
    update_trust_radius,
)
from multioptpy_tpu.steppers.first_order import (
    cg_init,
    cg_step,
    fire_init,
    fire_step,
    lbfgs_init,
    lbfgs_step,
)


class TestHessianUpdates:
    def _sy(self, rng, n=6):
        s = jnp.asarray(rng.normal(size=n))
        a = rng.normal(size=(n, n))
        h_true = jnp.asarray(a @ a.T + n * np.eye(n))
        y = h_true @ s  # consistent curvature pair
        h0 = jnp.eye(n) * 2.0
        return h0, s, y

    @pytest.mark.parametrize("rule", ["bfgs", "sr1", "psb", "fsb", "bofill", "msp"])
    def test_secant_condition(self, rng, rule):
        # all quasi-Newton updates satisfy H_new s = y exactly
        h0, s, y = self._sy(rng)
        h_new = update_hessian(h0, s, y, rule)
        np.testing.assert_allclose(np.asarray(h_new @ s), np.asarray(y),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_new).T)

    def test_flowchart_selects_bfgs_for_descent_pair(self, rng):
        h0, s, y = self._sy(rng)
        # ys strongly positive here -> flowchart should reduce to BFGS or SR1
        d_fc = UPDATE_RULES["flowchart"](h0, s, y)
        d_bfgs = bfgs_delta(h0, s, y)
        d_sr1 = sr1_delta(h0, s, y)
        match = min(float(jnp.max(jnp.abs(d_fc - d_bfgs))),
                    float(jnp.max(jnp.abs(d_fc - d_sr1))))
        assert match < 1e-10

    def test_zero_denominator_guard(self):
        n = 4
        h = jnp.eye(n)
        s = jnp.zeros(n)
        y = jnp.zeros(n)
        for rule in ["bfgs", "sr1", "psb", "fsb", "bofill", "msp", "flowchart"]:
            out = update_hessian(h, s, y, rule)
            assert np.all(np.isfinite(np.asarray(out))), rule
            np.testing.assert_allclose(np.asarray(out), np.eye(n))

    def test_double_damping_enforces_curvature(self, rng):
        s = jnp.asarray(rng.normal(size=5))
        y = -s  # negative curvature pair
        y_t = double_damping(s, y, mu2=0.2)
        assert float(jnp.dot(s, y_t)) > 0.0

    def test_updates_vmap(self, rng):
        # batched rank-2 updates: (B, D, D) in one call
        b, n = 3, 5
        h = jnp.stack([jnp.eye(n)] * b)
        s = jnp.asarray(rng.normal(size=(b, n)))
        y = jnp.asarray(rng.normal(size=(b, n)))
        out = jax.vmap(lambda hh, ss, yy: update_hessian(hh, ss, yy, "fsb"))(h, s, y)
        assert out.shape == (b, n, n)
        for i in range(b):
            single = update_hessian(h[i], s[i], y[i], "fsb")
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single),
                                       atol=1e-12)


class TestRsRfo:
    def _quadratic(self, rng, n=8, neg=0):
        q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        evals = np.abs(rng.normal(size=n)) + 0.5
        evals[:neg] *= -1.0
        h = jnp.asarray(q @ np.diag(evals) @ q.T)
        x = jnp.asarray(rng.normal(size=n))
        g = h @ x  # gradient of 0.5 x^T H x at x
        return h, x, g

    def test_newton_step_inside_trust(self, rng):
        h, x, g = self._quadratic(rng)
        g = g * 1e-3  # RFO -> Newton only in the small-gradient limit
        step, aux = rs_rfo_step(g, h, trust_radius=100.0, saddle_order=0)
        newton = -jnp.linalg.solve(h, g)
        cos = float(jnp.dot(step, newton) /
                    (jnp.linalg.norm(step) * jnp.linalg.norm(newton)))
        assert cos > 0.999
        assert float(aux["predicted_energy_change"]) < 0.0

    def test_step_respects_trust_radius(self, rng):
        h, x, g = self._quadratic(rng)
        r = 0.05
        step, aux = rs_rfo_step(g, h, trust_radius=r, saddle_order=0)
        assert float(jnp.linalg.norm(step)) <= r * 1.01
        assert abs(float(jnp.linalg.norm(step)) - r) < r * 0.05  # on the boundary

    def test_quadratic_converges_to_minimum(self, rng):
        h, x, g = self._quadratic(rng)

        def body(x, _):
            g = h @ x
            step, _ = rs_rfo_step(g, h, trust_radius=0.3, saddle_order=0)
            return x + step, jnp.linalg.norm(g)

        x_fin, norms = jax.lax.scan(body, x, None, length=30)
        assert float(jnp.linalg.norm(x_fin)) < 1e-6

    def test_saddle_order_one_goes_uphill_on_neg_mode(self, rng):
        h, x, g = self._quadratic(rng, neg=1)
        # at a point displaced along the negative mode, an order-1 search
        # should walk toward the saddle at the origin
        def body(x, _):
            g = h @ x
            step, _ = rs_rfo_step(g, h, trust_radius=0.3, saddle_order=1)
            return x + step, None

        x_fin, _ = jax.lax.scan(body, x, None, length=40)
        assert float(jnp.linalg.norm(x_fin)) < 1e-6  # found the 1st-order saddle

    def test_classic_rfo_direction(self, rng):
        h, x, g = self._quadratic(rng)
        step = rfo_classic_step(g, h, mode="min")
        assert float(jnp.dot(step, g)) < 0.0

    def test_trust_radius_update(self):
        tr = jnp.asarray(0.2)
        grown = update_trust_radius(tr, -1.0, -1.05, tr_max=0.5)
        assert float(grown) == pytest.approx(0.24)
        shrunk = update_trust_radius(tr, 0.5, -1.0, tr_min=0.01)
        assert float(shrunk) == pytest.approx(0.1)
        kept = update_trust_radius(tr, -0.5, -1.0)
        assert float(kept) == pytest.approx(0.2)
        # tiny predicted change -> unchanged
        same = update_trust_radius(tr, 1.0, 1e-14)
        assert float(same) == pytest.approx(0.2)

    def test_trust_radius_overshoot_shrinks(self):
        # |actual| >> |predicted| is a model failure even though the raw
        # ratio is far above `good`: during saddle refinement (uphill
        # legal, downhill rejection off) a one-sided rule kept the radius
        # pinned while the energy ran away 0.3 Ha (round-3 flagship
        # diagnosis) — the two-sided band must SHRINK here.
        tr = jnp.asarray(0.2)
        overshoot = update_trust_radius(tr, -3.0, -1.0, tr_min=0.01)
        assert float(overshoot) == pytest.approx(0.1)
        # ratio just inside the band still grows
        inside = update_trust_radius(tr, -1.9, -1.0, tr_max=0.5)
        assert float(inside) == pytest.approx(0.24)
        # custom bound respected
        custom = update_trust_radius(tr, -1.9, -1.0, overshoot=1.5)
        assert float(custom) == pytest.approx(0.1)

    def test_rs_rfo_vmap(self, rng):
        hs, xs, gs = [], [], []
        for _ in range(3):
            h, x, g = self._quadratic(rng)
            hs.append(h), xs.append(x), gs.append(g)
        h_b, g_b = jnp.stack(hs), jnp.stack(gs)
        step_b, aux_b = jax.vmap(
            lambda g, h: rs_rfo_step(g, h, trust_radius=0.1))(g_b, h_b)
        assert step_b.shape == g_b.shape
        s0, _ = rs_rfo_step(g_b[0], h_b[0], trust_radius=0.1)
        np.testing.assert_allclose(np.asarray(step_b[0]), np.asarray(s0),
                                   atol=1e-10)


class TestFirstOrder:
    def _loop(self, step_fn, state, h, x0, n=400):
        def body(carry, _):
            x, st = carry
            g = h @ x
            mv, st = step_fn(st, g, x)
            return (x + mv, st), jnp.linalg.norm(g)

        (x, _), gn = jax.lax.scan(body, (x0, state), None, length=n)
        return x, gn

    def test_fire_minimizes_quadratic(self, rng):
        n = 6
        h = jnp.eye(n) * jnp.asarray(rng.uniform(0.5, 2.0, n))
        x0 = jnp.asarray(rng.normal(size=n))
        x, _ = self._loop(lambda st, g, x: fire_step(st, g),
                          fire_init(n), h, x0)
        assert float(jnp.linalg.norm(x)) < 1e-4

    def test_cg_minimizes_quadratic(self, rng):
        n = 6
        h = jnp.eye(n) * jnp.asarray(rng.uniform(0.5, 2.0, n))
        x0 = jnp.asarray(rng.normal(size=n))
        x, _ = self._loop(lambda st, g, x: cg_step(st, g, variant="pr"),
                          cg_init(n), h, x0)
        assert float(jnp.linalg.norm(x)) < 1e-3

    def test_lbfgs_minimizes_quadratic(self, rng):
        n = 6
        a = rng.normal(size=(n, n))
        h = jnp.asarray(a @ a.T + n * np.eye(n))
        x0 = jnp.asarray(rng.normal(size=n))
        x, _ = self._loop(
            lambda st, g, x: lbfgs_step(st, x, g, delta=0.5),
            lbfgs_init(n), h, x0, n=200)
        assert float(jnp.linalg.norm(x)) < 1e-5


def test_rs_rfo_jacobi_eigh_matches_xla():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
    from multioptpy_tpu.steppers.rfo import rs_rfo_step

    # step-level agreement on a well-conditioned Hessian
    rng = np.random.default_rng(3)
    a = rng.normal(size=(12, 12))
    h = jnp.asarray(a @ a.T + 12 * np.eye(12))
    g = jnp.asarray(rng.normal(size=12))
    s_x, _ = rs_rfo_step(g, h, jnp.asarray(0.3), eigh_impl="xla")
    s_j, _ = rs_rfo_step(g, h, jnp.asarray(0.3), eigh_impl="jacobi")
    np.testing.assert_allclose(np.asarray(s_j), np.asarray(s_x),
                               rtol=1e-8, atol=1e-10)

    # end-to-end: same LJ trimer minimum
    calc = LennardJones()
    coords = jnp.asarray([[0.0, 0.0, 0.0], [6.5, 0.0, 0.0],
                          [3.2, 5.6, 0.0]])
    z = jnp.array([18, 18, 18])
    es = {}
    for impl in ("xla", "jacobi"):
        res = optimize(calc, coords, z, config=OptimizeConfig(
            method="rfo_bfgs", nsteps=60, eigh_impl=impl))
        assert bool(res.converged), impl
        es[impl] = float(res.energy)
    assert es["jacobi"] == pytest.approx(es["xla"], abs=1e-9)
