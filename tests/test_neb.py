"""NEB: tangents, force laws, IDPP, and end-to-end on Muller-Brown."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_C,
    MB_TS_BC,
    MullerBrown,
    muller_brown_energy,
)
from multioptpy_tpu.drivers.neb import (
    NEBConfig,
    idpp_path,
    improved_tangents,
    interpolate_linear,
    neb,
    neb_forces,
)


def _mb_path(n_images):
    start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    return interpolate_linear(start, end, n_images)


class TestComponents:
    def test_tangents_unit_norm(self, rng):
        coords = jnp.asarray(rng.normal(size=(6, 4, 3)))
        energies = jnp.asarray(rng.normal(size=6))
        tau = improved_tangents(coords, energies)
        norms = np.asarray(jnp.sqrt(jnp.sum(tau * tau, axis=(1, 2))))
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)

    def test_endpoints_frozen(self, rng):
        coords = jnp.asarray(rng.normal(size=(5, 3, 3)))
        energies = jnp.asarray(rng.normal(size=5))
        grads = jnp.asarray(rng.normal(size=(5, 3, 3)))
        f = neb_forces(coords, energies, grads)
        np.testing.assert_allclose(np.asarray(f[0]), 0.0)
        np.testing.assert_allclose(np.asarray(f[-1]), 0.0)

    def test_interior_force_perpendicular_without_springs(self, rng):
        coords = jnp.asarray(rng.normal(size=(5, 3, 3)))
        energies = jnp.asarray(rng.normal(size=5))
        grads = jnp.asarray(rng.normal(size=(5, 3, 3)))
        f = neb_forces(coords, energies, grads, k_spring=0.0, variant="lup")
        tau = improved_tangents(coords, energies)
        for i in range(1, 4):
            dot = float(jnp.sum(f[i] * tau[i]))
            assert abs(dot) < 1e-8

    def test_idpp_endpoints_preserved(self, rng):
        start = jnp.asarray(rng.normal(size=(4, 3)) * 3.0)
        end = start + jnp.asarray(rng.normal(size=(4, 3)))
        path = idpp_path(start, end, 8, n_steps=60)
        assert path.shape == (8, 4, 3)
        np.testing.assert_allclose(np.asarray(path[0]), np.asarray(start),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(path[-1]), np.asarray(end),
                                   atol=1e-10)
        assert np.all(np.isfinite(np.asarray(path)))


class TestMullerBrownNEB:
    def test_cineb_finds_highest_saddle(self):
        calc = MullerBrown()
        path0 = _mb_path(14)
        z = jnp.array([0])
        res = neb(calc, path0, z, NEBConfig(
            variant="cineb", n_steps=400, k_spring=5e-4,
            climbing_start=50, fmax=2e-4, dt0=0.05, dt_max=0.4))
        e = np.asarray(res.energies) / 1e-3  # back to MB units
        # the A->C path crosses both saddles; the climbing image must land
        # on the higher barrier
        ts_e_expected = float(muller_brown_energy(*MB_TS_BC))
        e_saddles = [-40.665, -72.249]
        ts_found = e[res.ts_index]
        assert ts_found == pytest.approx(max(e_saddles), abs=1.5)
        # endpoints unmoved
        np.testing.assert_allclose(np.asarray(res.path[0, 0, :2]),
                                   MB_MIN_A, atol=1e-8)

    def test_energy_profile_shape(self):
        calc = MullerBrown()
        path0 = _mb_path(10)
        z = jnp.array([0])
        res = neb(calc, path0, z, NEBConfig(
            variant="neb", n_steps=150, k_spring=5e-4, dt0=0.05,
            dt_max=0.3, fmax=5e-4))
        e = np.asarray(res.energies)
        # interior max must exceed both endpoints (it's a barrier)
        assert e[res.ts_index] > e[0] and e[res.ts_index] > e[-1]


def test_bneb_and_nesb_variants():
    calc = MullerBrown()
    path0 = _mb_path(10)
    z = jnp.array([1])
    for variant in ("bneb", "nesb"):
        res = neb(calc, path0, z, NEBConfig(
            variant=variant, n_steps=150, k_spring=5e-4, dt0=0.05,
            dt_max=0.3, fmax=5e-4))
        e = np.asarray(res.energies)
        assert np.all(np.isfinite(e))
        assert e[res.ts_index] > max(e[0], e[-1])


def test_dmf_variant_stays_stable_and_climbs():
    calc = MullerBrown()
    path0 = _mb_path(12)
    z = jnp.array([1])
    res = neb(calc, path0, z, NEBConfig(
        variant="dmf", n_steps=200, dt0=0.02, dt_max=0.15, fmax=5e-4,
        dmf_beta=400.0))
    e = np.asarray(res.energies)
    assert np.all(np.isfinite(e))
    # the MaxFlux path climbs over the barrier region (note: the
    # exp-weighting spaces discrete images AWAY from the exact peak, so the
    # sampled maximum under-resolves the saddle; the reference subdivides
    # segments for the same reason, pathopt_dmf_force.py nsegs)
    assert e[res.ts_index] > max(e[0], e[-1])
    assert np.all(e < 0.0)  # never runs up the outer walls


def test_adaptive_neb_grows_and_focuses():
    from multioptpy_tpu.drivers.neb import adaptive_neb

    calc = MullerBrown()
    path0 = _mb_path(8)
    z = jnp.array([1])
    res = adaptive_neb(calc, path0, z, NEBConfig(
        variant="cineb", n_steps=120, k_spring=5e-4, climbing_start=30,
        fmax=5e-4, dt0=0.05, dt_max=0.3), n_rounds=3, growth=1.4)
    e = np.asarray(res.energies)
    assert len(e) > 8                      # image count grew
    assert e[res.ts_index] > max(e[0], e[-1])
    # refined band still hits the higher MB saddle energy
    assert e[res.ts_index] / 1e-3 == pytest.approx(-40.665, abs=2.0)


def test_aneb_insert_matches_reference_rule():
    """Oracle for the reference's _exec_adaptive_neb insertion
    (neb.py:609-646): strict interior maxima get interpolation_num
    linear points on EACH side at fractions (j+1)/(num+1)."""
    from multioptpy_tpu.drivers.neb import aneb_insert

    path = np.arange(5, dtype=np.float64).reshape(5, 1, 1) * 10.0
    e = np.array([0.0, 1.0, 0.5, 2.0, 0.0])   # maxima at i=1 and i=3
    out = aneb_insert(path, e, interpolation_num=1)
    expected = np.array([0.0, 5.0, 10.0, 15.0, 20.0,
                         25.0, 30.0, 35.0, 40.0]).reshape(9, 1, 1)
    np.testing.assert_allclose(out, expected)

    # num=2: fractions 1/3, 2/3 around the single maximum
    e2 = np.array([0.0, 1.0, 0.0])
    path2 = np.array([0.0, 3.0, 9.0]).reshape(3, 1, 1)
    out2 = aneb_insert(path2, e2, interpolation_num=2)
    np.testing.assert_allclose(
        out2.ravel(), [0.0, 1.0, 2.0, 3.0, 5.0, 7.0, 9.0])

    # plateaus/edges are NOT maxima (argrelmax strictness)
    e3 = np.array([0.0, 1.0, 1.0, 0.0])
    assert len(aneb_insert(path[:4], e3, 1)) == 4


def test_aneb_densifies_around_mb_barrier():
    """-aneb semantics end-to-end: the band grows in-run around the
    energy maxima and still resolves the higher MB saddle."""
    from multioptpy_tpu.drivers.neb import aneb

    calc = MullerBrown()
    path0 = _mb_path(8)
    z = jnp.array([1])
    res = aneb(calc, path0, z, NEBConfig(
        variant="cineb", n_steps=150, k_spring=5e-4, climbing_start=30,
        fmax=5e-4, dt0=0.05, dt_max=0.3),
        interpolation_num=1, frequency=40, max_images=20)
    e = np.asarray(res.energies)
    assert len(e) > 8                      # grew in-run
    assert e[res.ts_index] > max(e[0], e[-1])
    assert e[res.ts_index] / 1e-3 == pytest.approx(-40.665, abs=2.0)
    # density increased near the maximum: the two segments flanking the
    # TS image must be shorter than the mean segment
    p = np.asarray(res.path).reshape(len(e), -1)
    seg = np.linalg.norm(np.diff(p, axis=0), axis=1)
    i = int(res.ts_index)
    flank = seg[max(i - 1, 0):i + 1]
    assert flank.mean() < seg.mean()


def test_ewbneb_variant_converges_on_mb():
    calc = MullerBrown()
    path0 = _mb_path(10)
    z = jnp.array([1])
    res = neb(calc, path0, z, NEBConfig(
        variant="ewbneb", n_steps=200, dt0=0.05, dt_max=0.3, fmax=5e-4))
    e = np.asarray(res.energies)
    assert np.all(np.isfinite(e))
    assert e[res.ts_index] > max(e[0], e[-1])


def test_qsm2_ayala_tangents_and_force():
    from multioptpy_tpu.drivers.neb import ayala_tangents

    calc = MullerBrown()
    path0 = _mb_path(12)
    z = jnp.array([1])
    res = neb(calc, path0, z, NEBConfig(
        variant="qsm2", n_steps=200, dt0=0.04, dt_max=0.25, fmax=5e-4))
    e = np.asarray(res.energies)
    assert np.all(np.isfinite(e))
    assert e[res.ts_index] > max(e[0], e[-1])
    # tangent invariants: interior unit norm, endpoints zero, and the
    # qsm2 force is perpendicular to its own tangents
    tau = ayala_tangents(res.path, res.energies)
    norms = np.asarray(jnp.sqrt(jnp.sum(tau**2, axis=(1, 2))))
    np.testing.assert_allclose(norms[1:-1], 1.0, atol=1e-6)
    np.testing.assert_allclose(norms[[0, -1]], 0.0, atol=1e-12)
    _, grads = jax.vmap(lambda x: calc.energy_and_gradient(x, z))(res.path)
    f = neb_forces(res.path, res.energies, grads, variant="qsm2")
    for i in range(1, 11):
        assert abs(float(jnp.sum(f[i] * tau[i]))) < 1e-8


def test_bneb2_bneb3_variants():
    calc = MullerBrown()
    path0 = _mb_path(10)
    z = jnp.array([1])
    for variant in ("bneb2", "bneb3"):
        res = neb(calc, path0, z, NEBConfig(
            variant=variant, n_steps=150, dt0=0.05, dt_max=0.3, fmax=5e-4))
        e = np.asarray(res.energies)
        assert np.all(np.isfinite(e)), variant
        assert e[res.ts_index] > max(e[0], e[-1]), variant


def test_neb_scan_matches_host_loop():
    from multioptpy_tpu.drivers.neb import neb_scan

    calc = MullerBrown()
    path0 = _mb_path(10)
    z = jnp.array([1])
    cfg = NEBConfig(variant="neb", n_steps=80, k_spring=5e-4, dt0=0.05,
                    dt_max=0.3, fmax=1e-12)   # fixed iterations both ways
    r_host = neb(calc, path0, z, cfg)
    r_scan = neb_scan(calc, path0, z, cfg)
    np.testing.assert_allclose(np.asarray(r_scan.path),
                               np.asarray(r_host.path), atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_scan.energies),
                               np.asarray(r_host.energies), atol=1e-12)
    assert r_scan.energy_history.shape[0] == 80


def test_afire_per_image_clocks_relax_band():
    """AFIRE_NEB equivalent: independent per-image FIRE clocks
    (ref: Optimizer/afire_neb.py)."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.neb import (
        NEBConfig, interpolate_linear, neb)

    a = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 6.8]]))
    b = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.2]]))
    path0 = interpolate_linear(a, b, 8)
    z = jnp.array([18, 18])
    res = neb(LennardJones(), path0, z,
              NEBConfig(variant="cineb", optimizer="afire", n_steps=40))
    assert np.allclose(np.asarray(res.path[0]), np.asarray(path0[0]))
    assert np.allclose(np.asarray(res.path[-1]), np.asarray(path0[-1]))
    # band relaxed: interior max force dropped
    e0 = res.energy_history[0]
    e1 = res.energy_history[-1]
    assert e1.max() <= e0.max() + 1e-12


def test_per_image_trust_clamp_rules():
    """TR_NEB semantics (ref: Optimizer/trust_radius_neb.py:4): moves
    opposing the force are zeroed; moves toward a neighbor are clamped to
    half the neighbor distance."""
    import jax.numpy as jnp
    from multioptpy_tpu.drivers.neb import per_image_trust_clamp

    # 4 images on a line, spacing 2.0 => interior trust radius 1.0
    path = jnp.asarray(np.array(
        [[[0.0, 0.0, 0.0]], [[2.0, 0.0, 0.0]],
         [[4.0, 0.0, 0.0]], [[6.0, 0.0, 0.0]]]))
    # image 1 wants to move +x by 5 (toward image 2), force along move
    mv = jnp.zeros_like(path).at[1, 0, 0].set(5.0)
    forces = jnp.zeros_like(path).at[1, 0, 0].set(1.0)
    out = np.asarray(per_image_trust_clamp(path, forces, mv))
    assert out[1, 0, 0] == pytest.approx(1.0)   # clamped to half-spacing

    # move opposing the force is zeroed (projected velocity-Verlet)
    forces_neg = jnp.zeros_like(path).at[1, 0, 0].set(-1.0)
    out2 = np.asarray(per_image_trust_clamp(path, forces_neg, mv))
    assert out2[1, 0, 0] == pytest.approx(0.0)

    # small move within the trust region is untouched
    mv_small = jnp.zeros_like(path).at[1, 0, 0].set(0.5)
    out3 = np.asarray(per_image_trust_clamp(path, forces, mv_small))
    assert out3[1, 0, 0] == pytest.approx(0.5)


def test_neb_with_per_image_trust_runs():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.neb import (
        NEBConfig, interpolate_linear, neb)

    a = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 6.8]]))
    b = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.2]]))
    path0 = interpolate_linear(a, b, 8)
    res = neb(LennardJones(), path0, jnp.array([18, 18]),
              NEBConfig(variant="cineb", optimizer="fire", n_steps=30,
                        per_image_trust=True))
    assert np.all(np.isfinite(np.asarray(res.path)))
    assert np.allclose(np.asarray(res.path[0]), np.asarray(path0[0]))


def test_rfo_band_optimizer_muller_brown():
    """Blended FIRE+RFO band clock (ref: Optimizer/rfo_neb.py RFOOptimizer):
    converges the MB path and keeps the barrier-top image near the known
    saddle."""
    from multioptpy_tpu.calculators.model_surfaces import (
        MB_MIN_A, MB_MIN_C, MB_TS_AB, MullerBrown)
    from multioptpy_tpu.drivers.neb import (
        NEBConfig, interpolate_linear, neb)

    calc = MullerBrown()
    z = jnp.array([1])
    start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    path0 = interpolate_linear(start, end, 14)
    res = neb(calc, path0, z, NEBConfig(
        variant="cineb", optimizer="rfo", n_steps=250, k_spring=5e-4,
        climbing_start=40, dt0=0.05, dt_max=0.4, rfo_ratio=0.5))
    e = np.asarray(res.energies)
    ts = np.asarray(res.path[int(np.argmax(e))])
    np.testing.assert_allclose(ts[0, :2], MB_TS_AB, atol=0.05)


class TestSplineClimbingInsert:
    """Reference '-ci' climbing image: spline-located maximum insertion
    (ref: interface.py:320 -> neb.py:562-564 -> calc_tools.py:865)."""

    def _band(self):
        # 8-image band of an Ar2 stretch with an asymmetric energy peak
        # placed INSIDE segment (3,4) so the spline maximum falls there
        import numpy as np
        r = np.linspace(6.0, 9.5, 8)
        path = np.zeros((8, 2, 3))
        path[:, 1, 2] = r
        e = np.array([0.0, 0.1, 0.35, 0.8, 0.75, 0.3, 0.1, 0.0])
        return jnp.asarray(path), e

    def test_insertion_moves_pre_peak_image(self):
        from multioptpy_tpu.drivers.neb import spline_climbing_insert
        path, e = self._band()
        out = spline_climbing_insert(path, e)
        out = np.asarray(out)
        p = np.asarray(path)
        # endpoints and far-from-peak images untouched
        np.testing.assert_array_equal(out[0], p[0])
        np.testing.assert_array_equal(out[-1], p[-1])
        np.testing.assert_array_equal(out[1], p[1])
        # image 3 was replaced by the refined interpolation at the maximum:
        # moved toward image 4, stays between its old neighbors
        assert not np.allclose(out[3], p[3])
        z3 = out[3, 1, 2]
        assert p[3, 1, 2] < z3 < p[4, 1, 2]

    def test_no_interior_maximum_is_a_noop(self):
        from multioptpy_tpu.drivers.neb import spline_climbing_insert
        path, _ = self._band()
        e_mono = np.linspace(0.0, 1.0, 8)   # monotone: no local maximum
        out = spline_climbing_insert(path, e_mono)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(path))

    def test_cli_ci_flag_maps_to_spline_ci(self):
        """-ci start interval -> NEBConfig.spline_ci_*; -cineb stays the
        CI-force start (the reference keeps them distinct)."""
        import multioptpy_tpu.cli as cli
        import multioptpy_tpu.drivers.neb as nebmod
        captured = {}
        orig = nebmod.neb

        def fake_neb(calc, path0, z, config, **kw):
            captured["cfg"] = config
            raise SystemExit(0)

        nebmod.neb = fake_neb
        try:
            import tempfile, os
            with tempfile.TemporaryDirectory() as td:
                xyz = os.path.join(td, "a.xyz")
                with open(xyz, "w") as f:
                    f.write("2\n\nAr 0 0 0\nAr 0 0 3.8\n")
                xyz2 = os.path.join(td, "b.xyz")
                with open(xyz2, "w") as f:
                    f.write("2\n\nAr 0 0 0\nAr 0 0 5.0\n")
                try:
                    cli.run_nebmain([xyz, "-i2", xyz2, "-nimg", "6",
                                     "-calc", "lj", "-ns", "3",
                                     "-ci", "5", "2", "-cineb", "7"])
                except SystemExit:
                    pass
        finally:
            nebmod.neb = orig
        cfg = captured["cfg"]
        assert cfg.spline_ci_start == 5
        assert cfg.spline_ci_interval == 2
        assert cfg.climbing_start == 7
