"""Benchmarks: batched RS-RFO overhead (headline), 32-image SQM NEB,
f64 on-device SQM optimization throughput, and in-image A/B rows against
the reference's own drivers running on its torch SQM2 backend.

Targets from BASELINE.md: < 1 ms/structure for a 256-structure batched RFO
step and < 1 ms/image for a 32-image NEB step (the reference advances
structures/images sequentially in Python; `vs_baseline` =
baseline_ms / our_ms, >1 means faster).

Un-losable by construction (round-3 bench timed out and captured NOTHING):
each row's JSON is printed the moment it completes (flushed), rows run
cheapest-first, a wall-clock budget (env BENCH_BUDGET_S, default 3300 s)
skips rows that would not fit — with the skip reason emitted as a row —
and a SIGTERM/SIGINT handler prints the final aggregate before dying so
even a driver-side `timeout` keeps everything measured so far. Per-row
costs are learned across runs in .bench_estimates.json. The LAST line
printed is always the aggregate {"metric", "value", "unit",
"vs_baseline", "extras": [...]} the driver parses.
"""

import json
import os
import signal
import sys
import time

import numpy as np

_EST_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_estimates.json")

# Committed cache of reference-side (torch CPU) timings. The reference
# numbers are hardware-stable run to run on this box, and re-measuring
# them live burned ~1300 s of every bench budget (the 98-atom SQM2
# gradient alone is ~445 s) — which round 4 paid by self-skipping rows.
# Cached rows carry "reference_cached": true so the artifact is explicit
# about provenance; BENCH_REFRESH_REF=1 re-measures everything live.
_REF_CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_ref_cache.json")


def _ref_cached(key, measure_fn):
    """-> (value, was_cached). Caches reference-side wall-clock numbers
    across bench runs (see _REF_CACHE_FILE comment)."""
    refresh = os.environ.get("BENCH_REFRESH_REF") == "1"
    try:
        with open(_REF_CACHE_FILE) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    if not refresh and key in cache:
        return cache[key], True
    val = measure_fn()
    cache[key] = val
    try:
        with open(_REF_CACHE_FILE, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return val, False


def _timeit(fn, reps=3):
    """Mean wall-clock of fn() over reps (fn must block on its result)."""
    fn()  # compile / warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def bench_rfo_lj():
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.drivers.optimize import (
        OptimizeConfig, init_state, make_step_fn)
    from multioptpy_tpu.periodic import UFF_VDW_R

    BATCH, N_ATOMS, N_STEPS = 256, 8, 100
    rmin = float(UFF_VDW_R[18])
    rng = np.random.default_rng(7)
    coords = (rng.standard_normal((BATCH, N_ATOMS, 3)) * rmin * 0.8
              ).astype(np.float32)
    z = jnp.array([18] * N_ATOMS)

    calc = LennardJones()
    # pallas eigensolver (ops/jacobi_pallas.py): the whole Jacobi iteration
    # in ONE TPU kernel, batch on lanes, VPU rotations in VMEM — 0.78 ms
    # per (256,24,24) eigh vs 5.6 ms XLA-Jacobi vs 11.1 ms EighTpu; whole
    # production step 5.5 -> 0.93 ms/iter (round-2 bisection). Single-step
    # agreement with "xla" at the f32 floor (tests/test_jacobi_pallas.py).
    config = OptimizeConfig(method="rfo_fsb", init_hessian="exact",
                            eigh_impl="pallas")
    step = make_step_fn(calc, z, None, config)
    state = jax.vmap(lambda c: init_state(c, z, calc, None, config))(
        jnp.asarray(coords))

    @jax.jit
    def run(state):
        def body(s, _):
            return jax.vmap(step)(s), None
        final, _ = jax.lax.scan(body, state, None, length=N_STEPS)
        return final

    dt = _timeit(lambda: jax.block_until_ready(run(state).coords))
    ms = dt / (BATCH * N_STEPS) * 1e3
    return {"metric": "batched_rfo_step_overhead_256xAr8",
            "value": round(ms, 6), "unit": "ms/structure/step",
            "vs_baseline": round(1.0 / ms, 3)}


def bench_sqm_neb32():
    """32-image NEB on the on-device SQM backend (water isomerization-ish
    stretch path), neb_scan driver — BASELINE target < 1 ms/image/step."""
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM
    from multioptpy_tpu.drivers.neb import NEBConfig, interpolate_linear
    from multioptpy_tpu.units import ANGSTROM2BOHR

    N_IMAGES, N_STEPS = 32, 60
    water = np.array([[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                      [0.0, -0.7572, -0.4692]]) * ANGSTROM2BOHR
    stretched = water.copy()
    stretched[1, 1] += 1.5
    z = jnp.array([8, 1, 1])
    path0 = interpolate_linear(jnp.asarray(np.float32(water)),
                               jnp.asarray(np.float32(stretched)), N_IMAGES)
    calc = SQM(eigh_impl="pallas")   # lane-parallel Jacobi for the band
    config = NEBConfig(variant="cineb", optimizer="fire", n_steps=N_STEPS)

    # build the jitted band program ONCE (calling neb_scan repeatedly would
    # re-trace its inner closure and time compiles instead of steps)
    from multioptpy_tpu.drivers.neb import make_neb_step
    from multioptpy_tpu.steppers.first_order import fire_init

    step = make_neb_step(calc, z, config)
    fire0 = fire_init(path0.size, path0.dtype, dt0=config.dt0)

    @jax.jit
    def run(p, f):
        def body(carry, it):
            p, f = carry
            p, f, _, _, _ = step(p, f, it)
            return (p, f), None
        (p, f), _ = jax.lax.scan(body, (p, f),
                                 jnp.arange(1, N_STEPS + 1))
        return p

    dt = _timeit(lambda: jax.block_until_ready(run(path0, fire0)))
    ms = dt / (N_IMAGES * N_STEPS) * 1e3
    return {"metric": "sqm_neb_step_32img_water",
            "value": round(ms, 6), "unit": "ms/image/step",
            "vs_baseline": round(1.0 / ms, 3)}


def bench_aldol_neb_fixture():
    """CI-NEB step throughput on the reference's LITERAL aldol_rxn NEB
    fixture (test/aldol_rxn/_0..{80}.xyz, 17 images x 11 atoms, C/H/O) with
    the on-device SQM backend — the BASELINE.md 'NEB wall-clock
    (aldol_rxn)' anchor on the reference's own input files."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM
    from multioptpy_tpu.drivers.neb import NEBConfig, make_neb_step
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.steppers.first_order import fire_init
    from multioptpy_tpu.units import ANGSTROM2BOHR

    folder = "/root/reference/test/aldol_rxn"
    files = sum([sorted(glob.glob(os.path.join(
        folder, "*_" + "[0-9]" * i + ".xyz"))) for i in range(1, 4)], [])
    frames, symbols = [], None
    for f in files:
        symbols, c_ang = read_xyz(f)
        frames.append(np.float32(c_ang * ANGSTROM2BOHR))
    path0 = jnp.asarray(np.stack(frames))
    z = jnp.asarray(symbols_to_z(symbols))
    n_images = path0.shape[0]

    N_STEPS = 60
    calc = SQM(eigh_impl="pallas")
    config = NEBConfig(variant="cineb", optimizer="fire", n_steps=N_STEPS)
    step = make_neb_step(calc, z, config)
    fire0 = fire_init(path0.size, path0.dtype, dt0=config.dt0)

    @jax.jit
    def run(p, f):
        def body(carry, it):
            p, f = carry
            p, f, _, _, _ = step(p, f, it)
            return (p, f), None
        (p, f), _ = jax.lax.scan(body, (p, f),
                                 jnp.arange(1, N_STEPS + 1))
        return p

    dt = _timeit(lambda: jax.block_until_ready(run(path0, fire0)))
    ms = dt / (n_images * N_STEPS) * 1e3
    return {"metric": "aldol_fixture_neb_step",
            "value": round(ms, 6), "unit": "ms/image/step",
            "n_images": n_images,
            "vs_baseline": round(1.0 / ms, 3)}


def bench_sqm_f64_tight():
    """f64 on-device SQM + RFO, 64x water ensemble, 40 steps — proves the
    full QM gradient path runs in x64 on the TPU (round-1 blocker) and
    records its throughput."""
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM
    from multioptpy_tpu.drivers.optimize import (
        OptimizeConfig, init_state, make_step_fn)
    from multioptpy_tpu.units import ANGSTROM2BOHR

    jax.config.update("jax_enable_x64", True)
    try:
        # batch 64: the fixed per-step cost (f64-emulated eigh) amortizes
        # over the batch (16x water measured 3.5x WORSE per structure);
        # steps trimmed 40 -> 25 — the ~5 min f64 XLA compile dominates the
        # sub-bench wall clock either way
        BATCH, N_STEPS = 64, 25
        water = np.array([[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                          [0.0, -0.7572, -0.4692]]) * ANGSTROM2BOHR
        rng = np.random.default_rng(0)
        coords = np.stack([water + 0.1 * rng.standard_normal(water.shape)
                           for _ in range(BATCH)])
        z = jnp.array([8, 1, 1])
        calc = SQM()
        config = OptimizeConfig(method="rfo_fsb", init_hessian="identity")
        step = make_step_fn(calc, z, None, config)
        state = jax.vmap(lambda c: init_state(
            c, z, calc, None, config, hessian0=jnp.eye(9)))(
            jnp.asarray(coords, jnp.float64))

        @jax.jit
        def run(state):
            def body(s, _):
                return jax.vmap(step)(s), None
            final, _ = jax.lax.scan(body, state, None, length=N_STEPS)
            return final

        dt = _timeit(lambda: jax.block_until_ready(run(state).coords))
        final = run(state)
        assert final.coords.dtype == jnp.float64
        max_g = float(jnp.max(jnp.abs(final.gradient)))
        ms = dt / (BATCH * N_STEPS) * 1e3
        return {"metric": "sqm_f64_rfo_64xwater",
                "value": round(ms, 6), "unit": "ms/structure/step",
                "vs_baseline": round(1.0 / ms, 3),
                "final_max_grad": round(max_g, 9)}
    finally:
        jax.config.update("jax_enable_x64", False)


def bench_reference_sqm2_ab():
    """Reference-relative A/B (VERDICT r2 weak #9): the reference's own
    torch SQM2 backend (/root/reference, imported as an external library —
    nothing is copied) runs in-image on CPU; time its per-step
    energy+gradient on the same water molecule the f64 row uses. The
    reference reconstructs its calculator every step
    (Calculator/sqm2_calculation_tools.py:74 run_calculation), so
    construct+gradient is its true per-step cost — and it EXCLUDES the
    reference's optimizer overhead, making the ratio a lower bound."""
    import contextlib
    import io
    import os
    import sys
    import types

    if not os.path.isdir("/root/reference/multioptpy"):
        raise RuntimeError("reference tree not mounted")
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = ["/root/reference/multioptpy"]
        sys.modules["multioptpy"] = pkg
    from multioptpy.SQM.sqm2.sqm2_core import SQM2Calculator

    water = np.array([[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                      [0.0, -0.7572, -0.4692]])
    z = np.array([8, 1, 1])

    def one():
        calc = SQM2Calculator(xyz=water, element_list=z, charge=0, spin=0)
        return calc.total_gradient(water)

    with contextlib.redirect_stdout(io.StringIO()):  # ref prints per call
        one()
        t0 = time.perf_counter()
        for _ in range(5):
            one()
        ms = (time.perf_counter() - t0) / 5 * 1e3
    return {"metric": "reference_sqm2_gradient_water_torchcpu",
            "value": round(ms, 3), "unit": "ms/structure/gradient"}


def bench_reference_optmain_e2e_ab():
    """Full-DRIVER A/B (extends the gradient-only A/B above): the
    reference's complete Optimize loop — optmain via its own
    Wrapper/optimize_wrapper.py:5 OptimizationJob, torch SQM2 backend,
    per-step file round-trips, bias engine, RSIRFO step, convergence
    checks (optimization.py:1862 main loop) — runs end-to-end in-image on
    the same water fixture the f64 row optimizes on-device. Per-iteration
    wall-clock of the whole reference stack; main() pairs it with
    sqm_f64_rfo_64xwater as vs_reference_e2e (their full step / our full
    step). Nothing is copied: the reference is imported as an external
    library and executed as a user would."""
    import contextlib
    import io
    import os
    import sys
    import tempfile
    import types

    if not os.path.isdir("/root/reference/multioptpy"):
        raise RuntimeError("reference tree not mounted")
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = ["/root/reference/multioptpy"]
        sys.modules["multioptpy"] = pkg
    import multioptpy.interface    # noqa: F401  (wrapper expects these)
    import multioptpy.optimization  # noqa: F401
    sys.path.insert(0, "/root/reference")
    try:
        from multioptpy.Wrapper.optimize_wrapper import OptimizationJob
    finally:
        sys.path.remove("/root/reference")

    NSTEP = 15
    xyz = ("3\nwater (perturbed)\n"
           "O 0.02 -0.01 0.1473\n"
           "H 0.01 0.8072 -0.4992\n"
           "H -0.02 -0.7872 -0.4392\n")
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "water.xyz")
        with open(path, "w") as fh:
            fh.write(xyz)
        os.chdir(tmp)  # the reference writes work dirs relative to cwd
        try:
            job = OptimizationJob(path)
            job.set_options(sqm2=True, NSTEP=NSTEP)
            with contextlib.redirect_stdout(io.StringIO()):
                t0 = time.perf_counter()
                job.run()
                wall = time.perf_counter() - t0
        finally:
            os.chdir(cwd)
        # count per-iteration sample dirs to get the true step count
        n_iter = 0
        for root, dirs, _files in os.walk(tmp):
            n_iter += sum(d.startswith("samples_water_") for d in dirs)
    n_iter = max(n_iter, 1)
    return {"metric": "reference_optmain_sqm2_water_e2e_torchcpu",
            "value": round(wall / n_iter * 1e3, 3), "unit": "ms/step",
            "n_steps": n_iter, "wall_s": round(wall, 2)}


def bench_sqm2_scale_ab():
    """Molecule-size scale A/B: f64 SQM2 energy+gradient on (a) the
    reference's LARGEST basis-representable fixture
    (test/autots_v2_test.xyz — 32 atoms C9H21OP, row-3 P so the d-shell
    basis path is live) and (b) a procedural 98-atom C32H66 alkane —
    our on-device jitted path vs the reference's own torch SQM2 on CPU
    (imported as an external library, nothing copied; its calculator is
    rebuilt per step by its driver, so construct+gradient is its true
    per-step cost). This is the 'bigger than toy molecules' scale
    evidence: per-molecule ms for both frameworks at 3N = 96 and 294."""
    import contextlib
    import io
    import os
    import sys
    import types

    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM2
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.io.fixtures import alkane_chain
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = ["/root/reference/multioptpy"]
        sys.modules["multioptpy"] = pkg
    from multioptpy.SQM.sqm2.sqm2_core import SQM2Calculator

    symbols, c_ang = read_xyz("/root/reference/test/autots_v2_test.xyz")
    fixtures = {
        "autots_v2_32atom": (c_ang * ANGSTROM2BOHR,
                             np.asarray(symbols_to_z(symbols))),
        "alkane_c32h66_98atom": alkane_chain(32),
    }
    jax.config.update("jax_enable_x64", True)
    try:
        rows = []
        for name, (coords_bohr, z) in fixtures.items():
            calc = SQM2()
            zj = jnp.asarray(z)
            grad_fn = jax.jit(lambda c, zz=zj: calc.energy_and_gradient(
                c, zz))
            cj = jnp.asarray(coords_bohr, jnp.float64)
            dt = _timeit(lambda: jax.block_until_ready(grad_fn(cj)))
            ours_ms = dt * 1e3

            c_np = np.asarray(coords_bohr) * BOHR2ANGSTROM
            z_np = np.asarray(z)

            def ref_one():
                rc = SQM2Calculator(xyz=c_np, element_list=z_np,
                                    charge=0, spin=0)
                return rc.total_gradient(c_np)

            def ref_timed():
                # ONE timed call: the reference reconstructs its
                # calculator per call anyway (no warm-up state), and at
                # 98 atoms each call costs ~445 s
                with contextlib.redirect_stdout(io.StringIO()):
                    t0 = time.perf_counter()
                    ref_one()
                    return (time.perf_counter() - t0) * 1e3

            ref_ms, cached = _ref_cached(f"sqm2_grad_{name}_ms", ref_timed)
            rows.append({"metric": f"sqm2_grad_{name}",
                         "value": round(ours_ms, 4),
                         "unit": "ms/gradient (ours, TPU f64)",
                         "reference_ms": round(ref_ms, 2),
                         "reference_cached": cached,
                         "vs_reference": round(ref_ms / ours_ms, 1)})
        return {"metric": "sqm2_scale_ab", "value": rows[-1]["value"],
                "unit": rows[-1]["unit"], "rows": rows}
    finally:
        jax.config.update("jax_enable_x64", False)


def bench_autots_flagship():
    """End-to-end flagship wall-clock (VERDICT r2 item 1): the full 4-step
    AutoTS pipeline (2x pairwise AFIR -> 16-image CI-NEB with in-loop
    redistribution -> top-N saddle refinement with exact SQM Hessians ->
    LQA IRC + endpoint opts) on the butadiene+acrolein Diels-Alder system
    (18 atoms C/H/O, 3N = 54) with the on-device SQM2 backend in FLOAT64
    — the same configuration tests/test_flagship_autots.py asserts
    physics on (exactly one imaginary mode at the refined TS). Measured
    cold (first-ever run, every f64 program compiling): 2324 s with
    n_imaginary = 1; the persistent compilation cache (main()) makes
    subsequent runs pay step time only. Ref anchor: Wrapper/autots.py:477
    + test/config_autots_run_xtb_test.json."""
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM2
    from multioptpy_tpu.drivers.irc import IRCConfig
    from multioptpy_tpu.drivers.neb import NEBConfig
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.io.fixtures import diels_alder_reactant
    from multioptpy_tpu.workflows.autots import AutoTSConfig, autots

    jax.config.update("jax_enable_x64", True)
    try:
        coords, z = diels_alder_reactant()
        cfg = AutoTSConfig(
            afir_list=[(300.0, [1], [11]), (300.0, [4], [12])],
            afir_opt=OptimizeConfig(method="rfo_fsb", nsteps=300,
                                    init_hessian="model:lindh2007d3_raw",
                                    fc_count=-1, mfc_count=30),
            n_images=16,
            neb=NEBConfig(variant="cineb", n_steps=250, k_spring=0.01,
                          climbing_start=80, fmax=5e-4, dt0=0.05,
                          dt_max=0.2, redistribute="linear",
                          redistribute_every=25),
            top_n_candidates=2,
            saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                                  nsteps=120, fc_count=5,
                                  init_hessian="exact"),
            irc=IRCConfig(method="lqa", step_size=0.1, n_steps=70),
            endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=150,
                                        init_hessian="model:lindh2007d3_raw"),
        )
        calc = SQM2()
        t0 = time.perf_counter()
        res = autots(calc, jnp.asarray(coords, jnp.float64),
                     jnp.asarray(z), cfg)
        wall_s = time.perf_counter() - t0
        if not (np.isfinite(res.barrier_forward)
                and np.isfinite(res.barrier_backward)):
            # FAIL LOUDLY (row-level "error") instead of reporting nan
            # barriers as if they were a timing result (round-4 weakness)
            raise RuntimeError(
                "flagship produced non-finite barriers "
                f"(fwd={res.barrier_forward}, bwd={res.barrier_backward}, "
                f"n_imaginary={res.n_imaginary}, wall={wall_s:.0f}s)")
        return {"metric": "autots_flagship_diels_alder_18atom_sqm2_f64",
                "value": round(wall_s, 1), "unit": "s end-to-end",
                "stage_seconds": res.stage_seconds,
                "n_imaginary": int(res.n_imaginary),
                "barrier_fwd_hartree": round(float(res.barrier_forward), 5),
                "barrier_bwd_hartree": round(float(res.barrier_backward), 5),
                # strip the per-candidate coordinate arrays — this dict
                # goes through json.dumps
                "candidates": [{k: v for k, v in c.items() if k != "coords"}
                               for c in res.candidates]}
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# A/B rows: the reference's own drivers executed in-image (torch SQM2 —
# the one QM backend both frameworks can share; nothing is copied, the
# reference is imported as an external library and run as a user would)
# ---------------------------------------------------------------------------

_ASE_STUB = r"""
import sys
from unittest.mock import MagicMock
for name in ['ase', 'ase.calculators', 'ase.calculators.espresso',
             'ase.calculators.gamess_us', 'ase.calculators.gaussian',
             'ase.calculators.mopac', 'ase.calculators.nwchem',
             'ase.calculators.orca', 'ase.data', 'ase.vibrations',
             'ase.io', 'ase.units']:
    sys.modules[name] = MagicMock()
"""


def _run_reference_cli(argv_py_list, cwd, timeout_s):
    """Run a reference entry point in a subprocess (the reference package
    imports ASE unconditionally via Calculator/ase_tools — stubbed; ref:
    test strategy of tests/test_reference_live55.py). Returns (wall_s
    measured INSIDE the subprocess around the entry call, stdout tail)."""
    import subprocess
    import tempfile

    entry = {"nebmain": "run_nebmain", "optmain": "run_optmain",
             "run_autots": "run_autots"}[argv_py_list[0]]
    module = ("multioptpy.Entrypoints.autots" if entry == "run_autots"
              else "multioptpy.Entrypoints.core")
    runner = (_ASE_STUB +
              f"import sys, time\nsys.argv = {argv_py_list!r}\n"
              f"import multioptpy\nfrom {module} import {entry}\n"
              "t0 = time.perf_counter()\n"
              f"{entry}()\n"
              "print('BENCHWALL %.3f' % (time.perf_counter() - t0))\n")
    env = dict(os.environ, PYTHONPATH="/root/reference")
    with tempfile.NamedTemporaryFile("w", suffix=".py",
                                     delete=False) as fh:
        fh.write(runner)
        script = fh.name
    try:
        proc = subprocess.run([sys.executable, script], cwd=cwd, env=env,
                              capture_output=True, text=True,
                              timeout=timeout_s)
    finally:
        os.unlink(script)
    if proc.returncode != 0:
        raise RuntimeError("reference driver failed: "
                           + proc.stderr[-500:])
    wall = None
    for line in proc.stdout.splitlines():
        if line.startswith("BENCHWALL"):
            wall = float(line.split()[1])
    if wall is None:
        raise RuntimeError("no BENCHWALL marker in reference stdout")
    return wall, proc.stdout[-2000:]


def bench_reference_nebmain_e2e_ab():
    """Full-DRIVER NEB A/B, reference side: the reference's complete
    nebmain (neb.py:380 NEB.run -> execute loop :489 — per-image torch
    SQM2 gradients via SQM2Engine, tangent/spring forces, per-step file
    round-trips) on its own literal aldol_rxn fixture
    (test/aldol_rxn/_0..80.xyz, 17 images x 11 atoms). main() pairs this
    with aldol_fixture_neb_sqm2_f64 as vs_reference_e2e."""
    import shutil
    import tempfile

    n_steps = 3

    def measure():
        with tempfile.TemporaryDirectory() as tmp:
            shutil.copytree("/root/reference/test/aldol_rxn",
                            os.path.join(tmp, "aldol_rxn"))
            wall, _ = _run_reference_cli(
                ["nebmain", "aldol_rxn", "-sqm2", "-ns", str(n_steps)],
                cwd=tmp, timeout_s=1800)
        return wall

    wall, cached = _ref_cached(f"nebmain_sqm2_aldol_ns{n_steps}_wall_s",
                               measure)
    n_images = 17
    ms = wall / (n_images * n_steps) * 1e3
    return {"metric": "reference_nebmain_sqm2_aldol_e2e_torchcpu",
            "value": round(ms, 3), "unit": "ms/image/step",
            "n_images": n_images, "n_steps": n_steps,
            "reference_cached": cached,
            "wall_s": round(wall, 2)}


def bench_aldol_neb_sqm2_f64():
    """Our side of the NEB e2e A/B: CI-NEB on the same aldol fixture with
    OUR on-device SQM2 backend in float64 (the accuracy configuration the
    f64 optmain row uses) — the full jitted band step (energies, gradients,
    tangents, springs, climbing image, FIRE update) per image per step."""
    import glob

    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM2
    from multioptpy_tpu.drivers.neb import NEBConfig, make_neb_step
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.steppers.first_order import fire_init
    from multioptpy_tpu.units import ANGSTROM2BOHR

    jax.config.update("jax_enable_x64", True)
    try:
        folder = "/root/reference/test/aldol_rxn"
        files = sum([sorted(glob.glob(os.path.join(
            folder, "*_" + "[0-9]" * i + ".xyz"))) for i in range(1, 4)],
            [])
        frames, symbols = [], None
        for f in files:
            symbols, c_ang = read_xyz(f)
            frames.append(np.float64(c_ang * ANGSTROM2BOHR))
        path0 = jnp.asarray(np.stack(frames), jnp.float64)
        z = jnp.asarray(symbols_to_z(symbols))
        n_images = path0.shape[0]

        N_STEPS = 30
        calc = SQM2()
        config = NEBConfig(variant="cineb", optimizer="fire",
                           n_steps=N_STEPS)
        step = make_neb_step(calc, z, config)
        fire0 = fire_init(path0.size, path0.dtype, dt0=config.dt0)

        @jax.jit
        def run(p, f):
            def body(carry, it):
                p, f = carry
                p, f, _, _, _ = step(p, f, it)
                return (p, f), None
            (p, f), _ = jax.lax.scan(body, (p, f),
                                     jnp.arange(1, N_STEPS + 1))
            return p

        dt = _timeit(lambda: jax.block_until_ready(run(path0, fire0)))
        ms = dt / (n_images * N_STEPS) * 1e3
        return {"metric": "aldol_fixture_neb_sqm2_f64",
                "value": round(ms, 6), "unit": "ms/image/step",
                "n_images": n_images,
                "vs_baseline": round(1.0 / ms, 3)}
    finally:
        jax.config.update("jax_enable_x64", False)


def _our_autots_mini():
    """Our side of the AutoTS A/B: the shared examples/ab v1 config JSON
    through autots_config_from_v1 + our on-device SQM2 in f64. Split out
    so tools/warm_cache.py can pre-compile its programs without paying
    the reference subprocess."""
    import jax
    import jax.numpy as jnp

    from multioptpy_tpu.calculators.sqm import SQM2
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR
    from multioptpy_tpu.workflows.autots import (autots,
                                                 autots_config_from_v1)

    here = os.path.dirname(os.path.abspath(__file__))
    cfg_src = os.path.join(here, "examples", "ab",
                           "config_autots_sqm2_ab.json")
    xyz_src = os.path.join(here, "examples", "ab", "hcn.xyz")
    with open(cfg_src) as f:
        cfg = json.load(f)
    ts_config, _flow = autots_config_from_v1(cfg)
    symbols, c_ang = read_xyz(xyz_src)
    z = jnp.asarray(symbols_to_z(symbols))
    jax.config.update("jax_enable_x64", True)
    try:
        calc = SQM2()
        t0 = time.perf_counter()
        res = autots(calc, jnp.asarray(c_ang * ANGSTROM2BOHR,
                                       jnp.float64), z, ts_config)
        return time.perf_counter() - t0, int(res.n_imaginary)
    finally:
        jax.config.update("jax_enable_x64", False)


def bench_autots_mini_ab():
    """AutoTS end-to-end A/B on ONE SHARED v1 config (examples/ab/):
    HCN -> HNC isomerization, 4-step AFIR -> NEB -> saddle -> IRC, torch
    SQM2 for the reference (run_autots, Wrapper/autots.py:477) vs our
    run of the SAME JSON through autots_config_from_v1 + our on-device
    SQM2 in f64. Same workflow semantics, same config file — the
    'switch frameworks' wall-clock."""
    import shutil
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    cfg_src = os.path.join(here, "examples", "ab",
                           "config_autots_sqm2_ab.json")
    xyz_src = os.path.join(here, "examples", "ab", "hcn.xyz")

    # --- reference side (subprocess, its own full driver; cached like
    # every other reference-side CPU timing — hardware-stable run to run,
    # and re-measuring cost ~132 s of every budget) ---------------------
    def measure():
        with tempfile.TemporaryDirectory() as tmp:
            shutil.copy(xyz_src, os.path.join(tmp, "hcn.xyz"))
            shutil.copy(cfg_src, os.path.join(tmp, "config_ab.json"))
            open(os.path.join(tmp, "software_path.conf"), "w").close()
            ref_wall, ref_tail = _run_reference_cli(
                ["run_autots", "hcn.xyz", "-cfg", "config_ab.json"],
                cwd=tmp, timeout_s=1800)
        # the reference's step3 refinement diverges on its own torch SQM2
        # HCN TS (energies blow up to ~-1e18 Ha, observed across
        # rsirfo_fsb / rsirfo_block_bofill / loose criteria); its driver
        # then skips step4. Record the fact rather than hide it.
        return {"wall_s": ref_wall,
                "refined": "did not converge" not in ref_tail}
    ref, ref_cached = _ref_cached("run_autots_hcn_ab", measure)
    ref_wall, ref_refined = ref["wall_s"], ref["refined"]

    our_wall, n_imag = _our_autots_mini()
    return {"metric": "autots_e2e_ab_hcn_sqm2",
            "value": round(our_wall, 2), "unit": "s end-to-end (ours)",
            "reference_wall_s": round(ref_wall, 2),
            "reference_cached": ref_cached,
            "reference_refined_ts": ref_refined,
            "n_imaginary": n_imag,
            "vs_reference_e2e": round(ref_wall / our_wall, 2)}


# ---------------------------------------------------------------------------
# streaming, budget-aware runner (round-3 bench rc=124 captured nothing:
# one buffered JSON line + an unbounded row list. Now every row streams
# its JSON immediately, rows run cheapest-first, a wall-clock budget
# skips rows that don't fit, and SIGTERM still prints the aggregate.)
# ---------------------------------------------------------------------------

# (name, fn, default cost estimate in seconds — overridden by the learned
# .bench_estimates.json from the previous completed run on this machine)
_DEFAULT_EST = 120.0
_ROWS = [
    ("reference_sqm2_gradient_water_torchcpu",
     bench_reference_sqm2_ab, 30),
    ("batched_rfo_step_overhead_256xAr8", bench_rfo_lj, 120),
    ("sqm_neb_step_32img_water", bench_sqm_neb32, 120),
    ("aldol_fixture_neb_step", bench_aldol_neb_fixture, 120),
    ("reference_optmain_sqm2_water_e2e_torchcpu",
     bench_reference_optmain_e2e_ab, 90),
    ("sqm_f64_rfo_64xwater", bench_sqm_f64_tight, 400),
    ("reference_nebmain_sqm2_aldol_e2e_torchcpu",
     bench_reference_nebmain_e2e_ab, 240),
    ("aldol_fixture_neb_sqm2_f64", bench_aldol_neb_sqm2_f64, 400),
    ("sqm2_scale_ab", bench_sqm2_scale_ab, 600),
    # flagship before the HCN mini A/B: if the budget only fits one of
    # the two AutoTS rows, the 18-atom flagship is the one that matters
    ("autots_flagship_diels_alder_18atom_sqm2_f64",
     bench_autots_flagship, 900),
    ("autots_e2e_ab_hcn_sqm2", bench_autots_mini_ab, 900),
]

_HEADLINE_METRIC = "batched_rfo_step_overhead_256xAr8"


def _load_estimates():
    try:
        with open(_EST_FILE) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    except Exception:
        return {}


def _save_estimate(name, seconds):
    est = _load_estimates()
    est[name] = round(seconds, 1)
    try:
        with open(_EST_FILE, "w") as f:
            json.dump(est, f, indent=1, sort_keys=True)
    except OSError:
        pass


class _Bench:
    def __init__(self, budget_s):
        self.extras = []
        self.deadline = time.monotonic() + budget_s
        self.finalized = False

    def emit(self, row):
        print(json.dumps(row), flush=True)
        self.extras.append(row)

    def finalize(self, interrupted=None):
        if self.finalized:
            return
        self.finalized = True
        by_metric = {e.get("metric"): e for e in self.extras}
        ours = by_metric.get("sqm_f64_rfo_64xwater")
        ref = by_metric.get("reference_sqm2_gradient_water_torchcpu")
        if ours and ref and "value" in ours and "value" in ref:
            # reference-relative: its CPU gradient vs our full on-device
            # f64 step (gradient + RFO + convergence bookkeeping)
            ours["vs_reference"] = round(ref["value"] / ours["value"], 1)
        ref_e2e = by_metric.get(
            "reference_optmain_sqm2_water_e2e_torchcpu")
        if ours and ref_e2e and "value" in ours and "value" in ref_e2e:
            # full-driver A/B: the reference's whole per-step stack vs ours
            ours["vs_reference_e2e"] = round(
                ref_e2e["value"] / ours["value"], 1)
        our_neb = by_metric.get("aldol_fixture_neb_sqm2_f64")
        ref_neb = by_metric.get(
            "reference_nebmain_sqm2_aldol_e2e_torchcpu")
        if (our_neb and ref_neb and "value" in our_neb
                and "value" in ref_neb):
            our_neb["vs_reference_e2e"] = round(
                ref_neb["value"] / our_neb["value"], 1)
        headline = by_metric.get(_HEADLINE_METRIC)
        if not (headline and "value" in headline):
            headline = next((e for e in self.extras if "value" in e),
                            {"metric": "bench", "value": 0.0,
                             "unit": "no row completed"})
        headline = dict(headline)
        if interrupted:
            headline["interrupted"] = interrupted
        headline["extras"] = [e for e in self.extras
                              if e.get("metric") != headline.get("metric")]
        print(json.dumps(headline), flush=True)

    def run(self):
        learned = _load_estimates()
        for name, fn, default_est in _ROWS:
            est = learned.get(name, float(default_est))
            remaining = self.deadline - time.monotonic()
            if est * 1.2 > remaining:
                self.emit({"metric": name, "skipped":
                           f"estimated {est:.0f}s > remaining "
                           f"{remaining:.0f}s budget"})
                continue
            t0 = time.monotonic()
            c0 = _CompileCounter.count
            try:
                row = fn()
            except Exception as exc:
                row = {"metric": name, "error": repr(exc)[:300]}
            row["row_wall_s"] = round(time.monotonic() - t0, 1)
            if _CompileCounter.count > c0:
                # compile-cost telemetry (VERDICT r3 item 5): distinct XLA
                # programs this row traced+compiled (persistent-cache hits
                # included — this is the program-count budget, the
                # wall-clock share shows in row_wall_s across runs)
                row["n_xla_programs"] = _CompileCounter.count - c0
            if "error" not in row:
                _save_estimate(name, time.monotonic() - t0)
            self.emit(row)
        self.finalize()


class _CompileCounter(__import__("logging").Handler):
    """Counts 'Compiling ...' log records from jax_log_compiles."""

    count = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            _CompileCounter.count += 1


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 3300))
    bench = _Bench(budget_s)

    # Install the TERM/INT handlers BEFORE the slow jax import: a driver
    # timeout landing during startup must still get the aggregate line.
    def _on_term(signum, _frame):
        bench.finalize(interrupted=f"signal {signum}")
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # Persistent compilation cache: the flagship AutoTS row compiles many
    # distinct f64 programs (~35 min cold on the tunnel); with the cache
    # warm (tools/warm_cache.py, tests and bench runs share the machine)
    # re-runs pay step time only. Content-addressed, so never stale.
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    # cache EVERYTHING including sub-second programs: compiles go through
    # the axon tunnel at ~1 s round-trip each, and the AutoTS pipeline
    # traces ~1000 tiny host-side programs — uncached they dominate its
    # wall-clock (measured: 1222 s, ~85% tunnel latency)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import logging
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax").addHandler(_CompileCounter())

    bench.run()


if __name__ == "__main__":
    main()


