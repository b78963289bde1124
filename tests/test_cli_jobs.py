"""CLI entry points and programmatic Jobs API."""

import os

import numpy as np
import pytest

from multioptpy_tpu.cli import num_parse, run_ircmain, run_optmain
from multioptpy_tpu.io.xyz import format_xyz
from multioptpy_tpu.periodic import UFF_VDW_R

RMIN_ANG = float(UFF_VDW_R[18]) * 0.52917721067


def test_num_parse():
    assert num_parse("1,2,4-7") == [1, 2, 4, 5, 6, 7]
    assert num_parse("3") == [3]


@pytest.fixture
def ar3_xyz(tmp_path):
    coords = np.array([[0.0, 0.0, 0.0], [RMIN_ANG * 1.1, 0.0, 0.0],
                       [RMIN_ANG * 0.5, RMIN_ANG * 0.95, 0.05]])
    p = tmp_path / "ar3.xyz"
    p.write_text(format_xyz(["Ar", "Ar", "Ar"], coords))
    return str(p)


def test_optmain_cli(ar3_xyz, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = run_optmain([ar3_xyz, "-calc", "lj", "-ns", "200", "-tight",
                      "-out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "optimized.xyz"))
    assert os.path.exists(os.path.join(out, "trajectory.xyz"))
    assert os.path.exists(os.path.join(out, "energies.csv"))
    text = capsys.readouterr().out
    assert "converged: True" in text


def test_optmain_with_bias_and_fix(ar3_xyz, tmp_path):
    out = str(tmp_path / "out2")
    rc = run_optmain([ar3_xyz, "-calc", "lj", "-ns", "150", "-fc", "10",
                      "-ma", "50", "1", "2", "-fix", "3", "-out", out])
    # biased run may exit 0 or 1 (convergence), but must produce outputs
    assert os.path.exists(os.path.join(out, "optimized.xyz"))


class TestJobs:
    def test_optimization_job(self, ar3_xyz):
        from multioptpy_tpu.jobs import OptimizationJob

        job = OptimizationJob(ar3_xyz, calculator="lj", method="rfo_fsb",
                              nsteps=150, max_force=1e-6, rms_force=7e-7,
                              max_displacement=1e-4, rms_displacement=7e-5)
        res = job.run()
        assert bool(res.converged)

    def test_neb_job_muller_brown(self):
        import jax.numpy as jnp

        from multioptpy_tpu.calculators.model_surfaces import MB_MIN_A, MB_MIN_C
        from multioptpy_tpu.jobs import NEBJob

        start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
        end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
        job = NEBJob(coords=start, z=np.array([1]),
                     calculator="muller_brown", end_coords=end, n_images=10,
                     variant="neb", n_steps=100, k_spring=5e-4, dt0=0.05,
                     dt_max=0.3, fmax=1e-3)
        res = job.run()
        e = np.asarray(res.energies)
        assert e[res.ts_index] > max(e[0], e[-1])

    def test_md_job(self, ar3_xyz):
        from multioptpy_tpu.jobs import MDJob

        job = MDJob(ar3_xyz, calculator="lj", timestep_fs=2.0, n_steps=50,
                    temperature=30.0, thermostat="langevin")
        res = job.run()
        assert res.trajectory.shape[0] == 50


def test_cli_full_bias_flag_surface(tmp_path):
    """Every reference bias flag is accepted with the reference's syntax
    (ref: interface.py:205-240 parser_for_biasforce) and produces a
    working BiasEngine."""
    import jax.numpy as jnp
    from multioptpy_tpu.cli import _base_parser, _make_bias

    p = _base_parser("test")
    argv = [
        "dummy.xyz",
        "-ma", "100", "1", "2",
        "-rp", "1.0", "1.0", "1", "2", "scale",
        "-rp", "5.0", "2.5", "1", "2", "value",
        "-rpv2", "1.0", "1.0", "1.5", "1.0", "1.0", "12", "6",
        "1,2", "3-4", "scale",
        "-rpg", "4.0", "2.0", "2.0", "3.0", "1.0", "1", "2",
        "-cp", "4.0", "2.5", "90", "1", "2,3,4", "4",
        "-fp", "0.01,0.01,0.02", "2,2,2", "0,0,0", "1-2",
        "-kp", "0.5", "1.5", "1,2",
        "-kpv2", "0.5", "2.0", "1,2", "3,4",
        "-akp", "0.2", "0.5", "1.2", "1,2",
        "-ka", "0.4", "104.5", "1,2,3",
        "-kav2", "0.4", "100", "1", "2", "3,4",
        "-up", "50", "1-3",
        "-kda", "0.2", "60", "1,2,3,4",
        "-kdav2", "0.2", "60", "1", "2", "3", "4",
        "-kdac", "0.2", "3", "60", "1", "2", "3", "4",
        "-kopa", "0.2", "10", "1,2,3,4",
        "-kopav2", "0.2", "10", "1", "2", "3", "4",
        "-vpp", "0.5", "1.0", "0,0,0", "1,2", "2",
        "-brp", "0.5", "0.5", "3.0", "1.0", "1", "2",
        "-wp", "50", "1", "2", "1.0,1.8,4.0,5.0",
        "-wwp", "50", "x", "1.0,1.8,4.0,5.0", "1-3",
        "-vpwp", "50", "0,0,0", "1.0,1.8,4.0,5.0", "1-3",
        "-awp", "50", "1", "1.0,1.8,4.0,5.0", "2-4",
        "-metad", "bond", "5.0", "0.2", "1,2",
        "-lmefp", "500", "1,2", "3,4",
        "-lmefpv2", "500", "1,2",
        "-esp", "0.5", "1", "2",
        "-espap", "0.5", "1,2",
        "-nrp", "8.0", "14.0", "1.5", "0.5", "1.0", "0.5",
    ]
    args = p.parse_args(argv)
    z = np.array([6, 6, 8, 1])
    engine = _make_bias(args, z)
    assert engine is not None and len(engine) >= 28
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [2.4, 0.1, 0.0], [4.4, 2.0, 0.5],
         [5.8, 3.4, -0.7]]))
    e, g = engine.energy_and_gradient(coords)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(g)))


def test_stage_timer_and_profiler_hook(tmp_path):
    """SURVEY §5.1: driver-level per-stage timers + profiler hook."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
    from multioptpy_tpu.logging_utils import StageTimer

    t = StageTimer()
    coords = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 7.6]]))
    optimize(LennardJones(), coords, jnp.array([18, 18]),
             config=OptimizeConfig(nsteps=5), timer=t)
    rep = t.report()
    assert rep["step"]["count"] >= 1
    assert rep["step"]["total_s"] > 0
    csv = os.path.join(tmp_path, "stages.csv")
    t.write_csv(csv)
    lines = open(csv).read().splitlines()
    assert lines[0] == "stage,total_s,count,mean_ms"
    assert any(l.startswith("step,") for l in lines)


def test_nebmain_reference_variant_flags(tmp_path):
    """Reference-syntax NEB switches (-om/-lup/-dneb/.../-qsmv2, -sdneb,
    -aneb, -pitr, in-loop -ad) parse and run (ref: interface.py:243)."""
    from multioptpy_tpu.cli import run_nebmain

    start = tmp_path / "a.xyz"
    end = tmp_path / "b.xyz"
    start.write_text("2\n\nAr 0 0 0\nAr 0 0 3.6\n")
    end.write_text("2\n\nAr 0 0 0\nAr 0 0 4.8\n")
    out = tmp_path / "out"
    rc = run_nebmain([str(start), "-i2", str(end), "-nimg", "6",
                      "-lup", "-sdneb", "-k", "0.02", "-pitr",
                      "-ad", "2", "-ns", "5", "-calc", "lj",
                      "-out", str(out)])
    assert rc == 0
    assert (out / "neb_path.xyz").exists()
    # per-iteration diagnostic CSVs, reference file-for-file
    # (ref: neb.py:865 _save_analysis_data): one appended row per
    # iteration, one column per image
    for name in ("path_length.csv", "energy_plot.csv",
                 "bias_force_rms.csv", "orthogonality.csv",
                 "perp_rms_gradient.csv", "perp_max_gradient.csv"):
        rows = (out / name).read_text().strip().split("\n")
        assert len(rows) == 5, name          # -ns 5 iterations
        assert len(rows[0].split(",")) == 6, name  # 6 images
    pl = [float(v) for v in
          (out / "path_length.csv").read_text().split("\n")[0].split(",")]
    assert pl[0] == 0.0 and all(b >= a for a, b in zip(pl, pl[1:]))

    # -aneb [interpolation_num frequency]: reference in-run densification
    # semantics (interface.py:263 -> drivers.neb.aneb)
    out2 = tmp_path / "out_aneb"
    rc = run_nebmain([str(start), "-i2", str(end), "-nimg", "6",
                      "-aneb", "1", "3", "-ns", "7", "-calc", "lj",
                      "-out", str(out2)])
    assert rc == 0
    assert (out2 / "neb_path.xyz").exists()


def test_ieipmain_pair_discovery(tmp_path):
    """Reference input discovery (ieip.py:250): the positional input may
    be a directory (or prefix) holding *_A.xyz / *_B.xyz; the pair is
    globbed instead of requiring -i2."""
    from multioptpy_tpu.cli import run_ieipmain

    d = tmp_path / "pairdir"
    d.mkdir()
    a = np.array([[0.0, 0.0, 0.0], [RMIN_ANG * 1.05, 0.0, 0.0],
                  [RMIN_ANG * 0.5, RMIN_ANG * 0.95, 0.0]])
    b = np.array([[0.0, 0.0, 0.0], [RMIN_ANG * 1.05, 0.0, 0.0],
                  [RMIN_ANG * 1.6, RMIN_ANG * 0.95, 0.0]])
    (d / "ar3_A.xyz").write_text(format_xyz(["Ar"] * 3, a))
    (d / "ar3_B.xyz").write_text(format_xyz(["Ar"] * 3, b))
    out = str(tmp_path / "out")
    rc = run_ieipmain([str(d), "-calc", "lj", "-ns", "60", "-out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "ts_guess.xyz"))


def test_nebmain_folder_input(tmp_path):
    """Reference folder input (neb.py:1008): a directory of numerically
    ordered *_N.xyz images is the initial NEB path."""
    from multioptpy_tpu.cli import run_nebmain

    d = tmp_path / "imgs"
    d.mkdir()
    a = np.array([[0.0, 0.0, 0.0], [RMIN_ANG * 1.05, 0.0, 0.0],
                  [RMIN_ANG * 0.5, RMIN_ANG * 0.95, 0.0]])
    b = a.copy()
    b[2, 0] += RMIN_ANG * 1.1
    for i in range(11):  # 11 images, two-digit suffixes exercise ordering
        t = i / 10.0
        (d / f"img_{i}.xyz").write_text(
            format_xyz(["Ar"] * 3, a * (1 - t) + b * t))
    out = str(tmp_path / "out")
    rc = run_nebmain([str(d), "-calc", "lj", "-ns", "5", "-out", out])
    assert rc == 0
    from multioptpy_tpu.io import read_trajectory
    _, frames, _ = read_trajectory(os.path.join(out, "neb_path.xyz"))
    assert frames.shape[0] == 11


class TestShapeAndDissociation:
    def test_judge_shape_condition(self):
        from multioptpy_tpu.geometry import judge_shape_condition

        # linear triatomic, 1.0 Ang spacings (in Bohr)
        a2b = 1.0 / 0.52917721067
        c = np.array([[0.0, 0.0, 0.0], [a2b, 0.0, 0.0], [2 * a2b, 0.0, 0.0]])
        # bond 1-2 = 1.0 Ang: "gt 0.5" holds, "gt 1.5" violated
        assert not judge_shape_condition(c, ["0.5", "gt", "1,2"])
        assert judge_shape_condition(c, ["1.5", "gt", "1,2"])
        assert not judge_shape_condition(c, ["1.5", "lt", "1,2"])
        # angle 1-2-3 = 180 deg
        assert not judge_shape_condition(c, ["90", "gt", "1,2,3"])
        assert judge_shape_condition(c, ["90", "lt", "1,2,3"])
        # multiple triples: first holds, second violated
        assert judge_shape_condition(
            c, ["0.5", "gt", "1,2", "0.5", "lt", "2,3"])
        with pytest.raises(ValueError):
            judge_shape_condition(c, ["1.0", "gt"])

    def test_optmain_sc_aborts(self, ar3_xyz, tmp_path):
        """-sc condition violated from the start -> immediate abort, few
        iterations recorded (ref: optimization.py:1871)."""
        from multioptpy_tpu.cli import run_optmain

        out = str(tmp_path / "out_sc")
        run_optmain([ar3_xyz, "-calc", "lj", "-ns", "200",
                     "-sc", "0.1", "lt", "1,2", "-out", out])
        e = np.loadtxt(os.path.join(out, "energies.csv"))
        assert e.ndim == 0 or len(np.atleast_1d(e)) <= 3


def test_opt_fragment_rigid_translation(ar3_xyz, tmp_path):
    """-of: atoms of a fragment share one averaged gradient, so their
    internal geometry is frozen while the fragment still translates
    (ref: optimization.py:1228 calc_fragment_grads)."""
    from multioptpy_tpu.cli import run_optmain
    from multioptpy_tpu.io import read_xyz

    # first-order engine: the reference documents -of as incompatible
    # with quasi-Newton steps (interface.py:177) — with steepest descent
    # the averaged gradient IS the move, giving a rigid translation
    out = str(tmp_path / "out_of")
    run_optmain([ar3_xyz, "-calc", "lj", "-ns", "300", "-o", "sd",
                 "-tight", "-of", "1,2", "-out", out])
    _, before = read_xyz(ar3_xyz)
    _, after = read_xyz(os.path.join(out, "optimized.xyz"))
    d_before = np.linalg.norm(before[0] - before[1])
    d_after = np.linalg.norm(after[0] - after[1])
    # the 1-2 distance is untouched by a pure shared translation
    assert d_after == pytest.approx(d_before, abs=1e-6)
    # but atom 3 relaxed relative to the fragment
    assert np.linalg.norm(after[2] - before[2]) > 1e-3


def test_gfix_freezes_bond_gradient(ar3_xyz, tmp_path):
    """-gfix i,j projects the bond-stretch direction out of the gradient:
    that bond length stays put while the rest relaxes (ref:
    interface.py:90 gradient_fix_atoms)."""
    from multioptpy_tpu.cli import run_optmain
    from multioptpy_tpu.io import read_xyz

    out = str(tmp_path / "out_gfix")
    run_optmain([ar3_xyz, "-calc", "lj", "-ns", "300", "-o", "sd",
                 "-tight", "-gfix", "1,2", "-out", out])
    _, before = read_xyz(ar3_xyz)
    _, after = read_xyz(os.path.join(out, "optimized.xyz"))
    d12b = np.linalg.norm(before[0] - before[1])
    d12a = np.linalg.norm(after[0] - after[1])
    d23b = np.linalg.norm(before[1] - before[2])
    d23a = np.linalg.norm(after[1] - after[2])
    assert d12a == pytest.approx(d12b, abs=1e-6)
    assert abs(d23a - d23b) > 1e-3
