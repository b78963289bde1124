"""LIVE parity wave 25: the iEIP ElasticImagePair engine and the Spring
Pair Method (OtherMethod/elastic_image_pair.py, spring_pair_method.py) —
the reference's own pair-force algebra and full iteration() loops executed
on a shared analytic double-well, side by side with our drivers/ieip.py.

Conventions learned by execution (ref: elastic_image_pair.py):

  * Force helpers pinned exactly (:580-629): N points from the LOWER-
    energy image toward the HIGHER one (the energy_2>energy_1 branch
    flips the argument order, :401-407); Lt = max(0.9 L, L_conv-0.01);
    displacement() normalizes and caps at displacement_limit;
    delta_energy_force returns the SAME vector for both images (called
    with identical arguments, :418-419) and only the composition signs
    differ (+ for image 1, - for image 2, :466-467).
  * `force_R` (:594-597) is DEAD CODE that cannot execute: `min(max(L/
    Lc, 1))` calls min() on a scalar -> TypeError before the undefined
    `self.F_R_convage_criterion` could even raise — pinned with raises.
  * The per-iteration update is plain AdaBelief with NO bias correction
    and a fixed 0.01 learning rate (:472-482, deviating from the cited
    arXiv:2010.07468 which bias-corrects both moments) — pinned by an
    exact replica of iteration 0 (Kabsch align -> pair forces ->
    AdaBelief -> re-align -> Å round trip) to 5e-13.
  * kabsch_algorithm centers BOTH images in place every iteration
    (calc_tools.py:412-424) — the pair drifts to the centroid frame.
  * lbfgs_update (:41-91) is the standard two-loop with +1e-10
    regularized rho/gamma — pinned exactly; but the microiteration
    memory that would feed it stores s in CARTESIAN coordinates against
    y in POLAR gradient differences with a force-convention curvature
    gate (:143-165), and ieipmain defaults to -mi 0 so the whole
    microiteration path is dead by default (interface.py:92).
  * Full iteration() on a 2-atom double well (minima b=1,2, TS b=1.5)
    converges the image distance below the 0.15 Bohr criterion with the
    pair straddling the barrier — and our drivers/ieip.py eip engine
    localizes the same TS on the same PES.

ref: spring_pair_method.py:
  * get_spring_vectors / decompose_gradient pinned exactly; the spring
    targets l_s = max(L_covergence, 0.1) with k = 10.
  * The climbing phase moves ALONG the parallel gradient component
    (`geom += 0.5 * grad_par`, :252-255): for a gradient-convention
    engine this is an uphill walk along the pair axis by construction
    — executed on the double well, both images converge to the barrier
    and the saved average is the saddle.
  * _generate_perturbed_structure displaces every atom by EXACTLY
    `scale` (per-atom normalized noise, :67-77) — pinned.
  * The final structure is written to `{folder}_optimized.xyz` in the
    CURRENT WORKING DIRECTORY, not the output folder (:283-290) —
    pinned via monkeypatched cwd.

Ref anchors: OtherMethod/elastic_image_pair.py:41-91 (lbfgs), :347-576
(iteration), :580-629 (helpers); OtherMethod/spring_pair_method.py:48-77
(helpers), :78-301 (iteration); Utils/calc_tools.py:412 (Kabsch);
drivers/ieip.py (ours).
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _empty_force_data():
    iface = _ref_module("multioptpy.interface")
    p = iface.init_parser()
    p = iface.call_optimizeparser(p)
    p = iface.parser_for_biasforce(p)
    return iface.force_data_parser(p.parse_args(["dummy.xyz"]))


def _bohr2ang():
    return _ref_module("multioptpy.Parameters.unit_values") \
        .UnitValueLib().bohr2angstroms


class _Cfg:
    def __init__(self, tmp_path):
        self.iEIP_FOLDER_DIRECTORY = str(tmp_path) + "/"
        self.bohr2angstroms = _bohr2ang()
        self.hartree2kcalmol = 627.509
        self.microiterlimit = 300
        self.microiter_num = 0
        self.img_distance_convage_criterion = 0.15
        self.L_covergence = 0.03
        self.displacement_limit = 0.04
        self.BETA = 1.0
        self.force_data = _empty_force_data()
        os.makedirs(self.iEIP_FOLDER_DIRECTORY, exist_ok=True)


class _StubGraph:
    def __init__(self, *a, **k):
        pass

    def single_plot(self, *a, **k):
        pass


class _FIO:
    """Captures geometries the engine 'writes to disk' per image."""

    def __init__(self, holder, b2a):
        self.holder = holder
        self.b2a = b2a
        self.history = []

    def make_psi4_input_file(self, geom_list, iter_num):
        rows = geom_list[0][1:]
        ang = np.array([[float(v) for v in row[1:]] for row in rows])
        self.holder["geom"] = ang / self.b2a
        self.history.append(self.holder["geom"].copy())
        return f"fake_{iter_num}"

    def make_traj_file_for_DM(self, *a, **k):
        pass

    def argrelextrema_txt_save(self, *a, **k):
        pass


class _SP:
    """Gradient-convention single_point on an analytic PES."""

    def __init__(self, holder, efunc, gfunc):
        self.holder = holder
        self.efunc = efunc
        self.gfunc = gfunc

    def single_point(self, fdir, el, it, cm, me):
        x = np.asarray(self.holder["geom"], float)
        return (float(self.efunc(x)), np.asarray(self.gfunc(x)), x.copy(),
                False)


def _doublewell():
    def e(x):
        b = np.linalg.norm(x[1] - x[0])
        return ((b - 1.5) ** 2 - 0.25) ** 2

    def g(x):
        b = np.linalg.norm(x[1] - x[0])
        dEdb = 4.0 * ((b - 1.5) ** 2 - 0.25) * (b - 1.5)
        u = (x[1] - x[0]) / b
        gr = np.zeros_like(x)
        gr[0] = -dEdb * u
        gr[1] = dEdb * u
        return gr

    return e, g


def _make_eip(tmp_path):
    mod = _ref_module("multioptpy.OtherMethod.elastic_image_pair")
    mod.Graph = _StubGraph
    return mod.ElasticImagePair(_Cfg(tmp_path))


# ------------------------------------------------------------- helpers

def test_eip_force_helpers_exact(tmp_path):
    eip = _make_eip(tmp_path)
    rng = np.random.default_rng(3)
    g1 = rng.normal(size=(3, 3))
    g2 = rng.normal(size=(3, 3))
    grad = rng.normal(size=(3, 3))

    L = np.linalg.norm(g2 - g1) + 1e-10
    np.testing.assert_allclose(eip.dist_2imgs(g1, g2), L, rtol=0)
    N = (g2 - g1) / L
    np.testing.assert_allclose(eip.norm_dist_2imgs(g1, g2), N, atol=1e-15)
    np.testing.assert_allclose(eip.target_dist_2imgs(L),
                               max(L * 0.9, 0.03 - 0.01), rtol=0)

    # displacement: normalized force capped at the limit
    f = grad * 10
    n = np.linalg.norm(f)
    np.testing.assert_allclose(eip.displacement(f),
                               f / (n + 1e-10) * min(n, 0.04), atol=1e-15)
    np.testing.assert_allclose(eip.displacement_prime(f),
                               f / (n + 1e-10) * 0.04, atol=1e-15)

    # perpendicular force
    gf, Nf = grad.reshape(-1), N.reshape(-1)
    expect = (gf - np.dot(gf, Nf) * Nf).reshape(3, 3)
    np.testing.assert_allclose(eip.perpendicular_force(grad, N), expect,
                               atol=1e-14)

    # energy-difference force: same vector regardless of image
    d = eip.delta_energy_force(-1.2, -1.5, N, L)
    np.testing.assert_allclose(d, N * 0.3 / L, atol=1e-15)

    ct = eip.close_target_force(L, 0.9 * L, g1, g2)
    np.testing.assert_allclose(ct, (g2 - g1) * (L - 0.9 * L) / L, atol=1e-14)


def test_eip_force_R_is_dead_code(tmp_path):
    eip = _make_eip(tmp_path)
    with pytest.raises(TypeError):
        eip.force_R(1.0)


def test_eip_lbfgs_update_exact_two_loop(tmp_path):
    eip = _make_eip(tmp_path)
    rng = np.random.default_rng(11)
    n = 12
    s_list = [rng.normal(size=n) for _ in range(4)]
    y_list = [rng.normal(size=n) for _ in range(4)]
    grad = rng.normal(size=n)

    got = eip.lbfgs_update(s_list, y_list, grad.copy())

    q = grad.copy()
    k = len(s_list)
    rhos = [1.0 / (np.dot(y_list[i], s_list[i]) + 1e-10) for i in range(k)]
    alphas = np.zeros(k)
    for i in range(k - 1, -1, -1):
        alphas[i] = rhos[i] * np.dot(s_list[i], q)
        q = q - alphas[i] * y_list[i]
    gamma = np.dot(s_list[-1], y_list[-1]) / (np.dot(y_list[-1],
                                                     y_list[-1]) + 1e-10)
    r = gamma * q
    for i in range(k):
        beta = rhos[i] * np.dot(y_list[i], r)
        r = r + s_list[i] * (alphas[i] - beta)
    np.testing.assert_allclose(got, -r, atol=1e-13)

    # empty memory -> plain steepest descent on the passed vector
    np.testing.assert_allclose(eip.lbfgs_update([], [], grad), -grad,
                               atol=0)


# ------------------------------------------------- full iteration, EIP

def _ct_kabsch(a, b):
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    return ct.kabsch_algorithm(a.copy(), b.copy())


def test_eip_iteration0_exact_replica(tmp_path):
    eip = _make_eip(tmp_path)
    e, g = _doublewell()
    h1, h2 = {"geom": None}, {"geom": None}
    sp1, sp2 = _SP(h1, e, g), _SP(h2, e, g)
    b2a = eip.config.bohr2angstroms
    fio1, fio2 = _FIO(h1, b2a), _FIO(h2, b2a)
    g1_0 = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    g2_0 = np.array([[0.0, 0.0, 0.0], [1.05, 0.0, 0.0]])
    h1["geom"], h2["geom"] = g1_0.copy(), g2_0.copy()
    eip.config.microiterlimit = 1       # run exactly iteration 0
    with contextlib.redirect_stdout(io.StringIO()):
        eip.iteration("d1", "d2", sp1, sp2, ["H", "H"], [0, 1], [0, 1],
                      fio1, fio2)
    assert len(fio1.history) == 1 and len(fio2.history) == 1

    # ---- replica of iteration 0
    g1, g2 = _ct_kabsch(g1_0, g2_0)
    e1, e2 = e(g1), e(g2)
    gr1, gr2 = g(g1), g(g2)
    if e2 > e1:
        L = np.linalg.norm(g2 - g1) + 1e-10
        N = (g2 - g1) / L
    else:
        L = np.linalg.norm(g1 - g2) + 1e-10
        N = (g1 - g2) / L
    Lt = max(L * 0.9, 0.03 - 0.01)

    def disp(f):
        n = np.linalg.norm(f)
        return f / (n + 1e-10) * min(n, 0.04)

    fd1, fd2 = disp(gr1), disp(gr2)
    Nf = N.reshape(-1)
    pf1 = (gr1.reshape(-1) - np.dot(gr1.reshape(-1), Nf) * Nf).reshape(2, 3)
    pf2 = (gr2.reshape(-1) - np.dot(gr2.reshape(-1), Nf) * Nf).reshape(2, 3)
    de = N * abs(e1 - e2) / L
    ct = (g2 - g1) * (L - Lt) / L
    pd1, pd2 = disp(pf1), disp(pf2)
    ded1, ded2 = disp(de), disp(de)
    ctd = disp(ct)

    td1 = -pd1 + ded1 + ctd - fd1
    td2 = -pd2 - ded2 - ctd - fd2
    m1 = 0.1 * td1
    m2 = 0.1 * td2
    v1 = 0.001 * (td1 - m1) ** 2
    v2 = 0.001 * (td2 - m2) ** 2
    new1 = g1 + 0.01 * (m1 / (np.sqrt(v1) + 1e-8))
    new2 = g2 + 0.01 * (m2 / (np.sqrt(v2) + 1e-8))
    new1, new2 = _ct_kabsch(new1, new2)
    # engine round-trips through Å before the fake SP sees it
    np.testing.assert_allclose(fio1.history[0], (new1 * b2a) / b2a,
                               atol=5e-13)
    np.testing.assert_allclose(fio2.history[0], (new2 * b2a) / b2a,
                               atol=5e-13)


def test_eip_full_run_brackets_the_barrier_and_ours_agrees(tmp_path):
    eip = _make_eip(tmp_path)
    e, g = _doublewell()
    h1, h2 = {"geom": None}, {"geom": None}
    sp1, sp2 = _SP(h1, e, g), _SP(h2, e, g)
    b2a = eip.config.bohr2angstroms
    fio1, fio2 = _FIO(h1, b2a), _FIO(h2, b2a)
    h1["geom"] = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    h2["geom"] = np.array([[0.0, 0.0, 0.0], [1.05, 0.0, 0.0]])
    with contextlib.redirect_stdout(io.StringIO()):
        eip.iteration("d1", "d2", sp1, sp2, ["H", "H"], [0, 1], [0, 1],
                      fio1, fio2)
    assert not os.path.isfile(eip.config.iEIP_FOLDER_DIRECTORY
                              + "not_converged.txt")
    f1, f2 = fio1.history[-1], fio2.history[-1]
    bond = lambda x: np.linalg.norm(x[1] - x[0])
    assert np.linalg.norm(f2 - f1) < 0.15          # met its criterion
    mid_b = bond((f1 + f2) / 2)
    assert 1.35 < mid_b < 1.65                     # straddles the TS

    # ours on the same PES
    from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip

    class _PES:
        def energy_and_gradient(self, x, z):
            b = jnp.linalg.norm(x[1] - x[0])
            en = ((b - 1.5) ** 2 - 0.25) ** 2
            gr = jax.grad(lambda xx: ((jnp.linalg.norm(xx[1] - xx[0])
                                       - 1.5) ** 2 - 0.25) ** 2)(x)
            return en, gr

    res = ieip(_PES(), jnp.asarray(h1["geom"]) * 0 + jnp.array(
        [[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]]),
        jnp.array([[0.0, 0.0, 0.0], [1.05, 0.0, 0.0]]),
        jnp.array([1, 1]), config=IEIPConfig(engine="eip"))
    b_ts = float(jnp.linalg.norm(res.ts_guess[1] - res.ts_guess[0]))
    assert abs(b_ts - 1.5) < 0.1


# ------------------------------------------------------------------ SPM

def _make_spm(tmp_path):
    mod = _ref_module("multioptpy.OtherMethod.spring_pair_method")
    mod.Graph = _StubGraph
    return mod.SpringPairMethod(_Cfg(tmp_path))


def test_spm_helpers_exact(tmp_path):
    spm = _make_spm(tmp_path)
    assert spm.l_s == max(0.03, 0.1) == 0.1
    rng = np.random.default_rng(5)
    g1 = rng.normal(size=(3, 3))
    g2 = rng.normal(size=(3, 3))
    d, v = spm.get_spring_vectors(g1, g2)
    np.testing.assert_allclose(d, np.linalg.norm(g2 - g1), rtol=0)
    np.testing.assert_allclose(v, (g2 - g1) / d, atol=1e-15)

    grad = rng.normal(size=(3, 3))
    par, perp = spm.decompose_gradient(grad, v)
    mag = np.dot(grad.reshape(-1), v.reshape(-1))
    np.testing.assert_allclose(par, mag * v, atol=1e-14)
    np.testing.assert_allclose(perp, grad - mag * v, atol=1e-14)

    np.random.seed(42)
    pert = spm._generate_perturbed_structure(g1, 0.1)
    # every atom moved by exactly the scale
    np.testing.assert_allclose(np.linalg.norm(pert - g1, axis=1), 0.1,
                               rtol=1e-8)


def test_spm_full_run_finds_the_saddle(tmp_path, monkeypatch):
    spm = _make_spm(tmp_path)
    spm.config.microiterlimit = 40
    e, g = _doublewell()
    h = {"geom": None}
    sp = _SP(h, e, g)
    fio = _FIO(h, spm.config.bohr2angstroms)
    h["geom"] = np.array([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0]])
    np.random.seed(7)
    monkeypatch.chdir(tmp_path)       # the output xyz lands in CWD
    with contextlib.redirect_stdout(io.StringIO()):
        spm.iteration("d1", sp, ["H", "H"], [0, 1], fio)
    out = os.path.join(str(tmp_path),
                       os.path.basename(os.path.normpath(
                           spm.config.iEIP_FOLDER_DIRECTORY))
                       + "_optimized.xyz")
    assert os.path.isfile(out), "optimized xyz written to CWD"
    with open(out) as f:
        lines = f.read().strip().splitlines()
    xyz = np.array([[float(v) for v in ln.split()[1:]] for ln in lines[2:]])
    b = np.linalg.norm(xyz[1] - xyz[0]) / spm.config.bohr2angstroms
    assert abs(b - 1.5) < 0.1, f"saddle bond {b}"
