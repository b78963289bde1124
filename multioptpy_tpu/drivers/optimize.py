"""Geometry-optimization driver: pytree state + one jitted step function.

TPU-native redesign of the reference's file-driven main loop
(ref: multioptpy/optimization.py:1862-2100): instead of writing an xyz per
iteration and re-parsing it (optimization.py:319), the whole step — energy/
gradient (+bias), quasi-Newton Hessian update, TR/rot projection, RS-RFO or
first-order step, convergence check, trust-radius control — is ONE compiled
XLA program over a `OptState` pytree. Ensembles run the same step `vmap`ped
over a leading batch axis with convergence masking (converged members idle at
zero step), which is the TPU replacement for the reference's sequential
conformer loops (SURVEY §2.7).

Modes:
* `optimize()` — host loop around the jitted step: early exit, per-iteration
  history, works with host-callback QM backends.
* `optimize_batch()` — fixed-step `lax.scan`, fully on device, batched.

Convergence semantics mirror the reference exactly
(ref: optimization.py:1240-1290 ConvergenceChecker: Gaussian-style 4
criteria with force-coupled displacement thresholds, masked RMS).
"""

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.geometry import project_gradient_tr_rot, tr_rot_projector
from multioptpy_tpu.hessian.updates import auto_scale, update_hessian
from multioptpy_tpu.steppers.first_order import (
    cg_init,
    cg_step,
    fire_init,
    fire_step,
    fire2_step,
    abc_fire_step,
    lbfgs_init,
    lbfgs_step,
    sd_step,
)
from multioptpy_tpu.steppers.rfo import (
    rs_prfo_step,
    rs_rfo_step,
    update_trust_radius,
)
from multioptpy_tpu.units import ANGSTROM2BOHR


@dataclasses.dataclass(frozen=True)
class OptimizeConfig:
    """Driver configuration (defaults = reference defaults).

    ref: optimization.py:129-132 (criteria), interface.py:147 (NSTEP),
    optimizer.py:281-303 (trust radii, Angstrom).
    """

    method: str = "rfo_fsb"          # rfo_<update> | fire | fire2 | abc_fire
                                     # | lbfgs | cg_<variant> | sd
    nsteps: int = 1000
    saddle_order: int = 0
    max_force: float = 3e-4          # Hartree/Bohr
    rms_force: float = 2e-4
    max_displacement: float = 1.5e-3  # Bohr (a.u., as in the reference)
    rms_displacement: float = 1e-3
    trust_radius_ang: Optional[float] = None  # default 0.5 (min) / 0.1 (saddle)
    trust_radius_min_ang: float = 0.01
    delta: float = 1.0               # first-order step scale
    fc_count: int = -1               # exact Hessian every k steps (-1: never)
    mfc_count: int = -1              # model-Hessian rebuild cadence
                                     # (ref: optimization.py:1884 mFC_COUNT)
    init_hessian: str = "auto"       # auto | exact | identity | model:<kind>
    use_gdiis: bool = False          # GDIIS extrapolation on top of the
                                     # quasi-Newton step (ref: optimizer.py
                                     # enhancement chain :328-387)
    diis_variant: Optional[str] = None  # gdiis | gediis | kdiis | ediis |
                                     # adiis | c2diis (overrides use_gdiis;
                                     # ref: Optimizer/{gdiis,gediis,kdiis,
                                     # ediis,adiis,c2diis}.py)
    follow_mode_index: int = 0       # initial mode for mf_rsirfo_* methods
                                     # (ref: Optimizer/mf_rsirfo.py)
    eigh_impl: str = "xla"           # "xla" | "jacobi" — eigensolver for the
                                     # RFO step (jacobi: batched round-robin
                                     # Jacobi, ~1.7x faster than the EighTpu
                                     # custom call for small batched
                                     # Hessians; see ops/jacobi.py)
    switch_method: Optional[str] = None  # high-force first-order engine for
                                     # sigmoid RMS-force switching toward
                                     # `method` near convergence
                                     # (ref: optimizer.py:582
                                     # switch_move_vector; CLI: -o m1 m2)
    project_tr_rot: bool = True
    scan_chunk: int = 0              # >1: run this many steps per device
                                     # dispatch via lax.scan (host-side
                                     # early exit / guards checked at chunk
                                     # boundaries). 0/1 = per-step host
                                     # loop. On the tunneled single-chip
                                     # setup each blocking per-step
                                     # dispatch costs ~1 s round-trip —
                                     # chunking is what makes small-system
                                     # pipelines (AutoTS) latency-
                                     # competitive with an in-process
                                     # driver.

    def effective_diis(self):
        return self.diis_variant or ("gdiis" if self.use_gdiis else None)

    def initial_trust_bohr(self):
        tr = self.trust_radius_ang
        if tr is None:
            tr = 0.1 if self.saddle_order > 0 else 0.5
        return tr * ANGSTROM2BOHR

    def criteria(self, tight=False, loose=False):
        if tight:
            return (1.5e-5, 1e-5, 6e-5, 4e-5)
        if loose:
            return (3e-3, 2e-3, 1e-2, 7e-3)
        return (self.max_force, self.rms_force,
                self.max_displacement, self.rms_displacement)


class OptState(NamedTuple):
    coords: jnp.ndarray        # (N,3) Bohr
    energy: jnp.ndarray        # scalar (bias-included)
    gradient: jnp.ndarray      # (N,3) effective gradient
    raw_gradient: jnp.ndarray  # (N,3) unbiased gradient (Hessian updates)
    prev_coords: jnp.ndarray
    prev_energy: jnp.ndarray
    prev_raw_gradient: jnp.ndarray
    hessian: jnp.ndarray       # (3N,3N)
    trust_radius: jnp.ndarray  # scalar, Bohr
    predicted_change: jnp.ndarray
    move: jnp.ndarray          # (N,3) last displacement
    iteration: jnp.ndarray     # int32
    converged: jnp.ndarray     # bool
    fo_state: tuple            # first-order engine state (or ())


def _masked_rms(v, thresh=1e-10):
    """RMS over components with |v| > thresh (ref: optimization.py:1245)."""
    mask = jnp.abs(v) > thresh
    n = jnp.sum(mask)
    s = jnp.sum(jnp.where(mask, v * v, 0.0))
    return jnp.sqrt(s / jnp.maximum(n, 1))


def check_convergence(gradient, displacement, criteria):
    """Four Gaussian-style criteria with force-coupled displacement
    thresholds (ref: optimization.py:1252-1290)."""
    max_f_th, rms_f_th, max_d_th, rms_d_th = criteria
    g = gradient.reshape(-1)
    d = displacement.reshape(-1)
    max_force = jnp.max(jnp.abs(g))
    rms_force = _masked_rms(g)
    max_disp = jnp.max(jnp.abs(d))
    rms_disp = _masked_rms(d)
    d_max_th = max_d_th + jnp.maximum(0.0, max_f_th - max_force)
    d_rms_th = rms_d_th + jnp.maximum(0.0, rms_f_th - rms_force)
    return ((max_force < max_f_th) & (rms_force < rms_f_th)
            & (max_disp < d_max_th) & (rms_disp < d_rms_th))


def _parse_method(method):
    m = method.lower()
    # "trim" anywhere in a quasi-Newton method name activates the TRIM
    # step replacement (ref: optimizer.py:384 `"trim" in lower_m`); the
    # flag itself is read off config.method by make_step_fn
    m = m.replace("_trim", "")
    # reference method-string aliases (ref: optimizer.py:68-255
    # quasi_newton_mapping, e.g. "rsirfo_fsb", "rsprfo_bofill")
    if m.startswith("dic_rsirfo"):
        # delocalized-internal-coordinate RS-I-RFO
        # (ref: Optimizer/dic_rsirfo.py:8); the dic flag is read off
        # config.method by make_step_fn/init_state
        m = "rfo" + m[len("dic_rsirfo"):]
    if m.startswith("crsirfo"):
        # constrained RS-I-RFO: null-space reduced solve
        # (ref: Optimizer/crsirfo.py:5); the crs flag is read off
        # config.method by make_step_fn
        m = "rfo" + m[len("crsirfo"):]
    if m.startswith("smf_rsirfo"):
        # STATIC mode-following (ref: optimizer.py:68 's'-prefixed keys,
        # Optimizer/mf_rsirfo.py static variant): same engine as mf; the
        # followed mode starts from config.follow_mode_index either way and
        # max-overlap tracking keeps a static mode static on smooth paths
        m = "prfo" + m[len("smf_rsirfo"):]
    if m.startswith("mf_rsirfo"):
        # mode-following RS-I-RFO (ref: Optimizer/mf_rsirfo.py:6): a
        # P-RFO that maximizes along the max-overlap mode
        m = "prfo" + m[len("mf_rsirfo"):]
    if m.startswith("rsirfo"):
        m = "rfo" + m[len("rsirfo"):]
    if m.startswith("rsprfo"):
        m = "prfo" + m[len("rsprfo"):]
    if m.startswith("prfo"):
        update = m.split("_", 1)[1] if "_" in m else "auto"
        return ("prfo", update)
    if m.startswith("rfo"):
        update = m.split("_", 1)[1] if "_" in m else "auto"
        return ("rfo", update)
    if m.startswith("cg"):
        variant = m.split("_", 1)[1] if "_" in m else "pr"
        return ("cg", variant)
    if m == "tr_lbfgs":
        # trust-region L-BFGS (ref: Optimizer/tr_lbfgs.py): L-BFGS direction
        # with ratio-adaptive trust clamping
        return ("lbfgs", "tr")
    if m in ("fire", "fire2", "abc_fire", "lbfgs", "sd", "eve", "gan", "rl",
             "mwsd", "gpmin"):
        return (m, None)
    if m.startswith("mw"):
        # mass-weighted quasi-Newton variants (ref: optimizer.py:68-255
        # mw/mwmf/mws prefixes); the mw flag is read off config.method
        return _parse_method(m[2:])
    from multioptpy_tpu.steppers.ml import OPTAX_STEPPERS
    if m in OPTAX_STEPPERS:
        return ("optax", m)
    raise ValueError(f"unknown optimization method '{method}'")


def _dic_diag_hessian(ic, dtype):
    """Baker-style diagonal primitive-space guess: 0.5 / 0.2 / 0.1 Hartree
    per Bohr^2/rad^2 for stretches/bends/torsions (ref: dic_rsirfo.py
    initial Hessian)."""
    nb, na, nt = len(ic.bonds), len(ic.angles), len(ic.torsions)
    nl = 2 * len(ic.linear_bends)   # linear-bend pairs: bend-like stiffness
    return jnp.diag(jnp.asarray(
        np.concatenate([np.full(nb, 0.5), np.full(na, 0.2),
                        np.full(nt, 0.1), np.full(nl, 0.2)]), dtype))


def init_state(coords, z, calc, bias_engine=None, config=OptimizeConfig(),
               hessian0=None, internals=None):
    """Build the initial OptState (evaluates one energy/gradient).

    `internals` (an InternalCoordinates with static primitives) switches the
    quasi-Newton machinery into DIC space for dic_rsirfo_* methods."""
    coords = jnp.asarray(coords)
    n = coords.shape[0]
    dtype = coords.dtype
    # one compiled program for the first eval (eager op-by-op dispatch is
    # ~free on a local chip but dominated driver glue on the tunneled
    # setup — see ops/hosteval.py)
    from multioptpy_tpu.ops import hosteval
    e, g, raw_g = hosteval.eg_with_raw(calc, coords, z, bias_engine)

    if hessian0 is None:
        kind0, _ = _parse_method(config.method)
        use_exact = (config.init_hessian == "exact"
                     or (config.init_hessian == "auto" and calc.on_device))
        if kind0 != "rfo":
            hessian0 = jnp.eye(3 * n, dtype=dtype)
        elif config.init_hessian.startswith("model:"):
            # model guess Hessian (ref: ModelHessian/approx_hessian.py:30)
            from multioptpy_tpu.hessian.model import model_hessian
            hessian0 = model_hessian(coords, np.asarray(z),
                                     kind=config.init_hessian.split(":", 1)[1],
                                     gradient=raw_g)
        elif use_exact:
            # cheap for on-device backends; spares quasi-Newton the many
            # steps needed to learn a wide curvature spectrum from identity
            hessian0 = hosteval.hessian(calc, coords, z, bias_engine)
        else:
            hessian0 = jnp.eye(3 * n, dtype=dtype)

    kind, sub = _parse_method(config.method)
    if kind == "fire" or kind == "fire2" or kind == "abc_fire":
        fo = (fire_init(3 * n, dtype),)
    elif kind == "lbfgs":
        fo = (lbfgs_init(3 * n, dtype=dtype),)
    elif kind == "cg":
        fo = (cg_init(3 * n, dtype),)
    elif kind == "eve":
        from multioptpy_tpu.steppers.ml import eve_init
        fo = (eve_init(3 * n, dtype=dtype),)
    elif kind == "gan":
        from multioptpy_tpu.steppers.learned import gan_init
        fo = (gan_init(3 * n, dtype=dtype),)
    elif kind == "rl":
        from multioptpy_tpu.steppers.learned import rl_init
        fo = (rl_init(3 * n, dtype=dtype),)
    elif kind == "gpmin":
        # GP surrogate minimizer in inverse-distance descriptor space
        # (ref: Optimizer/gpmin.py:7; descriptors gpmin.py:223)
        from multioptpy_tpu.steppers.gp import gp_init, inv_dist_descriptor
        _, n_feat = inv_dist_descriptor(n)
        fo = (gp_init(n_feat, dtype=dtype),)
    elif kind == "optax":
        from multioptpy_tpu.steppers.ml import optax_init
        fo = (optax_init(sub, 3 * n, dtype=dtype),)
    elif kind in ("rfo", "prfo") and sub.startswith("block"):
        from multioptpy_tpu.hessian.block_updates import block_window_init
        fo = (block_window_init(3 * n, dtype=dtype),)
    else:
        fo = ()
    if internals is not None and config.method.lower().startswith("dic"):
        # q-space quasi-Newton state: primitive Hessian + previous q-space
        # gradient and values (ref: Optimizer/dic_rsirfo.py histories)
        q0 = internals.q_flat(coords.reshape(-1))
        b0 = internals.b_matrix(coords)
        g_q0 = internals.g_pinv(internals.g_matrix(b0)) @ (b0 @ g.reshape(-1))
        fo = fo + (_dic_diag_hessian(internals, dtype), g_q0, q0)
    if config.method.lower().replace("mw", "", 1).startswith("mf_rsirfo"):
        # initial followed mode (ref: Optimizer/mf_rsirfo.py Initialization)
        from multioptpy_tpu.steppers.enhancements import (
            mode_following_direction)
        mode0, _ = mode_following_direction(jnp.asarray(hessian0, dtype),
                                            index=config.follow_mode_index)
        fo = fo + (mode0,)
    dv = config.effective_diis()
    if (kind in ("rfo", "prfo") and dv
            and not config.method.lower().startswith("dic")):
        from multioptpy_tpu.steppers.diis import (diis_init, gediis_init,
                                                  kdiis_init)
        # ediis/adiis/c2diis share the gediis history state
        # (ref: Optimizer/{ediis,adiis,c2diis}.py)
        ini = {"gdiis": diis_init, "gediis": gediis_init,
               "kdiis": kdiis_init, "ediis": gediis_init,
               "adiis": gediis_init, "c2diis": gediis_init}[dv]
        fo = fo + (ini(3 * n, dtype=dtype),)

    if config.switch_method:
        # RMS-force engine switching (ref: optimizer.py:582): the high-force
        # first-order engine gets its own state slot at the END of fo_state
        if dv:
            raise ValueError("switch_method does not compose with DIIS")
        sk, _ = _parse_method(config.switch_method)
        if sk in ("fire", "fire2", "abc_fire"):
            fo = fo + (fire_init(3 * n, dtype),)
        elif sk in ("sd", "mwsd"):
            fo = fo + (jnp.zeros((0,), dtype),)   # stateless placeholder
        else:
            raise ValueError("switch_method must be a first-order engine "
                             "(fire/fire2/abc_fire/sd/mwsd)")

    zero = jnp.zeros_like(coords)
    return OptState(
        coords=coords, energy=e, gradient=g, raw_gradient=raw_g,
        prev_coords=coords, prev_energy=e, prev_raw_gradient=raw_g,
        hessian=jnp.asarray(hessian0, dtype),
        trust_radius=jnp.asarray(config.initial_trust_bohr(), dtype),
        predicted_change=jnp.asarray(0.0, dtype),
        move=zero, iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False), fo_state=fo,
    )


def make_step_fn(calc, z, bias_engine=None, config=OptimizeConfig(),
                 model_hessian_fn=None, constraints=None,
                 constraint_targets=None, internals=None):
    """Build the jitted `state -> state` transition.

    The returned function is pure and traceable: vmap it for ensembles,
    scan it for fully-on-device trajectories.
    """
    kind, sub = _parse_method(config.method)
    is_dic = internals is not None and config.method.lower().startswith("dic")
    if is_dic and sub.startswith("block"):
        raise ValueError("dic_rsirfo does not compose with block updates")
    criteria = config.criteria()
    saddle_order = config.saddle_order
    tr_max = config.initial_trust_bohr()
    tr_min = config.trust_radius_min_ang * ANGSTROM2BOHR

    def energy_gradient(coords):
        e, g = calc.energy_and_gradient(coords, z)
        raw_g = g
        if bias_engine is not None and len(bias_engine):
            be, bg = bias_engine.energy_and_gradient(coords)
            e, g = e + be, g + bg
        return e, g, raw_g

    def exact_hessian(coords):
        h = calc.hessian(coords, z)
        if bias_engine is not None and len(bias_engine):
            h = h + bias_engine.hessian(coords)
        return h

    def dic_move(state, g_flat):
        """RS-I-RFO in delocalized internal coordinates (ref:
        Optimizer/dic_rsirfo.py:8): primitive-space quasi-Newton Hessian,
        RFO solved in the Baker active space U (nonzero-eigenvalue
        eigenvectors of G = B B^T), fixed-iteration Gauss-Newton
        back-transform. All shapes static; torsion differences wrapped."""
        ic = internals
        coords = state.coords
        dtype = g_flat.dtype
        q_now = ic.q_flat(coords.reshape(-1))
        b = ic.b_matrix(coords)
        ginv = ic.g_pinv(ic.g_matrix(b))
        g_q = ginv @ (b @ g_flat)
        h_q, g_q_prev, q_prev = state.fo_state

        is_torsion = ic.torsion_mask()
        s_q = q_now - q_prev
        s_q = jnp.where(is_torsion,
                        jnp.arctan2(jnp.sin(s_q), jnp.cos(s_q)), s_q)
        y_q = g_q - g_q_prev
        have_pair = (state.iteration > 0) & (jnp.linalg.norm(s_q) > 1e-12)
        h_upd = update_hessian(h_q, s_q, y_q, sub)
        h_q = jnp.where(have_pair, h_upd, h_q)
        if config.fc_count > 0 and calc.on_device:
            rebuild = (state.iteration % config.fc_count) == 0
            h_exact_q = ic.internal_hessian_from_cart(
                exact_hessian(coords), g_flat.reshape(-1, 3), coords)
            h_q = jnp.where(rebuild, h_exact_q, h_q)

        # Baker active space: RFO in the nonredundant subspace
        u, keep = ic.delocalized_basis(coords)
        g_u = (u.T @ g_q) * keep
        h_u = u.T @ h_q @ u
        h_u = 0.5 * (h_u + h_u.T) + jnp.diag((~keep).astype(dtype))

        actual = state.energy - state.prev_energy
        trust_new = update_trust_radius(
            state.trust_radius, actual, state.predicted_change,
            tr_min=tr_min, tr_max=tr_max)
        trust_new = jnp.where(state.iteration > 0, trust_new,
                              state.trust_radius)
        step_u, aux = rs_rfo_step(g_u, h_u, trust_new,
                                  saddle_order=saddle_order)
        dq = u @ step_u
        x_new = ic.to_cartesian(q_now + dq, coords)
        mv = (x_new - coords).reshape(-1)
        # guard: a failed back-transform (huge Cartesian move from a modest
        # dq) falls back to the projected-gradient direction
        ok = (jnp.all(jnp.isfinite(mv))
              & (jnp.linalg.norm(mv) < 10.0 * trust_new + 1e-2))
        sd = -g_flat
        sd_n = jnp.linalg.norm(sd)
        sd = jnp.where(sd_n > trust_new,
                       sd * (trust_new / jnp.maximum(sd_n, 1e-30)), sd)
        mv = jnp.where(ok, mv, sd)
        return (mv, state.hessian, trust_new,
                aux["predicted_energy_change"], (h_q, g_q, q_now))

    def quasi_newton_move(state, g_flat):
        n3 = g_flat.shape[0]
        s = (state.coords - state.prev_coords).reshape(-1)
        y = (state.raw_gradient - state.prev_raw_gradient).reshape(-1)
        have_pair = (state.iteration > 0) & (jnp.linalg.norm(s) > 1e-12)
        is_identity = jnp.all(state.hessian == jnp.eye(n3, dtype=g_flat.dtype))
        h = auto_scale(state.hessian, s, y, is_identity & have_pair)
        if sub.startswith("block"):
            # multi-secant window update (ref: block_hessian_update.py:23)
            from multioptpy_tpu.hessian.block_updates import (
                block_update_hessian)
            win = state.fo_state[0]
            h_upd, win_new = block_update_hessian(h, win, s, y, sub)
            h = jnp.where(have_pair, h_upd, h)
            win_out = jax.tree_util.tree_map(
                lambda a, b: jnp.where(have_pair, a, b), win_new, win)
            qn_fo = (win_out,)
        else:
            h_upd = update_hessian(h, s, y, sub)
            h = jnp.where(have_pair, h_upd, h)
            qn_fo = ()
        if config.fc_count > 0 and calc.on_device:
            # periodic exact Hessian rebuild, branchless
            # (ref: optimization.py:1884 FC_COUNT exact-Hessian cadence)
            rebuild = (state.iteration % config.fc_count) == 0
            h = jnp.where(rebuild, exact_hessian(state.coords), h)
        if config.mfc_count > 0 and model_hessian_fn is not None:
            # periodic model-Hessian rebuild (ref: optimization.py:1884)
            rebuild = (state.iteration % config.mfc_count) == 0
            # ref passes raw_gradient into ApproxHessian.main
            # (optimization.py:1903) — the lindh2007d* damp factor reads it
            h = jnp.where(rebuild,
                          model_hessian_fn(state.coords, state.raw_gradient),
                          h)

        # effective Hessian: TR/rot projected (ref: rsirfo.py:353), with
        # the projected-out subspace SHIFTED to +1e3 instead of left at 0.
        # The step is unchanged — the projected gradient has machine-zero
        # TR/rot components, so those modes contribute g~^2/(lambda-s) ~
        # 1e-32 to the RS-RFO secular equation either way — but the
        # 6-fold-degenerate ZERO block is exactly what breaks the TPU's
        # float-float-emulated QR eigh (measured: the batched NaN rescue
        # fired nearly every step on projected Hessians, 0.025 -> 0.25
        # ms/structure; the same structure caused the round-3 flagship
        # NaN diagnosis). Shifted to the top of the spectrum, TR/rot can
        # also never be chosen as saddle modes (the reference instead
        # filters small eigenvalues per-solve, rsirfo.py:265).
        if config.project_tr_rot and state.coords.shape[0] > 1:
            p = tr_rot_projector(state.coords)
            h_eff = p.T @ h @ p
            h_eff = 0.5 * (h_eff + h_eff.T)
            eye = jnp.eye(h_eff.shape[0], dtype=h_eff.dtype)
            h_eff = h_eff + 1e3 * (eye - p)
        else:
            h_eff = h
        if constraints is not None and constraints.has_any():
            h_eff = constraints.project_hessian(h_eff, state.coords)
        # trust-radius feedback from the PREVIOUS step's prediction
        actual = state.energy - state.prev_energy
        trust_new = update_trust_radius(
            state.trust_radius, actual, state.predicted_change,
            tr_min=tr_min, tr_max=tr_max)
        trust_new = jnp.where(state.iteration > 0, trust_new, state.trust_radius)
        # mass-weighted solve (ref: optimizer.py mw* method names): step in
        # M^{1/2}-scaled coordinates, transformed back afterwards
        is_mw = config.method.lower().startswith("mw")
        if is_mw:
            from multioptpy_tpu.geometry import masses_from_z
            m3 = jnp.repeat(masses_from_z(np.asarray(z)).astype(g_flat.dtype),
                            3)
            minv = 1.0 / jnp.sqrt(m3)
            g_flat = g_flat * minv
            h_eff = h_eff * minv[:, None] * minv[None, :]

        is_mf = config.method.lower().replace("mw", "", 1).startswith(
            "mf_rsirfo")
        is_crs = config.method.lower().startswith("crsirfo")
        if kind == "prfo" and is_mf:
            # mode-following P-RFO (ref: Optimizer/mf_rsirfo.py:6): maximize
            # along the eigenvector overlapping the carried mode, then carry
            # the chosen (sign-aligned) eigenvector forward
            mode_idx = 1 if sub.startswith("block") else 0
            mode = state.fo_state[mode_idx]
            step, aux = rs_prfo_step(g_flat, h_eff, trust_new,
                                     follow_vector=mode,
                                     eigh_impl=config.eigh_impl)
            qn_fo = qn_fo + (aux["followed_mode"],)
        elif kind == "prfo":
            step, aux = rs_prfo_step(g_flat, h_eff, trust_new,
                                     saddle_order=max(saddle_order, 1),
                                     eigh_impl=config.eigh_impl)
        elif is_crs and constraints is not None and constraints.n_constraints:
            # CRS-I-RFO (ref: Optimizer/crsirfo.py:5): exact null-space
            # reduction of the constraint Jacobian via SVD (static shapes:
            # the constraint count is fixed), RS-RFO solved in the reduced
            # space, step lifted back. SHAKE below returns the geometry to
            # the manifold exactly.
            b = constraints.jacobian(state.coords)            # (m, 3N)
            _, _, vt = jnp.linalg.svd(b, full_matrices=True)
            q = vt[b.shape[0]:, :]                            # (3N-m, 3N)
            g_r = q @ g_flat
            h_r = q @ h_eff @ q.T
            step_r, aux = rs_rfo_step(g_r, h_r, trust_new,
                                      saddle_order=saddle_order)
            step = q.T @ step_r
        else:
            step, aux = rs_rfo_step(g_flat, h_eff, trust_new,
                                    saddle_order=saddle_order,
                                    eigh_impl=config.eigh_impl)
        if "trim" in config.method.lower() and kind in ("rfo", "prfo"):
            # TRIM enhancement (ref: optimizer.py:384,680 + trim.py:233):
            # a step within the trust radius is kept; a trust-limited one
            # is replaced by Helgaker's level-shifted image step (the
            # reference replaces its engine's raw over-long step — ours is
            # already boundary-restricted, so the swap happens exactly
            # when the RS solve lands on the boundary)
            from multioptpy_tpu.steppers.enhancements import trim_step
            so = max(saddle_order, 1) if kind == "prfo" else saddle_order
            t_step = trim_step(g_flat, h_eff, trust_new, saddle_order=so)
            on_boundary = jnp.linalg.norm(step) >= trust_new * (1.0 - 1e-9)
            step = jnp.where(on_boundary, t_step, step)
        if is_mw:
            step = step * minv
        dv = config.effective_diis()
        if dv:
            from multioptpy_tpu.steppers.diis import (
                adiis_step, c2diis_step, ediis_step, gdiis_step, gediis_step,
                kdiis_step)
            diis = state.fo_state[-1]
            x_flat = state.coords.reshape(-1)
            if dv == "gediis":
                step, diis_new = gediis_step(diis, x_flat, state.energy,
                                             g_flat, step)
            elif dv == "kdiis":
                step, diis_new = kdiis_step(diis, x_flat, g_flat, step)
            elif dv in ("ediis", "adiis", "c2diis"):
                fn = {"ediis": ediis_step, "adiis": adiis_step,
                      "c2diis": c2diis_step}[dv]
                step, diis_new = fn(diis, x_flat, state.energy, g_flat, step)
            else:
                step, diis_new = gdiis_step(diis, x_flat, step, step)
            qn_fo = qn_fo + (diis_new,)
        return step, h, trust_new, aux["predicted_energy_change"], qn_fo

    def first_order_move(state, g_flat):
        if kind == "sd":
            mv, fo_new = sd_step(g_flat, delta=config.delta), None
        elif kind == "mwsd":
            from multioptpy_tpu.geometry import masses_from_z
            from multioptpy_tpu.steppers.first_order import mwsd_step
            m3 = jnp.repeat(masses_from_z(np.asarray(z)).astype(g_flat.dtype),
                            3)
            mv, fo_new = mwsd_step(g_flat, m3, delta=config.delta), None
        else:
            fo = state.fo_state[0]
            if kind in ("fire", "fire2", "abc_fire"):
                fn = {"fire": fire_step, "fire2": fire2_step,
                      "abc_fire": abc_fire_step}[kind]
                mv, fo_new = fn(fo, g_flat)
            elif kind == "lbfgs":
                mv, fo_new = lbfgs_step(fo, state.coords.reshape(-1), g_flat,
                                        delta=config.delta)
            elif kind == "eve":
                from multioptpy_tpu.steppers.ml import eve_step
                mv, fo_new = eve_step(fo, g_flat, state.energy,
                                      delta=0.03 * config.delta)
            elif kind == "gan":
                from multioptpy_tpu.steppers.learned import gan_step
                mv, fo_new = gan_step(fo, state.coords.reshape(-1), g_flat,
                                      state.energy, -config.delta * g_flat)
            elif kind == "rl":
                from multioptpy_tpu.steppers.learned import rl_step
                mv, fo_new = rl_step(fo, g_flat, state.energy,
                                     -config.delta * g_flat)
            elif kind == "optax":
                from multioptpy_tpu.steppers.ml import optax_step
                mv, fo_new = optax_step(sub, fo, g_flat,
                                        lr=0.05 * config.delta)
            elif kind == "gpmin":
                from multioptpy_tpu.steppers.gp import (gp_step,
                                                        inv_dist_descriptor)
                phi_fn, _ = inv_dist_descriptor(state.coords.shape[0])
                mv, fo_new = gp_step(fo, state.coords.reshape(-1),
                                     state.energy, g_flat, phi_fn=phi_fn,
                                     max_step=0.5 * config.delta)
            else:  # cg
                mv, fo_new = cg_step(fo, g_flat, variant=sub, delta=config.delta)
        # clamp to trust radius (ref: optimizer.py:792)
        norm = jnp.linalg.norm(mv)
        trust = state.trust_radius
        if sub == "tr":
            # ratio-adaptive trust (TR-LBFGS, ref: Optimizer/tr_lbfgs.py)
            actual = state.energy - state.prev_energy
            trust = update_trust_radius(trust, actual, state.predicted_change,
                                        tr_min=tr_min, tr_max=tr_max)
            trust = jnp.where(state.iteration > 0, trust, state.trust_radius)
        mv = jnp.where(norm > trust, mv * (trust / jnp.maximum(norm, 1e-30)), mv)
        fo = (fo_new,) if fo_new is not None else ()
        return mv, state.hessian, trust, jnp.dot(g_flat, mv), fo

    def step(state):
        g = state.gradient
        # single-particle model surfaces live in the translation subspace —
        # never project those
        if config.project_tr_rot and state.coords.shape[0] > 1:
            g = project_gradient_tr_rot(g, state.coords)
        if constraints is not None and constraints.has_any():
            # remove constraint-violating directions + freezes
            # (ref: optimization.py:1934,1991 ProjectOutConstrain apply)
            g = constraints.project_gradient(g, state.coords)
        g_flat = g.reshape(-1)

        if is_dic:
            mv_flat, h, trust, predicted, fo = dic_move(state, g_flat)
        elif kind in ("rfo", "prfo"):
            mv_flat, h, trust, predicted, fo = quasi_newton_move(state, g_flat)
        else:
            mv_flat, h, trust, predicted, fo = first_order_move(state, g_flat)
            if not fo:
                fo = state.fo_state

        if config.switch_method and kind in ("rfo", "prfo"):
            # sigmoid RMS-force blend toward the first-order engine at high
            # force (ref: optimizer.py:582 switch_move_vector; thresholds
            # 0.05/0.005, steepness 10, offset 0.5)
            from multioptpy_tpu.steppers.first_order import (abc_fire_step,
                                                             fire2_step)
            sk, _ = _parse_method(config.switch_method)
            sw_state = state.fo_state[-1]
            if sk in ("fire", "fire2", "abc_fire"):
                fn = {"fire": fire_step, "fire2": fire2_step,
                      "abc_fire": abc_fire_step}[sk]
                mv_fo, sw_new = fn(sw_state, g_flat)
            else:
                mv_fo, sw_new = sd_step(g_flat, delta=config.delta), sw_state
            rms = jnp.sqrt(jnp.mean(g_flat ** 2))
            x_j = jnp.clip((rms - 0.005) / (0.05 - 0.005), 0.0, 1.0)
            f_hi = jax.nn.sigmoid(10.0 * (x_j - 0.5))
            f_hi = jnp.where(rms > 0.05, 1.0, jnp.where(rms <= 0.005, 0.0,
                                                        f_hi))
            mv_flat = f_hi * mv_fo + (1.0 - f_hi) * mv_flat
            fo = fo + (sw_new,)

        move = mv_flat.reshape(state.coords.shape)
        # frozen once converged (ensemble masking)
        move = jnp.where(state.converged, 0.0, move)
        if constraints is not None and constraints.has_any():
            move = move * constraints.mask(move.dtype)
            new_coords = state.coords + move
            if constraint_targets is not None and constraints.n_constraints:
                # SHAKE the geometry back onto the constraint manifold
                # (ref: constraint_condition.py:62)
                new_coords = constraints.shake(new_coords, constraint_targets)
                move = new_coords - state.coords
        else:
            new_coords = state.coords + move

        e_new, g_new, raw_g_new = energy_gradient(new_coords)

        conv_now = check_convergence(g, move, criteria)
        converged = state.converged | conv_now

        new_state = OptState(
            coords=new_coords, energy=e_new, gradient=g_new,
            raw_gradient=raw_g_new,
            prev_coords=state.coords, prev_energy=state.energy,
            prev_raw_gradient=state.raw_gradient,
            hessian=h, trust_radius=trust,
            predicted_change=jnp.asarray(predicted, state.energy.dtype),
            move=move,
            iteration=state.iteration + 1,
            converged=converged,
            fo_state=fo,
        )

        # --- trust-region step REJECTION (minimization only) --------------
        # An uphill move means the quadratic model failed at this radius:
        # revert the geometry and retry smaller. Without this, near stiff
        # anharmonic walls the ratio feedback alone produces a sawtooth
        # (grow trust -> overshoot -> crawl back) that never converges.
        # The trust floor for rejections sits well below the ratio-control
        # floor so repeated rejections always make progress possible.
        if saddle_order == 0 and kind == "rfo":
            reject = (~state.converged) & ~conv_now & \
                (e_new > state.energy + 1e-14)
            # LEARN from the failed trial: update the Hessian with the
            # measured (s, y) of the rejected step. Without this, a
            # spurious quasi-Newton negative eigenvalue whose gradient
            # overlap is numerical noise pins the RS-RFO secular shift,
            # every trial step rides the fake mode uphill, and the
            # reject/shrink loop repeats to trust = 0 without ever
            # correcting the mode (round-5 ethane stall diagnosis: FSB
            # mode at -0.164 with |g_t| = 1.5e-6, step entirely along
            # it, dE > 0 at every radius). A BFGS update with the real
            # uphill data flips that curvature positive in one shot.
            s_trial = mv_flat
            y_trial = (raw_g_new - state.raw_gradient).reshape(-1)
            upd_ok = jnp.all(jnp.isfinite(y_trial)) & \
                (jnp.dot(y_trial, s_trial) > 1e-14)
            h_learn = jnp.where(upd_ok,
                                update_hessian(h, s_trial, y_trial, "bfgs"),
                                h)
            rejected_state = state._replace(
                hessian=h_learn,
                # zero the (s, y) pair so the same update isn't re-applied
                prev_coords=state.coords,
                prev_raw_gradient=state.raw_gradient,
                trust_radius=jnp.maximum(
                    jnp.linalg.norm(mv_flat) * 0.25, 1e-5),
                predicted_change=jnp.zeros_like(state.predicted_change),
                iteration=state.iteration + 1,
            )
            new_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(reject, b, a),
                new_state, rejected_state)

        # converged members keep their state frozen entirely
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(state.converged, b, a),
            new_state, state._replace(converged=converged))

    return step


class OptResult(NamedTuple):
    coords: jnp.ndarray
    energy: jnp.ndarray
    gradient: jnp.ndarray
    converged: jnp.ndarray
    n_iterations: int
    energy_history: np.ndarray
    coords_history: Optional[np.ndarray]


def dissociation_detected(coords, limit=10.0):
    """True if any atom's nearest neighbor is farther than `limit` Bohr
    (ref: optimization.py:2219 dissociation_check)."""
    c = np.asarray(coords)
    if len(c) < 2:
        return False
    d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return bool(np.max(np.min(d, axis=1)) > limit)


def _optimize_chunked(step_raw, state, config, record_trajectory=False,
                      callback=None, stop_file="end.txt",
                      dissociation_limit=None, shape_conditions=None,
                      detect_negative_eigenvalues=False,
                      checkpoint_path=None, checkpoint_every=0, timer=None):
    """`config.scan_chunk` optimization steps per device dispatch.

    The per-step host loop pays one blocking round-trip per iteration —
    ~1 s each through the tunneled single-chip setup, which made small-
    system pipelines dispatch-bound (the round-4 HCN AutoTS A/B measured
    ~1000 host round-trips at 689 s vs the reference's 132 s in-process
    driver). Here `lax.scan` runs K steps inside ONE compiled program;
    the host sees control only at chunk boundaries, where early exit,
    stop files, dissociation/shape guards, -negeigval, checkpoints and
    callbacks all still fire (at chunk cadence instead of per step).

    In-trace guards: converged members freeze inside the step itself;
    a step that produces a non-finite or runaway (|E| > 1e8) energy is
    REJECTED in-trace — the carry keeps the last good state and raises a
    `stopped` flag the host turns into the runaway break. (The per-step
    loop instead returns the post-runaway state; keeping the last finite
    state is strictly more useful to callers like AutoTS's endpoint
    optimization.)
    """
    import os

    chunk = int(config.scan_chunk)

    @jax.jit
    def run_chunk(state):
        def body(carry, _):
            s, stopped = carry
            new = step_raw(s)
            # freeze past the step budget: the chunk count rounds nsteps
            # up, and the final state must not overshoot it. A budget-
            # frozen step's output is discarded entirely (including any
            # NaN it produced), so it cannot raise the runaway flag.
            active = (~stopped) & (s.iteration < config.nsteps)
            bad = active & ((~jnp.isfinite(new.energy))
                            | (jnp.abs(new.energy) > 1e8))
            keep = (~active) | bad
            new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, b, a), new, s)
            return (new, stopped | bad), (new.energy, new.converged,
                                          new.coords)
        (final, stopped), (e_h, conv_h, c_h) = jax.lax.scan(
            body, (state, jnp.asarray(False)), None, length=chunk)
        return final, stopped, e_h, conv_h, c_h

    from contextlib import nullcontext
    stage = timer.stage if timer is not None else (
        lambda name, block=None: nullcontext())

    energies = [float(state.energy)]
    traj = [np.asarray(state.coords)] if record_trajectory else None
    it = 0
    n_chunks = -(-config.nsteps // chunk)
    for ci in range(n_chunks):
        with stage("step"):
            state, stopped_d, e_h_d, conv_d, c_h_d = run_chunk(state)
            # ONE blocking transfer for everything the host inspects:
            # each separate blocking read pays a full round trip on the
            # tunneled single-chip setup (~1 s), and the per-chunk loop
            # was paying 4-5 of them
            fetch = (stopped_d, e_h_d, conv_d) + (
                (c_h_d,) if record_trajectory else ())
            got = jax.device_get(fetch)
            stopped, e_h, conv_np = got[0], got[1], got[2]
        # how many of this chunk's steps count toward the nsteps budget
        take = min(chunk, config.nsteps - ci * chunk)
        if conv_np.any():
            # report the iteration count where convergence latched
            take = min(take, int(np.argmax(conv_np)) + 1)
        it = ci * chunk + take
        energies.extend(float(e) for e in e_h[:take])
        with stage("host"):
            if record_trajectory:
                traj.extend(np.asarray(c) for c in got[3][:take])
            if callback is not None:
                callback(it, state)
            if (checkpoint_path and checkpoint_every
                    and (it // checkpoint_every)
                    > (max(it - chunk, 0) // checkpoint_every)):
                from multioptpy_tpu.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, state,
                                meta={"iteration": it,
                                      "method": config.method})
        if bool(stopped):
            print(f"# runaway detected (|E| > 1e8 or non-finite) in "
                  f"method={config.method} saddle_order="
                  f"{config.saddle_order} around iteration {it} - "
                  "keeping the last finite state")
            break
        if bool(conv_np[-1]):   # latched flag; == state.converged
            break
        if stop_file and os.path.exists(stop_file):
            break
        if dissociation_limit and dissociation_detected(
                state.coords, dissociation_limit):
            break
        if shape_conditions:
            from multioptpy_tpu.geometry import judge_shape_condition
            if judge_shape_condition(np.asarray(state.coords),
                                     shape_conditions):
                break
        if (detect_negative_eigenvalues and config.saddle_order > 0
                and config.fc_count > 0):
            from multioptpy_tpu.geometry import project_hessian_tr_rot
            h_proj = np.asarray(project_hessian_tr_rot(
                state.hessian, state.coords))
            if not np.any(np.linalg.eigvalsh(h_proj) < -1e-10):
                print("# no negative eigenvalues while saddle_order > 0 "
                      "- stopping (ref -negeigval)")
                break

    return OptResult(
        coords=state.coords, energy=state.energy, gradient=state.gradient,
        converged=state.converged, n_iterations=it,
        energy_history=np.asarray(energies),
        coords_history=np.stack(traj) if record_trajectory else None,
    )


def optimize(calc, coords, z, bias_engine=None, config=OptimizeConfig(),
             hessian0=None, record_trajectory=False, callback=None,
             constraints=None, stop_file="end.txt", dissociation_limit=None,
             shape_conditions=None, detect_negative_eigenvalues=False,
             checkpoint_path=None, checkpoint_every=0, resume_from=None,
             timer=None):
    """Host-driven optimization loop with early exit (3.1-equivalent stack).

    Failure/stop handling mirrors the reference: a `stop_file` in the cwd
    breaks the loop gracefully (ref: optimization.py:1864 end.txt), and
    `dissociation_limit` (Bohr) aborts runs whose molecule broke apart
    (ref: optimization.py:2219). `checkpoint_path` + `checkpoint_every`
    write resumable snapshots; `resume_from` restarts from one. `timer`
    (a logging_utils.StageTimer) records per-stage wall clock: "setup"
    (trace+compile+first state), "step" (device step incl. blocking),
    "host" (logging/checkpoint/guards) — SURVEY §5.1.
    """
    z = jnp.asarray(z)
    coords = jnp.asarray(coords)
    constraint_targets = None
    if constraints is not None:
        if constraints.n_atoms is None:
            constraints.n_atoms = coords.shape[0]
        if constraints.n_constraints:
            constraint_targets = constraints.targets(coords)
            # start ON the constraint manifold
            coords = constraints.shake(coords, constraint_targets)
    internals = None
    if config.method.lower().startswith("dic"):
        # DIC engine: primitives fixed at the starting connectivity
        # (ref: Optimizer/dic_rsirfo.py builds its RIC set once)
        from multioptpy_tpu.coords.internals import auto_internals
        internals = auto_internals(np.asarray(coords), np.asarray(z))
    if resume_from is not None:
        from multioptpy_tpu.checkpoint import load_checkpoint
        state, _ = load_checkpoint(resume_from)
    else:
        state = init_state(coords, z, calc, bias_engine, config, hessian0,
                           internals=internals)
    model_fn = None
    if config.mfc_count > 0:
        from multioptpy_tpu.coords.internals import detect_primitives
        from multioptpy_tpu.hessian.model import make_model_hessian_fn
        kind = (config.init_hessian.split(":", 1)[1]
                if config.init_hessian.startswith("model:") else "lindh")
        b, a, t = detect_primitives(np.asarray(coords), np.asarray(z))
        model_fn = make_model_hessian_fn(np.asarray(z), b, a, t, kind)
    step_raw = make_step_fn(calc, z, bias_engine, config, model_fn,
                            constraints, constraint_targets,
                            internals=internals)
    if config.scan_chunk and config.scan_chunk > 1:
        return _optimize_chunked(
            step_raw, state, config,
            record_trajectory=record_trajectory, callback=callback,
            stop_file=stop_file, dissociation_limit=dissociation_limit,
            shape_conditions=shape_conditions,
            detect_negative_eigenvalues=detect_negative_eigenvalues,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, timer=timer)
    step = jax.jit(step_raw)

    from contextlib import nullcontext
    stage = timer.stage if timer is not None else (
        lambda name, block=None: nullcontext())

    energies = [float(state.energy)]
    traj = [np.asarray(state.coords)] if record_trajectory else None
    it = 0
    import os
    for it in range(1, config.nsteps + 1):
        with stage("step"):
            state = step(state)
            energies.append(float(state.energy))  # blocks on the result
        with stage("host"):
            if record_trajectory:
                traj.append(np.asarray(state.coords))
            if callback is not None:
                callback(it, state)
            if (checkpoint_path and checkpoint_every
                    and it % checkpoint_every == 0):
                from multioptpy_tpu.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, state,
                                meta={"iteration": it,
                                      "method": config.method})
        if bool(state.converged):
            break
        if stop_file and os.path.exists(stop_file):
            # graceful user stop (ref: optimization.py:1864 end.txt)
            break
        if dissociation_limit and dissociation_detected(
                state.coords, dissociation_limit):
            break
        if shape_conditions:
            # geometric exit conditions (ref: optimization.py:1871
            # judge_shape_condition on every iteration)
            from multioptpy_tpu.geometry import judge_shape_condition
            if judge_shape_condition(np.asarray(state.coords),
                                     shape_conditions):
                break
        if (detect_negative_eigenvalues and config.saddle_order > 0
                and config.fc_count > 0):
            # saddle search left the region with downhill curvature (ref:
            # optimization.py:1291 judge_early_stop_due_to_no_negative_
            # eigenvalues): projected Hessian all-positive -> stop
            from multioptpy_tpu.geometry import project_hessian_tr_rot
            h_proj = np.asarray(project_hessian_tr_rot(
                state.hessian, state.coords))
            if not np.any(np.linalg.eigvalsh(h_proj) < -1e-10):
                print("# no negative eigenvalues while saddle_order > 0 "
                      "- stopping (ref -negeigval)")
                break
        e_now = float(state.energy)
        if not np.isfinite(e_now) or abs(e_now) > 1e8:
            # runaway guard: a diverging (e.g. uphill TS) search otherwise
            # burns the full step budget printing astronomical energies
            print("# runaway detected (|E| > 1e8 or non-finite) - aborting")
            break

    return OptResult(
        coords=state.coords, energy=state.energy, gradient=state.gradient,
        converged=state.converged, n_iterations=it,
        energy_history=np.asarray(energies),
        coords_history=np.stack(traj) if record_trajectory else None,
    )


def optimize_batch(calc, coords_batch, z, bias_engine=None,
                   config=OptimizeConfig(), n_steps=None, hessian0=None,
                   mesh=None):
    """Fully-on-device batched optimization: `vmap` over structures,
    `lax.scan` over a fixed number of steps with convergence masking.

    This is the TPU replacement for the reference's sequential conformer
    loop (ref: Entrypoints/conformation_search.py:569). All members advance
    in lockstep; converged members are frozen at zero cost to correctness.

    `mesh`: a 1-D jax.sharding.Mesh — the batch axis is split across its
    devices (NamedSharding on the initial state; GSPMD partitions the
    jitted scan, no collectives on this embarrassingly parallel path).
    """
    z = jnp.asarray(z)
    n_steps = int(n_steps if n_steps is not None else config.nsteps)
    step = make_step_fn(calc, z, bias_engine, config)

    init_one = lambda c: init_state(c, z, calc, bias_engine, config, hessian0)
    state0 = jax.vmap(init_one)(jnp.asarray(coords_batch))
    if mesh is not None:
        from multioptpy_tpu.parallel.mesh import shard_batch
        state0 = shard_batch(state0, mesh, mesh.axis_names[0])

    @jax.jit
    def run(state0):
        def body(state, _):
            state = jax.vmap(step)(state)
            return state, (state.energy, state.converged)

        final, (e_hist, conv_hist) = jax.lax.scan(
            body, state0, None, length=n_steps)
        return final, e_hist, conv_hist

    final, e_hist, conv_hist = run(state0)
    return OptResult(
        coords=final.coords, energy=final.energy, gradient=final.gradient,
        converged=final.converged, n_iterations=n_steps,
        energy_history=np.asarray(e_hist), coords_history=None,
    )
