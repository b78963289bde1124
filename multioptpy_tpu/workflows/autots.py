"""AutoTS — automated transition-state pipeline.

ref: multioptpy/Wrapper/autots.py:30 AutoTSWorkflow (v1): step1 AFIR-biased
relaxation :81 -> step2 NEB on the biased path :110 -> step3 saddle
refinement with saddle_order=1 :193 -> step4 IRC + endpoint optimization
:237. The reference passes geometries between steps via xyz files on disk;
here they are arrays, and every stage runs on device.

Entry points:
  autots(...)            full pipeline from reactant (+ AFIR spec or an
                         explicit product geometry)
  refine_saddle(...)     step-3 equivalent: RS-I-RFO with saddle_order=1
"""

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.analysis.vibrations import count_imaginary
from multioptpy_tpu.drivers.irc import IRCConfig, IRCResult, irc
from multioptpy_tpu.drivers.neb import NEBConfig, idpp_path, interpolate_linear, neb
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.potentials import BiasEngine, get_potential


@dataclasses.dataclass(frozen=True)
class AutoTSConfig:
    # step 1: AFIR exploration (ignored when product_coords given)
    afir_gamma: float = 150.0
    afir_fragm_1: Sequence[int] = ()
    afir_fragm_2: Sequence[int] = ()
    # multi-AFIR: list of (gamma, fragm_1, fragm_2) applied TOGETHER —
    # needed for concerted multi-bond formation (e.g. cycloadditions,
    # where a single two-fragment AFIR collapses asymmetrically onto one
    # bond). Overrides the single-AFIR fields when non-empty. The
    # reference's -ma accepts the same repeated triples
    # (interface.py:206).
    afir_list: Sequence = ()
    afir_opt: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(
            method="rfo_fsb", nsteps=300, fc_count=10))
    # step 2: NEB
    n_images: int = 12
    # image count from path length instead: one image per `node_distance`
    # Angstrom of initial-path arc length (ref: interface.py:284 -nd;
    # overrides n_images when set), clipped to [4, 64]
    node_distance_ang: Optional[float] = None
    neb: NEBConfig = dataclasses.field(default_factory=lambda: NEBConfig(
        variant="cineb", n_steps=300, k_spring=5e-4, climbing_start=30,
        fmax=5e-4, dt0=0.05, dt_max=0.4))
    use_idpp: bool = False
    # step 3: saddle refinement
    top_n_candidates: int = 3   # refine the N highest NEB local maxima
                                # (ref: autots.py:40,152 — one guess per run
                                # misses the true TS on multi-maximum paths)
    saddle: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(
            method="rfo_bofill", saddle_order=1, nsteps=100, fc_count=5,
            init_hessian="exact"))
    # step 4: IRC
    irc: IRCConfig = dataclasses.field(default_factory=IRCConfig)
    optimize_endpoints: bool = True
    endpoint_opt: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(method="rfo_fsb", nsteps=200))
    # steps per device dispatch for every optimization/NEB stage whose own
    # config leaves scan_chunk unset (see OptimizeConfig.scan_chunk): the
    # pipeline is dispatch-bound on tunneled single-chip setups (~1 s
    # blocking round-trip per step), so AutoTS chunks by default. 0
    # disables the default (per-step host loops everywhere).
    scan_chunk: int = 16


class AutoTSResult(NamedTuple):
    ts_coords: jnp.ndarray
    ts_energy: float
    n_imaginary: int
    barrier_forward: float       # E_ts - E(reactant-side IRC end)
    barrier_backward: float
    irc_result: IRCResult
    reactant_coords: jnp.ndarray
    product_coords: jnp.ndarray
    reactant_energy: float
    product_energy: float
    neb_path: jnp.ndarray
    neb_energies: np.ndarray
    afir_trajectory: Optional[np.ndarray]
    # per-candidate refinement diagnostics (ref logs each refined guess,
    # autots.py:193): [{index, neb_energy, energy, n_imaginary, converged,
    # selected}]
    candidates: tuple = ()
    # wall-clock per pipeline stage: {"step1_afir", "step2_neb",
    # "step3_refine", "step4_irc"} in seconds (includes any jit compiles
    # that stage triggered)
    stage_seconds: dict = {}


def refine_saddle(calc, ts_guess, z, config=None, bias_engine=None):
    """Step-3 equivalent (ref: autots.py:193): first-order saddle refinement
    via the image-function RS-RFO."""
    config = config or OptimizeConfig(method="rfo_bofill", saddle_order=1,
                                      nsteps=100, fc_count=5,
                                      init_hessian="exact")
    return optimize(calc, ts_guess, z, bias_engine=bias_engine, config=config)


def _select_candidate(refined):
    """Tiered TS pick over refined candidates
    (coords, energy, n_imag, hessian, converged, neb_idx), kept in
    descending NEB-energy order: converged first-order saddle, else ANY
    first-order saddle (an unconverged one still beats a wrong-curvature
    stationary point — the reference keys its selection on the
    imaginary-mode count, ref: autots.py:193,:935), else any converged
    point, else the rate-limiting candidate."""
    for cond in (lambda r: r[4] and r[2] == 1,
                 lambda r: r[2] == 1,
                 lambda r: r[4]):
        tier = [r for r in refined if cond(r)]
        if tier:
            return tier[0]
    return refined[0]


def autots(calc, reactant, z, config=AutoTSConfig(), product_coords=None,
           bias_engine=None, afir_trajectory=None, verbose=False,
           mesh=None, mesh_axis="batch"):
    """Full AutoTS pipeline (ref: autots.py:477 run_workflow).

    `afir_trajectory`: optional (T,N,3) pre-computed step-1 trajectory
    (e.g. from the mapper's device-batched AFIR executor) — used as the
    NEB initial path when `product_coords` is also given.
    `verbose`: stage banners + wall-clock to stdout, like the reference's
    per-step workflow logging (ref: autots.py:81,110,193,237).
    `mesh`: optional jax.sharding.Mesh — step 2 runs the NEB band with its
    image axis sharded over the mesh (drivers/neb.neb_sharded, ppermute
    halos; image count rounded up to a mesh multiple), and step 3 refines
    the top-N saddle candidates candidate-parallel through
    sharded_optimize_batch instead of sequentially."""
    import time as _time
    t0 = _time.perf_counter()

    def _vlog(msg):
        if verbose:
            print(f"# autots [{_time.perf_counter() - t0:8.1f} s] {msg}",
                  flush=True)
    reactant = jnp.asarray(reactant)
    z = jnp.asarray(z)
    afir_traj = (np.asarray(afir_trajectory)
                 if afir_trajectory is not None else None)
    if config.scan_chunk and config.scan_chunk > 1:
        # default every stage to chunked-scan execution unless its config
        # pinned a value itself (see AutoTSConfig.scan_chunk)
        def _chunked(oc):
            return (oc if oc.scan_chunk
                    else dataclasses.replace(oc, scan_chunk=config.scan_chunk))
        config = dataclasses.replace(
            config,
            afir_opt=_chunked(config.afir_opt),
            saddle=_chunked(config.saddle),
            endpoint_opt=_chunked(config.endpoint_opt),
            neb=(config.neb if config.neb.scan_chunk
                 else dataclasses.replace(config.neb,
                                          scan_chunk=config.scan_chunk)))
    stage_seconds = {}
    _mark = [t0]

    def _stage_done(name):
        now = _time.perf_counter()
        stage_seconds[name] = round(now - _mark[0], 2)
        _mark[0] = now

    # ---- step 1: product generation via AFIR (ref: autots.py:81) --------
    if product_coords is None:
        if config.afir_list:
            pots = [get_potential("afir", gamma=g, fragm_1=list(f1),
                                  fragm_2=list(f2),
                                  element_z=np.asarray(z))
                    for (g, f1, f2) in config.afir_list]
        elif len(config.afir_fragm_1) and len(config.afir_fragm_2):
            pots = [get_potential(
                "afir", gamma=config.afir_gamma,
                fragm_1=list(config.afir_fragm_1),
                fragm_2=list(config.afir_fragm_2),
                element_z=np.asarray(z))]
        else:
            raise ValueError("give product_coords or AFIR fragments")
        afir = BiasEngine(pots)
        _vlog("step1: AFIR-biased optimization")
        res1 = optimize(calc, reactant, z, bias_engine=afir,
                        config=config.afir_opt,
                        record_trajectory=True)
        product_coords = res1.coords
        afir_traj = res1.coords_history
        # relax the AFIR product on the unbiased surface
        _vlog("step1: unbiased product relaxation")
        res1b = optimize(calc, product_coords, z,
                         config=config.endpoint_opt)
        product_coords = res1b.coords
    product_coords = jnp.asarray(product_coords)
    _stage_done("step1_afir")

    # ---- step 2: NEB (ref: autots.py:110 — the reference runs NEB ON THE
    # AFIR TRAJECTORY, not on an endpoint interpolation; a straight-line /
    # IDPP path across a large approach gap routes images through atom
    # clashes that NEB cannot heal) ------------------------------------
    n_images = config.n_images
    if config.node_distance_ang:
        # one image per node_distance Angstrom of arc length along the
        # source path (ref: interface.py:284 -nd node_distance)
        from multioptpy_tpu.units import BOHR2ANGSTROM
        if afir_traj is not None and len(afir_traj) >= 3:
            src = np.concatenate([np.asarray(afir_traj),
                                  np.asarray(product_coords)[None]], axis=0)
        else:
            src = np.stack([np.asarray(reactant),
                            np.asarray(product_coords)])
        seg = np.sqrt(((src[1:] - src[:-1]) ** 2).sum(axis=(1, 2)))
        arc_ang = float(seg.sum()) * BOHR2ANGSTROM
        n_images = int(np.clip(round(arc_ang / config.node_distance_ang) + 1,
                               4, 64))
    if mesh is not None:
        # sharded band: image count must divide over the mesh axis
        n_dev = int(mesh.shape[mesh_axis])
        n_images = max(((n_images + n_dev - 1) // n_dev) * n_dev, n_dev)
    if afir_traj is not None and len(afir_traj) >= 3:
        from multioptpy_tpu.interpolation import linear_resample
        full = jnp.concatenate([jnp.asarray(afir_traj),
                                product_coords[None]], axis=0)
        path0 = linear_resample(full, n_images)
    elif config.use_idpp:
        path0 = idpp_path(reactant, product_coords, n_images)
    else:
        path0 = interpolate_linear(reactant, product_coords, n_images)
    _vlog(f"step2: NEB ({path0.shape[0]} images x {path0.shape[1]} atoms)"
          + (f" sharded over {mesh.shape[mesh_axis]} devices"
             if mesh is not None else ""))
    if mesh is not None:
        from multioptpy_tpu.drivers.neb import neb_sharded
        neb_res = neb_sharded(calc, path0, z, config.neb, mesh=mesh,
                              axis=mesh_axis, bias_engine=bias_engine)
    else:
        neb_res = neb(calc, path0, z, config.neb, bias_engine=bias_engine)
    _stage_done("step2_neb")

    # ---- step 3: refine the top-N NEB local maxima (ref: autots.py:152
    # _filter_candidates_by_energy + :193 per-candidate refinement; v2
    # consolidation :935) and keep the best true TS -------------------
    e_path = np.asarray(neb_res.energies)
    maxima = [i for i in range(1, len(e_path) - 1)
              if e_path[i] >= e_path[i - 1] and e_path[i] >= e_path[i + 1]]
    if not maxima:
        maxima = [neb_res.ts_index]
    maxima.sort(key=lambda i: e_path[i], reverse=True)
    candidates = maxima[:max(1, config.top_n_candidates)]

    if mesh is not None and len(candidates) > 1:
        # candidate-parallel refinement: every top-N saddle guess advances
        # in lockstep, the candidate batch sharded over the mesh (the
        # reference refines candidates sequentially, autots.py:193)
        from multioptpy_tpu.parallel.mesh import sharded_optimize_batch
        n_dev = int(mesh.shape[mesh_axis])
        cand_pad = list(candidates)
        while len(cand_pad) % n_dev:
            cand_pad.append(candidates[-1])
        guesses = jnp.stack([neb_res.path[i] for i in cand_pad])
        _vlog(f"step3: candidate-parallel saddle refinement "
              f"x{len(cand_pad)} over {n_dev} devices")
        final = sharded_optimize_batch(
            calc, guesses, z, mesh=mesh, bias_engine=bias_engine,
            config=config.saddle, n_steps=config.saddle.nsteps,
            axis=mesh_axis)
        triples = [(final.coords[k], float(final.energy[k]),
                    bool(final.converged[k]), int(idx))
                   for k, idx in enumerate(candidates)]
    else:
        triples = []
        for idx in candidates:
            _vlog(f"step3: saddle refinement of NEB image {idx}")
            res3 = refine_saddle(calc, neb_res.path[idx], z, config.saddle,
                                 bias_engine)
            triples.append((res3.coords, float(res3.energy),
                            bool(res3.converged), int(idx)))

    from multioptpy_tpu.ops import hosteval
    refined = []   # (coords, energy, n_imag, hessian, converged, neb_idx)
    for coords3, e3, conv3, idx in triples:
        _vlog("step3: exact Hessian + normal modes")
        # fused single-program Hessian + frequencies (eager glue was the
        # dispatch-latency hot spot on the tunneled chip, hosteval.py);
        # unbiased, matching the prior step-3 analysis semantics
        h, freqs = hosteval.hessian_and_modes(calc, coords3, z)
        ni = count_imaginary(freqs)
        # consolidate duplicates: identical refined TSs collapse
        # (ref: autots.py:935 consolidate_ts / v2 dedup)
        c_np = np.asarray(coords3)
        if any(np.sqrt(np.mean((c_np - np.asarray(r[0])) ** 2)) < 1e-3
               for r in refined):
            continue
        refined.append((coords3, e3, ni, h, conv3, idx))

    # candidates stay ordered by NEB-path energy (rate-limiting barrier
    # first, the reference's descending-energy ordering, autots.py:185);
    # pick the first that refined to a CONVERGED first-order saddle, so a
    # false global maximum (wrong curvature / no convergence) falls through
    # to the next candidate instead of poisoning the run. Tiered fallback
    # when nothing fully qualifies: an unconverged first-order saddle
    # still beats a wrong-curvature stationary point (the reference's own
    # selection keys on the imaginary-mode count, autots.py:193,:935).
    pick = _select_candidate(refined)
    ts_coords, ts_energy, n_imag, h_ts = pick[:4]
    _stage_done("step3_refine")
    cand_info = tuple(
        {"index": r[5], "neb_energy": float(e_path[r[5]]),
         "energy": r[1], "n_imaginary": r[2], "converged": r[4],
         "selected": r is pick, "coords": np.asarray(r[0])}
        for r in refined)

    # ---- step 4: IRC + endpoint optimization (ref: autots.py:237) -------
    _vlog("step4: IRC")
    irc_res = irc(calc, ts_coords, z, hessian=h_ts, config=config.irc,
                  bias_engine=bias_engine)
    end_f = jnp.asarray(irc_res.forward_path[-1])
    end_b = jnp.asarray(irc_res.backward_path[-1])
    if config.optimize_endpoints:
        _vlog("step4: endpoint optimizations")
        # an endpoint optimization that hits the runaway guard leaves
        # non-finite coordinates; fall back to the raw IRC endpoint so
        # barriers stay reportable (observed once on the TPU flagship:
        # one endpoint diverged, nan barriers in the bench artifact)
        for which, start in (("f", end_f), ("b", end_b)):
            cand = optimize(calc, start, z,
                            config=config.endpoint_opt).coords
            ok = bool(jnp.all(jnp.isfinite(cand)))
            if which == "f":
                end_f = cand if ok else start
            else:
                end_b = cand if ok else start
            if not ok:
                _vlog(f"step4: endpoint {which} diverged — keeping the "
                      "raw IRC terminus")
    e_f = float(hosteval.energy(calc, end_f, z))
    e_b = float(hosteval.energy(calc, end_b, z))
    _stage_done("step4_irc")

    return AutoTSResult(
        ts_coords=ts_coords, ts_energy=ts_energy, n_imaginary=n_imag,
        barrier_forward=ts_energy - e_f, barrier_backward=ts_energy - e_b,
        irc_result=irc_res,
        reactant_coords=end_f, product_coords=end_b,
        reactant_energy=e_f, product_energy=e_b,
        neb_path=neb_res.path, neb_energies=np.asarray(neb_res.energies),
        afir_trajectory=afir_traj, candidates=cand_info,
        stage_seconds=stage_seconds,
    )


# ---------------------------------------------------------------------------
# reference v1 legacy config translation
# ---------------------------------------------------------------------------

# NEB force-law switches: reference argparse dest name -> variant string
# (ref: interface.py call_nebparser -om/-lup/-bneb/.../-qsmv2)
_V1_VARIANTS = (("QSMv2", "qsm2"), ("QSM", "qsm"), ("OM", "om"),
                ("LUP", "lup"), ("BNEB2", "bneb2"), ("BNEB", "bneb"),
                ("DNEB", "dneb"), ("NESB", "nesb"), ("DMF", "dmf"),
                ("EWBNEB", "ewbneb"))

# in-loop redistribution switches (ref: interface.py:267-287)
_V1_REDIST = (("align_distances", "linear"),
              ("align_distances_energy", "energy"),
              ("align_distances_energy_predicted", "pred"),
              ("align_distances_ritz_energy_predicted", "ritz"),
              ("align_distances_spline", "spline"),
              ("align_distances_spline_ver2", "spline2"),
              ("align_distances_geodesic", "geodesic"),
              ("align_distances_bernstein", "bernstein"),
              ("align_distances_bernstein_energy", "bernstein_energy"),
              ("align_distances_adaptive_energy", "adaptive"))


def _v1_opt_config(settings, base):
    """stepN_settings -> OptimizeConfig derived from `base`.

    Keys are the reference's call_optimizeparser argparse dest names — the
    reference's own config guide points users at interface.py for the
    vocabulary (ref: Entrypoints/autots.py:21-26; dest names at
    interface.py:98 calc_exact_hess, :147 NSTEP, :151 max_trust_radius,
    :181 tight_convergence_criteria, :191 use_model_hessian)."""
    kw = {}
    om = settings.get("opt_method") or []
    if isinstance(om, str):
        om = [om]
    if len(om) >= 2:
        # two entries = sigmoid force-switching pair (ref: optimizer.py:582)
        kw["switch_method"], kw["method"] = om[0], om[1]
    elif om:
        kw["method"] = om[0]
    if "NSTEP" in settings:
        kw["nsteps"] = int(settings["NSTEP"])
    fc = int(settings.get("calc_exact_hess", -1) or -1)
    if fc > 0:
        kw["fc_count"] = fc
        kw["init_hessian"] = "exact"
    mh = settings.get("use_model_hessian")
    if mh:
        # bare true / null = flag given without argument -> the reference's
        # ModelhessAction default 'fischerd3old' (interface.py:187)
        kw["init_hessian"] = "model:%s" % (mh if isinstance(mh, str)
                                           else "fischerd3old")
    if settings.get("tight_convergence_criteria"):
        kw.update(max_force=1.5e-5, rms_force=1e-5,
                  max_displacement=6e-5, rms_displacement=4e-5)
    if settings.get("loose_convergence_criteria"):
        kw.update(max_force=3e-3, rms_force=2e-3,
                  max_displacement=1e-2, rms_displacement=7e-3)
    if settings.get("max_trust_radius") is not None:
        kw["trust_radius_ang"] = float(settings["max_trust_radius"])
    if settings.get("min_trust_radius") is not None:
        kw["trust_radius_min_ang"] = float(settings["min_trust_radius"])
    return dataclasses.replace(base, **kw)


def _v1_afir_list(ma):
    """manual_AFIR value -> ((gamma, fragm_1, fragm_2), ...). The reference
    accepts repeated [gamma f1 f2] triples (interface.py:206); fragments use
    the 1-indexed "1,2-5" syntax."""
    from multioptpy_tpu.cli import num_parse
    ma = list(ma or [])
    out = []
    for i in range(0, len(ma) - 2, 3):
        f1, f2 = ma[i + 1], ma[i + 2]
        out.append((float(ma[i]),
                    tuple(num_parse(str(f1))),
                    tuple(num_parse(str(f2)))))
    return tuple(out)


def autots_config_from_v1(cfg, n_images_default=12):
    """Translate the reference's v1 legacy AutoTS config (top-level
    step1_settings..step4_settings keys — the format of the reference's own
    regression fixture, test/config_autots_run_xtb_test.json; ref:
    Entrypoints/autots.py:17 "V1 (Legacy)") into an AutoTSConfig.

    Returns (config, flow): `flow` carries the v1 switches the caller
    interprets — skip_step1 / skip_to_step4 / run_step4 / save_pict /
    frequency_analysis plus calculator hints (usextb, electronic_charge,
    spin_multiplicity) and node_distance (image count from path length).
    """
    base = AutoTSConfig(n_images=n_images_default)
    s1 = dict(cfg.get("step1_settings", {}))
    s2 = dict(cfg.get("step2_settings", {}))
    s3 = dict(cfg.get("step3_settings", {}))
    s4 = dict(cfg.get("step4_settings", {}))

    kw = {"afir_opt": _v1_opt_config(s1, base.afir_opt),
          "saddle": _v1_opt_config(s3, base.saddle)}
    if "top_n_candidates" in cfg:
        kw["top_n_candidates"] = int(cfg["top_n_candidates"])
    afir = _v1_afir_list(s1.get("manual_AFIR"))
    if len(afir) == 1:
        kw.update(afir_gamma=afir[0][0], afir_fragm_1=afir[0][1],
                  afir_fragm_2=afir[0][2])
    elif afir:
        kw["afir_list"] = afir

    # step 2 -> NEBConfig (dest names from call_nebparser)
    nkw = {}
    if "NSTEP" in s2:
        nkw["n_steps"] = int(s2["NSTEP"])
    for dest, variant in _V1_VARIANTS:
        if s2.get(dest):
            nkw["variant"] = variant
            break
    ci = s2.get("apply_CI_NEB")
    if ci is not None and int(ci) < 99999:
        nkw["climbing_start"] = int(ci)
    if s2.get("memory_limited_BFGS") or s2.get("global_quasi_newton"):
        nkw["optimizer"] = "lbfgs"
    elif int(s2.get("steepest_descent", 99999) or 99999) < 99999:
        nkw["optimizer"] = "sd"
    for dest, scheme in _V1_REDIST:
        every = int(s2.get(dest, 0) or 0)
        if every > 0:
            nkw.update(redistribute=scheme, redistribute_every=every)
    sg = str(s2.get("align_distances_savgol", "0,0,0")).split(",")
    if sg and sg[0].strip() and int(sg[0]) > 0:
        nkw.update(redistribute="savgol", redistribute_every=int(sg[0]))
        if len(sg) >= 3:
            nkw.update(savgol_window=int(sg[1]), savgol_order=int(sg[2]))
    if nkw:
        kw["neb"] = dataclasses.replace(base.neb, **nkw)
    if s2.get("use_image_dependent_pair_potential"):
        kw["use_idpp"] = True
    part = int(s2.get("partition", 0) or 0)
    if part > 0:
        kw["n_images"] = part
    # all -nd variants place images by arc-length spacing; the spline /
    # bernstein / savgol flavors differ only in the resampling curve
    # (ref: interface.py:284-287), which linear_resample approximates
    for nd_key in ("node_distance", "node_distance_spline",
                   "node_distance_bernstein"):
        if s2.get(nd_key) is not None:
            kw["node_distance_ang"] = float(s2[nd_key])
            break
    if s2.get("node_distance_savgol"):
        first = str(s2["node_distance_savgol"]).split(",")[0]
        if first.strip():
            kw["node_distance_ang"] = float(first)

    # step 4 -> IRCConfig + endpoint optimization
    irc_spec = list(s4.get("intrinsic_reaction_coordinates", []) or [])
    if irc_spec:
        # [step_size, n_steps, method] (ref: optimization.py:2173)
        kw["irc"] = IRCConfig(
            step_size=float(irc_spec[0]) if len(irc_spec) > 0 else 0.05,
            n_steps=int(irc_spec[1]) if len(irc_spec) > 1 else 200,
            method=str(irc_spec[2]) if len(irc_spec) > 2 else "lqa")
    ep = s4.get("step4b_opt_method") or s4.get("opt_method")
    if ep:
        kw["endpoint_opt"] = _v1_opt_config(
            {"opt_method": ep,
             "NSTEP": s4.get("NSTEP", base.endpoint_opt.nsteps),
             "tight_convergence_criteria":
                 s4.get("tight_convergence_criteria")},
            base.endpoint_opt)

    flow = {"skip_step1": bool(cfg.get("skip_step1", False)),
            "skip_to_step4": bool(cfg.get("skip_to_step4", False)),
            "run_step4": bool(cfg.get("run_step4", True)),
            "save_pict": bool(s2.get("save_pict", False)),
            "frequency_analysis": bool(s3.get("frequency_analysis", False)
                                       or s4.get("frequency_analysis",
                                                 False)),
            "node_distance": s2.get("node_distance"),
            "usextb": (s1.get("usextb") or s2.get("usextb")
                       or s3.get("usextb") or s4.get("usextb")),
            "electronic_charge": s1.get("electronic_charge"),
            "spin_multiplicity": s1.get("spin_multiplicity"),
            # failure-detection knobs the driver layer owns (ref:
            # optimization.py:2219 dissociation_check; -negeigval)
            "dissociate_check": (float(s1["dissociate_check"])
                                 if s1.get("dissociate_check") else None),
            "detect_negative_eigenvalues":
                bool(s3.get("detect_negative_eigenvalues", False))}
    return dataclasses.replace(base, **kw), flow
