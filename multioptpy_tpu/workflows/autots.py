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

from multioptpy_tpu.analysis import normal_modes
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


def refine_saddle(calc, ts_guess, z, config=None, bias_engine=None):
    """Step-3 equivalent (ref: autots.py:193): first-order saddle refinement
    via the image-function RS-RFO."""
    config = config or OptimizeConfig(method="rfo_bofill", saddle_order=1,
                                      nsteps=100, fc_count=5,
                                      init_hessian="exact")
    return optimize(calc, ts_guess, z, bias_engine=bias_engine, config=config)


def autots(calc, reactant, z, config=AutoTSConfig(), product_coords=None,
           bias_engine=None, afir_trajectory=None):
    """Full AutoTS pipeline (ref: autots.py:477 run_workflow).

    `afir_trajectory`: optional (T,N,3) pre-computed step-1 trajectory
    (e.g. from the mapper's device-batched AFIR executor) — used as the
    NEB initial path when `product_coords` is also given."""
    reactant = jnp.asarray(reactant)
    z = jnp.asarray(z)
    afir_traj = (np.asarray(afir_trajectory)
                 if afir_trajectory is not None else None)

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
        res1 = optimize(calc, reactant, z, bias_engine=afir,
                        config=config.afir_opt,
                        record_trajectory=True)
        product_coords = res1.coords
        afir_traj = res1.coords_history
        # relax the AFIR product on the unbiased surface
        res1b = optimize(calc, product_coords, z,
                         config=config.endpoint_opt)
        product_coords = res1b.coords
    product_coords = jnp.asarray(product_coords)

    # ---- step 2: NEB (ref: autots.py:110 — the reference runs NEB ON THE
    # AFIR TRAJECTORY, not on an endpoint interpolation; a straight-line /
    # IDPP path across a large approach gap routes images through atom
    # clashes that NEB cannot heal) ------------------------------------
    if afir_traj is not None and len(afir_traj) >= 3:
        from multioptpy_tpu.interpolation import linear_resample
        full = jnp.concatenate([jnp.asarray(afir_traj),
                                product_coords[None]], axis=0)
        path0 = linear_resample(full, config.n_images)
    elif config.use_idpp:
        path0 = idpp_path(reactant, product_coords, config.n_images)
    else:
        path0 = interpolate_linear(reactant, product_coords, config.n_images)
    neb_res = neb(calc, path0, z, config.neb, bias_engine=bias_engine)

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

    refined = []   # (coords, energy, n_imag, hessian, converged, neb_idx)
    for idx in candidates:
        res3 = refine_saddle(calc, neb_res.path[idx], z, config.saddle,
                             bias_engine)
        h = calc.hessian(res3.coords, z)
        nm = normal_modes(h, res3.coords, z)
        ni = count_imaginary(nm.frequencies_cm1)
        # consolidate duplicates: identical refined TSs collapse
        # (ref: autots.py:935 consolidate_ts / v2 dedup)
        c_np = np.asarray(res3.coords)
        if any(np.sqrt(np.mean((c_np - np.asarray(r[0])) ** 2)) < 1e-3
               for r in refined):
            continue
        refined.append((res3.coords, float(res3.energy), ni, h,
                        bool(res3.converged), int(idx)))

    # candidates stay ordered by NEB-path energy (rate-limiting barrier
    # first, the reference's descending-energy ordering, autots.py:185);
    # pick the first that refined to a CONVERGED first-order saddle, so a
    # false global maximum (wrong curvature / no convergence) falls through
    # to the next candidate instead of poisoning the run
    valid = [r for r in refined if r[4] and r[2] == 1]
    pick = valid[0] if valid else refined[0]
    ts_coords, ts_energy, n_imag, h_ts = pick[:4]
    cand_info = tuple(
        {"index": r[5], "neb_energy": float(e_path[r[5]]),
         "energy": r[1], "n_imaginary": r[2], "converged": r[4],
         "selected": r is pick, "coords": np.asarray(r[0])}
        for r in refined)

    # ---- step 4: IRC + endpoint optimization (ref: autots.py:237) -------
    irc_res = irc(calc, ts_coords, z, hessian=h_ts, config=config.irc,
                  bias_engine=bias_engine)
    end_f = jnp.asarray(irc_res.forward_path[-1])
    end_b = jnp.asarray(irc_res.backward_path[-1])
    if config.optimize_endpoints:
        end_f = optimize(calc, end_f, z, config=config.endpoint_opt).coords
        end_b = optimize(calc, end_b, z, config=config.endpoint_opt).coords
    e_f = float(calc.energy(end_f, z))
    e_b = float(calc.energy(end_b, z))

    return AutoTSResult(
        ts_coords=ts_coords, ts_energy=ts_energy, n_imaginary=n_imag,
        barrier_forward=ts_energy - e_f, barrier_backward=ts_energy - e_b,
        irc_result=irc_res,
        reactant_coords=end_f, product_coords=end_b,
        reactant_energy=e_f, product_energy=e_b,
        neb_path=neb_res.path, neb_energies=np.asarray(neb_res.energies),
        afir_trajectory=afir_traj, candidates=cand_info,
    )
