"""AutoTS v2 — JSON-driven dynamic workflow engine.

ref: multioptpy/Wrapper/autots.py:528 AutoTSWorkflow_v2 (+ docs/manuals/
AUTOTS_V2_README.md): the config carries a "workflow" list of step entries

    {"step": "afir" | "opt" | "neb" | "saddle" | "irc" | "freq" | "confsearch",
     "settings_key": "...",        # which settings block to use
     "repeat": N,                   # run the step N times
     "repeat_settings": [..],       # per-repeat settings_key overrides
     "param_override": {...},       # inline parameter overrides
     "enabled": true}

Each step consumes/produces named artifacts (geometries, paths, TS guesses)
in a shared context dict, mirroring the reference's path merging (:843),
candidate selection (:877), and TS consolidation (:935). Steps chain through
arrays in memory — no files.
"""

import dataclasses
import json
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np


class WorkflowError(ValueError):
    pass


def validate_workflow(workflow_steps):
    """ref: autots.py _validate_workflow_config."""
    known = {"afir", "opt", "neb", "saddle", "irc", "freq", "confsearch"}
    for i, entry in enumerate(workflow_steps):
        name = entry.get("step")
        if name not in known:
            raise WorkflowError(f"workflow entry {i}: unknown step '{name}'")
        repeat = entry.get("repeat", 1)
        if not isinstance(repeat, int) or repeat < 1:
            raise WorkflowError(
                f"workflow entry {i} ({name}): 'repeat' must be a positive "
                "integer")
        rs = entry.get("repeat_settings", [])
        if rs and len(rs) > repeat:
            raise WorkflowError(
                f"workflow entry {i} ({name}): 'repeat_settings' longer "
                "than 'repeat'")
    return True


class AutoTSv2:
    """Execute a v2 workflow config against one input structure."""

    def __init__(self, calc, coords, z, config):
        self.calc = calc
        self.z = jnp.asarray(z)
        self.config = dict(config)
        self.steps = self.config.get("workflow", [])
        validate_workflow(self.steps)
        # shared artifact context (ref: v2 path merging / candidate lists)
        self.ctx: Dict[str, Any] = {
            "geometry": jnp.asarray(coords),
            "product": None,
            "path": None,
            "ts_guess": None,
            "ts": None,
            "irc_ends": None,
            "history": [],
        }

    # ---- settings resolution (ref: _get_settings_for_repeat) -------------

    def _settings(self, entry, repeat_index):
        key = entry.get("settings_key", f"{entry['step']}_settings")
        rs = entry.get("repeat_settings", [])
        if rs and repeat_index < len(rs):
            key = rs[repeat_index]
        settings = dict(self.config.get(key, {}))
        settings.update(entry.get("param_override", {}))
        return settings

    # ---- step implementations -------------------------------------------

    def _step_afir(self, s):
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
        from multioptpy_tpu.potentials import BiasEngine, get_potential

        bias = BiasEngine([get_potential(
            "afir", gamma=s.get("gamma", 150.0),
            fragm_1=s.get("fragm_1", [1]), fragm_2=s.get("fragm_2", [2]),
            element_z=np.asarray(self.z))])
        res = optimize(self.calc, self.ctx["geometry"], self.z,
                       bias_engine=bias,
                       config=OptimizeConfig(
                           method=s.get("method", "rfo_fsb"),
                           nsteps=s.get("nsteps", 300),
                           fc_count=s.get("fc_count", 10)),
                       record_trajectory=True)
        self.ctx["product"] = res.coords
        self.ctx["path"] = jnp.asarray(res.coords_history)
        return {"energy": float(res.energy)}

    def _step_opt(self, s):
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        target = s.get("target", "geometry")
        res = optimize(self.calc, self.ctx[target], self.z,
                       config=OptimizeConfig(
                           method=s.get("method", "rfo_fsb"),
                           nsteps=s.get("nsteps", 200)))
        self.ctx[target] = res.coords
        return {"energy": float(res.energy), "converged": bool(res.converged)}

    def _step_neb(self, s):
        from multioptpy_tpu.drivers.neb import (
            NEBConfig, idpp_path, interpolate_linear, neb)
        from multioptpy_tpu.interpolation import linear_resample

        n_images = s.get("n_images", 12)
        if self.ctx.get("path") is not None and s.get("from_path", True):
            path0 = linear_resample(self.ctx["path"], n_images)
        else:
            if self.ctx.get("product") is None:
                raise WorkflowError("neb step needs a product or a path")
            fn = idpp_path if s.get("idpp", False) else interpolate_linear
            path0 = fn(self.ctx["geometry"], self.ctx["product"], n_images)
        res = neb(self.calc, path0, self.z, NEBConfig(
            variant=s.get("variant", "cineb"),
            n_steps=s.get("nsteps", 200),
            k_spring=s.get("k_spring", 0.01),
            climbing_start=s.get("climbing_start", 30)))
        self.ctx["path"] = res.path
        self.ctx["ts_guess"] = res.path[res.ts_index]
        return {"ts_index": res.ts_index,
                "e_max": float(res.energies[res.ts_index])}

    def _step_saddle(self, s):
        from multioptpy_tpu.drivers.optimize import OptimizeConfig
        from multioptpy_tpu.workflows.autots import refine_saddle

        if self.ctx.get("ts_guess") is None:
            raise WorkflowError("saddle step needs a ts_guess (run neb first)")
        res = refine_saddle(self.calc, self.ctx["ts_guess"], self.z,
                            OptimizeConfig(
                                method=s.get("method", "rfo_bofill"),
                                saddle_order=s.get("saddle_order", 1),
                                nsteps=s.get("nsteps", 100),
                                fc_count=s.get("fc_count", 5),
                                init_hessian="exact",
                                trust_radius_ang=s.get("trust_radius", 0.1)))
        self.ctx["ts"] = res.coords
        return {"energy": float(res.energy), "converged": bool(res.converged)}

    def _step_freq(self, s):
        from multioptpy_tpu.analysis import normal_modes
        from multioptpy_tpu.analysis.vibrations import count_imaginary

        target = self.ctx.get("ts") if self.ctx.get("ts") is not None \
            else self.ctx["geometry"]
        h = self.calc.hessian(target, self.z)
        nm = normal_modes(h, target, self.z)
        n_imag = count_imaginary(nm.frequencies_cm1)
        return {"n_imaginary": n_imag,
                "lowest_cm1": float(nm.frequencies_cm1[0])}

    def _step_irc(self, s):
        from multioptpy_tpu.drivers.irc import IRCConfig, irc

        if self.ctx.get("ts") is None:
            raise WorkflowError("irc step needs a refined ts")
        res = irc(self.calc, self.ctx["ts"], self.z, config=IRCConfig(
            method=s.get("method", "lqa"),
            step_size=s.get("step_size", 0.05),
            n_steps=s.get("nsteps", 150)))
        self.ctx["irc_ends"] = (jnp.asarray(res.forward_path[-1]),
                                jnp.asarray(res.backward_path[-1]))
        return {"ts_energy": res.ts_energy}

    def _step_confsearch(self, s):
        from multioptpy_tpu.workflows.confsearch import (
            ConfSearchConfig, conformer_search)

        res = conformer_search(self.calc, self.ctx["geometry"], self.z,
                               ConfSearchConfig(
                                   n_rounds=s.get("n_rounds", 4),
                                   batch_size=s.get("batch_size", 8),
                                   base_gamma=s.get("base_gamma", 150.0)))
        self.ctx["geometry"] = jnp.asarray(res.conformers[0])
        return {"n_conformers": len(res.energies),
                "best_energy": float(res.energies[0])}

    # ---- engine ----------------------------------------------------------

    def run(self):
        """ref: autots.py run_dynamic_workflow. Returns the step report
        list; artifacts live in self.ctx."""
        dispatch = {"afir": self._step_afir, "opt": self._step_opt,
                    "neb": self._step_neb, "saddle": self._step_saddle,
                    "irc": self._step_irc, "freq": self._step_freq,
                    "confsearch": self._step_confsearch}
        reports: List[dict] = []
        for entry in self.steps:
            if not entry.get("enabled", True):
                continue
            name = entry["step"]
            for rep in range(entry.get("repeat", 1)):
                s = self._settings(entry, rep)
                out = dispatch[name](s)
                report = {"step": name, "repeat": rep, **out}
                reports.append(report)
                self.ctx["history"].append(report)
        return reports


def run_autots_v2(calc, coords, z, config_path_or_dict):
    """Convenience loader (ref: Entrypoints/autots.py:29 config load,
    :70 v1/v2 select by presence of a 'workflow' block)."""
    if isinstance(config_path_or_dict, str):
        with open(config_path_or_dict) as f:
            config = json.load(f)
    else:
        config = config_path_or_dict
    engine = AutoTSv2(calc, coords, z, config)
    reports = engine.run()
    return engine, reports
