"""Run logging / observability.

ref: multioptpy/optimization.py:1373 RunLogger (per-step dynamic CSV :1377,
energy profiles :1401, geometry-parameter tracking :1415 `-gi`), plus the
`input.txt` args snapshot (:1525) and per-term bias-potential logs
(potential.py:140).

`RunLogger` collects per-iteration scalars into columnar CSV + optional
tracked geometry parameters (bond/angle/dihedral values along the run), and
`snapshot_config` writes the reproducibility record.
"""

from contextlib import contextmanager as _contextmanager
import dataclasses
import json
import os

import numpy as np


class RunLogger:
    def __init__(self, out_dir, tracked_params=None):
        """tracked_params: list of ("bond", (i, j)) / ("angle", (i, j, k)) /
        ("dihedral", (i, j, k, l)) with 1-based atoms (ref: -gi flag)."""
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.rows = []
        self.tracked = tracked_params or []
        self.geom_rows = []

    def log_step(self, iteration, energy, max_force, rms_force, step_norm,
                 trust_radius, **extra):
        row = dict(iteration=iteration, energy=energy, max_force=max_force,
                   rms_force=rms_force, step_norm=step_norm,
                   trust_radius=trust_radius, **extra)
        self.rows.append(row)

    def log_geometry(self, coords):
        """Track requested internal parameters (ref: optimization.py:1415)."""
        if not self.tracked:
            return
        import jax.numpy as jnp

        from multioptpy_tpu.potentials.base import _angle, _dihedral

        c = jnp.asarray(coords)
        vals = []
        for kind, atoms in self.tracked:
            a = [i - 1 for i in atoms]
            if kind == "bond":
                vals.append(float(jnp.linalg.norm(c[a[0]] - c[a[1]])))
            elif kind == "angle":
                vals.append(float(_angle(c[a[0]], c[a[1]], c[a[2]])))
            elif kind == "dihedral":
                vals.append(float(_dihedral(c[a[0]], c[a[1]], c[a[2]],
                                            c[a[3]])))
        self.geom_rows.append(vals)

    def make_callback(self):
        """-> driver callback(it, state) feeding this logger."""
        import jax.numpy as jnp

        def cb(it, state):
            g = state.gradient.reshape(-1)
            self.log_step(
                it, float(state.energy), float(jnp.max(jnp.abs(g))),
                float(jnp.sqrt(jnp.mean(g * g))),
                float(jnp.linalg.norm(state.move)),
                float(state.trust_radius))
            self.log_geometry(state.coords)

        return cb

    def flush(self):
        """Write CSVs (ref: RunLogger.log_dynamic_csv)."""
        if self.rows:
            keys = list(self.rows[0].keys())
            path = os.path.join(self.out_dir, "run_log.csv")
            with open(path, "w") as f:
                f.write(",".join(keys) + "\n")
                for r in self.rows:
                    f.write(",".join(f"{r[k]}" for k in keys) + "\n")
        if self.geom_rows:
            labels = ["_".join([k] + [str(a) for a in at])
                      for k, at in self.tracked]
            np.savetxt(os.path.join(self.out_dir, "geometry_params.csv"),
                       np.asarray(self.geom_rows), delimiter=",",
                       header=",".join(labels))
        return self.out_dir


def snapshot_config(out_dir, config, extra=None):
    """Reproducibility record of every option (ref: optimization.py:1525
    input.txt)."""
    os.makedirs(out_dir, exist_ok=True)
    data = dataclasses.asdict(config) if dataclasses.is_dataclass(config) \
        else dict(config)
    if extra:
        data.update(extra)
    path = os.path.join(out_dir, "input.json")
    with open(path, "w") as f:
        json.dump(data, f, indent=1, default=str)
    return path


class StageTimer:
    """Per-stage wall-clock timers for driver loops (SURVEY §5.1: the
    reference has no tracing at all; this is the new-capability side).

    Usage:
        timer = StageTimer()
        with timer.stage("qm"):
            ...
        with timer.stage("step"):
            ...
        timer.report()   # -> {"qm": {"total_s": ..., "count": ..,
                         #            "mean_ms": ..}, ...}

    Works around async dispatch: `stage(..., block=x)` calls
    jax.block_until_ready(x) before closing the timer so device work is
    attributed to the stage that launched it.
    """

    def __init__(self):
        import collections
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @_contextmanager
    def stage(self, name, block=None):
        import time as _time
        t0 = _time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax as _jax
                _jax.block_until_ready(block)
            dt = _time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_ms": 1e3 * self.totals[name]
                       / max(self.counts[name], 1)}
                for name in self.totals}

    def write_csv(self, path):
        with open(path, "w") as f:
            f.write("stage,total_s,count,mean_ms\n")
            for name, row in self.report().items():
                f.write(f"{name},{row['total_s']:.6f},{row['count']},"
                        f"{row['mean_ms']:.4f}\n")


def profile_trace(out_dir):
    """Context manager wrapping `jax.profiler.trace`: XLA device traces
    viewable in TensorBoard/Perfetto. Driver-level hook for SURVEY §5.1."""
    import jax

    return jax.profiler.trace(out_dir)
