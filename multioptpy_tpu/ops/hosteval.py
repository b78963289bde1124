"""Cached jitted evaluators for host-level (driver-glue) calculator calls.

Driver code between compiled stages — `init_state`'s first
energy/gradient, AutoTS's per-candidate exact Hessian + normal modes,
IRC's TS Hessian, the final endpoint energies — historically ran EAGERLY:
every jnp op dispatched as its own tiny program. On a local chip that is
milliseconds of overhead; through the tunneled single-chip setup each
eager op pays an HTTP round trip, and the glue dominated the HCN AutoTS
A/B wall-clock (measured round 5: 240 s warm, of which the chunked
compute stages were < 30 s).

These helpers jit the whole glue expression ONCE per (calculator
instance, bias engine, geometry shape/dtype) and cache the compiled
callable on the calculator object itself (so the cache lifetime is the
instance lifetime and no id()-reuse aliasing is possible; the bias
engine is kept strongly referenced in the cache entry for the same
reason).

NOT used by the calibration-scan paths that pass tracers through
calculator attributes (tools/*): a cached jit closure must never capture
an outer-trace tracer. Driver instances always hold concrete attribute
values.
"""

import jax
import jax.numpy as jnp

_CACHE_ATTR = "_hosteval_jit_cache"


def _cache(calc, key, make):
    cache = calc.__dict__.setdefault(_CACHE_ATTR, {})
    hit = cache.get(key)
    if hit is None:
        hit = (jax.jit(make()), key)
        cache[key] = hit
    return hit[0]


def _key(kind, z, coords, bias_engine, extra=()):
    zs = tuple(int(v) for v in jax.device_get(z).reshape(-1)) \
        if hasattr(z, "reshape") else tuple(z)
    return (kind, zs, coords.shape, str(coords.dtype),
            id(bias_engine) if bias_engine is not None else None,
            bias_engine, tuple(extra))


def energy_and_gradient(calc, coords, z, bias_engine=None):
    """(e, g) with bias included — one compiled program."""
    coords = jnp.asarray(coords)

    def make():
        def f(c):
            e, g = calc.energy_and_gradient(c, z)
            if bias_engine is not None and len(bias_engine):
                be, bg = bias_engine.energy_and_gradient(c)
                e, g = e + be, g + bg
            return e, g
        return f

    return _cache(calc, _key("eg", z, coords, bias_engine), make)(coords)


def eg_with_raw(calc, coords, z, bias_engine=None):
    """(e_eff, g_eff, raw_g) — the init_state triple, one program."""
    coords = jnp.asarray(coords)

    def make():
        def f(c):
            e, g = calc.energy_and_gradient(c, z)
            raw_g = g
            if bias_engine is not None and len(bias_engine):
                be, bg = bias_engine.energy_and_gradient(c)
                e, g = e + be, g + bg
            return e, g, raw_g
        return f

    return _cache(calc, _key("egr", z, coords, bias_engine), make)(coords)


def energy(calc, coords, z, bias_engine=None):
    coords = jnp.asarray(coords)

    def make():
        def f(c):
            e = calc.energy(c, z)
            if bias_engine is not None and len(bias_engine):
                e = e + bias_engine.total_energy(c)
            return e
        return f

    return _cache(calc, _key("e", z, coords, bias_engine), make)(coords)


def hessian(calc, coords, z, bias_engine=None):
    """Exact (numerical/autodiff) Hessian with bias — one program."""
    coords = jnp.asarray(coords)

    def make():
        def f(c):
            h = calc.hessian(c, z)
            if bias_engine is not None and len(bias_engine):
                h = h + bias_engine.hessian(c)
            return h
        return f

    return _cache(calc, _key("h", z, coords, bias_engine), make)(coords)


def hessian_and_modes(calc, coords, z, bias_engine=None):
    """(hessian, frequencies_cm1) — Hessian + mass-weighted normal-mode
    frequencies fused into one compiled program (AutoTS step-3 glue)."""
    coords = jnp.asarray(coords)

    def make():
        from multioptpy_tpu.analysis import normal_modes

        def f(c):
            h = calc.hessian(c, z)
            if bias_engine is not None and len(bias_engine):
                h = h + bias_engine.hessian(c)
            nm = normal_modes(h, c, z)
            return h, nm.frequencies_cm1
        return f

    return _cache(calc, _key("hm", z, coords, bias_engine), make)(coords)
