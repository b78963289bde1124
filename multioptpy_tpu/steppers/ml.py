"""ML-style steppers backed by optax (Adam family, LARS, Lion, Lookahead).

The reference hand-rolls Adam/Adabelief/RAdam/EVE/Prodigy/LARS/LookAhead as
numpy classes (ref: multioptpy/Optimizer/{adam,adabelief,radam,eve,prodigy,
lars,lookahead}.py). On TPU the canonical implementations live in optax;
each stepper is an `optax.GradientTransformation` adapted to the framework's
`(state, gradient) -> (move, state)` protocol, so it composes with the
driver's trust-radius clamp and convergence machinery and vmaps over
ensembles like every other engine.
"""

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax


class OptaxState(NamedTuple):
    inner: Any


def _build(name, lr):
    name = name.lower()
    if name == "adam":
        return optax.adam(lr)
    if name == "adabelief":
        return optax.adabelief(lr)
    if name == "radam":
        return optax.radam(lr)
    if name == "lars":
        return optax.lars(lr)
    if name == "lamb":
        return optax.lamb(lr)
    if name == "lion":
        return optax.lion(lr)
    if name == "adamw":
        return optax.adamw(lr)
    if name == "prodigy":
        try:
            return optax.contrib.prodigy(lr)
        except AttributeError as e:
            raise ValueError("prodigy requires optax.contrib.prodigy") from e
    if name == "lookahead_adam":
        return optax.lookahead(optax.adam(lr), sync_period=5,
                               slow_step_size=0.5)
    raise ValueError(f"unknown optax stepper '{name}'")


OPTAX_STEPPERS = ("adam", "adabelief", "radam", "lars", "lamb", "lion",
                  "adamw", "prodigy", "lookahead_adam")


def optax_init(name, dim, lr=0.05, dtype=jnp.float64):
    tx = _build(name, lr)
    params = jnp.zeros((dim,), dtype)
    if name == "lookahead_adam":
        params = optax.LookaheadParams.init_synced(params)
    return OptaxState(inner=tx.init(params))


def optax_step(name, state, gradient, lr=0.05):
    """-> (move, new_state). The returned move is a displacement (the
    framework applies x + move)."""
    tx = _build(name, lr)
    g = gradient
    if name == "lookahead_adam":
        g = optax.LookaheadParams(fast=gradient, slow=gradient)
        updates, inner = tx.update(g, state.inner)
        move = updates.fast
    else:
        updates, inner = tx.update(g, state.inner)
        move = updates
    return move, OptaxState(inner=inner)


class EveState(NamedTuple):
    """Eve optimizer state (Koushik & Hayashi, arXiv:1611.01505; ref:
    Optimizer/eve.py:7 EVE): Adam moments plus the energy-feedback scale
    d_tilde that shrinks the learning rate when the objective stagnates."""
    m: jnp.ndarray
    v: jnp.ndarray
    d_tilde: jnp.ndarray
    count: jnp.ndarray
    prev_energy: jnp.ndarray


def eve_init(dim, dtype=jnp.float64):
    return EveState(jnp.zeros((dim,), dtype), jnp.zeros((dim,), dtype),
                    jnp.asarray(1.0, dtype), jnp.asarray(0, jnp.int32),
                    jnp.asarray(0.0, dtype))


def eve_step(state, gradient, energy, delta=0.03, beta_m=0.9, beta_v=0.999,
             beta_d=0.999, c=10.0, eps=1e-12):
    """One Eve move (ref: eve.py:24 run; reference defaults DELTA=0.03,
    c=10). Branchless: the first step skips the d-feedback exactly like the
    reference's adam_count>1 gate."""
    count = state.count + 1
    m = beta_m * state.m + (1.0 - beta_m) * gradient
    v = beta_v * state.v + (1.0 - beta_v) * gradient ** 2
    t = count.astype(gradient.dtype)
    m_hat = m / (1.0 - beta_m ** t)
    v_hat = v / (1.0 - beta_v ** t)
    denom = jnp.minimum(jnp.abs(energy), jnp.abs(state.prev_energy)) + eps
    d = jnp.abs(energy - state.prev_energy) / denom
    d_hat = jnp.clip(d, 1.0 / c, c)
    d_tilde_new = beta_d * state.d_tilde + (1.0 - beta_d) * d_hat
    d_tilde = jnp.where(count > 1, d_tilde_new, state.d_tilde)
    move = -(delta / d_tilde) * m_hat / (jnp.sqrt(v_hat) + eps)
    return move, EveState(m, v, d_tilde, count,
                          jnp.asarray(energy, gradient.dtype))
