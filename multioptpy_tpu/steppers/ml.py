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
