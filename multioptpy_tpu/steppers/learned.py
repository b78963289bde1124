"""Online-learned step-size controllers: GAN-modulated and RL (policy
gradient) steppers.

ref: multioptpy/Optimizer/gan_step.py:12 (GANStep — generator/discriminator
MLPs over per-DOF (coordinate, gradient, step) features with an experience
replay buffer) and rl_step.py:42 (StepSizePolicy — an attention policy
network emitting a Gaussian step-size multiplier trained by policy
gradient).

TPU-native redesign: both controllers are pure-functional NamedTuple states
whose MLP parameters live INSIDE the stepper state, trained by inline SGD in
the same jitted step as the move computation — no host-side torch loops, no
Python replay deques (a fixed-size ring buffer array instead). The networks
are deliberately the same small scale as the reference's (the value is the
online adaptation, not capacity).

Both modulate a base step (the driver hands in the steepest-descent move):
  gan:  move = base * (1 + 0.5 * tanh(G(feat)))   per DOF
  rl:   move = base * exp(a),  a ~ N(mu, sigma)   global multiplier
with G / the policy updated every step from the observed energy change.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _mlp_init(key, sizes, dtype=jnp.float64):
    """He-initialized MLP parameters as a flat tuple of (W, b)."""
    params = []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype) * jnp.sqrt(
            2.0 / sizes[i])
        params.append((w, jnp.zeros((sizes[i + 1],), dtype)))
    return tuple(params), key


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    return x


# --------------------------------------------------------------------------
# GAN step (ref: gan_step.py:12)
# --------------------------------------------------------------------------

class GanState(NamedTuple):
    gen: tuple            # generator params: feat(3) -> scale(1)
    disc: tuple           # discriminator params: feat(3)+de(1) -> logit(1)
    buf_feat: jnp.ndarray  # (B, D, 3) replay ring buffer of features
    buf_de: jnp.ndarray    # (B,) energy changes
    buf_n: jnp.ndarray
    prev_energy: jnp.ndarray
    prev_feat: jnp.ndarray  # (D, 3) features of the step just taken
    count: jnp.ndarray


def gan_init(dim, key=None, buffer_size=32, dtype=jnp.float64):
    key = jax.random.PRNGKey(0) if key is None else key
    gen, key = _mlp_init(key, (3, 32, 32, 1), dtype)
    disc, _ = _mlp_init(key, (4, 32, 1), dtype)
    return GanState(gen, disc,
                    jnp.zeros((buffer_size, dim, 3), dtype),
                    jnp.zeros((buffer_size,), dtype),
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(jnp.inf, dtype),
                    jnp.zeros((dim, 3), dtype),
                    jnp.asarray(0, jnp.int32))


def gan_step(state, x, gradient, energy, base_step, lr=1e-3):
    """Modulate `base_step` per-DOF by the generator; train discriminator
    (real = energy went down) and generator (fool the discriminator) from
    the replay buffer — the reference's training loop (gan_step.py:101-300)
    collapsed into two inline SGD updates."""
    dtype = x.dtype
    dim = x.shape[0]
    feat = jnp.stack([x, gradient, base_step], axis=-1)      # (D, 3)
    # feature normalization (the reference normalizes per batch)
    feat = feat / (jnp.max(jnp.abs(feat), axis=0, keepdims=True) + 1e-12)

    # --- learn from the PREVIOUS step's outcome ---
    de = energy - state.prev_energy
    de_n = jnp.tanh(de / (jnp.abs(energy) + 1e-10) * 1e3)
    have = state.count > 0
    slot = state.buf_n % state.buf_feat.shape[0]
    buf_feat = jnp.where(have, state.buf_feat.at[slot].set(state.prev_feat),
                         state.buf_feat)
    buf_de = jnp.where(have, state.buf_de.at[slot].set(de_n), state.buf_de)
    buf_n = state.buf_n + have.astype(jnp.int32)
    n_avail = jnp.minimum(buf_n, buf_feat.shape[0])
    valid = (jnp.arange(buf_feat.shape[0]) < n_avail).astype(dtype)

    def disc_loss(disc):
        # good steps (de<0) labelled 1 (ref: discriminator target)
        inp = jnp.concatenate(
            [buf_feat.mean(axis=1), buf_de[:, None]], axis=-1)   # (B, 4)
        logit = _mlp_apply(disc, inp)[:, 0]
        label = (buf_de < 0).astype(dtype)
        bce = jnp.maximum(logit, 0) - logit * label + jnp.log1p(
            jnp.exp(-jnp.abs(logit)))
        return jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def gen_loss(gen):
        scale = jnp.tanh(_mlp_apply(gen, feat)[:, 0])
        mod = base_step * (1.0 + 0.5 * scale)
        inp = jnp.concatenate([feat.mean(axis=0),
                               jnp.asarray([-1.0], dtype)])     # hoped dE<0
        inp = inp.at[2].set(jnp.mean(mod))
        logit = _mlp_apply(state.disc, inp[None, :])[0, 0]
        # generator wants the discriminator to call its step "good"
        return -jax.nn.log_sigmoid(logit)

    d_grads = jax.grad(disc_loss)(state.disc)
    disc = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.disc,
                                  d_grads)
    g_grads = jax.grad(gen_loss)(state.gen)
    gen = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.gen, g_grads)

    scale = jnp.tanh(_mlp_apply(gen, feat)[:, 0])
    move = base_step * (1.0 + 0.5 * scale)
    # descent safeguard identical in spirit to the reference's fallback
    # (gan_step.py run() final checks)
    ok = (jnp.dot(move, gradient) < 0) & jnp.all(jnp.isfinite(move))
    move = jnp.where(ok, move, base_step)
    return move, GanState(gen, disc, buf_feat, buf_de, buf_n,
                          jnp.asarray(energy, dtype), feat, state.count + 1)


# --------------------------------------------------------------------------
# RL step-size policy (ref: rl_step.py:42)
# --------------------------------------------------------------------------

class RlState(NamedTuple):
    policy: tuple          # params: summary(4) -> (mu, log_sigma)
    key: jnp.ndarray
    baseline: jnp.ndarray  # running reward mean
    prev_energy: jnp.ndarray
    prev_summary: jnp.ndarray
    prev_action: jnp.ndarray
    count: jnp.ndarray


def rl_init(dim, key=None, dtype=jnp.float64):
    key = jax.random.PRNGKey(1) if key is None else key
    policy, key = _mlp_init(key, (4, 64, 2), dtype)
    return RlState(policy, key, jnp.asarray(0.0, dtype),
                   jnp.asarray(jnp.inf, dtype),
                   jnp.zeros((4,), dtype), jnp.asarray(0.0, dtype),
                   jnp.asarray(0, jnp.int32))


def _rl_summary(gradient, base_step, energy):
    gn = jnp.linalg.norm(gradient)
    return jnp.stack([jnp.log1p(gn), jnp.log1p(jnp.linalg.norm(base_step)),
                      jnp.tanh(energy), jnp.asarray(1.0, gradient.dtype)])


def rl_step(state, gradient, energy, base_step, lr=3e-3, sigma_min=0.02):
    """Sample a global log-multiplier a ~ N(mu, sigma) from the policy,
    move = base * exp(a); REINFORCE update with a running baseline replaces
    the reference's PPO machinery (rl_step.py:200-500) — same signal
    (reward = normalized energy decrease), two orders less code."""
    dtype = gradient.dtype
    # --- policy-gradient update from the previous transition ---
    reward = jnp.tanh(-(energy - state.prev_energy)
                      / (jnp.abs(energy) + 1e-10) * 1e3)
    have = (state.count > 0).astype(dtype)
    advantage = (reward - state.baseline) * have

    def logp(policy, summary, action):
        out = _mlp_apply(policy, summary[None, :])[0]
        mu, log_sigma = out[0], out[1]
        sigma = jnp.exp(jnp.clip(log_sigma, -3.0, 1.0)) + sigma_min
        return (-0.5 * ((action - mu) / sigma) ** 2 - jnp.log(sigma),
                mu, sigma)

    def loss(policy):
        lp, _, _ = logp(policy, state.prev_summary, state.prev_action)
        return -(advantage * lp)

    grads = jax.grad(loss)(state.policy)
    policy = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.policy,
                                    grads)
    baseline = 0.9 * state.baseline + 0.1 * reward * have

    # --- act ---
    summary = _rl_summary(gradient, base_step, energy)
    key, sub = jax.random.split(state.key)
    _, mu, sigma = logp(policy, summary, jnp.asarray(0.0, dtype))
    action = mu + sigma * jax.random.normal(sub, (), dtype)
    action = jnp.clip(action, -1.5, 1.5)
    move = base_step * jnp.exp(action)
    ok = jnp.all(jnp.isfinite(move))
    move = jnp.where(ok, move, base_step)
    return move, RlState(policy, key, baseline, jnp.asarray(energy, dtype),
                         summary, action, state.count + 1)
