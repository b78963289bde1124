"""LIVE parity wave 9: the ML-style first-order engines (Adam, EVE),
executed through the ACTUAL reference code side by side with ours.

Conventions learned by execution:

  * Reference Adam (adam.py:21-51) adds Epsilon INSIDE the v bias
    correction — v_hat = (v + eps)/(1 - beta_v^t) — and then AGAIN under
    the sqrt: move = DELTA * m_hat / sqrt(v_hat + eps). The published
    Adam (arXiv:1412.6980, which it cites) uses v_hat = v/(1-beta_v^t)
    and sqrt(v_hat) + eps. Pinned by replaying the executed recursion;
    ours delegates to optax.adam (the published form).
  * Reference EVE (eve.py:24-61) computes its objective-feedback ratio
    d = |E - E_prev| / min(E, E_prev) with the SIGNED min (:49). For
    chemistry energies (E < 0) the denominator is negative, d < 0, and
    np.clip(d, 1/c, c) saturates at the 0.1 floor EVERY step — the
    whole Eve mechanism degenerates to a constant 10x learning-rate
    cut on real molecules. Ours divides by min(|E|, |E_prev|) (the
    published form); on POSITIVE energies both recursions agree to
    machine precision, which is pinned, and the negative-energy
    degeneration is pinned as executed.
  * Sign/driver convention as all first-order engines: ref returns the
    move the driver subtracts (optimizer.py:798) => ref_move == -ours.

Ref anchors: Optimizer/adam.py:21-51, Optimizer/eve.py:24-61,
optimizer.py:798.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

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


def test_adam_engine_replay_live():
    adam_mod = _ref_module("multioptpy.Optimizer.adam")

    rng = np.random.default_rng(13)
    dim = 6
    grads = [rng.normal(size=dim) for _ in range(5)]
    x = rng.normal(size=dim)

    eng = adam_mod.Adam()
    ref_moves = []
    with contextlib.redirect_stdout(io.StringIO()):
        for bg in grads:
            mv = np.asarray(eng.run(x.copy(), bg.copy()), dtype=float)
            ref_moves.append(mv.copy())
            x = x - mv

    # replay with the executed quirk: eps inside the bias correction AND
    # under the sqrt (adam.py:42,46)
    beta_m, beta_v, delta, eps = 0.9, 0.999, 0.03, 1e-8
    m = np.zeros(dim)
    v = np.zeros(dim)
    for t, bg in enumerate(grads, start=1):
        m = beta_m * m + (1 - beta_m) * bg
        v = beta_v * v + (1 - beta_v) * bg ** 2
        m_hat = m / (1 - beta_m ** t)
        v_hat = (v + eps) / (1 - beta_v ** t)
        expect = delta * m_hat / np.sqrt(v_hat + eps)
        assert np.allclose(ref_moves[t - 1], expect, atol=1e-14), (
            f"step {t}: ref {ref_moves[t-1]} vs quirk replay {expect}")

    # ours is optax.adam — the published recursion: same m_hat but
    # v_hat = v/(1-b^t) and eps OUTSIDE the sqrt
    from multioptpy_tpu.steppers.ml import optax_init, optax_step
    state = optax_init("adam", dim, lr=delta)
    m2 = np.zeros(dim)
    v2 = np.zeros(dim)
    for t, bg in enumerate(grads, start=1):
        mv, state = optax_step("adam", state, jnp.asarray(bg), lr=delta)
        m2 = beta_m * m2 + (1 - beta_m) * bg
        v2 = beta_v * v2 + (1 - beta_v) * bg ** 2
        m_hat = m2 / (1 - beta_m ** t)
        v_hat = v2 / (1 - beta_v ** t)
        published = -delta * m_hat / (np.sqrt(v_hat) + 1e-8)
        assert np.allclose(np.asarray(mv), published, atol=1e-9), (
            f"step {t}: optax {np.asarray(mv)} vs published {published}")


def test_eve_engine_positive_energy_live():
    """On positive energies the reference's signed-min denominator is
    positive and the two recursions coincide exactly."""
    eve_mod = _ref_module("multioptpy.Optimizer.eve")
    from multioptpy_tpu.steppers.ml import eve_init, eve_step

    rng = np.random.default_rng(29)
    dim = 6
    grads = [rng.normal(size=dim) for _ in range(5)]
    energies = [5.0, 4.2, 3.9, 3.85, 3.84]    # positive, decreasing

    eng = eve_mod.EVE()
    state = eve_init(dim)
    x = rng.normal(size=dim)
    prev_e = 0.0
    with contextlib.redirect_stdout(io.StringIO()):
        for bg, e in zip(grads, energies):
            ref_mv = np.asarray(eng.run(x.copy(), bg.copy(), None, None, e,
                                        prev_e, None, None, None, None),
                                dtype=float)
            our_mv, state = eve_step(state, jnp.asarray(bg), e)
            assert np.allclose(ref_mv, -np.asarray(our_mv), atol=1e-10), (
                f"E={e}: ref {ref_mv} vs -ours {-np.asarray(our_mv)}")
            x = x - ref_mv
            prev_e = e


def test_eve_negative_energy_degeneration_live():
    """Chemistry energies are negative: the reference's d_hat saturates at
    the 0.1 clip floor every step, so after many steps d_tilde decays
    toward 0.1 and the step size inflates toward 10x DELTA — pinned as
    executed."""
    eve_mod = _ref_module("multioptpy.Optimizer.eve")

    dim = 3
    bg = np.array([1.0, -0.5, 0.25])
    eng = eve_mod.EVE()
    prev_e = 0.0
    with contextlib.redirect_stdout(io.StringIO()):
        for k, e in enumerate([-76.0, -76.1, -76.05, -76.2]):
            eng.run(bg * 0 + bg, bg.copy(), None, None, e, prev_e,
                    None, None, None, None)
            prev_e = e
    # every post-first step clipped d_hat to 1/c = 0.1:
    # d_tilde = 0.999^3 * 1.0 + (1-0.999)*(0.1)*(0.999^2+0.999+1)
    expect = 0.999 ** 3 * 1.0 + 0.001 * 0.1 * (0.999 ** 2 + 0.999 + 1.0)
    assert eng.eve_d_tilde == pytest.approx(expect, abs=1e-12), (
        f"d_tilde {eng.eve_d_tilde} vs saturation model {expect}")
