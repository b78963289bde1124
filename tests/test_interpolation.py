"""Ritz and hidden-TS adaptive path redistribution."""

import numpy as np


def test_ritz_resample_concentrates_at_barrier():
    from multioptpy_tpu.interpolation import ritz_resample

    # 1-D gaussian-bump path embedded in (N,1,3)
    t = np.linspace(0, 1, 12)
    path = np.zeros((12, 1, 3))
    path[:, 0, 0] = t * 10.0
    e = np.exp(-((t - 0.5) / 0.15) ** 2)
    out = np.asarray(ritz_resample(path, e, concentration=4.0))
    assert out.shape == (12, 1, 3)
    # more images near the peak (x ~ 5) than for uniform spacing
    x = out[:, 0, 0]
    n_near = np.sum(np.abs(x - 5.0) < 2.0)
    assert n_near >= 6  # uniform would give ~4-5
    np.testing.assert_allclose(out[0], path[0], atol=1e-12)
    np.testing.assert_allclose(out[-1], path[-1], atol=1e-12)


def test_adaptive_resample_boosts_hidden_ts_segment():
    from multioptpy_tpu.interpolation import adaptive_resample

    # energies look monotone at the nodes, but gradients reveal a hidden
    # max inside segment 2-3 (gradient flips sign between its endpoints)
    t = np.linspace(0, 1, 6)
    path = np.zeros((6, 1, 3))
    path[:, 0, 0] = t * 5.0
    e = np.array([0.0, 0.2, 0.4, 0.41, 0.2, 0.0])
    g = np.zeros((6, 1, 3))
    g[:, 0, 0] = [0.5, 0.5, 0.8, -0.8, -0.5, -0.1]
    out = np.asarray(adaptive_resample(path, e, g, n_out=10))
    assert out.shape == (10, 1, 3)
    x = out[:, 0, 0]
    # boosted density around the hidden-TS segment: image spacing in the
    # boosted region is tighter than at the path ends
    mid_gap = np.min(np.diff(x)[3:6])
    edge_gap = x[1] - x[0]
    assert mid_gap < 0.6 * edge_gap
    assert np.sum((x > 1.5) & (x < 3.5)) >= 4
