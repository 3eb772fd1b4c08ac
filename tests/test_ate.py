"""ATE evaluation harness tests (utils/ate.py).

The reference's accuracy protocol is external TUM-benchmark evaluation of
its trajectory files (`main_scan_3d.cpp:267-280`); these tests pin down the
in-repo equivalent: Horn alignment, timestamp association, RMSE.
"""

import numpy as np

from gradient_sdf_tpu.utils import ate


def _random_rigid(rng):
    R, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    return R, rng.randn(3)


def test_horn_alignment_exact_recovery():
    rng = np.random.RandomState(0)
    gt = rng.randn(40, 3)
    R, t = _random_rigid(rng)
    est = (gt - t) @ R  # est = R^T (gt - t)  =>  gt = R est + t
    res = ate.ate_rmse(est, gt)
    assert res.rmse < 1e-9
    np.testing.assert_allclose(res.R @ est.T + res.t[:, None], gt.T, atol=1e-9)


def test_ate_reports_noise_level():
    rng = np.random.RandomState(1)
    gt = rng.randn(500, 3)
    sigma = 0.05
    est = gt + sigma * rng.randn(500, 3)
    res = ate.ate_rmse(est, gt)
    # rmse of 3-D gaussian displacement ~ sigma * sqrt(3)
    assert 0.8 * sigma * np.sqrt(3) < res.rmse < 1.2 * sigma * np.sqrt(3)


def test_association_window_and_uniqueness():
    est_ts = np.array([0.0, 0.1, 0.2, 0.35])
    gt_ts = np.array([0.005, 0.106, 0.5])
    ia, ib = ate.associate(est_ts, gt_ts, max_dt=0.02)
    # 0.0<->0.005 and 0.1<->0.106 pair; 0.2 and 0.35 have no GT within 20 ms
    assert list(ia) == [0, 1]
    assert list(ib) == [0, 1]
    # the same gt stamp is never used twice
    est_ts2 = np.array([0.004, 0.006])
    ia2, ib2 = ate.associate(est_ts2, np.array([0.005]), max_dt=0.02)
    assert len(ia2) == 1


def test_evaluate_ate_end_to_end_and_degenerate():
    rng = np.random.RandomState(2)
    gt_xyz = np.cumsum(0.01 * rng.randn(60, 3), axis=0)
    R, t = _random_rigid(rng)
    est = [(0.1 * i, (gt_xyz[i] - t) @ R) for i in range(60)]
    gt = [(0.1 * i + 0.003, gt_xyz[i]) for i in range(60)]
    res = ate.evaluate_ate(est, gt)
    assert res is not None and res.num_pairs == 60 and res.rmse < 1e-9

    assert ate.evaluate_ate([], gt) is None
    assert ate.evaluate_ate(est[:1], gt) is None
    # disjoint timestamps -> no pairs
    far = [(1000.0 + i, gt_xyz[i]) for i in range(60)]
    assert ate.evaluate_ate(far, gt) is None
