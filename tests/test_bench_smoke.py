"""bench.py building blocks stay importable and well-formed."""
import json
import sys

import numpy as np


def test_build_problem_shapes():
    sys.path.insert(0, ".")
    import bench
    traj, img_shape, maps, rhs = bench.build_problem(
        n=16, nc=2, nspokes=8, nread=16)
    assert traj.shape == (128, 3)
    assert (np.abs(traj) <= 0.5).all()
    assert maps.shape == (2, 16, 16, 16)
    assert maps.dtype == np.complex64
    assert rhs.shape == (1, 16 ** 3)


def test_cpu_baseline_file_valid():
    with open("bench_cpu.json") as f:
        base = json.load(f)
    assert base["value"] > 0 and base["n"] == 128


def test_sharded_vol_lane_runs():
    """Drive the --sharded bench lane end-to-end on the virtual 8-device
    mesh (it needs >1 real chip in production, so without this test the
    lane could bitrot silently — VERDICT r2)."""
    sys.path.insert(0, ".")
    import bench
    r = bench.run_sharded_vol(n=16, iters=3, nspokes=64, nread=16)
    assert r["ips"] > 0
    x = np.asarray(r["x"])
    assert x.shape == (16, 16, 16)
    assert np.isfinite(x).all() and np.linalg.norm(x) > 0
    resids = np.asarray(r["resids"])
    assert np.isfinite(resids).all()


def test_cartesian_lane_runs():
    """Config-1 lane (run_cartesian_2d) runs at a small size on CPU and
    its normal op matches the float64 oracle."""
    sys.path.insert(0, ".")
    import bench
    r = bench.run_cartesian_2d(n=32, cpu=True)
    assert r["c1"] > 0 and r["c8"] > 0
    assert r["oracle_err"] < 1e-5
    assert 0 < r["roofline_frac"]
