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
