import numpy as np
import pytest

from pdb2reaction_tpu import native


def test_cell_list_matches_numpy(rng):
    x = rng.uniform(0, 15, size=(800, 3))
    pairs = native.cell_list_pairs(x, 2.0)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    ii, jj = np.nonzero(np.triu(d <= 2.0, 1))
    assert set(map(tuple, pairs)) == set(map(tuple,
                                             np.column_stack([ii, jj])))


def test_radius_query_matches_numpy(rng):
    x = rng.uniform(0, 10, size=(500, 3))
    c = rng.uniform(0, 10, size=(7, 3))
    hits = native.radius_query(x, c, 1.8)
    d = np.linalg.norm(x[:, None] - c[None, :], axis=-1)
    ref = set(map(tuple, np.column_stack(np.nonzero(d <= 1.8))))
    assert set(map(tuple, hits)) == ref


def test_lbfgsb_quadratic():
    A = np.diag([1.0, 10.0, 100.0])
    b = np.array([1.0, -2.0, 3.0])

    def fg(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x, f, it, conv = native.lbfgsb_minimize(fg, np.zeros(3), gtol=1e-8)
    assert conv
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-7)


def test_lbfgsb_bounded_rosenbrock():
    def rosen(x):
        f = 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        g = np.array([-400 * x[0] * (x[1] - x[0] ** 2) - 2 * (1 - x[0]),
                      200 * (x[1] - x[0] ** 2)])
        return f, g

    x, f, it, conv = native.lbfgsb_minimize(
        rosen, np.array([-1.2, 1.0]),
        lower=np.array([-2.0, -2.0]), upper=np.array([0.5, 2.0]),
        max_iter=5000, gtol=1e-6)
    assert conv
    np.testing.assert_allclose(x, [0.5, 0.25], atol=1e-4)
