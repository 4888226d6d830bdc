"""Element operator unit tests (model: reference test/Numerics/Mesh/Elements
and grad_test style checks)."""

import numpy as np
import pytest

from climatemachine_tpu.mesh import elements


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 10])
def test_lgl_points_basic(n):
    x, w = elements.lgl_points(n)
    assert len(x) == n + 1
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    # weights integrate constants and polynomials up to degree 2n-1 exactly
    assert np.isclose(np.sum(w), 2.0, atol=1e-14)
    for deg in range(1, 2 * n):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert np.isclose(np.sum(w * x ** deg), exact, atol=1e-12), deg


def test_lgl_known_values():
    # N=2: nodes -1, 0, 1; weights 1/3, 4/3, 1/3
    x, w = elements.lgl_points(2)
    assert np.allclose(x, [-1, 0, 1], atol=1e-15)
    assert np.allclose(w, [1 / 3, 4 / 3, 1 / 3], atol=1e-14)
    # N=3: interior nodes at +-1/sqrt(5)
    x, w = elements.lgl_points(3)
    assert np.allclose(np.abs(x[1:3]), 1 / np.sqrt(5), atol=1e-14)
    assert np.allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-13)


@pytest.mark.parametrize("n", [2, 4, 6, 9])
def test_derivative_matrix_exact_on_polynomials(n):
    x, _ = elements.lgl_points(n)
    D = elements.derivative_matrix(x)
    for deg in range(n + 1):
        p = x ** deg
        dp = deg * x ** (deg - 1) if deg > 0 else np.zeros_like(x)
        assert np.allclose(D @ p, dp, atol=1e-10), deg
    # derivative of a constant vanishes (row sums zero)
    assert np.allclose(D @ np.ones_like(x), 0, atol=1e-12)


def test_interpolation_matrix_exact():
    xs, _ = elements.lgl_points(5)
    xd = np.linspace(-1, 1, 13)
    I = elements.interpolation_matrix(xs, xd)
    for deg in range(6):
        assert np.allclose(I @ xs ** deg, xd ** deg, atol=1e-12)
    # interpolating onto the same nodes = identity
    I2 = elements.interpolation_matrix(xs, xs)
    assert np.allclose(I2, np.eye(6), atol=1e-13)


def test_sbp_property():
    # Q + Q^T = B: summation-by-parts for LGL collocation, the discrete
    # identity underpinning the weak-form DG tendency
    n = 4
    x, w = elements.lgl_points(n)
    D = elements.derivative_matrix(x)
    Q = np.diag(w) @ D
    B = np.zeros((n + 1, n + 1))
    B[0, 0], B[-1, -1] = -1.0, 1.0
    assert np.allclose(Q + Q.T, B, atol=1e-13)
