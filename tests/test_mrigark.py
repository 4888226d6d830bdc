"""MRI-GARK convergence tests (reference
test/Numerics/ODESolvers/ode_tests_basic.jl multirate sections)."""

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.ode.mrigark import (
    MRIGARKERK33aSandu, MRIGARKERK45aSandu, MRIGARKESDIRK34aSandu,
    MRIGARKESDIRK46aSandu, MRIGARKIRK21aSandu)

LAM_S, LAM_F = -0.4, -4.0
EXACT = np.exp(LAM_S + LAM_F)


def _slow(q, a, t):
    return LAM_S * q, a


def _fast(q, a, t):
    return LAM_F * q, a


def _fastm(rhs, d):
    return LSRK54CarpenterKennedy(rhs, d)


class _ScalarImplicit:
    """(I − α λ_s)⁻¹ for the scalar slow operator."""

    def solve(self, rhs, alpha_dt):
        return rhs / (1.0 - alpha_dt * LAM_S)


def _run(make, n):
    dt = 1.0 / n
    sol = make(dt)
    q, aux, t = jnp.asarray([1.0]), None, 0.0
    for _ in range(n):
        q, aux = sol.step(q, aux, t)
        t += dt
    return abs(float(q[0]) - EXACT)


@pytest.mark.parametrize("ctor,order", [
    (MRIGARKERK33aSandu, 3), (MRIGARKERK45aSandu, 4)])
def test_mrigark_explicit_order(ctor, order):
    def make(dt):
        return ctor(_slow, _fast, _fastm, nsubsteps=12, dt=dt)
    e1, e2 = _run(make, 10), _run(make, 20)
    p = np.log2(e1 / e2)
    assert e1 < 1e-4, e1
    assert p > order - 0.6, (p, e1, e2)


@pytest.mark.parametrize("ctor,order", [
    (MRIGARKIRK21aSandu, 2), (MRIGARKESDIRK34aSandu, 3),
    (MRIGARKESDIRK46aSandu, 4)])
def test_mrigark_implicit_order(ctor, order):
    def make(dt):
        return ctor(_slow, _fast, _fastm, 12, _ScalarImplicit(), dt)
    e1, e2 = _run(make, 10), _run(make, 20)
    p = np.log2(e1 / e2)
    assert e1 < 5e-3, e1
    assert p > order - 0.6, (p, e1, e2)


def test_mrigark_tableau_consistency():
    """Δc telescopes to 1 (stage times cover the step)."""
    for make in (lambda: MRIGARKERK33aSandu(_slow, _fast, _fastm, 4, 0.1),
                 lambda: MRIGARKERK45aSandu(_slow, _fast, _fastm, 4, 0.1)):
        sol = make()
        assert np.isclose(sol.dc.sum(), 1.0)
    for make in (
            lambda: MRIGARKIRK21aSandu(_slow, _fast, _fastm, 4,
                                       _ScalarImplicit(), 0.1),
            lambda: MRIGARKESDIRK34aSandu(_slow, _fast, _fastm, 4,
                                          _ScalarImplicit(), 0.1),
            lambda: MRIGARKESDIRK46aSandu(_slow, _fast, _fastm, 4,
                                          _ScalarImplicit(), 0.1)):
        sol = make()
        assert np.isclose(sol.dc.sum(), 1.0)
