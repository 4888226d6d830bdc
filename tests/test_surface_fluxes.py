"""Monin-Obukhov surface flux tests (reference test/Common/SurfaceFluxes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.common.surface_fluxes import (Businger, Grachev,
                                                      Gryanik,
                                                      surface_conditions)
from climatemachine_tpu.physics.parameters import EARTH


def test_neutral_log_law():
    """Neutral (Δθ=0): u* = κ u / ln(z/z0) exactly."""
    z, z0, u = 10.0, 0.1, jnp.asarray([5.0, 10.0])
    sc = surface_conditions(EARTH, u, jnp.asarray([300.0, 300.0]),
                            jnp.asarray([300.0, 300.0]), z, z0)
    expected = 0.4 * u / np.log(z / z0)
    assert float(jnp.max(jnp.abs(sc.u_star - expected))) < 1e-6
    assert float(jnp.max(jnp.abs(sc.shf))) < 1e-8


@pytest.mark.parametrize("uf", [Businger(), Gryanik(), Grachev()])
def test_stability_regimes(uf):
    """Unstable: L<0, enhanced u*; stable: L>0, suppressed u*;
    self-consistency of the profile relation."""
    z, z0 = 10.0, 0.1
    u = jnp.asarray([5.0, 5.0])
    th_in = jnp.asarray([299.0, 302.0])     # unstable / stable
    th_s = jnp.asarray([302.0, 299.0])
    sc = surface_conditions(EARTH, u, th_in, th_s, z, z0, uf=uf)
    L = np.asarray(sc.L_MO)
    assert L[0] < 0 < L[1]
    us_neutral = 0.4 * 5.0 / np.log(z / z0)
    assert float(sc.u_star[0]) > us_neutral > float(sc.u_star[1])
    # profile self-consistency: recover u from u* and ψ
    zeta = z / sc.L_MO
    zeta0 = z0 / sc.L_MO
    u_rec = sc.u_star / 0.4 * (np.log(z / z0) - uf.psi_m(zeta)
                               + uf.psi_m(zeta0))
    assert float(jnp.max(jnp.abs(u_rec - u))) < 0.05
    # heat flux signs: unstable -> upward (positive shf)
    assert float(sc.shf[0]) > 0 > float(sc.shf[1])


def test_exchange_coefficients_positive():
    sc = surface_conditions(EARTH, jnp.asarray([4.0]), jnp.asarray([300.5]),
                            jnp.asarray([300.0]), 10.0, 0.05)
    assert float(sc.C_drag[0]) > 0
