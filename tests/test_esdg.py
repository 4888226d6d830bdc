"""Entropy-stable DG tests (model: reference test/Numerics/ESDGMethods:
two-point flux consistency/symmetry, entropy-variable identities, and
semi-discrete entropy conservation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.atmos.esdg import DryAtmosESDGModel, logave
from climatemachine_tpu.dg.esdg import (ESDGModel, EntropyConservativeSurfaceFlux,
                                        EntropyStableRusanov)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh import topology as topo
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.utils.ftypes import set_default_float
from climatemachine_tpu.physics.parameters import EARTH


@pytest.fixture(autouse=True)
def _f64():
    set_default_float(np.float64)
    yield
    set_default_float(np.float32)


def _rand_states(n=32, seed=0):
    rng = np.random.default_rng(seed)
    rho = 1.0 + 0.3 * rng.random(n)
    u = rng.standard_normal((n, 3)) * 20.0
    p = 8e4 * (1.0 + 0.3 * rng.random(n))
    Phi = 1e3 * rng.random(n)
    m = DryAtmosESDGModel()
    gm = m.gamma
    rhou = rho[:, None] * u
    rhoe = p / (gm - 1) + 0.5 * rho * np.sum(u * u, -1) + rho * Phi
    q = m.prog_spec.pack(
        {"rho": jnp.asarray(rho), "rhou": jnp.asarray(rhou),
         "rhoe": jnp.asarray(rhoe)}, batch_shape=(n,))
    aux = m.aux_spec.pack(
        {"coord": jnp.zeros((n, 3)), "Phi": jnp.asarray(Phi)},
        batch_shape=(n,))
    return m, q, aux


def test_logave():
    a = jnp.asarray([1.0, 2.0, 3.0, 1.0 + 1e-9])
    b = jnp.asarray([2.0, 2.0, 1.0, 1.0])
    got = np.asarray(logave(a, b))
    want = np.where(np.abs(a - b) > 1e-14,
                    (np.asarray(a) - np.asarray(b)) /
                    np.log(np.asarray(a) / np.asarray(b)), np.asarray(a))
    assert np.allclose(got, want, rtol=1e-12)


def test_ec_flux_consistency():
    """H(q, q) == f(q) (two-point flux consistency)."""
    m, q, aux = _rand_states()
    H = m.numerical_volume_flux_first_order(q, aux, q, aux)
    F = m.flux_first_order(q, aux, 0.0)
    assert np.allclose(np.asarray(H), np.asarray(F), rtol=1e-12, atol=1e-8)


def test_ec_flux_symmetry():
    """Conservative part symmetric in (1<->2) when Phi matches."""
    m, q1, aux = _rand_states(seed=1)
    m2, q2, _ = _rand_states(seed=2)
    H12 = m.numerical_volume_flux_first_order(q1, aux, q2, aux)
    H21 = m.numerical_volume_flux_first_order(q2, aux, q1, aux)
    assert np.allclose(np.asarray(H12), np.asarray(H21), rtol=1e-12,
                       atol=1e-8)


def test_entropy_variables_are_gradient():
    """β == dη/dq (checked with jax.grad node by node)."""
    m, q, aux = _rand_states(n=8)

    def eta(qi, auxi):
        return m.state_to_entropy(qi[None], auxi[None])[0]

    beta = m.state_to_entropy_variables(q, aux)
    g = jax.vmap(jax.grad(eta))(q, aux)
    assert np.allclose(np.asarray(beta[..., :5]), np.asarray(g),
                       rtol=1e-9, atol=1e-12)


def test_entropy_variables_roundtrip():
    m, q, aux = _rand_states(n=16, seed=3)
    beta = m.state_to_entropy_variables(q, aux)
    q2, Phi2 = m.entropy_variables_to_state(beta)
    assert np.allclose(np.asarray(q2), np.asarray(q), rtol=1e-9)
    assert np.allclose(np.asarray(Phi2),
                       np.asarray(m.aux_spec.get(aux, "Phi")),
                       rtol=1e-8, atol=1e-8)


def test_tadmor_shuffle():
    """βᵀ₁ H_j(q1,q2) − βᵀ₂ H_j(q2,q1) == ψ_j(q1) − ψ_j(q2) with
    ψ_j = ρu_j (the entropy potential flux; the Φ-slot of β pairs with
    the gravity fluctuation)."""
    m, q1, aux1 = _rand_states(seed=4)
    _, q2, aux2 = _rand_states(seed=5)
    H12 = m.numerical_volume_flux_first_order(q1, aux1, q2, aux2)
    H21 = m.numerical_volume_flux_first_order(q2, aux2, q1, aux1)
    b1 = m.state_to_entropy_variables(q1, aux1)[..., :5]
    b2 = m.state_to_entropy_variables(q2, aux2)[..., :5]
    lhs = jnp.einsum("...s,...cs->...c", b1, H12) - \
        jnp.einsum("...s,...cs->...c", b2, H21)
    # the fluctuation pairs with βΦ = 2ρb: add its jump contribution
    bphi1 = m.state_to_entropy_variables(q1, aux1)[..., 5]
    bphi2 = m.state_to_entropy_variables(q2, aux2)[..., 5]
    psi1 = m.prog_spec.get(q1, "rhou")
    psi2 = m.prog_spec.get(q2, "rhou")
    rhs = psi1 - psi2
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-10,
                       atol=1e-6), np.abs(np.asarray(lhs - rhs)).max()


def _periodic_setup(nel=3, poly=3):
    ranges = [np.linspace(0, 1e3, nel + 1)] * 3
    t = topo.brick_topology(ranges, periodicity=(True, True, True))
    g = make_grid(t, poly)

    def geopot(c):
        # smooth periodic potential so faces see continuous Phi
        return 500.0 * jnp.sin(2 * np.pi * c[..., 2] / 1e3)

    def init(m, coords, aux, t):
        x = coords / 1e3
        rho = 1.0 + 0.1 * jnp.sin(2 * np.pi * x[..., 0]) * \
            jnp.cos(2 * np.pi * x[..., 1])
        u = jnp.stack([20.0 + 5 * jnp.sin(2 * np.pi * x[..., 2]),
                       -10.0 * jnp.cos(2 * np.pi * x[..., 0]),
                       3.0 * jnp.ones_like(rho)], axis=-1)
        p = 8e4 * (1.0 + 0.05 * jnp.cos(2 * np.pi * x[..., 1]))
        Phi = m.aux_spec.get(aux, "Phi")
        gm = m.gamma
        rhoe = p / (gm - 1) + 0.5 * rho * jnp.sum(u * u, -1) + rho * Phi
        return m.prog_spec.pack(
            {"rho": rho, "rhou": rho[..., None] * u, "rhoe": rhoe},
            batch_shape=rho.shape)

    model = DryAtmosESDGModel(init_state=init, geopotential=geopot)
    return model, g


def test_esdg_free_stream():
    """Constant state, Phi = 0: zero tendency on a warped cubed sphere."""
    t = topo.stacked_cubed_sphere_topology(3, np.linspace(1.0, 1.5, 3))
    g = make_grid(t, 4)

    def init(m, coords, aux, t):
        rho = jnp.ones(coords.shape[:-1])
        gm = m.gamma
        rhoe = jnp.full_like(rho, 8e4 / (gm - 1))
        return m.prog_spec.pack(
            {"rho": rho, "rhou": jnp.zeros(coords.shape[:-1] + (3,)),
             "rhoe": rhoe}, batch_shape=rho.shape)

    model = DryAtmosESDGModel(init_state=init, geopotential=lambda c: 0.0 * c[..., 0])
    # tag faces as walls -> reflective BC keeps the constant state exact
    esdg = ESDGModel(model, g)
    q, aux = init_ode_state(esdg)
    tend, _ = jax.jit(esdg)(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(q)))
    assert float(jnp.max(jnp.abs(tend))) < 1e-8 * scale


def _perturb(q):
    """Nodally random (hence inter-element discontinuous) perturbation so
    face jumps are nonzero and the surface-flux entropy properties are
    actually exercised."""
    rng = np.random.default_rng(7)
    return q * (1.0 + 1e-3 * jnp.asarray(rng.random(q.shape) - 0.5))


def test_esdg_entropy_conservation():
    """Semi-discrete entropy production Σ M βᵀ(dq/dt) == 0 to round-off
    (periodic box, smooth Phi, EC volume + EC surface) — the Tadmor
    property end to end, including across the discontinuous perturbation.
    Mass and total energy are likewise conserved."""
    model, g = _periodic_setup()
    esdg = ESDGModel(model, g)
    q, aux = init_ode_state(esdg)
    q = _perturb(q)
    tend, _ = jax.jit(esdg)(q, aux, 0.0)
    beta = model.state_to_entropy_variables(q, aux)[..., :5]
    deta = float(jnp.sum(g.M[..., None] * beta * tend))
    eta = model.state_to_entropy(q, aux)
    scale = float(jnp.sum(g.M * jnp.abs(eta)))
    assert abs(deta) < 1e-10 * scale, (deta, scale)
    # conservation of mass and total energy (gravity enters through the
    # fluctuation which is energy-consistent with time-independent Phi)
    dmass = float(jnp.sum(g.M * tend[..., 0]))
    dener = float(jnp.sum(g.M * model.prog_spec.get(tend, "rhoe")))
    mass = float(jnp.sum(g.M * q[..., 0]))
    ener = float(jnp.sum(g.M * model.prog_spec.get(q, "rhoe")))
    assert abs(dmass) < 1e-12 * abs(mass)
    assert abs(dener) < 1e-9 * abs(ener)


def test_esdg_rusanov_dissipates():
    """EntropyStableRusanov surface flux produces non-positive entropy
    production."""
    model, g = _periodic_setup()
    esdg = ESDGModel(model, g, surface_numerical_flux=EntropyStableRusanov())
    q, aux = init_ode_state(esdg)
    q = _perturb(q)
    tend, _ = jax.jit(esdg)(q, aux, 0.0)
    beta = model.state_to_entropy_variables(q, aux)[..., :5]
    deta = float(jnp.sum(g.M[..., None] * beta * tend))
    eta_scale = float(jnp.sum(g.M * jnp.abs(model.state_to_entropy(q, aux))))
    # clearly negative: orders above the EC round-off floor
    assert deta < -1e-8 * eta_scale, (deta, eta_scale)


def test_esdg_converges_to_analytic_rhs():
    """ESDG tendency converges to the analytic −∇·F − ρ∇Φ of the smooth
    manufactured state at ~order p (p=4 here), same as standard DG
    (measured: both ≈4.1)."""
    model0 = DryAtmosESDGModel()
    gm = model0.gamma

    def qfun(x):
        xs = x / 1e3
        rho = 1.0 + 0.1 * jnp.sin(2 * jnp.pi * xs[0]) * \
            jnp.cos(2 * jnp.pi * xs[1])
        u = jnp.stack([20.0 + 5 * jnp.sin(2 * jnp.pi * xs[2]),
                       -10.0 * jnp.cos(2 * jnp.pi * xs[0]), 3.0])
        p = 8e4 * (1.0 + 0.05 * jnp.cos(2 * jnp.pi * xs[1]))
        Phi = 500.0 * jnp.sin(2 * jnp.pi * xs[2])
        rhoe = p / (gm - 1) + 0.5 * rho * jnp.sum(u * u) + rho * Phi
        return jnp.concatenate([rho[None], rho * u, rhoe[None]])

    def phifun(x):
        return 500.0 * jnp.sin(2 * jnp.pi * x[2] / 1e3)

    def flux(x):
        q, Phi = qfun(x), phifun(x)
        rho, rhou, rhoe = q[0], q[1:4], q[4]
        p = (gm - 1) * (rhoe - 0.5 * jnp.sum(rhou * rhou) / rho - rho * Phi)
        u = rhou / rho
        return jnp.concatenate(
            [rhou[:, None], rhou[:, None] * u[None, :] + p * jnp.eye(3),
             (u * (rhoe + p))[:, None]], axis=1)

    def exact_rhs(x):
        J = jax.jacfwd(flux)(x)                   # dF[c,s]/dx[d]
        div = jnp.trace(J, axis1=0, axis2=2)
        rho = qfun(x)[0]
        src = jnp.concatenate([jnp.zeros(1), -rho * jax.grad(phifun)(x),
                               jnp.zeros(1)])
        return -div + src

    errs = []
    for nel in (2, 4):
        model, g = _periodic_setup(nel=nel, poly=4)
        esdg = ESDGModel(model, g)
        q, aux = init_ode_state(esdg)
        t1, _ = esdg(q, aux, 0.0)
        ex = jax.vmap(exact_rhs)(g.coords.reshape(-1, 3)).reshape(t1.shape)
        den = float(jnp.sqrt(jnp.sum(g.M[..., None] * ex ** 2)))
        errs.append(float(jnp.sqrt(
            jnp.sum(g.M[..., None] * (t1 - ex) ** 2))) / den)
    order = np.log2(errs[0] / errs[1])
    assert order > 3.4, (order, errs)
