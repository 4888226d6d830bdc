"""AtmosLESDefault / AtmosLESCore diagnostics groups (reference
src/Diagnostics/atmos_les_default.jl, atmos_les_core.jl)."""

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import AtmosModel, AtmosPhysics, HydrostaticState
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.moisture import EquilMoist
from climatemachine_tpu.common.turbulence import ConstantKinematicViscosity
from climatemachine_tpu.diagnostics.atmos_les import (AtmosLESCoreGroup,
                                                      AtmosLESDefaultGroup)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.io.writers import NetCDFWriter
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import DryAdiabaticProfile

L, H = 1000.0, 1500.0
CLD_LO, CLD_HI = 600.0, 1000.0
U0, WAMP = 5.0, 0.5


def _setup():
    ps = EARTH
    r = [np.linspace(0, L, 4)] * 2 + [np.linspace(0, H, 4)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.1),
        moisture=EquilMoist())

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        # saturated (cloudy) band CLD_LO < z < CLD_HI
        in_cld = (z > CLD_LO) & (z < CLD_HI)
        rho_dry = p / (ps.R_d * T)
        qsat = td.q_vap_saturation(ps, T, rho_dry)
        q_tot = jnp.where(in_cld, 1.5 * qsat, 0.1 * qsat)
        pp = td.phase_partition_equil(ps, T, rho_dry, q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        u = U0 * jnp.ones_like(z)
        w = WAMP * jnp.sin(2 * jnp.pi * x / L)
        e_int = td.internal_energy(ps, T, pp)
        e_kin = 0.5 * (u ** 2 + w ** 2)
        rhou = jnp.stack([rho * u, jnp.zeros_like(u), rho * w], axis=-1)
        q = m.prog_spec.pack({"rho": rho, "rhou": rhou,
                              "rhoe": rho * (e_int + e_kin + Phi),
                              "moisture.rhoq_tot": rho * q_tot},
                             batch_shape=rho.shape)
        return q

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())))
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    return dg, q, aux


def test_les_default_group(tmp_path):
    dg, q, aux = _setup()
    g = dg.grid
    path = str(tmp_path / "les_default.nc")
    grp = AtmosLESDefaultGroup(dg, writer=NetCDFWriter(), out_path=path)
    vals = grp.write(q, aux, 0.0)

    nlev = g.n_vert * g.Nq[2]
    for k in ("u", "v", "w", "temp", "pres", "thd", "et", "ei", "ht", "hi",
              "qt", "ql", "qv", "thv", "thl", "var_u", "var_w", "tke",
              "cov_w_qt", "cld_frac", "w_ht_sgs", "w_qt_sgs"):
        assert k in vals, k
    assert vals["u"].shape == (nlev,)
    # Favre means: u is uniform U0, v zero, w averages ~0 per level
    assert np.allclose(vals["u"], U0, atol=1e-10)
    assert np.allclose(vals["v"], 0.0, atol=1e-12)
    assert np.allclose(vals["w"], 0.0, atol=1e-10)
    # w fluctuation is the full sine: var_w = WAMP^2/2 (uniform-rho approx)
    assert np.allclose(vals["var_w"], WAMP ** 2 / 2, rtol=2e-3)
    assert np.allclose(vals["tke"],
                       0.5 * (vals["var_u"] + vals["var_v"]
                              + vals["var_w"]))
    # moist band: cld_frac 1 inside, 0 outside; base/top bracket the band
    z = grp.z_levels
    inside = (z > CLD_LO + 150) & (z < CLD_HI - 150)
    outside = (z <= CLD_LO) | (z >= CLD_HI)
    assert np.all(vals["cld_frac"][inside] == 1.0)
    assert np.all(vals["cld_frac"][outside] == 0.0)
    # top/base land on the nearest cloudy node (spacing ~140 m here)
    assert CLD_LO < vals["cld_base"] < CLD_LO + 150
    assert CLD_HI - 150 < vals["cld_top"] < CLD_HI
    assert np.isclose(float(vals["cld_cover"]), 1.0)
    # lwp equals the direct quadrature integral Σ(M ρ q_liq)/A_horz
    bl = dg.balance_law
    rho = bl.prog(q, "rho")
    T, p, _, pp = bl.thermo_full(q, aux)
    M = np.asarray(g.M)
    zc = np.asarray(g.coords[..., 2])
    A = M.sum() / (zc.max() - zc.min())
    lwp_direct = float((M * np.asarray(rho * pp.liq)).sum() / A)
    assert np.isclose(float(vals["lwp"]), lwp_direct, rtol=1e-10)
    assert float(vals["lwp"]) > 0.0

    # NetCDF round trip
    import h5py
    with h5py.File(path, "r") as f:
        assert f["u"].shape == (1, nlev)
        assert f["lwp"].shape == (1,)
        assert np.allclose(f["z"][:], z)


def test_les_core_group():
    dg, q, aux = _setup()
    grp = AtmosLESCoreGroup(dg)
    vals = grp.collect(q, aux)
    g = dg.grid
    z = grp.z_levels
    # core = cloudy and updraft: half the horizontal nodes (sin>0) inside
    # the cloud band
    inside = (z > CLD_LO + 150) & (z < CLD_HI - 150)
    outside = (z <= CLD_LO) | (z >= CLD_HI)
    assert np.all(vals["core_frac"][outside] == 0.0)
    assert np.all(vals["core_frac"][inside] > 0.3)
    assert np.all(vals["core_frac"][inside] < 0.7)
    # conditional mean of u is still U0 in the core; w_core > 0 there
    assert np.allclose(vals["u_core"][inside], U0, atol=1e-10)
    assert np.all(vals["w_core"][inside] > 0.1)
    # conditional means vanish where there is no core (guarded division)
    assert np.all(vals["u_core"][outside] == 0.0)
    # direct check of one conditional average at the middle level
    bl = dg.balance_law
    rho = np.asarray(bl.prog(q, "rho"))
    rhou = np.asarray(bl.prog(q, "rhou"))
    w = rhou[..., 2] / rho
    _, _, _, pp = bl.thermo_full(q, aux)
    ind = (np.asarray(pp.liq) > 0) & (w > 0)
    M = np.asarray(g.M)
    Nq1, Nq2, Nq3 = g.Nq
    lev = lambda f: f.reshape(g.n_horz, g.n_vert, Nq3, Nq2 * Nq1)
    k = np.argmax(vals["core_frac"])
    nv, nk = k // Nq3, k % Nq3
    num = (lev(M * rho * w * ind)[:, nv, nk]).sum()
    den = (lev(M * rho * ind)[:, nv, nk]).sum()
    assert np.isclose(vals["w_core"][k], num / den, rtol=1e-12)
