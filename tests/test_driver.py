"""Driver layer tests: configs, solver config, invoke, callbacks,
checkpoint/restart (reference test/Driver/)."""

import logging
import os

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.driver import callbacks as cbs
from climatemachine_tpu.driver import checkpoint as cp
from climatemachine_tpu.driver.configs import (AtmosLESConfiguration,
                                               SingleStackConfiguration)
from climatemachine_tpu.driver.driver import (SETTINGS, init, invoke,
                                              parse_interval)
from climatemachine_tpu.driver.solver_configs import make_solver_configuration
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import DryAdiabaticProfile


def _les_model():
    ps = EARTH
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)))

    def init_state(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        r = jnp.sqrt((x - 500.0) ** 2 + (z - 300.0) ** 2)
        thp = 2.0 * jnp.clip(1 - r / 200.0, 0, 1)
        T = (300.0 + thp) * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        return m.prog_spec.pack(
            {"rho": rho, "rhoe": rho * (td.internal_energy(ps, T) + Phi)},
            batch_shape=rho.shape)

    return AtmosModel(physics,
                      AtmosProblem(init_state=init_state,
                                   boundary_conditions=(AtmosBC(), AtmosBC())),
                      sources=(Gravity(),))


def test_interval_grammar():
    assert parse_interval("never", 1.0) is None
    assert parse_interval("1000steps", 1.0) == ("steps", 1000)
    assert parse_interval("3.3sdays", 1.0) == ("simtime", 3.3 * 86400)
    assert parse_interval("2shours", 1.0) == ("simtime", 7200.0)
    assert parse_interval("30mins", 1.0) == ("walltime", 1800.0)
    with pytest.raises(ValueError):
        parse_interval("bogus", 1.0)


def test_les_config_end_to_end(tmp_path, caplog):
    init(show_updates="5steps", checkpoint="10steps",
         checkpoint_dir=str(tmp_path), checkpoint_at_end=False)
    model = _les_model()
    dc = AtmosLESConfiguration("bubble", 4, (50.0, 50.0, 50.0),
                               1000.0, 1000.0, 1000.0, model,
                               dtype=np.float64)
    sc = make_solver_configuration(0.0, -1.0, dc, Courant_number=0.4)
    # configure a real run of ~12 steps
    sc.timeend = 12 * sc.dt
    cons = cbs.ConservationCheck(dc.grid, model, "rho", 1e-7, every_steps=5)
    with caplog.at_level(logging.INFO, logger="climatemachine"):
        ratio = invoke(sc, check_cons=(cons,))
    assert np.isfinite(ratio) and abs(ratio - 1.0) < 0.1
    # checkpoint written at step 10
    assert os.path.exists(cp.checkpoint_path(str(tmp_path), "bubble", 0))
    q0, aux0, t0, step0 = cp.read_checkpoint(str(tmp_path), "bubble", 0)
    assert step0 == 10 and q0.shape == np.asarray(sc.q).shape


def test_checkpoint_on_crash(tmp_path):
    """A crash mid-run writes a checkpoint of the last COMPLETED step
    when checkpoint_on_crash is set, independently of checkpoint_at_end
    (reference Driver.jl:828-839)."""
    init(checkpoint_on_crash=True, checkpoint_at_end=False,
         checkpoint_dir=str(tmp_path))
    model = _les_model()
    dc = AtmosLESConfiguration("crash", 3, (100.0, 100.0, 100.0),
                               1000.0, 1000.0, 1000.0, model,
                               dtype=np.float64)
    sc = make_solver_configuration(0.0, 0.0, dc, ode_dt=0.05)
    sc.timeend = 10 * sc.dt

    class _Bomb:
        def call(self, state):
            if state.step >= 3:
                raise RuntimeError("boom")
            return False

    with pytest.raises(RuntimeError, match="boom"):
        invoke(sc, user_callbacks=(_Bomb(),))
    q0, aux0, t0, step0 = cp.read_checkpoint(str(tmp_path), "crash", 9999)
    assert step0 == 3
    assert abs(t0 - 3 * sc.dt) < 1e-12
    assert np.all(np.isfinite(q0))

    # the knob is independent: with it off, a crash writes nothing
    init(checkpoint_on_crash=False, checkpoint_at_end=False,
         checkpoint_dir=str(tmp_path))
    sc2 = make_solver_configuration(0.0, 0.0, dc, ode_dt=0.05)
    sc2.timeend = 10 * sc2.dt
    os.remove(cp.checkpoint_path(str(tmp_path), "crash", 9999))
    with pytest.raises(RuntimeError, match="boom"):
        invoke(sc2, user_callbacks=(_Bomb(),))
    assert not os.path.exists(
        cp.checkpoint_path(str(tmp_path), "crash", 9999))


def test_checkpoint_restart_roundtrip(tmp_path):
    init()
    model = _les_model()
    dc = AtmosLESConfiguration("ckpt", 3, (100.0, 100.0, 100.0),
                               1000.0, 1000.0, 1000.0, model,
                               dtype=np.float64)
    sc = make_solver_configuration(0.0, 0.0, dc, ode_dt=0.05)
    sc.timeend = 5 * sc.dt
    invoke(sc)
    cp.write_checkpoint(str(tmp_path), "ckpt", 0, sc.q, sc.aux,
                        sc.timeend, 5)

    sc2 = make_solver_configuration(
        0.0, 10 * 0.05, dc, ode_dt=0.05,
        restart_from=(str(tmp_path), 0))
    assert abs(sc2.t0 - sc.timeend) < 1e-12
    assert float(jnp.max(jnp.abs(sc2.q - sc.q))) == 0.0


def test_single_stack_configuration():
    model = _les_model()
    dc = SingleStackConfiguration("stack", 3, 5, 1000.0, model,
                                  dtype=np.float64)
    assert dc.grid.nelem == 5
    assert dc.grid.n_vert == 5
