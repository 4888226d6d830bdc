"""Top-level driver: settings, init, invoke.

Scope of reference ``src/Driver/Driver.jl``: ClimateMachine_Settings
(:57-90), precedence CLI > ENV(CLIMATEMACHINE_SETTINGS_*) > kwargs >
defaults (:123,:394-400), parse_commandline with the interval grammar
(:178,:191-198), init (:469), init_runtime (:566), invoke! (:670:
callbacks, energy bookends, try/except crash checkpoint, conservation and
analytic-distance checks).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger("climatemachine")

_ENV_PREFIX = "CLIMATEMACHINE_SETTINGS_"


@dataclass
class Settings:
    """(reference ClimateMachine_Settings, Driver.jl:57-90)"""
    disable_gpu: bool = False
    show_updates: str = "60secs"
    diagnostics: str = "never"
    vtk: str = "never"
    vtk_number_sample_points: int = 0
    monitor_timestep_duration: str = "never"
    monitor_courant_numbers: str = "never"
    adapt_timestep: str = "never"
    checkpoint: str = "never"
    checkpoint_keep_one: bool = True
    checkpoint_at_end: bool = False
    checkpoint_on_crash: bool = False
    checkpoint_dir: str = "checkpoint"
    restart_from_num: int = -1
    fix_rng_seed: bool = False
    debug_init: bool = False
    log_level: str = "INFO"
    output_dir: str = "output"
    integration_testing: bool = False
    array_type: str = "auto"          # auto | cpu | tpu
    sim_time: float = float("nan")
    fixed_number_of_steps: int = -1
    degree: int = -1
    nelems: int = -1


SETTINGS = Settings()

_INTERVAL_RE = re.compile(
    r"^([0-9.]+)(smonths|sdays|shours|smins|ssecs|steps)$")


def parse_interval(spec: str, dt: float, day: float = 86400.0):
    """Interval mini-grammar: '2hours' wall, '1000steps', '3.3sdays' sim
    time, 'never' (reference Driver.jl:191-198, Callbacks.CbGetter).

    Returns ('steps', n) | ('simtime', secs) | ('walltime', secs) | None.
    """
    if spec in (None, "", "never"):
        return None
    m = _INTERVAL_RE.match(spec)
    if m:
        val, unit = float(m.group(1)), m.group(2)
        mult = {"smonths": 30 * day, "sdays": day, "shours": 3600.0,
                "smins": 60.0, "ssecs": 1.0, "steps": 1.0}[unit]
        if unit == "steps":
            return ("steps", int(val))
        return ("simtime", val * mult)
    m2 = re.match(r"^([0-9.]+)(hours|mins|secs)$", spec)
    if m2:
        val, unit = float(m2.group(1)), m2.group(2)
        mult = {"hours": 3600.0, "mins": 60.0, "secs": 1.0}[unit]
        return ("walltime", val * mult)
    raise ValueError(f"unparsable interval: {spec!r}")


def _interval_callback(spec: str, dt: float, fn):
    from climatemachine_tpu.driver import callbacks as cbs
    parsed = parse_interval(spec, dt)
    if parsed is None:
        return None
    kind, val = parsed
    if kind == "steps":
        return cbs.EveryXSimulationSteps(fn, int(val))
    if kind == "simtime":
        return cbs.EveryXSimulationTime(fn, val)
    return cbs.EveryXWallTimeSeconds(fn, val)


def parse_commandline(argv: Optional[Sequence[str]] = None,
                      custom_clargs: Optional[argparse.ArgumentParser] = None
                      ) -> dict:
    """CLI flags mirroring the reference ArgParse table (Driver.jl:178)."""
    p = custom_clargs or argparse.ArgumentParser("climatemachine")
    for f in dataclasses.fields(Settings):
        flag = "--" + f.name.replace("_", "-")
        if f.type == bool or isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true"),
                           default=None)
        elif isinstance(f.default, int):
            p.add_argument(flag, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(flag, type=float, default=None)
        else:
            p.add_argument(flag, type=str, default=None)
    ns, _ = p.parse_known_args(argv)
    return {k: v for k, v in vars(ns).items() if v is not None}


def get_setting(name: str, cli: dict, kwargs: dict):
    """Precedence CLI > ENV > kwargs > defaults (reference :123-151)."""
    if name in cli and cli[name] is not None:
        return cli[name]
    env = os.environ.get(_ENV_PREFIX + name.upper())
    if env is not None:
        default = getattr(Settings(), name)
        if isinstance(default, bool):
            return env.lower() in ("1", "true", "yes")
        return type(default)(env)
    if name in kwargs:
        return kwargs[name]
    return getattr(Settings(), name)


def init(parse_clargs: bool = False, argv=None, custom_clargs=None,
         **kwargs) -> Settings:
    """(reference Driver.jl:469 + init_runtime :566)"""
    cli = parse_commandline(argv, custom_clargs) if parse_clargs else {}
    for f in dataclasses.fields(Settings):
        setattr(SETTINGS, f.name, get_setting(f.name, cli, kwargs))

    logging.basicConfig(
        level=getattr(logging, SETTINGS.log_level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    if SETTINGS.fix_rng_seed:
        np.random.seed(1000 * _process_index())

    if SETTINGS.array_type == "cpu" or SETTINGS.disable_gpu:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    return SETTINGS


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def invoke(solver_config, user_callbacks: Sequence = (),
           diagnostics_config=None,
           check_cons: Sequence = (),
           check_euclidean_distance: bool = False):
    """Run the simulation with standard callbacks (reference Driver.jl:670).

    Returns final norm(Q)/norm(Q0) energy ratio like the reference logs.
    """
    import jax.numpy as jnp

    from climatemachine_tpu.dg.reductions import euclidean_distance, norm
    from climatemachine_tpu.driver import callbacks as cbs
    from climatemachine_tpu.ode.solve import solve

    sc = solver_config
    dt = sc.dt
    callbacks = list(user_callbacks)

    parsed = parse_interval(SETTINGS.show_updates, dt)
    if parsed is not None:
        summary = cbs.SummaryLog(sc.dg.grid)
        inner = summary.make()
        if parsed[0] == "steps":
            inner.nsteps = int(parsed[1])
            callbacks.append(inner)
        else:
            callbacks.append(_interval_callback(
                SETTINGS.show_updates, dt, inner.fn))

    if parse_interval(SETTINGS.monitor_timestep_duration, dt):
        mon = cbs.MonitorTimestepDuration()
        m = mon.make()
        callbacks.append(m)
    if parse_interval(SETTINGS.monitor_courant_numbers, dt):
        callbacks.append(cbs.MonitorCourant(
            sc.dg.grid, sc.dg.balance_law, dt).make())
    parsed_adp = parse_interval(SETTINGS.adapt_timestep, dt)
    if parsed_adp:
        n = parsed_adp[1] if parsed_adp[0] == "steps" else max(
            int(parsed_adp[1] / dt), 1)
        callbacks.append(cbs.AdaptTimestep(sc, every_steps=n).make())
    if parse_interval(SETTINGS.checkpoint, dt):
        parsed_cp = parse_interval(SETTINGS.checkpoint, dt)
        n = parsed_cp[1] if parsed_cp[0] == "steps" else max(
            int(parsed_cp[1] / dt), 1)
        callbacks.append(cbs.CheckpointCallback(
            SETTINGS.checkpoint_dir, sc.name, every_steps=n,
            keep_one=SETTINGS.checkpoint_keep_one).make())
    for check in check_cons:
        callbacks.append(check.make())
    if diagnostics_config is not None:
        callbacks.extend(diagnostics_config.make_callbacks(sc, dt))

    eng0 = float(norm(sc.dg.grid, sc.q))
    logger.info("starting: norm(Q) = %.16e", eng0)

    # track the last completed step so a crash checkpoint captures the
    # state AT the crash, not the initial condition (reference
    # Driver.jl:828-839 checkpoint-on-crash from the catch block)
    class _StateTracker:
        state = None

        def call(self, state):
            type(self).state = state
            return False

    tracker = _StateTracker()
    # first in the callback list: captures the step even when a later
    # callback is what raises
    callbacks.insert(0, tracker)

    try:
        state = solve(sc.q, sc.aux, sc.solver, sc.timeend, t0=sc.t0,
                      callbacks=callbacks)
    except Exception:
        # dedicated knob, decoupled from end-of-run checkpointing
        # (reference Settings.checkpoint_on_crash)
        if SETTINGS.checkpoint_on_crash:
            from climatemachine_tpu.driver import checkpoint as cp
            st = tracker.state
            if st is not None:
                cp.write_checkpoint(SETTINGS.checkpoint_dir, sc.name,
                                    9999, st.q, st.aux, st.t, st.step)
            else:
                cp.write_checkpoint(SETTINGS.checkpoint_dir, sc.name,
                                    9999, sc.q, sc.aux, sc.t0, 0)
        raise

    sc.q, sc.aux = state.q, state.aux
    engf = float(norm(sc.dg.grid, state.q))
    logger.info("finished: norm(Q) = %.16e  ratio %.16e", engf,
                engf / eng0 if eng0 else float("nan"))

    if SETTINGS.checkpoint_at_end:
        from climatemachine_tpu.driver import checkpoint as cp
        cp.write_checkpoint(SETTINGS.checkpoint_dir, sc.name, 9999,
                            state.q, state.aux, state.t, state.step)

    if check_euclidean_distance:
        from climatemachine_tpu.dg.spatial import init_ode_state
        qe, _ = init_ode_state(sc.dg, state.t)
        dist = float(euclidean_distance(sc.dg.grid, state.q, qe))
        logger.info("euclidean distance from analytic init: %.16e", dist)

    return engf / eng0 if eng0 else float("nan")
