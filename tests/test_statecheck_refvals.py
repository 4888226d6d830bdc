"""Golden-statistics regression: a fixed 30-step Held-Suarez p3 run must
reproduce stored per-field min/max/mean/std (reference StateCheck
scdocheck + test/Ocean/refvals/*.jl pattern)."""

import importlib.util
import os

import jax
import numpy as np

from climatemachine_tpu.diagnostics.state_check import StateCheck
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def _load_refvals():
    path = os.path.join(os.path.dirname(__file__), "refvals",
                        "held_suarez.py")
    spec = importlib.util.spec_from_file_location("hs_refvals", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.refvals


def test_held_suarez_refvals():
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    step = jax.jit(LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t),
                                          dt).step)
    t = 0.0
    for _ in range(30):
        q, aux = step(q, aux, t)
        t += dt

    class _State:
        pass

    s = _State()
    s.q = q
    sc = StateCheck(tracked=((lambda st: st.q, cfg.model.prog_spec, "Q"),))
    sc.snapshot(s)
    # momentum means sit near zero -> statistics there are noise-scaled;
    # per-field tolerance mirrors the reference per-refval budgets
    rtols = {k: 1e-6 for k in _load_refvals()}
    rtols[("Q", "rhou[0]")] = 1e-4
    rtols[("Q", "rhou[1]")] = 1e-4
    rtols[("Q", "rhou[2]")] = 1e-4
    assert sc.do_check(_load_refvals(), rtols)
