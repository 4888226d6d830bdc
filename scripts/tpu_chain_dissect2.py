"""Finer dissection of the var-major chain + F2 build + surface variants."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg import ldg_varmajor as _lvm
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    g = dg.grid
    E, Np, nq = g.nelem, g.Np, vm.nq

    T, p, c_s, auxv = vm._thermo_update(qv, auxv, 0.0)
    bl = dg.balance_law
    ps = bl.param_set
    rho = qv[:, 0, :]
    ru = qv[:, 1:4, :]
    u = ru / rho[:, None, :]
    k = auxv[:, vm.i_gphi, :] / ps.grav
    u_h = u - jnp.sum(u * k, axis=1, keepdims=True) * k
    h_tot = (qv[:, 4, :] + p) / rho
    glv = jnp.concatenate([u_h, h_tot[:, None, :]], axis=1)
    ngl = glv.shape[1]
    faces, dims = vm.chain_faces, vm.chain_dims
    tab = _lvm._tables(dg, faces, ngl)
    geom = _lvm._geom(dg, faces, dims)
    grad = _lvm.grad_vm(dg, glv, tab, geom, dims, None)
    lap = _lvm.div_vm(dg, grad, tab, geom, dims, None)
    gl2 = _lvm.grad_vm(dg, lap, tab, geom, dims, None)
    F2v = vm._hyper_F2(qv, auxv, T, p, 0.0)

    def mk(fn):
        def make_body():
            def body(y):
                return fn(y)
            return make_body_inner(fn)
        def make_body_inner(fn):
            def body(y):
                return fn(y)
            return body
        return make_body_inner(fn)

    def meas(name, fn, x0, lo=2, hi=10):
        def make_body():
            def body(y):
                return fn(y)
            return body
        ms = titer(make_body, x0, k_lo=lo, k_hi=hi)
        print(f"{name:26s}: {ms:7.2f} ms", flush=True)

    def gl_of(y):
        uy = y[:, 1:4] / y[:, 0, None]
        uh = uy - jnp.sum(uy * k, axis=1, keepdims=True) * k
        return jnp.concatenate([uh, ((y[:, 4] + p) / y[:, 0])[:, None]],
                               axis=1)

    meas("gl build", lambda y: y.at[:, :4, :].add(1e-30 * gl_of(y)), qv)

    meas("grad pass (ngl=4)",
         lambda y: y.at[:, :4, :].add(
             1e-30 * _lvm.grad_vm(dg, y[:, :4], tab, geom, dims,
                                  None)[:, 0]), qv)
    meas("div pass",
         lambda y: y.at[:, :4, :].add(1e-30 * _lvm.div_vm(
             dg, grad * (1 + y[0, 0, 0] * 1e-30), tab, geom, dims,
             None)), qv, lo=2, hi=8)

    # transform+F2 build as in fast_rhs (at[].set into zeros)
    def f2_build(y):
        delta = vm._aux(auxv, "hyperdiffusion.delta")
        nu4 = (delta / 2) ** 4 / (2 * vm.hd.tau_timescale)
        gl2y = gl2 * (1 + 1e-30 * y[0, 0, 0])
        F2 = jnp.zeros((E, 3, nq, Np), dtype=qv.dtype)
        gu = nu4[:, None, None, :] * gl2y[:, :, 0:3, :]
        F2 = F2.at[:, :, 1:4, :].set(rho[:, None, None, :] * gu)
        Fe = (jnp.sum(gu * ru[:, None, :, :], axis=2)
              + rho[:, None, :] * nu4[:, None, :] * gl2y[:, :, 3, :])
        F2 = F2.at[:, :, 4, :].set(Fe)
        return y + 1e-30 * F2[:, 0]
    meas("F2 build (at.set)", f2_build, qv)

    # transform+F2 build via concatenate
    def f2_build2(y):
        delta = vm._aux(auxv, "hyperdiffusion.delta")
        nu4 = (delta / 2) ** 4 / (2 * vm.hd.tau_timescale)
        gl2y = gl2 * (1 + 1e-30 * y[0, 0, 0])
        gu = nu4[:, None, None, :] * gl2y[:, :, 0:3, :]
        Fe = (jnp.sum(gu * ru[:, None, :, :], axis=2)
              + rho[:, None, :] * nu4[:, None, :] * gl2y[:, :, 3, :])
        zero = jnp.zeros((E, 3, 1, Np), dtype=qv.dtype)
        F2 = jnp.concatenate([zero, rho[:, None, None, :] * gu,
                              Fe[:, :, None, :]], axis=2)
        return y + 1e-30 * F2[:, 0]
    meas("F2 build (concat)", f2_build2, qv)

    meas("surface (no F2)",
         lambda y: y + 1e-30 * vm._surface(y, auxv, p, c_s, 0.0), qv)
    meas("surface (fused F2)",
         lambda y: y + 1e-30 * vm._surface(y, auxv, p, c_s, 0.0,
                                           F2v=F2v), qv)
    meas("scalar hyper corr",
         lambda y: y + 1e-30 * vm._scalar_hyper_vm(
             F2v * (1 + 1e-30 * y[0, 0, 0]), vm.all_faces), qv)
    meas("FULL vm RHS", lambda y: y + 1e-30 * vm(y, auxv, 0.0)[0], qv)


if __name__ == "__main__":
    main()
