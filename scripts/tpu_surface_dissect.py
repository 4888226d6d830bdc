"""Device-honest dissection of the var-major surface pass at bench
scale: bundle build+extraction, neighbor gather, flux math + lift —
which of the ~4 ms (loaded) is where?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402

_HI = __import__("jax").lax.Precision.HIGHEST


def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg, chain_kernel="pallas")
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    g = dg.grid
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    X = nface * Nfp

    T, p, c_s, auxv = vm._thermo_update(qv, auxv, 0.0)
    hyper = vm._chain(qv, auxv, T, p, 0.0)
    gl2, nu = hyper

    def meas(name, fn, x0, lo=2, hi=10):
        def mk():
            return fn
        ms = titer(mk, x0, k_lo=lo, k_hi=hi)
        print(f"{name:28s}: {ms:7.2f} ms", flush=True)

    # full surface (with fused hyper correction)
    def full(y):
        out = vm._surface(y, auxv, p, c_s, 0.0, hyper=hyper)
        return y + 1e-30 * out
    meas("surface full (hyper)", full, qv)

    def nohyp(y):
        out = vm._surface(y, auxv, p, c_s, 0.0, hyper=None)
        return y + 1e-30 * out
    meas("surface full (no hyper)", nohyp, qv)

    # bundle concat + extraction matmul only
    nq = vm.nq
    def bundle(y):
        parts = [y, p[:, None, :], c_s[:, None, :],
                 vm._aux(auxv, "ref_state.p")[:, None, :]]
        phi = auxv[:, vm.i_phi, :]
        rhoe_r = vm._aux(auxv, "ref_state.rhoe")
        rho_r = vm._aux(auxv, "ref_state.rho")
        T_r = vm._aux(auxv, "ref_state.T")
        coeff = (rhoe_r + vm._aux(auxv, "ref_state.p")) / rho_r
        ps = vm.bl.param_set
        cl = jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d * T_r)
        parts += [phi[:, None, :], coeff[:, None, :], cl[:, None, :]]
        B = jnp.concatenate(parts, axis=1)
        B = jnp.concatenate(
            [B, gl2.reshape(E, 3 * gl2.shape[2], Np), nu], axis=1)
        nvb = B.shape[1]
        Bx = jnp.matmul(B.reshape(E * nvb, Np), g.lift,
                        precision=_HI).reshape(E, nvb, X)
        return y + 1e-30 * Bx[:, :nq, :Np]
    meas("bundle concat+extract", bundle, qv)

    # gather only (on a prebuilt face tensor, halo-free path)
    tab = vm._stab
    nvb = nq + 2 + 1 + 3 + 3 * gl2.shape[2] + 2 + nq
    Bf = jnp.ones((E, nvb, X), qv.dtype)

    def gather(y):
        blocks = []
        for f in range(nface):
            o = int(tab["opp"][f])
            src = y[:, :, o * Nfp:(o + 1) * Nfp]
            blk = src[tab["nbr_e"][f]]
            for fsrc, rows, src_e in tab["fix"][f]:
                fixed = y[src_e][:, :, fsrc * Nfp:(fsrc + 1) * Nfp]
                blk = blk.at[rows].set(fixed)
            blocks.append(blk)
        BP = jnp.concatenate(blocks, axis=2)
        return y + 1e-30 * BP
    meas(f"gather (nvb={nvb})", gather, Bf)

    # lift matmul only
    fst = jnp.ones((E, nq, X), qv.dtype)

    def lift(y):
        lifted = jnp.matmul(y.reshape(E * nq, X), g.lift.T,
                            precision=_HI).reshape(E, nq, Np)
        return y + 1e-30 * jnp.pad(lifted, ((0, 0), (0, 0), (0, X - Np)))
    meas("lift matmul", lift, fst)


if __name__ == "__main__":
    main()
