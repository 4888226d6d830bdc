"""Profile the pathological kernelA+flux composition: capture an XLA
trace of k iterations of (bundle_pallas + gather + flux) and summarize
device op self-times."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    vm.surface_kernel = "hybrid"
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)
    hyper = (gl2, nu)
    eps = 1e-12

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def runk(x, k):
        def body(i, y):
            s = vm._surface(y, auxv2, p, c_s, 0.0, hyper=hyper)
            return y + eps * s
        y = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(y * 0.0) + y.ravel()[0] * 1e-30

    float(runk(qv, 8))          # compile+warm
    import time
    with jax.profiler.trace("/tmp/hybrid_trace"):
        t0 = time.perf_counter()
        float(runk(qv, 8))
        print("8 iters:", (time.perf_counter() - t0) * 1e3, "ms",
              flush=True)


if __name__ == "__main__":
    main()
