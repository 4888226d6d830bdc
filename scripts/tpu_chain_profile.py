"""TPU micro-attribution of the hyperdiffusion LDG chain (legacy
layout): time each pass of grad -> div -> grad, plus variants, on the
Held-Suarez p4 config."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from _bench_util import timeit  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    bl = dg.balance_law
    direction = getattr(bl, "hyperdiffusion_direction", None) \
        or dg.diffusion_direction
    print("chain direction:", direction, flush=True)

    gl = jax.jit(lambda a, b: bl.compute_gradient_laplacian_argument(
        a, b, 0.0))(q, aux)
    jax.block_until_ready(gl)
    print("gl width:", gl.shape[-1], flush=True)

    try:
        ms = timeit(jax.jit(lambda a, b: bl.compute_gradient_laplacian_argument(
            a, b, 0.0)), q, aux)
        print(f"gl arg      : {ms:7.2f} ms", flush=True)
        grad = jax.jit(lambda x: dg.dg_gradient_of(x, direction))(gl)
        jax.block_until_ready(grad)
        ms = timeit(jax.jit(lambda x: dg.dg_gradient_of(x, direction)), gl)
        print(f"grad pass   : {ms:7.2f} ms  out {grad.shape}", flush=True)
        lap = jax.jit(lambda g: dg.dg_divergence_of(g, direction))(grad)
        jax.block_until_ready(lap)
        ms = timeit(jax.jit(lambda g: dg.dg_divergence_of(g, direction)), grad)
        print(f"div pass    : {ms:7.2f} ms  out {lap.shape}", flush=True)
        ms = timeit(jax.jit(lambda x: dg.dg_gradient_of(x, direction)), lap)
        print(f"grad2 pass  : {ms:7.2f} ms", flush=True)
        ms = timeit(jax.jit(lambda a, b: dg.hyperdiffusive_state(a, b, 0.0)),
                    q, aux)
        print(f"full chain  : {ms:7.2f} ms", flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
