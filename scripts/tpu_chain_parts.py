"""TPU attribution: volume vs face-exchange cost inside the fused
hyperdiffusion chain (one jit per variant, Held-Suarez p4 config)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import (DGModel, init_ode_state,
                                               direction_dims,
                                               direction_faces,
                                               strong_gradient, ref_gradient)
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    bl, g = dg.balance_law, dg.grid
    direction = getattr(bl, "hyperdiffusion_direction", None) \
        or dg.diffusion_direction
    dims = direction_dims(direction, g.dim)
    faces = direction_faces(direction, g.dim)

    def vol_grad(x):
        return strong_gradient(g, x, dims)

    def vol_div(v):
        E, nc, n = v.shape[0], v.shape[2], v.shape[3]
        vflat = v.reshape(E, g.Np, nc * n)
        dv = ref_gradient(g, vflat, dims)
        dv = dv.reshape(E, len(dims), g.Np, nc, n)
        div = 0.0
        for idx, a in enumerate(dims):
            div = div + jnp.sum(g.xi_x[:, :, a, :, None] * dv[:, idx],
                                axis=2)
        return div

    def chain_full(q, aux):
        return dg.hyperdiffusive_state(q, aux, 0.0)

    def chain_vol_only(q, aux):
        gl = bl.compute_gradient_laplacian_argument(q, aux, 0.0)
        grad = vol_grad(gl)
        lap = vol_div(grad)
        grad_lap = vol_grad(lap)
        return bl.transform_post_gradient_laplacian(grad_lap, q, aux, 0.0)

    def face_grad(x):
        xM, xP = dg._gather_faces(x, faces)
        nrm = g.normals[:, faces, :, :]
        corr = nrm[..., :, None] * (0.5 * (xP + xM) - xM)[..., None, :]
        sM = g.sM[:, faces, :, None, None]
        return dg._lift(sM * corr, faces)

    def face_div(v):
        E, nc, n = v.shape[0], v.shape[2], v.shape[3]
        vflat = v.reshape(E, g.Np, nc * n)
        nrm = g.normals[:, faces, :, :]
        vM, vP = dg._gather_faces(vflat, faces)
        vM = vM.reshape(vM.shape[:-1] + (nc, n))
        vP = vP.reshape(vP.shape[:-1] + (nc, n))
        diff = 0.5 * (vP + vM) - vM
        corr = sum(nrm[..., c, None] * diff[..., c, :]
                   for c in range(nrm.shape[-1]))
        sM = g.sM[:, faces, :, None]
        return dg._lift(sM * corr, faces)

    def chain_face_only(q, aux):
        gl = bl.compute_gradient_laplacian_argument(q, aux, 0.0)
        grad = face_grad(gl)
        lap = face_div(grad)
        grad_lap = face_grad(lap)
        return bl.transform_post_gradient_laplacian(grad_lap, q, aux, 0.0)

    for name, fn in [("full", chain_full), ("vol-only", chain_vol_only),
                     ("face-only", chain_face_only)]:
        f = jax.jit(fn)
        out = f(q, aux)
        jax.block_until_ready(out)
        ms = timeit(f, q, aux)
        print(f"{name:10s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
