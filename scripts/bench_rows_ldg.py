"""Prototype: rows-layout LDG gradient/divergence vs the current 4-D
face-tensor path.  Perf scratchpad for the hyperdiffusion chain rewrite."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state, \
    strong_gradient, ref_gradient, direction_dims, direction_faces
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def timeit(fn, *args, n=30, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    g = dg.grid
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    direction = "horizontal"
    dims = direction_dims(direction, g.dim)
    faces = direction_faces(direction, g.dim)

    # orientation structure
    P = np.asarray(g.face_perm_P)          # [nface, n_codes, Nfp, Nfp]
    n_codes = P.shape[1]
    same_across_faces = all(
        np.array_equal(P[0, c], P[f, c])
        for c in range(n_codes) for f in range(nface))
    oh = np.asarray(g.face_orient_onehot)  # [E, nface, n_codes]
    counts = oh.reshape(-1, n_codes).sum(axis=0)
    print(f"n_codes={n_codes} same_across_faces={same_across_faces} "
          f"row counts per code={counts}", flush=True)

    key = jax.random.PRNGKey(0)
    ng = 4
    gl = jax.random.normal(key, (E, Np, ng), dtype=jnp.float32)

    # ---- current path -----------------------------------------------------
    cur_grad = jax.jit(lambda x: dg.dg_gradient_of(x, direction))
    ms_cur_grad = timeit(cur_grad, gl)
    grad = cur_grad(gl)
    cur_div = jax.jit(lambda v: dg.dg_divergence_of(v, direction))
    ms_cur_div = timeit(cur_div, grad)

    # ---- rows-layout prototype ---------------------------------------------
    # static tables (numpy, setup time)
    idx = np.asarray(g.face_nbr_row)                  # [E, nface] -> row
    idx_flat = jnp.asarray(idx.reshape(-1))
    # rows-layout orientation: one [X, X] matmul per code + masked select
    # (P identical across faces here); row mask per code
    code_mask = []
    for c in range(n_codes):
        m = np.zeros((E * nface, 1), np.float32)
        m[:, 0] = oh[:, :, c].reshape(-1)
        code_mask.append(jnp.asarray(m))
    identity_code = [c for c in range(n_codes)
                     if np.array_equal(P[0, c], np.eye(Nfp))]
    print(f"identity codes: {identity_code}", flush=True)

    def perm_rows(rows_gathered, n):
        """Apply per-row orientation in rows layout via masked matmuls."""
        out = rows_gathered * 0.0
        for c in range(n_codes):
            if np.array_equal(P[0, c], np.eye(Nfp)):
                out = out + code_mask[c] * rows_gathered
            else:
                PK = jnp.asarray(np.kron(P[0, c], np.eye(n)),
                                 dtype=rows_gathered.dtype)
                out = out + code_mask[c] * (rows_gathered @ PK)
        return out

    # lift kron matrix: [nface*Nfp*n, Np*n] with sM folded per element?
    # sM varies per element -> multiply rows by sM_exp first.
    L = np.asarray(g.lift)                            # [Np, nface*Nfp]
    sM = np.asarray(g.sM)                             # [E, nface, Nfp]
    nrm = np.asarray(g.normals)                       # [E, nface, Nfp, 3]
    MI = np.asarray(g.MI)                             # [E, Np]

    def make_rows_exp(a, n):
        """[E, nface, Nfp] -> [E*nface, Nfp*n] lane-expanded."""
        return jnp.asarray(
            np.repeat(a.reshape(E * nface, Nfp), n, axis=1))

    def make_liftW(n, active_faces):
        """W[(f,k,j),(p,j)] = L[p, f*Nfp+k] for f in active faces."""
        nf = len(active_faces)
        W = np.zeros((nf * Nfp * n, Np * n), np.float32)
        for fi, f in enumerate(active_faces):
            for k in range(Nfp):
                for p in range(Np):
                    v = L[p, f * Nfp + k]
                    if v != 0.0:
                        r0 = (fi * Nfp + k) * n
                        c0 = p * n
                        W[r0:r0 + n, c0:c0 + n] = v * np.eye(n)
        return jnp.asarray(W)

    sMn_rows = [make_rows_exp(sM * nrm[..., c], ng) for c in range(3)]
    W4 = make_liftW(ng, faces)
    MI_j = jnp.asarray(MI)
    nf_active = len(faces)
    face_sel = np.zeros((E * nface,), bool)
    for f in faces:
        face_sel[np.arange(E) * nface + f] = True
    # active-face row selector as reshape+slice (faces assumed contiguous?)
    print(f"faces={faces}", flush=True)

    def rows_grad(x):
        rows = dg._face_rows(x)                       # [E*nface, Nfp*ng]
        gathered = rows[idx_flat]
        xP = perm_rows(gathered, ng)
        d = 0.5 * (xP - rows)                         # [E*nface, X]
        outs = []
        for c in range(3):
            t = (sMn_rows[c] * d).reshape(E, nface, Nfp * ng)
            t = t[:, list(faces)].reshape(E, nf_active * Nfp * ng)
            outs.append((t @ W4).reshape(E, Np, ng))
        corr = jnp.stack(outs, axis=2)                # [E, Np, 3, ng]
        vol = strong_gradient(g, x, dims)
        return vol + MI_j[:, :, None, None] * corr

    ms_rows_grad = timeit(jax.jit(rows_grad), gl)
    # parity
    ref = cur_grad(gl)
    got = jax.jit(rows_grad)(gl)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"grad:  current {ms_cur_grad:7.3f} ms   rows {ms_rows_grad:7.3f} ms"
          f"   rel err {err:.2e}", flush=True)

    # ---- divergence with scalar (n.v) exchange -----------------------------
    # s = sum_c n_c v_c computed in rows layout from v rows [E*nf, Nfp*3ng]
    nrm_exp3 = []
    for c in range(3):
        nrm_exp3.append(jnp.asarray(
            np.repeat(nrm[..., c].reshape(E * nface, Nfp), 3 * ng, axis=1)))
    # S matrix [Nfp*3ng, Nfp*ng] summing the c slots
    S = np.zeros((Nfp * 3 * ng, Nfp * ng), np.float32)
    for k in range(Nfp):
        for c in range(3):
            for j in range(ng):
                S[k * 3 * ng + c * ng + j, k * ng + j] = 1.0
    S_j = jnp.asarray(S)
    sM_rows1 = make_rows_exp(sM, ng)

    def rows_div(v):
        vflat = v.reshape(E, Np, 3 * ng)
        rows_v = dg._face_rows(vflat)                 # [E*nf, Nfp*3ng]
        # s rows with own outward normal; lane order = k*3ng + c*ng + j
        s = (rows_v * nrm_lane) @ S_j                 # [E*nf, Nfp*ng]
        s_nbr = perm_rows(s[idx_flat], ng)            # neighbor s (n+ . vP)
        # corr = 0.5 (n-.vP - n-.vM) = 0.5 (-s_nbr - s)
        d = -0.5 * (s_nbr + s)
        t = (sM_rows1 * d).reshape(E, nface, Nfp * ng)
        t = t[:, list(faces)].reshape(E, nf_active * Nfp * ng)
        corr = (t @ W4).reshape(E, Np, ng)
        # strong divergence (same as current volume part)
        dv = ref_gradient(g, vflat, dims)             # [E, nd, Np, 3*ng]
        dv = dv.reshape(E, len(dims), Np, 3, ng)
        div = 0.0
        for di, a in enumerate(dims):
            div = div + jnp.sum(g.xi_x[:, :, a, :, None] * dv[:, di],
                                axis=2)
        return div + MI_j[:, :, None] * corr

    # n_c lane weights: lane = k*3ng + c*ng + j -> value nrm[e,f,k,c]
    nrm_lane_np = np.zeros((E * nface, Nfp * 3 * ng), np.float32)
    nr = nrm.reshape(E * nface, Nfp, 3)
    for c in range(3):
        for j in range(ng):
            nrm_lane_np[:, c * ng + j::3 * ng] = nr[:, :, c]
    nrm_lane = jnp.asarray(nrm_lane_np)

    ms_rows_div = timeit(jax.jit(rows_div), grad)
    refd = cur_div(grad)
    gotd = jax.jit(rows_div)(grad)
    errd = float(jnp.max(jnp.abs(refd - gotd))
                 / (jnp.max(jnp.abs(refd)) + 1e-30))
    print(f"div:   current {ms_cur_div:7.3f} ms   rows {ms_rows_div:7.3f} ms"
          f"   rel err {errd:.2e}", flush=True)


if __name__ == "__main__":
    main()
