"""TPU primitive probe for the var-major LDG chain redesign:
cost of (a) rows transposes, (b) 2-D row gathers, (c) batched D matmuls,
(d) metric elementwise combines, at Held-Suarez p4 scale."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit  # noqa: E402

E, Np, Nfp, nf, dim = 12288, 125, 25, 4, 3
key = jax.random.PRNGKey(0)


def t(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    print(f"{name:42s}: {timeit(f, *args):7.3f} ms", flush=True)


def main():
    for n in (4, 12):
        X = jax.random.normal(key, (E, n, Np), jnp.float32)
        s = jax.random.normal(key, (E, n, nf * Nfp), jnp.float32)
        R2 = jax.random.normal(key, (E * nf, n * Nfp), jnp.float32)
        idx = np.random.permutation(E * nf).astype(np.int32)
        D2 = jax.random.normal(key, (Np, 2 * Np), jnp.float32)
        SelT = jax.random.normal(key, (Np, nf * Nfp), jnp.float32)
        LT = jax.random.normal(key, (nf * Nfp, Np), jnp.float32)
        xi = jax.random.normal(key, (E, 2, dim, Np), jnp.float32)

        print(f"--- n = {n}")
        # (a) transpose (E, n, nf, Nfp) -> (E*nf, n*Nfp)
        t("rows transpose s->R2", lambda s: s.reshape(E, n, nf, Nfp)
          .transpose(0, 2, 1, 3).reshape(E * nf, n * Nfp), s)
        # and back
        t("rows transpose R2->s", lambda r: r.reshape(E, nf, n, Nfp)
          .transpose(0, 2, 1, 3).reshape(E, n, nf * Nfp), R2)
        # (b) row gather on 2-D rows
        t("row gather R2[idx]", lambda r: r[idx], R2)
        # (c) volume derivative matmul (both dims in one matmul)
        t("vol matmul [E*n,125]@[125,250]",
          lambda x: (x.reshape(E * n, Np) @ D2).reshape(E, n, 2, Np), X)
        # (c2) face extraction matmul
        t("face extract X@SelT", lambda x: x.reshape(E * n, Np) @ SelT, X)
        # (c3) lift matmul
        t("lift s@LT", lambda s: (s.reshape(E * n, nf * Nfp) @ LT)
          .reshape(E, n, Np), s)
        # (d) metric combine: out[e,c,i,p] = sum_a xi[e,a,c,p]*dx[e,a,i,p]
        dx = jax.random.normal(key, (E, 2, n, Np), jnp.float32)
        t("metric combine -> [E,3,n,Np]",
          lambda xi, dx: jnp.einsum("eacp,eaip->ecip", xi, dx), xi, dx)
        # (e) the n.v scalar contraction on faces, var-major
        rows_vm = jax.random.normal(key, (E, dim, n, nf * Nfp), jnp.float32)
        nrm_vm = jax.random.normal(key, (E, dim, 1, nf * Nfp), jnp.float32)
        t("n.v contraction", lambda r, m: jnp.sum(r * m, axis=1),
          rows_vm, nrm_vm)
        # (f) final node-major conversion [E,3n,Np] -> [E,Np,3,n]
        Y = jax.random.normal(key, (E, dim * n, Np), jnp.float32)
        t("to node-major [E,Np,3n]",
          lambda y: y.transpose(0, 2, 1), Y)


if __name__ == "__main__":
    main()
