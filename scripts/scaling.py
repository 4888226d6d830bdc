"""Strong/weak scaling harness for the sharded Held-Suarez step
(BASELINE.md scaling points: 1-chip / 1-host / N-host).

On real hardware this measures points/s per chip across the device
counts JAX exposes; on CPU it validates the same code path over an
8-virtual-device mesh (set JAX_PLATFORMS=cpu, the script forces the
platform through the config API and requests 8 host devices).

Usage::

    python scripts/scaling.py [--mode strong|weak] [--steps 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.parallel import ShardedDGModel, make_mesh


def run(ndev, n_horz, n_vert, poly, steps, warm):
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    if ndev > 1:
        mesh = make_mesh(jax.devices()[:ndev])
        sdg = ShardedDGModel(dg, mesh)
        rhs = sdg
        q, aux = sdg.shard(q), sdg.shard(aux)
    else:
        rhs = dg
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    step = jax.jit(LSRK54CarpenterKennedy(
        lambda a, b, t: rhs(a, b, t), dt).step)
    t = 0.0
    for _ in range(warm):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    wall = time.perf_counter() - t0
    pts = cfg.grid.nelem * cfg.grid.Np
    return pts, wall / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["strong", "weak"], default="strong")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warm", type=int, default=2)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--n-horz", type=int, default=0,
                   help="base horizontal panel resolution (0 = auto)")
    p.add_argument("--n-vert", type=int, default=0)
    args = p.parse_args()

    on_cpu = jax.devices()[0].platform == "cpu"
    nh0 = args.n_horz or (4 if on_cpu else 16)
    nv0 = args.n_vert or (2 if on_cpu else 8)
    ndevs = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(jax.devices())]

    base = None
    rows = []
    for nd in ndevs:
        # weak mode grows the vertical so work per device stays constant
        # (columns never split: needs 6*nh0^2 % nd == 0, checked below)
        nh = nh0
        nv = nv0 if args.mode == "strong" else nv0 * nd
        # keep whole columns per shard: 6*nh^2 must divide by nd
        if (6 * nh * nh) % nd:
            continue
        pts, per_step = run(nd, nh, nv, args.poly, args.steps, args.warm)
        thr = pts / per_step
        per_chip = thr / nd
        if base is None:
            base = per_chip
        rows.append({"ndev": nd, "n_horz": nh, "gridpoints": pts,
                     "ms_per_step": round(per_step * 1e3, 3),
                     "points_per_s": round(thr, 1),
                     "points_per_s_per_chip": round(per_chip, 1),
                     "efficiency": round(per_chip / base, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # communication accounting (VERDICT r3 #5): per-step halo bytes from
    # the compiled HLO of the largest sharded config, with the
    # face-rows-only policy asserted (no all-gather, no volume-sized
    # permute payloads)
    nd = max(d for d in ndevs if not (6 * nh0 * nh0) % d)
    if nd > 1:
        from climatemachine_tpu.parallel.comm_audit import \
            audit_halo_exchange
        cfg = held_suarez_config(n_horz=nh0, n_vert=nv0, poly_order=args.poly,
                                 dtype=np.float32)
        dg = DGModel(cfg.model, cfg.grid)
        q, aux = init_ode_state(dg)
        mesh = make_mesh(jax.devices()[:nd])
        sdg = ShardedDGModel(dg, mesh, halo="ppermute")
        qs, auxs = sdg.shard(q), sdg.shard(aux)
        stats = audit_halo_exchange(sdg, lambda a, b: sdg(a, b, 0.0),
                                    qs, auxs)
        audit = {
            "ndev": nd,
            "rhs_permute_bytes_per_device": stats[
                "total_permute_bytes_per_call_per_device"],
            "n_permutes_per_rhs": stats["n_permutes"],
            "max_face_export_bytes": stats["max_face_export_bytes"],
            "local_state_bytes": int(np.asarray(qs).nbytes // nd),
            "policy": "no all-gather/all-to-all; every permute <= 2x "
                      "largest legitimate face export (asserted)",
        }
        print(json.dumps({"comm_audit": audit}), flush=True)


if __name__ == "__main__":
    main()
