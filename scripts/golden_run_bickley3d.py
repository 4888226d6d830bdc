"""Full golden run of the 3-D CNSE Bickley jet `fourth_order` table
(VERDICT r3 item 2): 25,000 SSPRK22Heuns steps at dt=0.004 on CPU f64,
then gate against the reference's shipped refvals
(/root/reference/test/Numerics/DGMethods/compressible_navier_stokes_equations/
three_dimensional/refvals_bickley_jet.jl).

Saves the raw statistics to scripts/out/bickley3d_<name>.json BEFORE
gating so a gate bug cannot waste the multi-hour run.

Usage: python scripts/golden_run_bickley3d.py [first_order|fourth_order]
"""
import json
import math
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cnse_refvals import _run_bickley3d  # noqa: E402
from tests.test_ocean_refvals import _load  # noqa: E402


def achieved_digits(got, ref):
    if ref == 0.0:
        return -math.log10(abs(got)) if got != 0.0 else 16.0
    rel = abs(got - ref) / abs(ref)
    return -math.log10(rel / 5.0) if rel > 0 else 16.0


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fourth_order"
    elems, order = {"first_order": (32, 1), "fourth_order": (13, 4)}[name]
    nsteps = int(os.environ.get("BICKLEY3D_NSTEPS", "25000"))
    ckpt = os.path.join(os.path.dirname(__file__), "out",
                        f"bickley3d_{name}_ckpt.npz")
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    t0 = time.perf_counter()
    fields = _run_bickley3d(elems, order, nsteps=nsteps, progress=True,
                            ckpt_path=ckpt)
    wall = time.perf_counter() - t0
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "out",
                            f"bickley3d_{name}.json")
    with open(out_path, "w") as f:
        json.dump({"name": name, "nsteps": nsteps, "wall_s": wall,
                   "fields": {repr(k): v for k, v in fields.items()}}, f,
                  indent=1)
    print(f"saved {out_path} ({wall:.0f}s)")

    rv = _load("bickley_jet_3d.py")
    ref = getattr(rv, name)
    parr = getattr(rv, "parr_" + name)
    worst = []
    for key, refrow in ref.items():
        for stat, g, r, d in zip(("min", "max", "mean", "std"),
                                 fields[key], refrow, parr[key]):
            ach = achieved_digits(g, r)
            status = "ok" if (d == 0 or ach >= min(d, 4)) else "FAIL"
            worst.append((status, key, stat, f"req={d}", f"ach={ach:.1f}",
                          g, r))
            print(worst[-1])
    nfail = sum(1 for w in worst if w[0] == "FAIL")
    print(f"RESULT {name}: {'PASS' if nfail == 0 else f'{nfail} FAILURES'}"
          f" (gate: min(parr, 4) digits)")


if __name__ == "__main__":
    main()
