"""Full golden run of the SplitExplicit01 double gyre (VERDICT r3
item 2): 75 slow steps (3 days) of the LSRK3n split-explicit solver on
CPU f64, gated against the reference's shipped
/root/reference/test/Ocean/refvals/simple_dbl_gyre_refvals.jl table at
the reference's own parr (no caps, no zeroed fields) — the point of
this run is to find out the real achieved digits per statistic.

Saves the raw statistics to scripts/out/dbl_gyre.json BEFORE gating.
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

from tests.test_simple_box_ivd_refvals import _run_dbl_gyre  # noqa: E402
from tests.test_ocean_refvals import _load  # noqa: E402


def achieved_digits(got, ref):
    if ref == 0.0:
        return -math.log10(abs(got)) if got != 0.0 else 16.0
    rel = abs(got - ref) / abs(ref)
    return -math.log10(rel / 5.0) if rel > 0 else 16.0


def main():
    nsteps = int(os.environ.get("DBL_GYRE_NSTEPS", "75"))
    ckpt = os.path.join(os.path.dirname(__file__), "out",
                        "dbl_gyre_ckpt.npz")
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    t0 = time.perf_counter()
    fields = _run_dbl_gyre(nsteps=nsteps, progress=True, ckpt_path=ckpt)
    wall = time.perf_counter() - t0
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "out", "dbl_gyre.json")
    with open(out_path, "w") as f:
        json.dump({"nsteps": nsteps, "wall_s": wall,
                   "fields": {repr(k): v for k, v in fields.items()}}, f,
                  indent=1)
    print(f"saved {out_path} ({wall:.0f}s)")

    rv = _load("simple_dbl_gyre.py")
    nfail = 0
    for key, refrow in rv.varr.items():
        for stat, g, r, d in zip(("min", "max", "mean", "std"),
                                 fields[key], refrow, rv.parr[key]):
            ach = achieved_digits(g, r)
            status = "ok" if (d == 0 or ach >= d) else "FAIL"
            nfail += status == "FAIL"
            print((status, key, stat, f"req={d}", f"ach={ach:.1f}", g, r))
    print(f"RESULT dbl_gyre: {'PASS' if nfail == 0 else f'{nfail} FAILURES'}"
          f" (gate: reference parr, uncapped)")


if __name__ == "__main__":
    main()
