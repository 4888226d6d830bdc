"""Analytic FLOP budget for the Held-Suarez p4 RHS (VERDICT r2 #10).

Counts the matmul FLOPs of every pass of the benchmark RHS from the
static config (2·M·N·K per [M,K]x[K,N] matmul) plus the leading
elementwise terms, so PERF_NOTES can report achieved TFLOP/s and
%-of-chip next to every measured number.

Run:  python scripts/flop_budget.py [n_horz n_vert poly]
"""

import sys

nh = int(sys.argv[1]) if len(sys.argv) > 1 else 16
nv = int(sys.argv[2]) if len(sys.argv) > 2 else 8
p = int(sys.argv[3]) if len(sys.argv) > 3 else 4

E = 6 * nh * nh * nv
Nq = p + 1
Np = Nq ** 3
Nfp = Nq ** 2
nface = 6
X = nface * Nfp          # face lanes
n = 5                    # prognostic
n_hyper = 4              # hyper chain width (rho u, rho e? DryBiharnomic)
F_h = 4 * Nfp            # horizontal-face lanes (chain)

G = 1e9
mm = lambda M, N, K: 2 * M * N * K


def report(name, flops, note=""):
    print(f"{name:38s} {flops / G:8.2f} GFLOP  {note}")
    return flops


total = 0.0
print(f"Held-Suarez p{p}, n_horz={nh}, n_vert={nv}: E={E}, Np={Np}, "
      f"gridpoints={E * Np / 1e6:.2f}M")
print("\n--- explicit RHS ---")
# volume (pallas): weak divergence [E*n? var-major: per var [TE,3Np]x[3Np,Np]]
v = mm(E * n, Np, 3 * Np)
total += report("volume weak divergence", v, "[E·5,3Np]x[3Np,Np]")
total += report("volume flux/thermo (VPU)", 60 * E * Np * 1,
                "~60 ops/node")
# fast surface: extraction + lift + flux math
s = mm(E * 7, X, Np) + mm(E * n, Np, X)
total += report("surface extract+lift", s, "[E·7,Np]x[Np,X] + lift")
total += report("surface Rusanov (VPU)", 80 * E * X)
# hyperdiffusion chain (var-major): 3 passes of Wcat [E·w, Np]x[Np, nd*Np+F]
nd = 2                    # horizontal-only chain
chain = 0.0
for w, label in ((n_hyper, "pass1 grad"), (3 * n_hyper, "pass2 div"),
                 (n_hyper, "pass3 grad")):
    c = mm(E * w, nd * Np + F_h, Np)
    chain += c
# lifts: pass1/3: [E·3n, F]x[F, Np]; pass2: [E·n, F]x[F, Np]
chain += 2 * mm(E * 3 * n_hyper, Np, F_h) + mm(E * n_hyper, Np, F_h)
total += report("hyperdiffusion chain (3 passes)", chain)
# scalar hyper correction: [E·3n? rows] roughly one extract + lift
sh = mm(E * 3 * n, F_h, Np) + mm(E * n, Np, F_h)
total += report("scalar-hyper surface corr", sh)
total += report("source+aux (VPU)", 40 * E * Np)
rhs = total
print(f"{'TOTAL explicit RHS':38s} {rhs / G:8.2f} GFLOP")

print("\n--- IMEX ARK2GKC step (3 stages) ---")
# per stage: remainder RHS (~= explicit RHS + linear subtraction)
imex = 3 * rhs
imex += report("remainder linear extras (x3)",
               3 * (20 * E * Np + 30 * E * 2 * Nfp))
# implicit: 1 rhs_im via block matvec + 2 solves + 2 apply_op
ncol = 6 * nh * nh * Nq * Nq
nb = Nq * n
Nv = nv * Nq * n
mv = 3 * mm(ncol, 1, nb) * nv           # block-tridiag matvec
solve = 2 * mv                           # fwd+bwd sweeps
imex += report("columnwise matvecs+solves (x2 solves, x3 G)",
               2 * solve + 3 * mv)
imex += 3 * rhs * 0  # already counted
print(f"{'TOTAL IMEX step':38s} {imex / G:8.2f} GFLOP")

print("\n--- reference points ---")
for ms, label in ((16.1, "r2 explicit RHS 16.1 ms"),
                  (10.0, "target RHS 10 ms"),
                  (82.8, "r2 LSRK54 step (5 RHS)"),
                  (170.3, "r2 IMEX step"),
                  (110.0, "target IMEX step")):
    which = rhs if ms < 60 else (5 * rhs if ms < 120 else imex)
    tf = which / (ms / 1e3) / 1e12
    print(f"  {label:32s} -> {tf:6.2f} TFLOP/s achieved "
          f"({100 * tf / 197:.1f}% of v5e bf16 peak, "
          f"{100 * tf / 49:.1f}% of ~f32-HIGHEST est.)")

# cross-check: the importable util (climatemachine_tpu/utils/flops.py)
# mirrors this budget for bench.py's MFU column — keep them in agreement
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from climatemachine_tpu.utils.flops import budget as _budget  # noqa: E402
_b = _budget(nh, nv, p)
assert abs(_b["rhs"] - rhs) < 1e-6 * rhs, (_b["rhs"], rhs)
assert abs(_b["imex_step"] - imex) < 1e-6 * imex, (_b["imex_step"], imex)
print("\n[util cross-check OK: climatemachine_tpu.utils.flops agrees]")
