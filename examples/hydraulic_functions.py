"""Soil hydraulics functions showcase (reference
tutorials/Land/Soil/Water/hydraulic_functions.jl).

Evaluates the water retention / hydraulic conductivity curves the land
model uses — matric potential psi(S_l), hydraulic conductivity
K(S_l) — for vanGenuchten and BrooksCorey parameterizations across
soil types, writes a CSV table, and checks the analytic properties the
tutorial demonstrates: monotonicity, the saturated limits
(psi -> 0-, K -> Ksat), and the effect of the ice impedance factor.
Smoke::

    python examples/hydraulic_functions.py
"""

import argparse
import sys

sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.land import BrooksCorey, vanGenuchten


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/hydraulic_functions.csv")
    args = p.parse_args()

    # tutorial soil types (vanGenuchten alpha [1/m], n)
    soils = {
        "sandy_loam_vG": vanGenuchten(alpha=7.5, n=1.89),
        "silt_loam_vG": vanGenuchten(alpha=2.0, n=1.41),
        "clay_vG": vanGenuchten(alpha=0.8, n=1.09),
        "sandy_loam_BC": BrooksCorey(psi_b=0.1656, m_exp=0.5),
    }
    Ksat = 4.42e-6                      # m/s, tutorial sandy loam
    S = jnp.linspace(0.01, 1.0, 100)

    rows = ["soil,S_l,psi_m,K"]
    for name, hyd in soils.items():
        psi = np.asarray(hyd.matric_potential(S))
        K = np.asarray(sp.hydraulic_conductivity(Ksat, hyd, S))
        for s, ps_, k in zip(np.asarray(S), psi, K):
            rows.append(f"{name},{s:.3f},{ps_:.6e},{k:.6e}")
        # tutorial properties: psi monotone nondecreasing toward 0- at
        # saturation; K monotone increasing to Ksat
        assert np.all(np.diff(psi) >= -1e-12), name
        assert np.all(np.diff(K) >= -1e-15), name
        assert abs(K[-1] - Ksat) < 1e-12 * Ksat, name
        if isinstance(hyd, BrooksCorey):
            # Brooks-Corey keeps the air-entry pressure -psi_b at S=1
            assert abs(psi[-1] + hyd.psi_b) < 1e-6, (name, psi[-1])
        else:
            assert psi[-1] <= 0.0 and psi[-1] > -1e-2, (name, psi[-1])
        print(f"{name:16s}: psi(0.3) = {psi[29]:+9.3f} m   "
              f"K(0.3)/Ksat = {K[29] / Ksat:.2e}")

    # impedance: ice blocks flow (reference viscosity_factor/impedance
    # concept — an ice-filled pore space cuts K by orders of magnitude)
    hyd = soils["sandy_loam_vG"]
    K_free = float(sp.hydraulic_conductivity(Ksat, hyd, jnp.array(0.5)))
    K_iced = float(sp.hydraulic_conductivity(Ksat, hyd, jnp.array(0.5),
                                             impedance=10 ** (-7 * 0.5)))
    print(f"impedance with half-ice pores: K drops {K_free / K_iced:.1e}x")
    assert K_iced < 1e-3 * K_free

    with open(args.out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.out} ({len(rows) - 1} rows)")


if __name__ == "__main__":
    main()
