"""StateCheck: statistics-based regression/debug harness.

Scope of reference ``src/Diagnostics/Debug/StateCheck.jl``: sccreate (:93)
makes a callback printing per-variable min/max/mean/std; scdocheck
compares against stored reference tables (refvals) with per-field
relative-error budgets; scprintref emits refvals source code.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("climatemachine")

STATS = ("min", "max", "mean", "std")


def _stats(arr):
    a = np.asarray(arr, dtype=np.float64)
    # ddof=1 matches the reference's Statistics.std convention
    # (StateCheck.jl:275 sqrt(sum/(n-1))) so stats are comparable against
    # the reference-shipped refvals tables bit-for-bit in definition
    return dict(min=float(a.min()), max=float(a.max()),
                mean=float(a.mean()),
                std=float(a.std(ddof=1)) if a.size > 1 else 0.0)


@dataclass
class StateCheck:
    """Track (array, VarSpec, label) groups; snapshot statistics every N
    steps (reference sccreate)."""
    tracked: Sequence[Tuple] = ()        # (getter(state) -> arr, spec, label)
    every_steps: int = 10
    history: List[Dict] = field(default_factory=list)

    def snapshot(self, state) -> Dict:
        snap = {}
        for getter, spec, label in self.tracked:
            arr = np.asarray(getter(state))
            for i, name in enumerate(spec.flattened_names()):
                snap[(label, name)] = _stats(arr[..., i])
        self.history.append(snap)
        return snap

    def report(self, snap: Dict) -> str:
        lines = ["# SC +++ label  var  min  max  mean  std"]
        for (label, name), s in snap.items():
            lines.append(f"SC {label:10s} {name:24s} "
                         f"{s['min']: .10e} {s['max']: .10e} "
                         f"{s['mean']: .10e} {s['std']: .10e}")
        return "\n".join(lines)

    def make_callback(self):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            snap = self.snapshot(state)
            logger.info("%s", self.report(snap))

        return EveryXSimulationSteps(fn, self.every_steps)

    # --- refvals ------------------------------------------------------------
    def print_ref(self) -> str:
        """Emit a refvals python literal for the last snapshot (reference
        scprintref)."""
        assert self.history, "no snapshots collected"
        snap = self.history[-1]
        out = ["refvals = {"]
        for (label, name), s in snap.items():
            out.append(f"  ({label!r}, {name!r}): "
                       f"{{'min': {s['min']!r}, 'max': {s['max']!r}, "
                       f"'mean': {s['mean']!r}, 'std': {s['std']!r}}},")
        out.append("}")
        return "\n".join(out)

    def do_check(self, refvals: Dict, rtols: Dict, snap: Optional[Dict] = None
                 ) -> bool:
        """Compare the (last) snapshot against refvals with per-field
        relative tolerances (reference scdocheck).  Returns pass/fail."""
        snap = snap or self.history[-1]
        ok = True
        for key, ref in refvals.items():
            rtol = rtols.get(key, 1e-7) if isinstance(rtols, dict) else rtols
            got = snap.get(key)
            if got is None:
                logger.error("statecheck: missing %s", key)
                ok = False
                continue
            for stat in STATS:
                denom = max(abs(ref[stat]), 1e-30)
                rel = abs(got[stat] - ref[stat]) / denom
                if rel > rtol:
                    logger.error(
                        "statecheck: %s %s rel err %.3e > %.3e "
                        "(got %.10e want %.10e)", key, stat, rel, rtol,
                        got[stat], ref[stat])
                    ok = False
        return ok
