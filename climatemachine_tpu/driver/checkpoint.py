"""Checkpoint / restart.

Scope of reference ``src/Driver/Checkpoint/Checkpoint.jl`` (:46-69 write,
:103-125 read: per-rank JLD2 files of (h_Q, h_aux, t) named
``<name>_checkpoint_mpirank%04d_num%04d.jld2``; rotation in
``Callbacks.jl:378-408``).

TPU-native: one .npz per process holding (q, aux, t, step); sharded
arrays are fetched with process-local addressable shards in multi-host
runs (single file in single-process runs).  Resume rebuilds the grid
deterministically and restores state (solver_configs.jl:129-160).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def checkpoint_path(directory: str, name: str, num: int,
                    process: Optional[int] = None) -> str:
    p = jax.process_index() if process is None else process
    return os.path.join(
        directory, f"{name}_checkpoint_rank{p:04d}_num{num:04d}.npz")


def write_checkpoint(directory: str, name: str, num: int, q, aux, t: float,
                     step: int) -> str:
    """Device→host copy then save (reference Checkpoint.jl:46-69)."""
    os.makedirs(directory, exist_ok=True)
    path = checkpoint_path(directory, name, num)
    np.savez(path, q=np.asarray(q), aux=np.asarray(aux),
             t=float(t), step=int(step))
    return path


def read_checkpoint(directory: str, name: str, num: int):
    """(q, aux, t, step) from disk (reference Checkpoint.jl:103-125)."""
    path = checkpoint_path(directory, name, num)
    with np.load(path) as data:
        return (data["q"], data["aux"], float(data["t"]), int(data["step"]))


def rm_checkpoint(directory: str, name: str, num: int) -> None:
    """Rotation helper (reference Callbacks.jl:399-404 keep-one)."""
    try:
        os.remove(checkpoint_path(directory, name, num))
    except FileNotFoundError:
        pass
