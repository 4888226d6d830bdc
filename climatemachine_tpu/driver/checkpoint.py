"""Checkpoint / restart.

Scope of reference ``src/Driver/Checkpoint/Checkpoint.jl`` (:46-69 write,
:103-125 read: per-rank JLD2 files of (h_Q, h_aux, t) named
``<name>_checkpoint_mpirank%04d_num%04d.jld2``; rotation in
``Callbacks.jl:378-408``).

TPU-native: one .npz per process.  In single-controller runs the arrays
are fully addressable and saved dense.  Under multi-controller JAX a
globally-sharded ``jax.Array`` exposes only its *addressable* shards to
each process, so each process writes its own shards together with their
global element-axis offsets (the element axis is the only sharded axis —
``parallel/partition.py`` never splits columns); restart reassembles the
global array from all rank files (reference per-rank JLD2 + the
MPI.Gatherv pattern of Interpolation.jl:304-313, inverted to
scatter-on-read).  Resume rebuilds the grid deterministically and
restores state (solver_configs.jl:129-160).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import numpy as np


def checkpoint_path(directory: str, name: str, num: int,
                    process: Optional[int] = None) -> str:
    p = jax.process_index() if process is None else process
    return os.path.join(
        directory, f"{name}_checkpoint_rank{p:04d}_num{num:04d}.npz")


def _element_offsets(x) -> Optional[list]:
    """[(start, shard_data), ...] for the addressable shards of a
    jax.Array sharded along axis 0, or None if dense save is fine."""
    if not isinstance(x, jax.Array):
        return None
    out = []
    for s in x.addressable_shards:
        idx = s.index[0] if s.index else slice(None)
        start = 0 if idx.start is None else int(idx.start)
        out.append((start, s))
    # replicated arrays produce duplicate (start, data) per local device
    seen, uniq = set(), []
    for start, s in sorted(out, key=lambda p: p[0]):
        if start not in seen:
            seen.add(start)
            uniq.append((start, s))
    try:
        fully = x.is_fully_addressable
    except AttributeError:
        fully = True
    if fully and len(uniq) == 1:
        return None  # single shard covers the array: dense save
    return [(start, np.asarray(s.data)) for start, s in uniq]


def _save_field(payload: dict, key: str, x) -> None:
    shards = _element_offsets(x)
    if shards is None:
        payload[key] = np.asarray(x)
    else:
        payload[f"{key}__nshards"] = np.int64(len(shards))
        for i, (start, data) in enumerate(shards):
            payload[f"{key}__shard{i}"] = data
            payload[f"{key}__start{i}"] = np.int64(start)


def write_checkpoint(directory: str, name: str, num: int, q, aux, t: float,
                     step: int) -> str:
    """Device→host copy then save (reference Checkpoint.jl:46-69).

    Multi-host safe: each process saves only its addressable shards
    (with global offsets) to its own rank file."""
    os.makedirs(directory, exist_ok=True)
    path = checkpoint_path(directory, name, num)
    payload = {"t": float(t), "step": int(step)}
    _save_field(payload, "q", q)
    _save_field(payload, "aux", aux)
    np.savez(path, **payload)
    return path


def _load_field(files: list, key: str):
    """Assemble one field from already-opened npz dicts (all ranks)."""
    if key in files[0]:
        return files[0][key]
    pieces = []
    for data in files:
        n = int(data[f"{key}__nshards"])
        for i in range(n):
            pieces.append((int(data[f"{key}__start{i}"]),
                           data[f"{key}__shard{i}"]))
    pieces.sort(key=lambda p: p[0])
    total = pieces[-1][0] + pieces[-1][1].shape[0]
    out = np.empty((total,) + pieces[0][1].shape[1:], pieces[0][1].dtype)
    for start, data in pieces:
        out[start:start + data.shape[0]] = data
    return out


def read_checkpoint(directory: str, name: str, num: int):
    """(q, aux, t, step) from disk (reference Checkpoint.jl:103-125).

    Reads every rank file present for (name, num) and reassembles the
    global arrays from the saved shard offsets; dense single-rank files
    load as before."""
    pat = os.path.join(directory,
                       f"{name}_checkpoint_rank????_num{num:04d}.npz")
    paths = sorted(glob.glob(pat))
    if not paths:
        # exact-path error message for the common single-rank case
        paths = [checkpoint_path(directory, name, num)]
    files = [dict(np.load(p)) for p in paths]
    q = _load_field(files, "q")
    aux = _load_field(files, "aux")
    return (q, aux, float(files[0]["t"]), int(files[0]["step"]))


def rm_checkpoint(directory: str, name: str, num: int) -> None:
    """Rotation helper (reference Callbacks.jl:399-404 keep-one) —
    removes this process's rank file."""
    try:
        os.remove(checkpoint_path(directory, name, num))
    except FileNotFoundError:
        pass
