"""VTK output (VTU + PVTU), dependency-free.

Scope of reference ``src/InputOutput/VTK/`` (writevtk — one VTU per rank
per dump, writepvtu master file; usage solver_configs.jl:297-315).

Each DG element is split into (Nq1-1)(Nq2-1)(Nq3-1) linear hexahedral
(or quad) sub-cells over its LGL nodes; fields are written as point data
in ascii (robust, diffable) — the reference uses WriteVTK.jl binary
appended format, same content.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _cells_for_element(Nq, dim):
    """Connectivity offsets (into the element's Np nodes) of sub-cells."""
    if dim == 3:
        Nq1, Nq2, Nq3 = Nq
        idx = np.arange(Nq1 * Nq2 * Nq3).reshape(Nq3, Nq2, Nq1)
        cells = []
        for k in range(Nq3 - 1):
            for j in range(Nq2 - 1):
                for i in range(Nq1 - 1):
                    cells.append([idx[k, j, i], idx[k, j, i + 1],
                                  idx[k, j + 1, i + 1], idx[k, j + 1, i],
                                  idx[k + 1, j, i], idx[k + 1, j, i + 1],
                                  idx[k + 1, j + 1, i + 1],
                                  idx[k + 1, j + 1, i]])
        return np.asarray(cells), 12  # VTK_HEXAHEDRON
    Nq1, Nq2 = Nq
    idx = np.arange(Nq1 * Nq2).reshape(Nq2, Nq1)
    cells = []
    for j in range(Nq2 - 1):
        for i in range(Nq1 - 1):
            cells.append([idx[j, i], idx[j, i + 1], idx[j + 1, i + 1],
                          idx[j + 1, i]])
    return np.asarray(cells), 9      # VTK_QUAD


def writevtk(prefix: str, grid, fields: Dict[str, np.ndarray],
             number_sample_points: int = 0) -> str:
    """Write ``<prefix>.vtu`` with per-node ``fields`` {name: [E, Np]}.

    Returns the written path (reference writevtk)."""
    coords = np.asarray(grid.coords, dtype=np.float64)
    E, Np, ncoord = coords.shape
    cell_off, ctype = _cells_for_element(grid.Nq, grid.dim)
    ncell_per_e = len(cell_off)

    pts = coords.reshape(E * Np, ncoord)
    if ncoord == 2:
        pts = np.concatenate([pts, np.zeros((E * Np, 1))], axis=1)

    conn = (cell_off[None, :, :] + (np.arange(E) * Np)[:, None, None])
    conn = conn.reshape(-1, cell_off.shape[1])
    ncells = conn.shape[0]
    offsets = np.arange(1, ncells + 1) * cell_off.shape[1]

    path = prefix + ".vtu"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n')
        f.write('  <UnstructuredGrid>\n')
        f.write(f'    <Piece NumberOfPoints="{E * Np}" '
                f'NumberOfCells="{ncells}">\n')
        f.write('      <Points>\n')
        f.write('        <DataArray type="Float64" '
                'NumberOfComponents="3" format="ascii">\n')
        np.savetxt(f, pts, fmt="%.10g")
        f.write('        </DataArray>\n      </Points>\n')
        f.write('      <Cells>\n')
        f.write('        <DataArray type="Int64" Name="connectivity" '
                'format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write('        </DataArray>\n')
        f.write('        <DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        np.savetxt(f, offsets[None, :], fmt="%d")
        f.write('        </DataArray>\n')
        f.write('        <DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        np.savetxt(f, np.full((1, ncells), ctype), fmt="%d")
        f.write('        </DataArray>\n      </Cells>\n')
        f.write('      <PointData>\n')
        for name, arr in fields.items():
            a = np.asarray(arr, dtype=np.float64).reshape(E * Np)
            f.write(f'        <DataArray type="Float64" Name="{name}" '
                    'format="ascii">\n')
            np.savetxt(f, a[None, :], fmt="%.10g")
            f.write('        </DataArray>\n')
        f.write('      </PointData>\n')
        f.write('    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n')
    return path


def writepvtu(prefix: str, piece_prefixes: Sequence[str],
              field_names: Sequence[str]) -> str:
    """Master file referencing per-process pieces (reference writepvtu)."""
    path = prefix + ".pvtu"
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="PUnstructuredGrid" version="0.1">\n')
        f.write('  <PUnstructuredGrid GhostLevel="0">\n')
        f.write('    <PPoints>\n      <PDataArray type="Float64" '
                'NumberOfComponents="3"/>\n    </PPoints>\n')
        f.write('    <PPointData>\n')
        for name in field_names:
            f.write(f'      <PDataArray type="Float64" Name="{name}"/>\n')
        f.write('    </PPointData>\n')
        for p in piece_prefixes:
            f.write(f'    <Piece Source="{os.path.basename(p)}.vtu"/>\n')
        f.write('  </PUnstructuredGrid>\n</VTKFile>\n')
    return path


def vtk_dump_state(prefix: str, dg, q, aux, spec=None, aux_spec=None) -> str:
    """Dump all prognostic (+selected aux) fields (reference Callbacks
    vtk callback, Callbacks.jl:152)."""
    bl = dg.balance_law
    spec = spec or bl.prog_spec
    fields = {}
    qn = np.asarray(q)
    for i, name in enumerate(spec.flattened_names()):
        fields[name.replace(".", "_").replace("[", "_").rstrip("]")] = \
            qn[..., i]
    return writevtk(prefix, dg.grid, fields)
