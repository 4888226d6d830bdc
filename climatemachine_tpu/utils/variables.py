"""Named, statically-sized views over flat state vectors.

TPU-native equivalent of the reference's VariableTemplates system
(reference ``src/Utilities/VariableTemplates/VariableTemplates.jl``:
``@vars`` macro, ``Vars``/``Grad`` views, ``varsindex``).

Design: instead of a Julia macro generating nested NamedTuple types, a
:class:`VarSpec` is a static (hashable) schema built at model-configuration
time mapping dotted names -> (offset, shape).  State lives in flat
``[..., nvars]`` arrays (the layout the DG einsum kernels want); ``Vars``
wraps such an array and resolves attribute access to zero-copy slices,
which XLA fuses away.  Everything is resolved at trace time — no dynamic
dispatch reaches the compiled program.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

ShapeLike = Union[int, Tuple[int, ...]]


def _normshape(shape: ShapeLike) -> Tuple[int, ...]:
    if isinstance(shape, int):
        return () if shape == 1 else (shape,)
    return tuple(shape)


class VarSpec:
    """Static schema: ordered fields, possibly nested via dotted names.

    ``VarSpec(rho=1, rhou=3, energy=VarSpec(rhoe=1))`` gives fields
    ``rho`` (scalar), ``rhou`` (3-vector), ``energy.rhoe`` (scalar) packed
    contiguously into a length-5 trailing axis.
    """

    def __init__(self, **fields):
        self._fields: dict = {}  # name -> ('leaf', offset, shape) | ('sub', VarSpec_with_base)
        off = 0
        for name, spec in fields.items():
            if isinstance(spec, VarSpec):
                sub = spec._with_base(off)
                self._fields[name] = ("sub", sub)
                off += spec.num
            else:
                shape = _normshape(spec)
                self._fields[name] = ("leaf", off, shape)
                off += int(math.prod(shape)) if shape else 1
        self._num = off
        self._base = 0

    def _with_base(self, base: int) -> "VarSpec":
        out = VarSpec.__new__(VarSpec)
        out._fields = {}
        for name, ent in self._fields.items():
            if ent[0] == "leaf":
                out._fields[name] = ("leaf", ent[1] + base, ent[2])
            else:
                out._fields[name] = ("sub", ent[1]._with_base(base))
        out._num = self._num
        out._base = self._base + base
        return out

    @property
    def num(self) -> int:
        """Total number of packed scalar slots (reference: ``varsize``)."""
        return self._num

    def index(self, name: str) -> slice:
        """Slice of the trailing axis for dotted ``name``
        (reference: ``varsindex``, VariableTemplates.jl:25)."""
        off, shape = self._resolve(name)
        n = int(math.prod(shape)) if shape else 1
        return slice(off, off + n)

    def shape_of(self, name: str) -> Tuple[int, ...]:
        return self._resolve(name)[1]

    def _resolve(self, name: str):
        spec = self
        parts = name.split(".")
        for p in parts[:-1]:
            kind, sub = spec._fields[p][0], spec._fields[p][1]
            if kind != "sub":
                raise KeyError(f"{p} is a leaf, cannot descend into it")
            spec = sub
        ent = spec._fields[parts[-1]]
        if ent[0] == "leaf":
            return ent[1], ent[2]
        return ent[1]._base, (ent[1].num,)

    def flattened_names(self, prefix: str = "") -> Sequence[str]:
        """Dotted names of all scalar slots, in packed order
        (reference: ``flattenednames``)."""
        out = []
        for name, ent in self._fields.items():
            full = f"{prefix}{name}"
            if ent[0] == "sub":
                out.extend(ent[1].flattened_names(prefix=full + "."))
            else:
                shape = ent[2]
                n = int(math.prod(shape)) if shape else 1
                if n == 1:
                    out.append(full)
                else:
                    out.extend(f"{full}[{i}]" for i in range(n))
        return out

    def names(self) -> Sequence[str]:
        return list(self._fields.keys())

    def field_dict(self):
        """{name: shape-or-VarSpec} suitable to rebuild/compose specs."""
        out = {}
        for name, ent in self._fields.items():
            if ent[0] == "sub":
                out[name] = VarSpec(**ent[1].field_dict())
            else:
                out[name] = ent[2] if ent[2] else 1
        return out

    def __repr__(self):
        return f"VarSpec({', '.join(self.flattened_names())})"

    # --- array views -----------------------------------------------------

    def get(self, arr, name: str):
        """Named view of ``arr[..., slot(s)]``; scalars lose the var axis."""
        off, shape = self._resolve(name)
        n = int(math.prod(shape)) if shape else 1
        view = arr[..., off:off + n]
        if not shape:
            return view[..., 0]
        if len(shape) > 1:
            view = view.reshape(view.shape[:-1] + shape)
        return view

    def set(self, arr, name: str, value):
        """Functional update: new array with ``name`` slots replaced."""
        off, shape = self._resolve(name)
        n = int(math.prod(shape)) if shape else 1
        value = jnp.asarray(value)
        if not shape:
            value = value[..., None]
        else:
            value = value.reshape(value.shape[: value.ndim - len(shape)] + (n,))
        return arr.at[..., off:off + n].set(value)

    def pack(self, mapping: Mapping[str, object], batch_shape=(), dtype=None):
        """Build a packed ``[*batch_shape, num]`` array from named parts.

        Pointwise values broadcast over the batch axes. Missing leaves are
        zero-filled.
        """
        parts = {}
        names = list(mapping.keys())
        for name in names:
            off, shape = self._resolve(name)
            parts[name] = (off, shape)
        if dtype is None:
            for v in mapping.values():
                dtype = jnp.result_type(v)
                break
        out = jnp.zeros(tuple(batch_shape) + (self.num,), dtype=dtype)
        for name, val in mapping.items():
            out = self.set(out, name, jnp.broadcast_to(
                jnp.asarray(val, dtype=dtype),
                _broadcast_target(batch_shape, self._resolve(name)[1])))
        return out

    def __hash__(self):
        return hash(tuple(self.flattened_names()))

    def __eq__(self, other):
        return (isinstance(other, VarSpec)
                and tuple(self.flattened_names()) == tuple(other.flattened_names()))


def _broadcast_target(batch_shape, shape):
    return tuple(batch_shape) + tuple(shape)


class Vars:
    """Attribute-style reader over a packed array (reference ``Vars{S}``)."""

    __slots__ = ("_spec", "_arr", "_prefix")

    def __init__(self, spec: VarSpec, arr, prefix: str = ""):
        object.__setattr__(self, "_spec", spec)
        object.__setattr__(self, "_arr", arr)
        object.__setattr__(self, "_prefix", prefix)

    def __getattr__(self, name):
        full = self._prefix + name
        spec = self._spec
        # descend into sub-spec => nested Vars
        try:
            ent_spec = spec
            for p in full.split(".")[:-1]:
                ent_spec = ent_spec._fields[p][1]
            ent = ent_spec._fields[full.split(".")[-1]]
        except KeyError as e:
            raise AttributeError(full) from e
        if ent[0] == "sub":
            return Vars(spec, self._arr, prefix=full + ".")
        return spec.get(self._arr, full)

    def __repr__(self):
        return f"Vars<{self._prefix or '.'}>({self._spec!r})"


def empty_spec() -> VarSpec:
    return VarSpec()


def concat_specs(**named: VarSpec) -> VarSpec:
    """Compose sub-model specs into one parent spec (reference: nested
    ``vars_state`` composition, e.g. AtmosModel.jl vars_state)."""
    return VarSpec(**named)
