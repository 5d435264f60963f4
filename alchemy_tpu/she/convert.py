"""Backend conversion for key/hint structures.

Hint generation is compile-time work full of small eager ops; on a remote
accelerator every op round-trips the device. Keys/hints are therefore
generated on the golden (numpy) backend and converted wholesale — every Cyc's
residue array re-homed with one `asarray` — before entering the target
backend's pipeline. Exactness is preserved (residues are plain integers)."""

from __future__ import annotations

import dataclasses

import numpy as np

from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.core.ring import get_ring


def to_backend(obj, bk):
    """Deep-convert any structure containing Cycs to the target backend."""
    if isinstance(obj, Cyc):
        arr = np.asarray(obj.data).astype(np.int64)
        return Cyc(get_ring(obj.m), obj.qs, obj.basis, bk.asarray(arr, obj.qs), bk)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return type(obj)(**{
            f.name: to_backend(getattr(obj, f.name), bk)
            for f in dataclasses.fields(obj)
        })
    if isinstance(obj, tuple):
        return tuple(to_backend(x, bk) for x in obj)
    if isinstance(obj, list):
        return [to_backend(x, bk) for x in obj]
    return obj
