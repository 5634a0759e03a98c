"""Pickle-based pytree serializer for device-problem caches.

Saves/loads nested structures of NamedTuples (BlockedHybrid, FaceOps,
FastDiag, TraceBanded, ...), jax arrays, numpy arrays, tuples, dicts
and scalars — preserving which leaves were jax arrays so a load
reconstructs device-resident operands (``jnp.asarray``) exactly where
the original had them.

Motivation (VERDICT r3 next #1): the flagship 1.05M-DOF solve cannot
pay the ~20-32 min host ``HybridProblem.build`` inside the bench
budget; the assembled device-input form (metrics for on-device
assembly, face tensors, fastdiag transforms, banded trace blocks, RHS,
host reference solution) is a few tens of MB and loads in seconds.
Pickle is appropriate here: these are repo-local cache artifacts with
a numerics fingerprint, not a data-interchange format.
"""
import importlib
import pickle

import numpy as np


def _is_namedtuple(x):
    return isinstance(x, tuple) and hasattr(x, "_fields")


def pack(obj):
    """Recursively convert ``obj`` into a picklable tagged tree."""
    import jax

    if isinstance(obj, jax.Array):
        return ("jnp", np.asarray(obj))
    if isinstance(obj, np.ndarray):
        return ("np", obj)
    if _is_namedtuple(obj):
        cls = type(obj)
        return ("nt", cls.__module__, cls.__name__,
                tuple(pack(v) for v in obj))
    if isinstance(obj, tuple):
        return ("tuple", tuple(pack(v) for v in obj))
    if isinstance(obj, list):
        return ("list", [pack(v) for v in obj])
    if isinstance(obj, dict):
        return ("dict", {k: pack(v) for k, v in obj.items()})
    return ("raw", obj)


def unpack(t):
    """Inverse of :func:`pack`; 'jnp' leaves go back on device."""
    import jax.numpy as jnp

    tag = t[0]
    if tag == "jnp":
        return jnp.asarray(t[1])
    if tag == "np":
        return t[1]
    if tag == "nt":
        _, mod, name, vals = t
        cls = getattr(importlib.import_module(mod), name)
        return cls(*(unpack(v) for v in vals))
    if tag == "tuple":
        return tuple(unpack(v) for v in t[1])
    if tag == "list":
        return [unpack(v) for v in t[1]]
    if tag == "dict":
        return {k: unpack(v) for k, v in t[1].items()}
    return t[1]


def save_pytree(path, obj, meta=None):
    """Pickle ``pack(obj)`` (plus a plain-dict ``meta``) to ``path``."""
    with open(path, "wb") as fh:
        pickle.dump({"version": 1, "meta": meta or {}, "tree": pack(obj)},
                    fh, protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path):
    """Returns (obj, meta)."""
    with open(path, "rb") as fh:
        blob = pickle.load(fh)
    assert blob.get("version") == 1, "unknown cache version"
    return unpack(blob["tree"]), blob["meta"]
