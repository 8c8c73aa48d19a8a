"""Scene/model serialization: typed JSON documents with a type registry.

TPU-native replacement for the reference's RTTI + archive system
(ref: core/rtti/so_type.hpp:642 type repo, core/serialization/xml_archiver.hpp,
bin_archiver.hpp, protobuf_archiver.hpp, objtree_archiver.hpp, scheme_builder).

The RTTI magic-number hierarchy collapses into a string-tag registry mapping
type tags → (to_doc, from_doc) converters; object graphs become nested JSON
documents (arrays base64/np-listed).  This is the checkpoint system: chain
specs, scenes, planner options, solutions all round-trip (SURVEY.md §5.4).
Built-in registrations cover ChainSpec, MPCProblem, shape records, proxy
models, trajectories, and Gaussian beliefs.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, NamedTuple, Tuple

import numpy as np

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}
_TYPE_TAGS: Dict[type, str] = {}


def register_type(tag: str, cls: type, to_doc=None, from_doc=None):
    """Register a serializable type (the RK_RTTI_MAKE_* macro equivalent,
    ref: core/rtti/typed_object.hpp:166)."""

    if to_doc is None or from_doc is None:
        if dataclasses.is_dataclass(cls):
            to_doc = lambda obj: {
                f.name: to_document(getattr(obj, f.name)) for f in dataclasses.fields(cls)
            }
            from_doc = lambda doc: cls(**{k: from_document(v) for k, v in doc.items()})
        elif hasattr(cls, "_fields"):  # NamedTuple
            to_doc = lambda obj: {f: to_document(getattr(obj, f)) for f in cls._fields}
            from_doc = lambda doc: cls(**{k: from_document(v) for k, v in doc.items()})
        else:
            raise TypeError(f"need explicit converters for {cls}")
    _REGISTRY[tag] = (to_doc, from_doc)
    _TYPE_TAGS[cls] = tag


def to_document(obj) -> Any:
    """Object → JSON-compatible document (tagged for registered types)."""
    import jax

    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (np.ndarray, jax.Array)):
        a = np.asarray(obj)
        return {"__nd__": a.tolist(), "dtype": str(a.dtype), "shape": list(a.shape)}
    if isinstance(obj, np.generic):
        return obj.item()
    t = type(obj)
    if t in _TYPE_TAGS:
        tag = _TYPE_TAGS[t]
        return {"__type__": tag, "data": _REGISTRY[tag][0](obj)}
    if isinstance(obj, dict):
        return {k: to_document(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return {"__seq__": [to_document(v) for v in obj], "tuple": isinstance(obj, tuple)}
    raise TypeError(f"unserializable type {t} — call register_type first "
                    "(ref: rtti unregistered-type failure)")


def from_document(doc) -> Any:
    if doc is None or isinstance(doc, (bool, int, float, str)):
        return doc
    if isinstance(doc, dict):
        if "__nd__" in doc:
            return np.asarray(doc["__nd__"], dtype=doc["dtype"]).reshape(doc["shape"])
        if "__type__" in doc:
            tag = doc["__type__"]
            if tag not in _REGISTRY:
                raise KeyError(f"unknown type tag {tag!r} (ref: so_type_repo miss)")
            return _REGISTRY[tag][1](doc["data"])
        if "__seq__" in doc:
            seq = [from_document(v) for v in doc["__seq__"]]
            return tuple(seq) if doc.get("tuple") else seq
        return {k: from_document(v) for k, v in doc.items()}
    if isinstance(doc, list):
        return [from_document(v) for v in doc]
    raise TypeError(f"bad document node {type(doc)}")


def save_scene(path: str, obj):
    """Serialize an object graph to JSON (the .rkx/.rkb equivalent;
    binary variant: use .json.gz path suffix for compression)."""
    doc = to_document(obj)
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "wt") as f:
            json.dump(doc, f)
    else:
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)


def load_scene(path: str):
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rt") as f:
            doc = json.load(f)
    else:
        with open(path) as f:
            doc = json.load(f)
    return from_document(doc)


# ---------------------------------------------------------------------------
# built-in registrations (the TypeIDList of the reference)
# ---------------------------------------------------------------------------


def _register_builtins():
    from reak_tpu.kte.spec import ChainSpec
    from reak_tpu.ctrl.mpc import MPCProblem
    from reak_tpu.ctrl.belief import GaussianBelief
    from reak_tpu.geom.shapes import Sphere, Capsule, Box, Cylinder, Plane, ShapeSet
    from reak_tpu.geom.proximity import ProxyModel
    from reak_tpu.interp.trajectory import Trajectory
    from reak_tpu.planning.queries import PlanningQuery, PlanResult

    register_type("reak.ChainSpec", ChainSpec)
    register_type("reak.MPCProblem", MPCProblem)
    register_type("reak.GaussianBelief", GaussianBelief)
    register_type("reak.Sphere", Sphere)
    register_type("reak.Capsule", Capsule)
    register_type("reak.Box", Box)
    register_type("reak.Cylinder", Cylinder)
    register_type("reak.Plane", Plane)
    register_type("reak.ShapeSet", ShapeSet)
    register_type("reak.ProxyModel", ProxyModel)
    register_type("reak.Trajectory", Trajectory)
    register_type("reak.PlanningQuery", PlanningQuery)
    register_type("reak.PlanResult", PlanResult)


_register_builtins()
