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
import struct
from typing import Any, Callable, Dict, NamedTuple, Tuple

import numpy as np

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}
_TYPE_TAGS: Dict[type, str] = {}

# When set (by the binary archiver), to_document keeps ndarrays as raw
# np.ndarray nodes instead of JSON list-dicts, so the binary writer can emit
# them as contiguous bytes (the bin_archiver.hpp win over xml_archiver.hpp).
_RAW_ARRAYS = False


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
        if _RAW_ARRAYS:
            return a
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
    if isinstance(doc, np.ndarray):  # raw node from the binary archive
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


# ---------------------------------------------------------------------------
# binary archive (ref: core/serialization/bin_archiver.hpp:107 — the compact
# row format; arrays stored as contiguous little-endian payloads)
# ---------------------------------------------------------------------------

_BIN_MAGIC = b"RKB1"
_T_NONE, _T_FALSE, _T_TRUE, _T_INT, _T_FLT, _T_STR, _T_ARR, _T_MAP, _T_LST = \
    range(9)


def _bin_encode(node, out):
    if node is None:
        out.append(bytes([_T_NONE]))
    elif isinstance(node, bool):
        out.append(bytes([_T_TRUE if node else _T_FALSE]))
    elif isinstance(node, int):
        out.append(bytes([_T_INT]) + struct.pack("<q", node))
    elif isinstance(node, float):
        out.append(bytes([_T_FLT]) + struct.pack("<d", node))
    elif isinstance(node, str):
        b = node.encode()
        out.append(bytes([_T_STR]) + struct.pack("<I", len(b)) + b)
    elif isinstance(node, np.ndarray):
        a = np.ascontiguousarray(node)
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        dt = str(a.dtype).encode()
        out.append(bytes([_T_ARR]) + struct.pack("<B", len(dt)) + dt
                   + struct.pack("<B", a.ndim)
                   + struct.pack(f"<{a.ndim}q", *a.shape)
                   + struct.pack("<Q", a.nbytes))
        out.append(a.tobytes())
    elif isinstance(node, dict):
        out.append(bytes([_T_MAP]) + struct.pack("<I", len(node)))
        for k, v in node.items():
            kb = k.encode()
            out.append(struct.pack("<I", len(kb)) + kb)
            _bin_encode(v, out)
    elif isinstance(node, (list, tuple)):
        out.append(bytes([_T_LST]) + struct.pack("<I", len(node)))
        for v in node:
            _bin_encode(v, out)
    else:
        raise TypeError(f"binary archive: unencodable node {type(node)}")


def _bin_decode(buf, off):
    t = buf[off]
    off += 1
    if t == _T_NONE:
        return None, off
    if t == _T_FALSE:
        return False, off
    if t == _T_TRUE:
        return True, off
    if t == _T_INT:
        return struct.unpack_from("<q", buf, off)[0], off + 8
    if t == _T_FLT:
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if t == _T_STR:
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        return buf[off:off + n].decode(), off + n
    if t == _T_ARR:
        nd = buf[off]
        dt = buf[off + 1:off + 1 + nd].decode()
        off += 1 + nd
        ndim = buf[off]
        off += 1
        shape = struct.unpack_from(f"<{ndim}q", buf, off)
        off += 8 * ndim
        nbytes = struct.unpack_from("<Q", buf, off)[0]
        off += 8
        a = np.frombuffer(buf[off:off + nbytes], dtype=dt).reshape(shape)
        return a.copy(), off + nbytes
    if t == _T_MAP:
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        d = {}
        for _ in range(n):
            kl = struct.unpack_from("<I", buf, off)[0]
            off += 4
            k = buf[off:off + kl].decode()
            off += kl
            d[k], off = _bin_decode(buf, off)
        return d, off
    if t == _T_LST:
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        xs = []
        for _ in range(n):
            v, off = _bin_decode(buf, off)
            xs.append(v)
        return xs, off
    raise ValueError(f"binary archive: bad tag {t} at {off - 1}")


def save_scene_bin(path: str, obj):
    """Serialize to the compact binary archive (.rkb equivalent): same
    document model as JSON, ndarrays as contiguous little-endian payloads."""
    global _RAW_ARRAYS
    _RAW_ARRAYS = True
    try:
        doc = to_document(obj)
    finally:
        _RAW_ARRAYS = False
    out = [_BIN_MAGIC]
    _bin_encode(doc, out)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def load_scene_bin(path: str):
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _BIN_MAGIC:
        raise ValueError("not a reak binary archive (bad magic)")
    doc, off = _bin_decode(buf, 4)
    if off != len(buf):
        raise ValueError(f"trailing bytes in archive ({len(buf) - off})")
    return from_document(doc)


def save_scene(path: str, obj):
    """Serialize an object graph (the .rkx/.rkb equivalent): JSON by
    default, gzip-JSON for ``.gz`` paths, compact binary for ``.rkb``."""
    if path.endswith(".rkb"):
        return save_scene_bin(path, obj)
    doc = to_document(obj)
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "wt") as f:
            json.dump(doc, f)
    else:
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)


def load_scene(path: str):
    if path.endswith(".rkb"):
        return load_scene_bin(path)
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
