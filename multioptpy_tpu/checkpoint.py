"""Structured checkpoint/resume for driver states.

The reference's resume story is scattered per-workload text files
(SURVEY §5.4: conformer-search .dat files, mapper JSON, per-iteration xyz
dirs). Here any driver pytree state (OptState, MDState, NEB path + Fire
state, ...) round-trips through ONE npz file: leaves as arrays plus a JSON
manifest of the tree structure. Works for every NamedTuple/tuple/dict tree
the drivers use; no pickle, so checkpoints are portable and inspectable.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np


def _encode_treedef(tree):
    """Structure manifest: nested lists/dicts with leaf placeholders."""
    def enc(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return {"__namedtuple__": type(node).__name__,
                    "fields": {f: enc(getattr(node, f))
                               for f in node._fields}}
        if isinstance(node, (list, tuple)):
            return {"__seq__": "tuple" if isinstance(node, tuple) else "list",
                    "items": [enc(x) for x in node]}
        if isinstance(node, dict):
            return {"__dict__": {k: enc(v) for k, v in node.items()}}
        return {"__leaf__": True}

    return enc(tree)


_NAMEDTUPLES = {}


def register_state_type(cls):
    """Register a NamedTuple state class for reconstruction on load."""
    _NAMEDTUPLES[cls.__name__] = cls
    return cls


def _builtin_state_types():
    from multioptpy_tpu.drivers.optimize import OptState
    from multioptpy_tpu.drivers.md import MDState
    from multioptpy_tpu.steppers.first_order import (
        CgState, FireState, LbfgsState)
    from multioptpy_tpu.hessian.block_updates import BlockWindow
    for cls in (OptState, MDState, CgState, FireState, LbfgsState,
                BlockWindow):
        _NAMEDTUPLES.setdefault(cls.__name__, cls)


def save_checkpoint(path, state, meta=None):
    """state: any pytree of arrays/scalars. meta: JSON-serializable dict."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    manifest = json.dumps({"tree": _encode_treedef(state),
                           "meta": meta or {}})
    np.savez(path, __manifest__=manifest, **arrays)


def load_checkpoint(path, to_jax=True):
    """-> (state, meta). NamedTuple nodes are rebuilt from registered
    classes (all driver states are pre-registered)."""
    _builtin_state_types()
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(str(data["__manifest__"]))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    if to_jax:
        leaves = [jnp.asarray(x) if x.ndim > 0 or x.dtype != object else x
                  for x in leaves]
    it = iter(leaves)

    def dec(node):
        if "__leaf__" in node:
            return next(it)
        if "__namedtuple__" in node:
            cls = _NAMEDTUPLES.get(node["__namedtuple__"])
            vals = {k: dec(v) for k, v in node["fields"].items()}
            if cls is None:
                return vals
            return cls(**vals)
        if "__seq__" in node:
            items = [dec(x) for x in node["items"]]
            return tuple(items) if node["__seq__"] == "tuple" else items
        if "__dict__" in node:
            return {k: dec(v) for k, v in node["__dict__"].items()}
        raise ValueError("bad manifest node")

    state = dec(manifest["tree"])
    return state, manifest["meta"]
