"""Flat <-> nested param-tree serialization for weight sidecars.

The serving path (tools/export_model.py --weights sidecar) exports the
eval forward with the variables as ARGUMENTS instead of baked HLO
constants: the .stablehlo artifact stays a few MB regardless of model
size, and the weights travel as a plain .npz the server device_puts once
at startup.  (A constants-embedded HRNet-W48 artifact is ~260 MB of HLO —
it bloats every compile/upload, and relay-fronted TPU runtimes reject it
outright.)  flax variables are nested plain dicts, so a '/'-joined key
flattening is lossless.
"""

from __future__ import annotations

import numpy as np

SEP = "/"


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    """Nested dict of arrays -> {'a/b/c': array} (leaves as np arrays)."""
    out: dict = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: dict) -> dict:
    """{'a/b/c': array} -> nested dict of arrays."""
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split(SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_tree_npz(path: str, tree: dict) -> None:
    np.savez(path, **flatten_tree(tree))


def load_tree_npz(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return unflatten_tree({k: z[k] for k in z.files})
