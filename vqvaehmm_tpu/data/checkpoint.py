"""Checkpointing with true resume: params + optimizer state + step + PRNG.

Upgrade over the reference, which only saves bare state_dicts at the end of
training (train.py:91-92, training_pipeline/train.py:134-137) and ships an
unused full-state helper (src/utils/data.py:47-60); config mentions
periodic save_freq but nothing implements it (SURVEY.md section 5).

Orbax handles the on-disk format; save/load operate on the whole TrainState
pytree so training resumes exactly (including Adam moments).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but be safe
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state, metadata: Optional[Dict] = None):
    """Save a TrainState (or any pytree); metadata goes to a sidecar JSON
    (kept out of the array tree so restore templates stay clean).

    Mesh-sharded states are gathered to host numpy before writing, so the
    on-disk format is mesh-free: a checkpoint written under an 8-device
    mesh restores under any other device count (place it back on a mesh
    with `place_state`). For this model the whole TrainState is replicated
    under data parallelism (only batches are sharded), so the gather is a
    local copy, not a collective."""
    import json

    path = os.path.abspath(path)
    host_state = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, host_state, force=True)
    else:
        flat, treedef = jax.tree_util.tree_flatten(host_state)
        np.savez(path + ".npz", *[np.asarray(a) for a in flat])
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def _shape_mismatches(restored, target, limit: int = 5):
    """Leaf differences between a restored tree and its template,
    compared BY KEY PATH (positional zip would let renamed/swapped keys
    with coincidentally equal shapes pass): missing keys, extra keys,
    and shape mismatches, up to `limit` entries."""
    rd = {jax.tree_util.keystr(kp): leaf for kp, leaf
          in jax.tree_util.tree_flatten_with_path(restored)[0]}
    td = {jax.tree_util.keystr(kp): leaf for kp, leaf
          in jax.tree_util.tree_flatten_with_path(target)[0]}
    bad = []
    for k in sorted(td.keys() - rd.keys()):
        bad.append(f"{k}: missing (template {tuple(np.shape(td[k]))})")
    for k in sorted(rd.keys() - td.keys()):
        bad.append(f"{k}: unexpected (checkpoint "
                   f"{tuple(np.shape(rd[k]))})")
    for k in sorted(rd.keys() & td.keys()):
        rs, ts = tuple(np.shape(rd[k])), tuple(np.shape(td[k]))
        if rs != ts:
            bad.append(f"{k}: checkpoint {rs} vs template {ts}")
    return bad[:limit]


def validate_params_for(model, params, what: str = "checkpoint") -> None:
    """Raise ValueError if `params` cannot belong to `model` (leaf shapes
    checked against a freshly-initialized template).  Serving layers call
    this at STARTUP so a config/checkpoint mismatch fails immediately
    with named paths instead of as request-time 500s."""
    template = model.init(jax.random.PRNGKey(0))
    bad = _shape_mismatches(params, template)
    if bad:
        raise ValueError(
            f"{what} params do not match the configured model "
            "(wrong model config?); mismatched leaves:\n  "
            + "\n  ".join(bad))


def load_checkpoint(path: str, target=None) -> Any:
    """Load; with `target` (a template pytree) restores exact structure.

    Raises ValueError when the checkpoint's leaf shapes disagree with the
    template's: orbax restores the ON-DISK shapes regardless of the
    template, so loading a checkpoint into a differently-configured
    model would otherwise succeed silently and fail much later as an
    opaque shape error inside jit (or train quietly wrong)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            restored = ckptr.restore(path, item=target)
            bad = _shape_mismatches(restored, target)
            if bad:
                raise ValueError(
                    f"checkpoint at {path} does not match the template "
                    "(wrong model config?); mismatched leaves:\n  "
                    + "\n  ".join(bad))
            return restored
        return ckptr.restore(path)
    raise RuntimeError("orbax unavailable and no fallback written")


def load_metadata(path: str) -> Optional[Dict]:
    import json

    p = os.path.abspath(path) + ".meta.json"
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def save_params_npz(path: str, params):
    """Portable flat-npz export of a param pytree (keys are /-joined)."""
    flat = _flatten("", params)
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str) -> Dict:
    data = np.load(path)
    out: Dict = {}
    for key in data.files:
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out


def _flatten(prefix: str, tree) -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}/{k}" if prefix else str(k), v))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(f"{prefix}/{i}", v))
    else:
        out[prefix] = tree
    return out
