"""Model checkpoint save/load (SURVEY.md §5: the reference has no persistence;
its only artifact is the in-memory plan).

Params are dict pytrees of arrays; checkpoints are single ``.npz`` files with
the flattened tree (keys = '/'-joined paths), so they are portable, diffable,
and free of pickle/version hazards.  Works for both model families
(spectral_filter, fno) and any other dict/list pytree of arrays.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_checkpoint(path: str, params: Any) -> int:
    """Write a params pytree to ``path`` (.npz).  Returns leaf count."""
    flat = _flatten(params)
    np.savez_compressed(path, **flat)
    return len(flat)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Read a checkpoint.  With ``like`` (a template pytree of matching
    structure) the arrays are restored into that structure and cast to the
    template leaves' dtypes; without it, returns the nested dict implied by
    the '/'-separated keys (list indices come back as string keys)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if like is None:
        nested: Dict[str, Any] = {}
        for key, val in flat.items():
            parts = key.split("/")
            cur = nested
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = val
        return nested
    # restore into the template's structure
    leaves, treedef = jax.tree_util.tree_flatten(like)
    template_flat = _flatten(like)
    if set(template_flat) != set(flat):
        missing = set(template_flat) ^ set(flat)
        raise ValueError(f"checkpoint/template key mismatch: {sorted(missing)[:5]}")

    def rebuild(tree: Any, prefix: str = "") -> Any:
        if isinstance(tree, dict):
            return {k: rebuild(tree[k], f"{prefix}{k}/") for k in tree}
        if isinstance(tree, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
            return type(tree)(seq)
        arr = flat[prefix.rstrip("/")]
        return jax.numpy.asarray(arr, dtype=np.asarray(tree).dtype)

    return rebuild(like)
