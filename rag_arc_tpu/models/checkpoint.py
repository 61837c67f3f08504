"""Model / train-state checkpointing.

SURVEY.md §5: the reference's checkpoint story is dill/pickle of live
objects; here model parameters and optimizer state are saved with orbax
(sharded-array aware — a checkpoint written on one topology restores onto
another) with a plain ``.npz`` fallback when orbax is unavailable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_params(params: Dict, path: str | Path, metadata: Optional[Dict] = None) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path.resolve() / "params", params, force=True)
        checkpointer.wait_until_finished()
    except Exception:  # noqa: BLE001 — fall back to flat npz
        flat, treedef = jax.tree_util.tree_flatten(params)
        np.savez(
            path / "params.npz",
            **{f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)},
        )
        (path / "treedef.txt").write_text(str(treedef))
    if metadata:
        (path / "metadata.json").write_text(json.dumps(metadata))
    return path


def load_params(path: str | Path, like: Optional[Dict] = None) -> Dict:
    """Restore params. ``like`` (an abstract/concrete tree of the same
    structure) is required for the orbax path and for npz tree rebuild."""
    path = Path(path)
    orbax_dir = path / "params"
    if orbax_dir.exists():
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        if like is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
            )
            return checkpointer.restore(orbax_dir.resolve(), abstract)
        return checkpointer.restore(orbax_dir.resolve())
    npz = np.load(path / "params.npz")
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    if like is None:
        raise ValueError("npz restore requires `like` for the tree structure")
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str | Path) -> Dict[str, Any]:
    meta = Path(path) / "metadata.json"
    return json.loads(meta.read_text()) if meta.exists() else {}
