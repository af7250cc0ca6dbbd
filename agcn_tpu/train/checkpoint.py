"""Checkpoint save/load.

Replaces the reference's torch state_dict checkpoints
(utils/processor.py:225-270): pytrees are saved via orbax when available
(async-capable, sharding-aware) with an npz fallback; loading supports
orbax dirs, npz files, and torch `.pt` files (for migrating reference
checkpoints through agcn_tpu.utils.torch_import).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Dict, Optional

import numpy as np


def _flatten(tree: Dict, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _unflatten(flat: Dict[tuple, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


_async_ckptr = None  # module-level so in-flight saves survive the call


def save_checkpoint(path: str, tree: Dict[str, Any],
                    async_save: bool = False,
                    use_orbax: bool = True):
    """Save a checkpoint pytree; orbax if importable, else npz.

    With `async_save`, the orbax save commits in a background thread
    (device->host transfer happens eagerly, serialization does not block
    the train loop); call `wait_for_checkpoints()` before reading it
    back or exiting.

    `use_orbax=False` forces the npz path: orbax saves are COLLECTIVE
    across jax processes, so a rank-0-only caller in a multi-process run
    must not enter orbax (the others never join the barrier — observed
    as a 5-minute hang then a shutdown-barrier crash).
    """
    global _async_ckptr
    ocp = None
    if use_orbax:
        try:
            import orbax.checkpoint as ocp
        except ImportError:
            # no orbax: degrade to the sync npz fallback below (for
            # async_save too — losing async-ness beats killing the run
            # at its FIRST save, epochs in)
            import warnings

            if async_save:
                warnings.warn("async_checkpoint requested but orbax is "
                              "not installed; saving synchronously as npz")
            ocp = None
    if ocp is not None:
        try:
            if async_save:
                if _async_ckptr is None:
                    _async_ckptr = ocp.AsyncCheckpointer(
                        ocp.StandardCheckpointHandler())
                _async_ckptr.save(os.path.abspath(path), args=ocp.args.
                                  StandardSave(tree), force=True)
                return
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), tree, force=True)
            ckptr.wait_until_finished()
            return
        except Exception:
            if async_save:
                # a REAL orbax failure mid-async-save should surface,
                # not be silently papered over with npz
                raise
    flat = {}
    for section, sub in tree.items():
        if isinstance(sub, dict):
            for p, v in _flatten(sub).items():
                flat["/".join((section,) + p)] = v
        else:
            flat[section] = np.asarray(sub)
    np.savez(path + ".npz", **flat)


def wait_for_checkpoints():
    """Block until every async save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load orbax dir / npz / pickled dict checkpoints."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        p = path if path.endswith(".npz") else path + ".npz"
        flat = dict(np.load(p, allow_pickle=False))
        tree: Dict[str, Any] = {}
        for key, v in flat.items():
            parts = key.split("/")
            node = tree
            for s in parts[:-1]:
                node = node.setdefault(s, {})
            node[parts[-1]] = v
        return tree
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_params(base: Dict, loaded: Dict, ignore_substrings=(),
                 log: Optional[Callable] = None) -> Dict:
    """Overlay loaded leaves onto base, skipping ignore matches and
    reporting missing keys (tolerant load, reference processor.py:251-270).
    """
    base_flat = _flatten(base)
    loaded_flat = _flatten(loaded)
    out = dict(base_flat)
    for path, v in loaded_flat.items():
        name = "/".join(str(p) for p in path)
        if any(s in name for s in ignore_substrings):
            if log:
                log(f"ignored weight: {name}")
            continue
        if path in out:
            out[path] = v.astype(out[path].dtype) \
                if hasattr(out[path], "dtype") else v
        elif log:
            log(f"unexpected weight skipped: {name}")
    missing = set(base_flat) - set(loaded_flat)
    if missing and log:
        for path in sorted(missing):
            log(f"missing weight kept at init: "
                f"{'/'.join(str(p) for p in path)}")
    return _unflatten(out)
