"""Checkpointing: native pytree checkpoints + TF1 checkpoint import.

Replaces reference ``Data_utils/weights_utils.py`` (TF1 Saver machinery):

* Native format: flat ``.npz`` of ``path/to/leaf`` -> array. Fast,
  dependency-free, and exactly reproducible. Step-numbered files with a
  resume helper mirror ``check_for_weights_or_restore_them``
  (weights_utils.py:41-75).
* TF1 import: reads the reference's pretrained checkpoints (the
  Google-Drive weights) through ``tf.train.load_checkpoint`` and maps
  variable names into our pytrees via each model's ``tf_name_map`` —
  with the same mask / prefix / ignore_list renaming hooks as
  ``get_var_to_restore_list`` (weights_utils.py:4-38).
* Orbax backend (``save_params_orbax`` / ``load_params_orbax``): the
  scale-out format for very large runs — async-capable, sharding-aware
  (restores device arrays directly), directory-per-checkpoint.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

__all__ = [
    "flatten_params",
    "unflatten_params",
    "save_params",
    "load_params",
    "latest_checkpoint",
    "save_step_checkpoint",
    "restore_or_init",
    "tf1_checkpoint_to_params",
    "save_params_orbax",
    "load_params_orbax",
]

Tree = Any


def flatten_params(tree: Tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Tree:
    root: Dict = {}
    for key, val in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_params(path: str, params: Tree) -> None:
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_params(path: str, dtype=None) -> Tree:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        flat = {k: (data[k].astype(dtype) if dtype else data[k]) for k in data.files}
    return unflatten_params(flat)


_CKPT_RE = re.compile(r"weights-(\d+)\.npz$")


def latest_checkpoint(logdir: str) -> Optional[Tuple[str, int]]:
    """Find the newest step-numbered checkpoint in ``logdir``."""
    if not os.path.isdir(logdir):
        return None
    best = None
    for f in os.listdir(logdir):
        m = _CKPT_RE.search(f)
        if m:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (os.path.join(logdir, f), step)
    return best


def save_step_checkpoint(logdir: str, params: Tree, step: int, keep: int = 2) -> str:
    """Save ``weights-{step}.npz`` keeping only the ``keep`` newest
    (reference keeps max_to_keep=2, Train.py:114)."""
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, f"weights-{step}.npz")
    save_params(path, params)
    ckpts = sorted(
        (
            (int(_CKPT_RE.search(f).group(1)), f)
            for f in os.listdir(logdir)
            if _CKPT_RE.search(f)
        )
    )
    for _, f in ckpts[:-keep]:
        os.remove(os.path.join(logdir, f))
    return path


def restore_or_init(
    logdir: str,
    params: Tree,
    initial_weights: Optional[str] = None,
    model=None,
) -> Tuple[Tree, bool, int]:
    """Resume-from-logdir if a checkpoint exists, else load
    ``initial_weights`` (native .npz or TF1 ckpt), else keep ``params``.
    Returns (params, restored?, step) like weights_utils.py:41-75."""
    found = latest_checkpoint(logdir)
    if found:
        path, step = found
        return load_params(path), True, step
    if initial_weights:
        if initial_weights.endswith(".npz") or os.path.exists(initial_weights + ".npz"):
            return load_params(initial_weights), True, 0
        if model is not None:
            restored, n = tf1_checkpoint_to_params(initial_weights, model, params)
            return restored, n > 0, 0
    return params, False, 0


# ------------------------------------------------------------- orbax backend


def save_params_orbax(path: str, params: Tree) -> None:
    """Save a param pytree as an orbax checkpoint directory.

    Same tree in/out as :func:`save_params`; use for multi-host /
    sharded runs where npz (host-gathered, single-file) doesn't scale.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str) -> Tree:
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


# ------------------------------------------------------------- TF1 import


def tf1_checkpoint_to_params(
    ckpt_path: str,
    model,
    base_params: Tree,
    mask: Iterable[str] = (),
    prefix: str = "",
    ignore_list: Iterable[str] = (),
) -> Tuple[Tree, int]:
    """Load a reference TF1 checkpoint into a param pytree.

    ``mask`` skips graph-side names containing any substring; ``prefix``
    is prepended to checkpoint names before matching; ``ignore_list``
    substrings are stripped from checkpoint names — the exact renaming
    hooks of weights_utils.get_var_to_restore_list.
    Returns (new_params, number_of_restored_leaves).
    """
    import tensorflow as tf  # local import; TF only needed for conversion

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()

    name_map = model.tf_name_map()
    name_map = {
        name: path
        for name, path in name_map.items()
        if not any(m in name for m in mask)
    }

    flat = flatten_params(base_params)
    restored = 0
    for ckpt_name in shapes:
        t_key = ckpt_name
        for ig in ignore_list:
            t_key = t_key.replace(ig, "")
        target = prefix + t_key
        if target in name_map:
            path = "/".join(name_map[target])
            value = np.asarray(reader.get_tensor(ckpt_name))
            if path in flat:
                if tuple(value.shape) != tuple(flat[path].shape):
                    raise ValueError(
                        f"shape mismatch for {ckpt_name}: ckpt {value.shape} vs model {flat[path].shape}"
                    )
                flat[path] = value.astype(flat[path].dtype)
                restored += 1
    return unflatten_params(flat), restored
