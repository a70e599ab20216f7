"""MAD block partitioning of a model's param pytree.

The reference drives Modular ADaptation with JSON block configs listing
TF layer names per independently-trainable portion
(``block_config/*.json``, consumed at Stereo_Online_Adaptation.py:32,110-114).
Here a block is a set of *param-pytree paths*; the same JSON files are
accepted and translated through the model's ``layer_to_path`` map, so a
reference user's configs work unchanged.

A block is materialised as a pair of functions over the pytree:
``extract`` (pull the block's subtree out) and ``merge`` (push an
updated subtree back). ``jax.grad`` on the extracted subtree then
computes exactly the block's gradients — the TPU-native equivalent of
TF's ``optimizer.minimize(loss, var_list=...)``.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax

__all__ = ["Block", "load_block_config", "make_blocks", "default_block_config_path"]

Path = Tuple[str, ...]


class Block:
    """One independently-trainable network portion."""

    def __init__(self, index: int, paths: Sequence[Path]):
        self.index = index
        # deduplicate while keeping order (left/right share pyramid convs)
        seen = []
        for p in paths:
            if p not in seen:
                seen.append(p)
        self.paths: List[Path] = seen

    def extract(self, params: Dict) -> Dict:
        """Pull the block's params out as a flat {'a/b': leaf-dict} dict."""
        out = {}
        for path in self.paths:
            node = params
            for k in path:
                node = node[k]
            out["/".join(path)] = node
        return out

    def merge(self, params: Dict, block_params: Dict) -> Dict:
        """Return a new full pytree with the block subtrees replaced."""
        new = _deep_copy_dicts(params)
        for path in self.paths:
            node = new
            for k in path[:-1]:
                node = node[k]
            node[path[-1]] = block_params["/".join(path)]
        return new

    def __repr__(self):
        return f"Block({self.index}, {['/'.join(p) for p in self.paths]})"


def _deep_copy_dicts(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _deep_copy_dicts(v) for k, v in tree.items()}
    return tree


def load_block_config(path: str) -> List[List[str]]:
    """Load a reference-format block config JSON (list of layer-name lists)."""
    with open(path) as f:
        return json.load(f)


def make_blocks(
    layer_groups: Sequence[Sequence[str]],
    layer_to_path: Callable[[str], Path | None],
) -> List[Block]:
    """Translate layer-name groups into param-path Blocks via the model's
    ``layer_to_path`` mapping (names without params are skipped, like
    ``StereoNet.get_variables`` returning [] — Stereo_net.py:213-222)."""
    blocks = []
    for i, group in enumerate(layer_groups):
        paths = []
        for name in group:
            p = layer_to_path(name)
            if p is not None:
                paths.append(tuple(p))
        blocks.append(Block(i, paths))
    return blocks


def default_block_config_path(model_name: str) -> str:
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fname = "MadNet_full.json" if model_name == "MADNet" else "dispnet_full.json"
    return os.path.join(here, "..", "block_config", fname)
