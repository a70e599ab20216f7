"""Flat parameter arena for the fused adaptation step.

Profiling the fused MAD step on a v5e (tools/profile_mad.py) showed
~440 tiny `copy` kernels per step (~10 ms at ~23 us fixed cost each):
every leaf of ``params``/``params0``/optimizer state is a separate HBM
buffer, and each one is copied through the ``lax.switch``/carried-state
boundary every frame. TPU kernel launches have a fixed cost, so 3.8 M
params spread over ~180 leaves cost ~100x more to move than the same
bytes in one buffer.

The arena packs a param pytree into ONE contiguous fp32 vector, ordered
so that every MAD block occupies a contiguous ``[start, end)`` range
(non-block leaves go last). The fused step then carries three vectors
(params / pristine params / momentum) instead of ~540 leaves:

* boundary copies collapse to a handful of big (bandwidth-bound) ones,
* the per-block optimizer update is ONE fused op over a slice,
* the reset safeguard is ONE select over the vector.

``unravel`` rebuilds the pytree view with static slice+reshape (free for
XLA — folded into consumers); ``unravel_override`` rebuilds it with
block ``k``'s leaves taken from a separate differentiable slice so that
``jax.grad`` w.r.t. that slice performs the same *partial* backward as
the reference's ``minimize(loss_k, var_list=block_k)``
(Stereo_Online_Adaptation.py:85-118) — leaves outside the block are
captured constants and get no gradient work.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ArenaSpec", "build_arena"]

Path = Tuple[str, ...]


def _walk(tree: Any, prefix: Path = ()):
    """Deterministic (sorted-key) leaf walk of a nested-dict pytree."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], prefix + (k,))
    else:
        yield prefix, tree


def _get(tree: Dict, path: Path):
    node = tree
    for k in path:
        node = node[k]
    return node


class ArenaSpec:
    """Packing of a specific pytree structure + block partition."""

    def __init__(self, params: Dict, blocks: Sequence[Any]):
        # leaf order: block 0 leaves, block 1 leaves, ..., the rest
        taken: List[Path] = []
        seen = set()
        ranges: List[Tuple[int, int]] = []
        entries: List[Tuple[Path, Tuple[int, ...], int, int]] = []
        pos = 0

        def add_leaf(path: Path, leaf) -> None:
            nonlocal pos
            size = int(np.prod(leaf.shape)) if leaf.shape else 1
            entries.append((path, tuple(leaf.shape), pos, size))
            seen.add(path)
            pos += size

        for block in blocks or []:
            start = pos
            for bpath in block.paths:
                for sub, leaf in _walk(_get(params, bpath)):
                    full = tuple(bpath) + sub
                    if full in seen:
                        # a leaf shared by two blocks cannot live in two
                        # contiguous ranges; silently assigning it to the
                        # first block would make the second block's
                        # updates drop it (unlike minimize(var_list=...))
                        raise ValueError(
                            f"param {'/'.join(full)} appears in more than "
                            "one MAD block; the flat arena requires "
                            "disjoint blocks — use arena=False for "
                            "overlapping block configs"
                        )
                    add_leaf(full, leaf)
            ranges.append((start, pos))
        for path, leaf in _walk(params):
            if path not in seen:
                add_leaf(path, leaf)

        self.entries = entries
        self.block_ranges = ranges
        self.size = pos
        self._leaf_block: List[int] = []
        for path, _, off, _ in entries:
            bid = -1
            for i, (s, e) in enumerate(ranges):
                if s <= off < e:
                    bid = i
                    break
            self._leaf_block.append(bid)

    # ------------------------------------------------------------------ pack
    def ravel(self, params: Dict) -> jnp.ndarray:
        parts = [
            jnp.reshape(_get(params, path), (-1,)) for path, _, _, _ in self.entries
        ]
        return jnp.concatenate(parts, axis=0)

    def unravel(self, flat: jnp.ndarray) -> Dict:
        """Pytree view of the arena (static slices + reshapes)."""
        out: Dict = {}
        for path, shape, off, size in self.entries:
            node = out
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = jax.lax.slice(flat, (off,), (off + size,)).reshape(shape)
        return out

    def unravel_override(self, flat: jnp.ndarray, bp: jnp.ndarray, block: int) -> Dict:
        """Pytree view where block ``block``'s leaves come from ``bp`` (a
        vector of that block's range length) — the only differentiable
        inputs; everything else reads the non-differentiated ``flat``."""
        start, _ = self.block_ranges[block]
        out: Dict = {}
        for (path, shape, off, size), bid in zip(self.entries, self._leaf_block):
            node = out
            for k in path[:-1]:
                node = node.setdefault(k, {})
            if bid == block:
                o = off - start
                node[path[-1]] = jax.lax.slice(bp, (o,), (o + size,)).reshape(shape)
            else:
                node[path[-1]] = jax.lax.slice(flat, (off,), (off + size,)).reshape(
                    shape
                )
        return out

    def block_slice(self, flat: jnp.ndarray, block: int) -> jnp.ndarray:
        start, end = self.block_ranges[block]
        return jax.lax.slice(flat, (start,), (end,))

    def block_update(
        self, flat: jnp.ndarray, new_bp: jnp.ndarray, block: int
    ) -> jnp.ndarray:
        start, _ = self.block_ranges[block]
        return jax.lax.dynamic_update_slice(flat, new_bp, (start,))


def build_arena(params: Dict, blocks: Sequence[Any]) -> ArenaSpec:
    return ArenaSpec(params, blocks)
