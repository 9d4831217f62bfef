"""Load converted pretrained-teacher weights (see tools/convert_torch_weights.py).

Artifacts are flat npz files keyed by '/'-joined flax paths; missing files
leave the corresponding teacher at its deterministic random init (documented
deviation — no egress in this environment).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _set_path(tree: Dict[str, Any], path, value) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    expect = node[path[-1]]
    if tuple(expect.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{expect.shape} vs {value.shape}")
    node[path[-1]] = jnp.asarray(value, expect.dtype)
    return True


def _load_npz_into(tree: Dict[str, Any], npz_path: str) -> int:
    data = np.load(npz_path)
    n = 0
    for key in data.files:
        if not _set_path(tree, key.split("/"), data[key]):
            raise KeyError(f"{npz_path}: no target for {key}")
        n += 1
    return n


def load_pretrained(teachers: Dict[str, Any], pretrained_dir: str) -> Dict[str, Any]:
    """Mutates (copies of) the teacher variable trees with available artifacts.

    teachers = {"hopenet": {params, batch_stats}, "perceptual": {params}}
    """
    import jax
    teachers = jax.tree.map(lambda x: x, teachers)   # shallow copy of containers
    vgg19 = os.path.join(pretrained_dir, "vgg19.npz")
    vggface = os.path.join(pretrained_dir, "vggface.npz")
    hopenet = os.path.join(pretrained_dir, "hopenet.npz")
    loaded = []
    if os.path.exists(vgg19):
        _load_npz_into(teachers["perceptual"]["params"]["vgg19"], vgg19)
        loaded.append("vgg19")
    if os.path.exists(vggface):
        _load_npz_into(teachers["perceptual"]["params"]["vggface"], vggface)
        loaded.append("vggface")
    if os.path.exists(hopenet):
        _load_npz_into(teachers["hopenet"], hopenet)
        loaded.append("hopenet")
    if loaded:
        print(f"loaded pretrained teachers: {', '.join(loaded)}")
    else:
        print(f"WARNING: no pretrained artifacts in {pretrained_dir}; "
              "teachers stay random-init")
    return teachers
