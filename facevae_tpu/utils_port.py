"""Generic torch<->flax parameter porting by structural order.

Both the reference's torch modules and our flax modules build their layers in
the same construction order (the architectures are mirrors), so a typed
order-preserving zip of the two parameter streams gives an exact mapping
without hand-written per-layer tables:

  torch conv weight (O,I,KH,KW)/(O,I,KD,KH,KW) <-> flax kernel HWIO/DHWIO
  torch linear weight (O,I)                    <-> flax kernel (I,O)
  torch BN weight/bias/running_mean/running_var<-> flax scale/bias + batch_stats
  torch IN weight/bias                         <-> flax scale/bias

Used by tools/convert_reference_checkpoint.py and the golden parity tests.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


def flatten_ordered(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    """DFS flatten in INSERTION order: flax variable dicts are built in module
    creation order during init, which mirrors the torch modules' definition
    order for every active model (verified per-model in
    tools/convert_reference_checkpoint.py).  Do not sort — name sorting breaks
    (e.g. 'ConvBlock_0' < 'Conv_0' alphabetically but not in creation order)."""
    out = []
    for key in tree.keys():
        val = tree[key]
        if isinstance(val, dict):
            out.extend(flatten_ordered(val, prefix + (key,)))
        else:
            out.append((prefix + (key,), np.asarray(val)))
    return out


def _merge_orders(p: List[str], s: List[str]) -> List[str]:
    """Merge two creation-ordered key lists sharing a common subsequence:
    params order is kept; stats-only keys are inserted at the position implied
    by their order relative to common keys (an affine-less BatchNorm has ONLY
    batch_stats, but still occupies its creation slot in the module stream)."""
    out: List[str] = []
    si = 0
    sset, pset = set(s), set(p)
    for k in p:
        if k in sset:
            while si < len(s) and s[si] != k:
                if s[si] not in pset:
                    out.append(s[si])
                si += 1
            si += 1
        out.append(k)
    while si < len(s):
        if s[si] not in pset:
            out.append(s[si])
        si += 1
    return out


def group_flax_modules(params: Dict[str, Any], batch_stats: Dict[str, Any] | None = None):
    """Group leaves by owning module (path minus leaf name), in CREATION order
    across BOTH collections (a merged traversal: stats-only modules — e.g.
    BatchNorm(use_scale_bias=False) — sit at their creation position, not at
    the end).  batch_stats leaves are merged as 'bn_mean'/'bn_var'.

    Requires creation-ordered dicts: use variables from a direct (non-jit)
    module.init — a jit pytree round-trip re-sorts dict keys.
    """
    modules: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    order: List[Tuple[str, ...]] = []

    def visit(p_node, s_node, path: Tuple[str, ...]):
        p_dict = p_node if isinstance(p_node, dict) else {}
        s_dict = s_node if isinstance(s_node, dict) else {}
        for k in _merge_orders(list(p_dict.keys()), list(s_dict.keys())):
            pv = p_dict.get(k)
            sv = s_dict.get(k)
            if isinstance(pv, dict) or isinstance(sv, dict):
                visit(pv, sv, path + (k,))
            else:
                if path not in modules:
                    modules[path] = {}
                    order.append(path)
                if pv is not None:
                    modules[path][k] = np.asarray(pv)
                if sv is not None:
                    modules[path]["bn_" + k] = np.asarray(sv)

    visit(params, batch_stats, ())
    return [(mod, modules[mod]) for mod in order]


def torch_param_stream(state_dict, skip_modules: Tuple[str, ...] = ()) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Group a torch state_dict (insertion-ordered) by owning module.

    skip_modules: module-name prefixes to drop (e.g. Hopenet's vestigial
    fc_finetune, reference trainer.py:36)."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if any(key.startswith(sm) for sm in skip_modules):
            continue
        mod, leaf = key.rsplit(".", 1) if "." in key else ("", key)
        if mod not in groups:
            groups[mod] = {}
            order.append(mod)
        groups[mod][leaf] = np.asarray(val)
    return [(m, groups[m]) for m in order]


def _to_flax_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:                      # conv2d OIHW -> HWIO
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:                      # conv3d OIDHW -> DHWIO
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 2:                      # linear (O,I) -> (I,O)
        return np.transpose(w, (1, 0))
    return w


def port_torch_to_flax(state_dict, params: Dict[str, Any],
                       batch_stats: Dict[str, Any] | None = None,
                       strict: bool = True,
                       skip_modules: Tuple[str, ...] = (),
                       spectral: Dict[str, Any] | None = None):
    """Return (new_params, new_batch_stats) with torch weights ported in,
    zipping typed module streams in construction order.

    If ``spectral`` (the flax 'spectral' collection of power-iteration u/v
    vectors) is given, torch weight_u/weight_v buffers are ported into it
    IN PLACE (v re-permuted from torch's (I,K...) flattening to our (K...,I))
    so spectral-normed forwards match the reference bit-for-fp32 from the
    first step."""
    import copy
    new_params = copy.deepcopy(_to_mutable(params))
    new_stats = copy.deepcopy(_to_mutable(batch_stats)) if batch_stats else None

    flax_mods = group_flax_modules(new_params, new_stats)
    torch_mods = torch_param_stream(state_dict, skip_modules)

    # typed streams: each flax module consumes the next compatible torch module
    ti = 0
    for mod_path, leaves in flax_mods:
        if ti >= len(torch_mods):
            if strict:
                raise ValueError(f"ran out of torch modules at {mod_path}")
            break
        tname, tleaves = torch_mods[ti]
        ti += 1
        _port_module(mod_path, leaves, tname, tleaves, new_params, new_stats, strict)
        if spectral is not None and "weight_u" in tleaves:
            _port_spectral(spectral, mod_path, tleaves)
    if strict and ti != len(torch_mods):
        raise ValueError(f"{len(torch_mods) - ti} torch modules left unported: "
                         f"{[m for m, _ in torch_mods[ti:ti+4]]}...")
    return new_params, new_stats


def _port_spectral(spectral: Dict[str, Any], mod_path, tleaves):
    """Copy torch spectral-norm power-iteration state (weight_u [O],
    weight_v [I*prod(K)] in (I,K...) order) into the flax 'spectral'
    collection at mod_path (u [O], v [prod(K)*I] in (K...,I) order)."""
    node = spectral
    for p in mod_path:
        if not isinstance(node, dict) or p not in node:
            return                      # this module isn't spectral-normed here
        node = node[p]
    if not isinstance(node, dict) or "u" not in node:
        return
    w = tleaves.get("weight_orig")
    u = tleaves["weight_u"]
    v = tleaves.get("weight_v")
    node["u"] = u.astype(np.asarray(node["u"]).dtype)
    if v is not None and "v" in node and w is not None:
        kshape = w.shape[2:]            # torch (O,I,K...)
        I = w.shape[1]
        ndim = len(kshape)
        perm = tuple(range(1, 1 + ndim)) + (0,)   # (I,K...) -> (K...,I)
        node["v"] = (v.reshape((I,) + tuple(kshape)).transpose(perm)
                     .reshape(-1).astype(np.asarray(node["v"]).dtype))


def _to_mutable(tree):
    if tree is None:
        return None
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _set_leaf(tree, path, name, value):
    node = tree
    for p in path:
        node = node[p]
    expect = node[name]
    if tuple(np.shape(expect)) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}/{name}: "
                         f"{np.shape(expect)} vs {value.shape}")
    node[name] = value.astype(np.asarray(expect).dtype)


def _port_module(mod_path, leaves, tname, tleaves, params, stats, strict):
    has_kernel = "kernel" in leaves
    has_scale = "scale" in leaves
    has_weight_param = "weight" in leaves            # LinearELR
    if has_kernel:
        # spectral-normed torch convs store weight_orig (+u/v buffers)
        w = tleaves.get("weight", tleaves.get("weight_orig"))
        if w is None:
            raise ValueError(f"flax {mod_path} (conv/dense) vs torch {tname} "
                             f"{list(tleaves)}")
        _set_leaf(params, mod_path, "kernel", _to_flax_kernel(w))
        if "bias" in leaves:
            if "bias" not in tleaves and strict:
                raise ValueError(f"{mod_path}: flax bias but torch {tname} has none")
            if "bias" in tleaves:
                _set_leaf(params, mod_path, "bias", tleaves["bias"])
    elif has_weight_param:
        _set_leaf(params, mod_path, "weight", tleaves["weight"])
        if "bias" in leaves and "bias" in tleaves:
            _set_leaf(params, mod_path, "bias", tleaves["bias"])
    elif has_scale or "bn_mean" in leaves:
        # norm layer
        if "weight" in tleaves and has_scale:
            _set_leaf(params, mod_path, "scale", tleaves["weight"])
        if "bias" in tleaves and "bias" in leaves:
            _set_leaf(params, mod_path, "bias", tleaves["bias"])
        if stats is not None and "running_mean" in tleaves and "bn_mean" in leaves:
            _set_leaf(stats, mod_path, "mean", tleaves["running_mean"])
            _set_leaf(stats, mod_path, "var", tleaves["running_var"])
    elif strict:
        raise ValueError(f"unhandled flax module {mod_path}: {list(leaves)}")
