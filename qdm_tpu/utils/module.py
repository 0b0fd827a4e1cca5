"""Param-tree graph utilities — parity with the reference's nn.Module
traversal helpers (utils/module.py:12-92), reformulated for pytrees.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from qdm_tpu.quant.apply import _set_at, iter_layers, path_str


def get_named_linears(params: dict) -> Dict[str, dict]:
    """{'path/to/layer': layer_dict} for 2D-kernel layers
    (get_named_linears, utils/module.py:12-13)."""
    return {path_str(p): l for p, l in iter_layers(params)
            if l.get("kernel") is not None and l["kernel"].ndim == 2}


def get_named_linears_and_convs(params: dict) -> Dict[str, dict]:
    """(utils/module.py:15-16)"""
    return {path_str(p): l for p, l in iter_layers(params)
            if l.get("kernel") is not None and l["kernel"].ndim in (2, 4)}


def get_op_by_name(params: dict, name: str):
    """(utils/module.py:18-27); name is '/'-joined."""
    sub = params
    for p in name.split("/"):
        found = False
        # tolerate composite keys containing '/'
        for k in sub:
            if k == p:
                sub = sub[k]
                found = True
                break
        if not found:
            raise KeyError(name)
    return sub


def set_op_by_name(params: dict, name: str, value) -> dict:
    """Functional setter (utils/module.py:29-40)."""
    return _set_at(params, tuple(name.split("/")), value)


def get_op_name(prefix_paths: Tuple[str, ...]) -> str:
    return "/".join(prefix_paths)


def append_str_prefix(items: List[Tuple], prefix: str) -> List[Tuple]:
    """(utils/module.py:48-56)"""
    out = []
    for it in items:
        if isinstance(it, str):
            out.append(prefix + it)
        elif isinstance(it, tuple):
            out.append(tuple(append_str_prefix([x], prefix)[0]
                             if isinstance(x, (str, tuple)) else x for x in it))
        else:
            out.append(it)
    return out


def exclude_layers_to_not_quantize(named_layers: Dict[str, dict],
                                   modules_to_not_convert) -> Dict[str, dict]:
    """Substring exclusion (utils/module.py:59-67)."""
    if not modules_to_not_convert:
        return named_layers
    return {name: layer for name, layer in named_layers.items()
            if not any(pat in name for pat in modules_to_not_convert)}
