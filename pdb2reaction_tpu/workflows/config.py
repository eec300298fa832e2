"""Config machinery: defaults <- CLI <- YAML precedence.

Capability match: /root/reference/pdb2reaction/utils.py:243-318 —
``deep_update``, ``apply_yaml_overrides`` with ordered candidate key paths
(YAML wins over CLI, SURVEY.md §5.6), ``load_yaml_dict``, ``pretty_block``
echo formatting, ``normalize_choice`` alias handling (light->lbfgs,
heavy->rfo), and elapsed-time formatting (utils.py:194-200).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Iterable, Mapping, Optional, Sequence, Tuple

import yaml


def deep_update(base: Dict[str, Any], override: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (in place, returned)."""
    for k, v in override.items():
        if (k in base and isinstance(base[k], dict)
                and isinstance(v, Mapping)):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_yaml_dict(path) -> Dict[str, Any]:
    if path is None:
        return {}
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"YAML file not found: {p}")
    data = yaml.safe_load(p.read_text()) or {}
    if not isinstance(data, dict):
        raise ValueError(f"Top-level YAML in {p} must be a mapping")
    return data


def apply_yaml_overrides(cfg: Dict[str, Any], yaml_dict: Mapping[str, Any],
                         candidates: Sequence[Tuple[str, ...]]) -> Dict[str, Any]:
    """Merge the first matching candidate key path from ``yaml_dict`` into
    ``cfg``. E.g. candidates [("sopt","lbfgs"), ("opt","lbfgs"), ("lbfgs",)]
    — every matching path is applied in order, later (more specific first in
    the reference's ordering; we follow: all matches merged, first listed
    takes lowest precedence so later candidates can refine)."""
    for path in candidates:
        node: Any = yaml_dict
        ok = True
        for key in path:
            if isinstance(node, Mapping) and key in node:
                node = node[key]
            else:
                ok = False
                break
        if ok and isinstance(node, Mapping):
            deep_update(cfg, node)
    return cfg


def pretty_block(title: str, cfg: Mapping[str, Any]) -> str:
    """YAML-formatted echo block like the reference's config echoes."""
    body = yaml.safe_dump(_plain(cfg), default_flow_style=False,
                          sort_keys=False)
    bar = "-" * max(len(title), 8)
    return f"{bar}\n{title}\n{bar}\n{body}"


def _plain(obj):
    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if hasattr(obj, "item"):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    if isinstance(obj, Path):
        return str(obj)
    return obj


_ALIASES = {
    "light": "lbfgs",
    "heavy": "rfo",
}


def normalize_choice(value: Optional[str], aliases: Optional[Mapping[str, str]] = None,
                     choices: Optional[Iterable[str]] = None) -> Optional[str]:
    if value is None:
        return None
    v = str(value).strip().lower()
    amap = dict(_ALIASES)
    if aliases:
        amap.update(aliases)
    v = amap.get(v, v)
    if choices is not None and v not in set(choices):
        raise ValueError(f"Invalid choice {value!r}; allowed: {sorted(set(choices))}")
    return v


def parse_bool(value) -> bool:
    """Explicit True|False CLI booleans (README.md:35 convention)."""
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in ("true", "1", "yes", "on"):
        return True
    if v in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"Expected True or False, got {value!r}")


def format_elapsed(t_start: float, t_end: Optional[float] = None) -> str:
    dt = (t_end if t_end is not None else time.time()) - t_start
    h = int(dt // 3600)
    m = int((dt % 3600) // 60)
    s = dt % 60
    return f"{h:02d}:{m:02d}:{s:06.3f}"
