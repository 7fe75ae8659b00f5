"""YAML config system with recursive ``inherit_from`` chains.

Behavioral parity with reference src/config.py:4-58 (load_config /
update_recursive / save_config): a scene yaml inherits from a dataset yaml
which inherits from the global defaults; child keys deep-merge over parents.
"""

import os
from typing import Any, Dict, Optional

import yaml

# Default config shipped with the package (mirrors the ~90-key surface of
# reference configs/mono_point_slam.yaml).
DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs",
    "mono_point_slam.yaml",
)


def update_recursive(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> None:
    """Deep-merge ``dict2`` into ``dict1`` in place (reference config.py:43-58)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            if not isinstance(dict1[k], dict):
                dict1[k] = dict()
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, following its ``inherit_from`` chain.

    Matches reference src/config.py:4-36: the leaf yaml wins; if no
    ``inherit_from`` is present the ``default_path`` seeds the dict.
    """
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # Resolve relative inherit paths against cwd first (reference
        # behavior), falling back to the directory of the current file.
        if not os.path.exists(inherit_from):
            candidate = os.path.join(os.path.dirname(path), inherit_from)
            if os.path.exists(candidate):
                inherit_from = candidate
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = dict()

    update_recursive(cfg, cfg_special)
    return cfg


def save_config(cfg: Dict[str, Any], path: str) -> None:
    """Snapshot the merged config (reference config.py:38-40)."""
    with open(path, "w+") as fp:
        yaml.dump(cfg, fp)
