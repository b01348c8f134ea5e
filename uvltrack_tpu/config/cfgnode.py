"""Lightweight attribute-dict config tree with strict YAML merge.

Matches the semantics of the reference config system
(lib/config/uvltrack/config.py:169-187): overriding a key that does not exist
in the defaults raises, scalars replace, nested dicts merge recursively.
"""

from __future__ import annotations

from typing import Any, Dict

import yaml


class CfgNode(dict):
    """dict subclass with attribute access. Values that are dicts are wrapped."""

    def __init__(self, init: Dict[str, Any] | None = None):
        super().__init__()
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        super().__setitem__(key, value)

    def clone(self) -> "CfgNode":
        out = CfgNode()
        for k, v in self.items():
            if isinstance(v, CfgNode):
                v = v.clone()
            elif isinstance(v, list):
                # list values (MILESTONES, FUSION_LAYER, DATASETS_NAME...)
                # must not be shared — in-place tweaks on a clone would
                # corrupt the base config of a sibling run
                v = list(v)
            out[k] = v
        return out

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()}

    def merge_from_dict(self, other: Dict[str, Any], _path: str = "") -> None:
        """Strict recursive merge: unknown keys raise ValueError."""
        for k, v in other.items():
            here = f"{_path}.{k}" if _path else k
            if k not in self:
                raise ValueError(f"{here} not exist in default config")
            if isinstance(v, dict):
                if not isinstance(self[k], CfgNode):
                    # defaults hold a scalar/None but override provides a dict
                    raise ValueError(f"{here}: cannot merge dict into non-dict")
                self[k].merge_from_dict(v, here)
            else:
                super(CfgNode, self).__setitem__(k, v)

    def merge_from_list(self, overrides) -> None:
        """Apply `KEY.SUBKEY=value` command-line overrides (yacs-style,
        cf. reference lib/config/__init__.py's yacs CfgNode). Values are
        parsed with yaml.safe_load so `2`, `2.5e-4`, `true`, `[1,2]` and
        quoted strings all work; unknown keys raise like merge_from_dict."""
        for item in overrides:
            key, sep, raw = item.partition("=")
            if not sep:
                raise ValueError(f"override {item!r} is not KEY=VALUE")
            node, parts = self, key.strip().split(".")
            for p in parts[:-1]:
                if not isinstance(node.get(p), CfgNode):
                    raise ValueError(f"{key}: {p} not a config section")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise ValueError(f"{key} not exist in default config")
            dict.__setitem__(node, leaf, yaml.safe_load(raw))

    def merge_from_file(self, filename: str) -> None:
        with open(filename) as f:
            data = yaml.safe_load(f)
        if data:
            self.merge_from_dict(data)

    def dump_yaml(self, filename: str) -> None:
        with open(filename, "w") as f:
            yaml.dump(self.to_dict(), f, default_flow_style=False)
