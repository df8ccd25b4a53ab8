"""Hierarchical YAML-backed configuration nodes.

First-party replacement for the yacs ``CfgNode`` surface the reference uses
(cf. /root/reference/main.py:28-110): attribute access, ``merge_from_file``,
``merge_from_other_cfg``, ``new_allowed`` open nodes, ``freeze`` and ``dump``.
Existing reference ``configs/**.yaml`` files parse unchanged.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Iterator, List

import yaml

_VALID_SCALARS = (int, float, bool, str, type(None))


def _validate(value: Any, key: str) -> Any:
    """Coerce a raw YAML value into config-storable form."""
    if isinstance(value, CfgNode):
        return value
    if isinstance(value, dict):
        return CfgNode(value)
    if isinstance(value, (list, tuple)):
        return [_validate(v, key) for v in value]
    if isinstance(value, _VALID_SCALARS):
        return value
    raise TypeError(f"Invalid config value for key '{key}': {type(value)}")


class CfgNode:
    """A dict-like config node with attribute access and merge semantics."""

    _RESERVED = ("_frozen", "_new_allowed", "_data")

    def __init__(self, init: Dict[str, Any] | None = None, new_allowed: bool = False):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_frozen", False)
        object.__setattr__(self, "_new_allowed", new_allowed)
        if init:
            for k, v in init.items():
                self._data[str(k)] = _validate(v, str(k))

    # -- mapping protocol -------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if key in data:
            return data[key]
        raise AttributeError(f"Config key not found: {key}")

    def __setattr__(self, key: str, value: Any) -> None:
        if self._frozen:
            raise AttributeError(f"Cannot set '{key}' on a frozen config")
        self._data[key] = _validate(value, key)

    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self.__setattr__(key, value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, CfgNode):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"CfgNode({self.to_dict()!r})"

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def pop(self, key: str, *default: Any) -> Any:
        if self._frozen:
            raise AttributeError(f"Cannot pop '{key}' from a frozen config")
        return self._data.pop(key, *default)

    # -- lifecycle ---------------------------------------------------------
    def freeze(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", True)
        for v in self._data.values():
            if isinstance(v, CfgNode):
                v.freeze()
            elif isinstance(v, list):
                for item in v:
                    if isinstance(item, CfgNode):
                        item.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", False)
        for v in self._data.values():
            if isinstance(v, CfgNode):
                v.defrost()
            elif isinstance(v, list):
                for item in v:
                    if isinstance(item, CfgNode):
                        item.defrost()
        return self

    def is_frozen(self) -> bool:
        return self._frozen

    def set_new_allowed(self, flag: bool) -> None:
        object.__setattr__(self, "_new_allowed", flag)

    def clone(self) -> "CfgNode":
        node = CfgNode(new_allowed=self._new_allowed)
        for k, v in self._data.items():
            node._data[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    # -- merging -----------------------------------------------------------
    def merge_from_file(self, filename: str) -> "CfgNode":
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f) or {}
        self._merge_dict(loaded)
        return self

    def merge_from_other_cfg(self, other: "CfgNode | Dict[str, Any]") -> "CfgNode":
        other_dict = other.to_dict() if isinstance(other, CfgNode) else other
        self._merge_dict(other_dict)
        return self

    def merge_from_list(self, opts: List[Any]) -> "CfgNode":
        assert len(opts) % 2 == 0, "Override list must be key/value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for part in parts[:-1]:
                node = getattr(node, part)
            if isinstance(value, str):
                try:
                    value = yaml.safe_load(value)
                except yaml.YAMLError:
                    pass
            setattr(node, parts[-1], value)
        return self

    def _merge_dict(self, src: Dict[str, Any]) -> None:
        if self._frozen:
            raise AttributeError("Cannot merge into a frozen config")
        for k, v in src.items():
            k = str(k)
            if k in self._data:
                current = self._data[k]
                if isinstance(current, CfgNode) and isinstance(v, dict):
                    current._merge_dict(v)
                elif isinstance(current, CfgNode) and isinstance(v, CfgNode):
                    current._merge_dict(v.to_dict())
                else:
                    self._data[k] = _validate(v, k)
            elif self._new_allowed:
                self._data[k] = _validate(v, k)
            else:
                raise KeyError(f"Non-existent config key: {k}")

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        def convert(v: Any) -> Any:
            if isinstance(v, CfgNode):
                return v.to_dict()
            if isinstance(v, list):
                return [convert(i) for i in v]
            return v

        return {k: convert(v) for k, v in self._data.items()}

    def dump(self, **kwargs: Any) -> str:
        kwargs.setdefault("default_flow_style", False)
        kwargs.setdefault("sort_keys", False)
        return yaml.safe_dump(self.to_dict(), **kwargs)

    @classmethod
    def load_cfg(cls, stream: Any) -> "CfgNode":
        if hasattr(stream, "read"):
            stream = stream.read()
        return cls(yaml.safe_load(stream) or {}, new_allowed=True)


CN = CfgNode
