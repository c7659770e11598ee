"""A tiny string->factory registry.

Replaces the reference's hand-written dicts (SEG_MODEL_DICT,
lib/models/model_manager.py:48-82; SEG_LOSS_DICT, lib/loss/loss_manager.py:27-42)
with one reusable mechanism.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, key: str | None = None):
        def deco(fn: Callable[..., Any]):
            k = key or fn.__name__
            if k in self._entries:
                raise KeyError(f"{self.name}: duplicate key {k!r}")
            self._entries[k] = fn
            return fn

        return deco

    def get(self, key: str) -> Callable[..., Any]:
        if key not in self._entries:
            raise KeyError(
                f"{self.name}: unknown key {key!r}; known: {sorted(self._entries)}"
            )
        return self._entries[key]

    def build(self, key: str, *args, **kwargs) -> Any:
        return self.get(key)(*args, **kwargs)

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    def keys(self):
        return sorted(self._entries)
