"""Parameter-file ("acon") loading and typed access.

Reference parity: every reference algorithm is driven by a JSON params
file read from the distributed filesystem
(config/shared/ConfigurationContext.scala:13-18, util/ConfigReader.scala:8-49).
We keep the same surface: a flat JSON object with required/optional keys,
loaded eagerly, with typed accessors that raise on missing required keys.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


class ConfigError(KeyError):
    """A required parameter is missing or has the wrong shape."""


@dataclass
class ParamsFile:
    """Typed view over one parsed params JSON object."""

    params: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "ParamsFile":
        with open(path, "r", encoding="utf-8") as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            raise ConfigError(f"params file {path!r} must hold a JSON object")
        return cls(data)

    # -- typed accessors (ConfigReader.scala:8-49 equivalent) ------------
    def get_string(self, key: str) -> str:
        return self._require(key, str)

    def get_int(self, key: str) -> int:
        v = self._require(key, (int,))
        if isinstance(v, bool):
            # bool is an int subclass: {"key": true} would silently
            # coerce to 1 — a config typo, not a value
            raise ConfigError(
                f"parameter {key!r} must be an integer, got JSON boolean {v!r}"
            )
        return int(v)

    def get_optional_int(
        self, key: str, default: int, minimum: int | None = None
    ) -> int:
        """Integer dial with the JSON-boolean/typo guard, naming the
        offending key (a bare ``int(p.get_optional(...))`` coerces
        {"key": true} to 1 and raises key-less errors on garbage).
        New params-driven dials should read through this."""
        raw = self.params.get(key, default)
        if isinstance(raw, bool) or not isinstance(raw, (int, str)):
            raise ConfigError(
                f"parameter {key!r} must be an integer, got {raw!r}"
            )
        try:
            n = int(raw)
        except ValueError:
            raise ConfigError(
                f"parameter {key!r} must be an integer, got {raw!r}"
            ) from None
        if minimum is not None and n < minimum:
            raise ConfigError(
                f"parameter {key!r} must be >= {minimum}, got {n}"
            )
        return n

    def get_bool(self, key: str) -> bool:
        return self._require(key, bool)

    def get_list(self, key: str) -> list[Any]:
        return self._require(key, list)

    def get_map(self, key: str) -> dict[str, Any]:
        return self._require(key, dict)

    def get_optional(self, key: str, default: Any = None) -> Any:
        return self.params.get(key, default)

    def has(self, key: str) -> bool:
        return key in self.params

    def _require(self, key: str, types: Any) -> Any:
        if key not in self.params:
            raise ConfigError(f"missing required parameter {key!r}")
        v = self.params[key]
        if not isinstance(v, types):
            raise ConfigError(
                f"parameter {key!r} has type {type(v).__name__}, expected {types}"
            )
        return v
