"""Base class for feature transformations (reference
feature_views/transforms/transformation.py:20)."""

from __future__ import annotations

from typing import Any, Dict


class Transformation:
    def to_json(self) -> Dict[str, Any]:
        raise NotImplementedError

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.__dict__})"
