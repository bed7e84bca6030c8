"""TableDescriptor: a named, schema'd logical table.

Re-expresses the reference abstraction
(/root/reference/python/feathub/table/table_descriptor.py:29-140): every
column is a feature; the descriptor carries entity ``keys``, a
``timestamp_field`` and its ``timestamp_format`` ("epoch" seconds,
"epoch_millis", or a strftime pattern).  ``build(registry)`` resolves string
references into a self-contained descriptor tree the planner can compile.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from feathub_spark.table.schema import Schema


class TableDescriptor:
    def __init__(
        self,
        name: str,
        keys: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
        timestamp_format: str = "epoch",
    ) -> None:
        self.name = name
        self.keys: Optional[List[str]] = list(keys) if keys is not None else None
        self.timestamp_field = timestamp_field
        self.timestamp_format = timestamp_format

    # -- resolution -----------------------------------------------------
    def build(self, registry) -> "TableDescriptor":
        """Return a resolved copy with all string references replaced."""
        return self

    def is_resolved(self) -> bool:
        return True

    # -- metadata -------------------------------------------------------
    def get_output_schema(self) -> Schema:
        raise NotImplementedError

    def get_output_fields(self) -> List[str]:
        return list(self.get_output_schema().field_names)

    def is_bounded(self) -> bool:
        return True

    def get_bounded_view(self) -> "TableDescriptor":
        if self.is_bounded():
            return self
        raise NotImplementedError(f"{type(self).__name__} cannot be bounded.")

    def __repr__(self) -> str:
        return f"{type(self).__name__}(name={self.name!r})"
