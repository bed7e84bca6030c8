"""LocalRegistry: in-memory name → TableDescriptor store
(reference registries/local_registry.py:44).

``build_features`` resolves string references recursively and registers each
resolved descriptor so later views can reference it by name.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

from feathub_spark.common.exceptions import RegistryError
from feathub_spark.table.table_descriptor import TableDescriptor


class LocalRegistry:
    def __init__(self) -> None:
        self._tables: Dict[str, TableDescriptor] = {}

    def build_features(
        self, descriptors: Union[TableDescriptor, Sequence[TableDescriptor]]
    ) -> List[TableDescriptor]:
        if isinstance(descriptors, TableDescriptor):
            descriptors = [descriptors]
        out: List[TableDescriptor] = []
        for d in descriptors:
            resolved = d.build(self)
            self._tables[resolved.name] = resolved
            out.append(resolved)
        return out

    def get_features(self, name: str) -> TableDescriptor:
        try:
            return self._tables[name]
        except KeyError:
            raise RegistryError(
                f"Table {name!r} is not registered; call build_features first. "
                f"Known: {sorted(self._tables)}"
            )

    def register(self, descriptor: TableDescriptor) -> None:
        self._tables[descriptor.name] = descriptor

    def delete_features(self, name: str) -> None:
        self._tables.pop(name, None)
