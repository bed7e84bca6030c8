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


class FileRegistry(LocalRegistry):
    """Persistent registry: resolved descriptors stored as {name}.json in a
    directory (the analog of the reference's MySQL registry,
    registries/mysql_registry.py:102 — same JSON, file-per-table storage)."""

    def __init__(self, directory: str) -> None:
        super().__init__()
        import os

        self._dir = directory
        os.makedirs(directory, exist_ok=True)
        self._load_all()

    def _load_all(self) -> None:
        import json
        import os

        from feathub_spark.registries.json_codec import descriptor_from_json

        for fname in sorted(os.listdir(self._dir)):
            if fname.endswith(".json"):
                with open(os.path.join(self._dir, fname)) as f:
                    obj = json.load(f)
                descriptor = descriptor_from_json(obj)
                # Re-resolve against what is already loaded.
                self._tables[descriptor.name] = descriptor.build(self)

    def build_features(self, descriptors):
        import json
        import os

        from feathub_spark.registries.json_codec import descriptor_to_json

        resolved = super().build_features(descriptors)
        for d in resolved:
            try:
                obj = descriptor_to_json(d)
            except Exception:
                continue  # non-serializable descriptors stay session-only
            with open(os.path.join(self._dir, f"{d.name}.json"), "w") as f:
                json.dump(obj, f, indent=1)
        return resolved
