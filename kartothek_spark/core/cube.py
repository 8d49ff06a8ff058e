"""Cube specification — a multi-dataset OLAP abstraction.

Parity target: ``kartothek/core/cube/cube.py:122-218`` in /root/reference.
A *seed* dataset defines the cell universe over ``dimension_columns``;
enrichment datasets join onto it by the shared dimension + partition
columns. Physical partitioning of every member dataset is
``partition_columns``; ``index_columns`` get secondary inverted indices.
"""

from __future__ import annotations

from dataclasses import dataclass


KTK_CUBE_UUID_SEPARATOR = "++"


@dataclass(frozen=True)
class Cube:
    dimension_columns: tuple[str, ...]
    partition_columns: tuple[str, ...]
    uuid_prefix: str
    seed_dataset: str = "seed"
    index_columns: frozenset = frozenset()
    suppress_index_on: frozenset = frozenset()

    def __post_init__(self):
        object.__setattr__(self, "dimension_columns", tuple(self.dimension_columns))
        object.__setattr__(self, "partition_columns", tuple(self.partition_columns))
        object.__setattr__(self, "index_columns", frozenset(self.index_columns))
        object.__setattr__(self, "suppress_index_on", frozenset(self.suppress_index_on))
        overlap = set(self.dimension_columns) & set(self.partition_columns)
        if overlap:
            raise ValueError(f"dimension and partition columns overlap: {sorted(overlap)}")
        if KTK_CUBE_UUID_SEPARATOR in self.uuid_prefix:
            raise ValueError(f"uuid_prefix must not contain {KTK_CUBE_UUID_SEPARATOR!r}")

    def ktk_dataset_uuid(self, ktk_cube_dataset_id: str) -> str:
        return f"{self.uuid_prefix}{KTK_CUBE_UUID_SEPARATOR}{ktk_cube_dataset_id}"

    def dataset_id_of(self, dataset_uuid: str) -> str:
        prefix = self.uuid_prefix + KTK_CUBE_UUID_SEPARATOR
        if not dataset_uuid.startswith(prefix):
            raise ValueError(f"{dataset_uuid!r} does not belong to cube {self.uuid_prefix!r}")
        return dataset_uuid[len(prefix):]
