"""Central query registry.

Every capability claimed in SURVEY.md §2 registers here as a ``QuerySpec``:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL a DuckDB oracle can run over the same parquet.

The driver consumes this through ``__spark_entry__.py``; the local harness
(``tools/check_oracle.py``) runs the same comparison pre-flight.

Determinism contract for oracle-checked specs:
- identical column NAMES in both engines (alias everything computed);
- no floating-point reassociation: money aggregates go through
  ``decimal`` (exact in both engines) and are cast back to double at the
  end; see ``plans/decimals.py``;
- no unstable tie-breaks: every top-k orders by a unique key suffix.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            description=description or (fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(REGISTRY)
