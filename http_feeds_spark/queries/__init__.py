"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`Query`: a named callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
re-exports this registry as ``queries()`` / ``oracle_sql()``.

Rules enforced by convention (FIXTURES.md oracle-alignment notes):
- every computed column is aliased identically in Spark and oracle SQL;
- double aggregations go through DECIMAL so the sum is order-independent
  and bit-identical across engines;
- top-k ties are broken by a unique key;
- timestamps stay µs-aligned (UTC session TZ both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None => rows-only check
    group: str = ""
    # DuckDB SQL for queries rotated OUT of the driver's 50 oracle slots
    # (slot-rotation protocol, SURVEY.md §8): the parity check stays
    # enforced on every pytest run (tests/test_rotated_oracle.py), it just
    # no longer occupies a driver slot. Exactly one of oracle /
    # pytest_oracle may be set.
    pytest_oracle: str | None = None


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    group: str = "",
    pytest_oracle: str | None = None,
):
    if oracle is not None and pytest_oracle is not None:
        raise ValueError(f"{name}: oracle and pytest_oracle are mutually exclusive")

    def deco(fn):
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, group=group, pytest_oracle=pytest_oracle
        )
        return fn

    return deco


def registry() -> dict[str, Query]:
    """Import all query modules (side-effect: registration) and return.

    Ordering contract: the driver's correctness harness records at most the
    first 50 registered queries, so every oracle-backed query must register
    ahead of the rows-only (``oracle is None``) set.  We enforce that here by
    partitioning the registry — oracle-backed first (stable in registration
    order), rows-only last — instead of relying on module import order.
    """
    from http_feeds_spark.queries import (  # noqa: F401
        extended,
        feed_queries,
        llm,
        relational,
        streaming_queries,
    )

    ordered = sorted(_REGISTRY.values(), key=lambda q: q.oracle is None)
    return {q.name: q for q in ordered}
