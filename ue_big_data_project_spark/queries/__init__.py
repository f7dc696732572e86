"""Query registry.

Every implemented operator from SURVEY §2 (plus the LLM-pipeline
extensions) is exposed here as a named query over the driver's testdata
tables, paired with the ANSI-SQL oracle DuckDB runs on the same parquet.

Cross-engine determinism conventions (so value-hashes match):

- **Sums of doubles go through DECIMAL**: float addition is
  order-dependent and Spark/DuckDB partition differently, so every SUM
  casts its per-row term to ``DECIMAL(18,4)`` (exact, associative), then
  the exact total is cast back to double and rounded. AVG is expressed as
  decimal-sum / count explicitly.
- **Timestamps leave as epoch micros** (``unix_micros`` / ``epoch_us``)
  or formatted strings — never raw timestamp columns, whose tz/precision
  rendering differs between engines.
- **Every computed column is aliased identically** in the Spark plan and
  the oracle SQL (driver hash compares by sorted column name).
- **Top-k orderings always carry a unique tie-breaker key.**
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark builder + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def all_queries() -> dict[str, QuerySpec]:
    from ue_big_data_project_spark.queries import events as _events
    from ue_big_data_project_spark.queries import multimodal as _multimodal
    from ue_big_data_project_spark.queries import (
        reference_registered as _reference,
    )
    from ue_big_data_project_spark.queries import textops as _textops
    from ue_big_data_project_spark.queries import tpch as _tpch

    out: dict[str, QuerySpec] = {}
    for mod in (_tpch, _events, _textops, _multimodal, _reference):
        out.update(mod.QUERIES)
    return out
