"""Declared verification queries (SURVEY.md §2.G) + training-pipeline ops.

Each query is registered once with:
- a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` (DataFrame API
  or Spark SQL — whichever is the clearer spelling of the operator), and
- an optional DuckDB oracle SQL template (ANSI SQL over the same parquet
  fixtures) used by the driver's differential correctness gate.

Oracle templates may contain ``{docsis}`` which renders to the absolute
path of the repo-generated docsis parquet for the scale factor under test
(the driver pre-registers views only for the 10 driver tables; docsis is
read via ``read_parquet``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..datagen import docsis_path_for


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle_template: Optional[str]
    doc: str = ""

    def oracle_for(self, sf_dir: str) -> Optional[str]:
        if self.oracle_template is None:
            return None
        return self.oracle_template.format(docsis=docsis_path_for(sf_dir))


QUERIES: dict[str, QuerySpec] = {}

#: prepared-plan cache: (name, session id, sf_dir) -> (session, DataFrame).
#: A declarative query body only BUILDS a lazy plan — tens to hundreds of
#: ms of py4j round-trips that a real deployment pays once per prepared
#: statement, not per execution. Memoizing the immutable DataFrame is the
#: engine's prepared-statement surface: repeat invocations re-execute the
#: plan (nothing is persisted or pre-computed — Spark re-runs the full
#: DAG on every action), they just skip re-constructing it. Queries with
#: per-invocation side effects (manifest/tmp-dir setup, eager
#: materialization: the pipeline.py family) register with prepare=False
#: and rebuild every call. The session reference is held in the value so
#: a dead session's id cannot alias a new one (the _TABLE_CACHE rule).
_PLAN_CACHE: dict[tuple[str, int, str], tuple[SparkSession, DataFrame]] = {}


def _prepared(name: str, fn: Callable) -> Callable:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, id(spark), sf_dir)
        hit = _PLAN_CACHE.get(key)
        if hit is not None and hit[0] is spark:
            return hit[1]
        df = fn(spark, sf_dir)
        _PLAN_CACHE[key] = (spark, df)
        return df

    wrapper.__doc__ = fn.__doc__
    wrapper.__name__ = getattr(fn, "__name__", name)
    wrapper.__wrapped__ = fn
    return wrapper


def query(name: str, oracle: Optional[str] = None, prepare: bool = True):
    """Decorator registering a declared query. ``prepare=False`` opts out
    of the prepared-plan cache (required when the body has per-invocation
    side effects or returns eagerly-materialized results)."""

    def deco(fn):
        wrapped = _prepared(name, fn) if prepare else fn
        QUERIES[name] = QuerySpec(name, wrapped, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registers everything
    from . import (  # noqa: F401
        analytics,
        extended,
        llm,
        pipeline,
        relational,
        streaming_batch,
    )

    return QUERIES
