"""Physical-plan inspection helpers — the engine's "is this the plan I'd
want at 100 TB" discipline, made assertable.

The reference hand-builds its physical strategies (inverted-list pruning,
bucket lookups, heap top-k — SURVEY.md §4); here Catalyst chooses them, so
the engine's scale guarantees live in plan PROPERTIES: filters reaching the
parquet scan, small sides broadcast, rank-limit pushdown (WindowGroupLimit)
before the exchange, no accidental cartesian products on big sides.
``tests/test_plans.py`` pins these for the headline queries; use
``report()`` while developing a new operator."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (PySpark 4 prints to stdout only)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reaches a file scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — column pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", physical_plan(df))


def count(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator name in the plan."""
    return physical_plan(df).count(op)


def has_broadcast_join(df: DataFrame) -> bool:
    return count(df, "BroadcastHashJoin") > 0 or count(df, "BroadcastNestedLoopJoin") > 0


def has_window_group_limit(df: DataFrame) -> bool:
    """True when the per-group top-k is limited BEFORE the shuffle
    (Spark 3.5+ WindowGroupLimit: each map task keeps only k rows per
    group, so a rank<=k window never shuffles the full input)."""
    return count(df, "WindowGroupLimit") > 0


def n_shuffles(df: DataFrame) -> int:
    """Exchange count — the number the scale review tries to shrink."""
    return count(df, "Exchange")


def report(df: DataFrame) -> str:
    """One-paragraph plan summary for interactive plan review."""
    return (
        f"shuffles={n_shuffles(df)} "
        f"broadcast_joins={count(df, 'BroadcastHashJoin')} "
        f"bnl_joins={count(df, 'BroadcastNestedLoopJoin')} "
        f"sortmerge_joins={count(df, 'SortMergeJoin')} "
        f"window_group_limit={has_window_group_limit(df)} "
        f"pushed={pushed_filters(df)} "
        f"read_schemas={scan_read_schemas(df)}"
    )
