"""DuckDB oracle SQL builders for the correctness gate.

Each gate query pairs a KAFSQL statement (run through the real engine) with
a DuckDB SQL twin built here. The envelope CTE reproduces the topic
presentation exactly (verified hash-identical in tests), and the render
helpers mirror functions/render.py.
"""

from __future__ import annotations

from platform_spark import envelope as env

#: ms-precision text (twin of render.ts_text)
def ts(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%g')"


def bytea(expr: str) -> str:
    return f"CASE WHEN {expr} IS NULL THEN NULL ELSE '\\x' || lower(hex({expr})) END"


def jval(value_expr: str, path: str) -> str:
    """json_value twin: NULL on invalid JSON or missing path."""
    return (
        f"CASE WHEN json_valid({value_expr}) "
        f"THEN json_extract_string({value_expr}, '{path}') ELSE NULL END"
    )


def jquery(value_expr: str, path: str) -> str:
    """json_query twin: JSON text of the subtree."""
    return (
        f"CASE WHEN json_valid({value_expr}) "
        f"THEN CAST(json_extract({value_expr}, '{path}') AS VARCHAR) ELSE NULL END"
    )


def jexists(value_expr: str, path: str) -> str:
    """json_exists tri-state twin (server.go:1719-1729)."""
    return (
        f"CASE WHEN NOT json_valid({value_expr}) THEN NULL "
        f"ELSE json_extract({value_expr}, '{path}') IS NOT NULL END"
    )


def dsum(expr: str) -> str:
    """Exact decimal SUM cast to double (twin of the compiler's SUM)."""
    return f"CAST(SUM(TRY_CAST({expr} AS DECIMAL(38,9))) AS DOUBLE)"


def davg(expr: str) -> str:
    """AVG = exact decimal sum / count, both as IEEE double ops."""
    return (
        f"(CAST(SUM(TRY_CAST({expr} AS DECIMAL(38,9))) AS DOUBLE) "
        f"/ COUNT(TRY_CAST({expr} AS DECIMAL(38,9))))"
    )


def with_topics(select_sql: str) -> str:
    """Prefix a query with the topic-envelope CTEs (t_events, t_orders,
    t_payments)."""
    return f"WITH {env.envelope_cte(env.DUCK)}\n{select_sql}"


#: pinned now for LAST determinism
NOW = env.PINNED_NOW
