"""KAFSQL query IR.

A single flat query description, mirroring the *shape* of the reference's
IR (sql/ast.go:29-57) — there is deliberately no logical-plan tree here:
the dialect is small enough that one struct captures it, and the Spark
compiler (compiler.py) turns it straight into a DataFrame where Catalyst
provides the real plan tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum


class QueryType(str, Enum):
    SHOW_TOPICS = "show_topics"
    SHOW_PARTITIONS = "show_partitions"
    SHOW_SNAPSHOTS = "show_snapshots"
    DESCRIBE = "describe"
    SELECT = "select"
    EXPLAIN = "explain"


class ColumnKind(str, Enum):
    STAR = "star"
    FIELD = "field"
    JSON_VALUE = "json_value"
    JSON_QUERY = "json_query"
    JSON_EXISTS = "json_exists"
    AGGREGATE = "aggregate"


@dataclass
class SelectColumn:
    raw: str
    kind: ColumnKind
    alias: str = ""
    source: str = ""  # table alias qualifier (joins)
    column: str = ""  # FIELD: column name; JSON_*: the json arg column
    json_path: str = ""
    agg_func: str = ""  # count|sum|avg|min|max
    agg_column: str = ""
    agg_json_path: str = ""
    agg_star: bool = False
    agg_source: str = ""

    def output_name(self) -> str:
        if self.alias:
            return self.alias
        if self.kind == ColumnKind.FIELD:
            return self.column
        return self.raw


class JoinExprKind(str, Enum):
    KEY = "key"
    JSON = "json"


@dataclass
class JoinExpr:
    kind: JoinExprKind
    side: str = ""  # alias the expression is qualified with ('' = positional)
    json_path: str = ""


@dataclass
class JoinCondition:
    left: JoinExpr
    right: JoinExpr


@dataclass
class Query:
    type: QueryType = QueryType.SELECT

    topic: str = ""
    topic_alias: str = ""
    join_topic: str = ""
    join_alias: str = ""
    join_type: str = ""  # "inner" | "left"
    join_on: JoinCondition | None = None

    select: list[SelectColumn] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    order_by: str = ""  # only "_ts" is legal (server.go:1347-1349)
    order_desc: bool = False
    limit: int | None = None

    partition: int | None = None
    offset_min: int | None = None
    offset_max: int | None = None
    ts_min: datetime | None = None
    ts_max: datetime | None = None
    #: `WHERE _key = '<text>'` point lookup (extension: the reference
    #: rejects it, parser.go:259-261; over a _key-bucketed Iceberg topic
    #: it plans 1/N of the files from the spec bucket id)
    key_eq: str | None = None
    #: `WHERE _key IN ('a', 'b', ...)` — the batch-fetch twin of key_eq
    #: (plans the UNION of the keys' buckets)
    key_in: tuple[str, ...] | None = None
    #: `FOR SYSTEM_TIME AS OF <ts>` — snapshot time travel (Iceberg
    #: topics only; extension over the reference's always-current reads)
    as_of: datetime | None = None
    #: `FOR SYSTEM_VERSION AS OF <snapshot-id>` — read a pinned snapshot
    #: by id (the ids `SHOW SNAPSHOTS FROM t` lists)
    version_of: int | None = None
    #: `FOR SYSTEM_VERSION AS OF '<ref>'` — read a named tag/branch
    #: (Iceberg's ref syntax: the 'corpus-v1 is what run X trained on'
    #: pin survives however much history expires around it)
    version_ref: str | None = None
    #: per-side time travel on the JOIN topic (`JOIN t FOR SYSTEM_TIME
    #: AS OF ... ON ...`) — the corpus-reproducibility join: the docs
    #: topic AS OF the training cut against today's eval topic
    join_as_of: datetime | None = None
    join_version_of: int | None = None
    join_version_ref: str | None = None

    within_seconds: float | None = None  # WITHIN <d> band (joins)
    last_seconds: float | None = None  # LAST <d>
    tail: int | None = None  # TAIL <n>
    scan_full: bool = False

    explain: "Query | None" = None

    def has_aggregates(self) -> bool:
        return any(c.kind == ColumnKind.AGGREGATE for c in self.select)

    def is_join(self) -> bool:
        return bool(self.join_topic)

    def has_time_bound(self) -> bool:
        return (
            self.last_seconds is not None
            or self.ts_min is not None
            or self.ts_max is not None
        )
