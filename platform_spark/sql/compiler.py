"""KAFSQL compiler: Query IR → PySpark DataFrame.

This replaces the reference's hand-rolled execution pipeline
(server.go:1308-1484 handleSelect → project/sort/tail/limit,
server.go:1762-2010 handleAggregateSelect, server.go:2281-2464
handleJoinSelect) with a declarative DataFrame expression; Catalyst then
provides segment pruning, predicate pushdown, column pruning, spillable
aggregation and size-aware join strategies — everything §4 of SURVEY.md
shows the reference hard-codes or lacks.

Semantics parity notes (the "watch list" of SURVEY.md §7):
- numeric coercion: SUM/AVG/MIN/MAX over JSON paths parse numeric strings
  and skip non-numeric values (server.go:2095-2109) — expressed as
  `cast(double)` under non-ANSI mode (bad cast → NULL → skipped).
- SUM accumulates as float64 in the reference (server.go:2237-2241); we sum
  exactly as DECIMAL(38,9) and cast to double, which is deterministic under
  any partitioning/ordering — a strictly stronger guarantee with the same
  logical value.
- group rows are emitted sorted by the group-key *string* with `\\x1f`
  separators and `<nil>` for NULL (server.go:1829-1833, 1968-1981).
- TAIL = last n records in scan order; scan order is (partition, offset)
  (segment listing order, discovery.go:115-200).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.errors import ValidationError
from platform_spark.functions import render
from platform_spark.sql.ast import (
    ColumnKind,
    JoinExpr,
    JoinExprKind,
    Query,
    SelectColumn,
)
from platform_spark.sql.parser import MAX_KEY_IN
from platform_spark.topics import IMPLICIT_COLUMNS, TopicCatalog

GROUP_KEY_SEP = "\x1f"
GROUP_KEY_NULL = "<nil>"


#: every optional kwarg a catalog scan/estimate hook may understand —
#: the capability vocabulary `scan_capabilities` resolves against
SCAN_CAPABILITIES = frozenset(
    {
        "partition", "ts_min", "ts_max", "offset_min", "offset_max",
        "key_eq", "as_of", "snapshot_id", "ref", "with_schema_columns",
    }
)

#: the time-travel keys: a hook that accepts-and-IGNORES one of these
#: serves CURRENT state as historical — wrong data, not merely unpruned
#: data (dropping a prune key like ts_min only costs pruning). A bare
#: ``**kwargs`` signature therefore never implies these; they require a
#: declared ``topic_scan_capabilities`` or an explicitly named parameter.
TIME_TRAVEL_CAPABILITIES = frozenset({"as_of", "snapshot_id", "ref"})


def scan_capabilities(owner, fn) -> frozenset:
    """The optional-kwarg capabilities of a catalog hook (``topic_scan``
    or ``estimate_topic_scan``). A DECLARED ``topic_scan_capabilities``
    attribute on the catalog wins outright — signature sniffing alone
    (the r13 shape) silently breaks on a decorator-wrapped hook (whose
    visible signature is ``*args, **kwargs``) and mis-fires time
    travel's loud-rejection contract. The fallback inspects the
    signature FOLLOWING ``__wrapped__`` chains; a bare ``**kwargs``
    grants only the PRUNE keys (a forwarding wrapper that drops one of
    those merely skips pruning), never the time-travel keys, where an
    accept-and-ignore hook would silently serve current state as
    historical (r14 ADVICE) — those demand a declaration or a named
    parameter."""
    if fn is None:
        return frozenset()  # no hook ⇒ no capabilities, declared or not
    caps = getattr(owner, "topic_scan_capabilities", None)
    if caps is not None:
        return frozenset(caps)
    import inspect

    try:
        sig = inspect.signature(fn, follow_wrapped=True)
    except (TypeError, ValueError):
        return frozenset()
    params = sig.parameters
    named = frozenset(params) & SCAN_CAPABILITIES
    if any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
    ):
        return (SCAN_CAPABILITIES - TIME_TRAVEL_CAPABILITIES) | named
    return named


@dataclass
class CompilerOptions:
    default_limit: int = 1000
    max_rows: int = 100_000
    max_unbounded_scan: int = 1000  # row cap applied to SCAN FULL
    require_time_bound: bool = True
    #: render _ts/_key/_value projections as reference text (F4/F5)
    render_text: bool = True
    #: exact emulation of the reference's MIN/MAX kind rule for JSON paths
    #: (first value in scan order decides number-vs-string, mismatched kinds
    #: ignored — server.go:2132-2182). Costs one tiny top-1 job per MIN/MAX
    #: over a JSON path; off by default in favor of the static rule.
    first_kind_wins: bool = False


class Compiler:
    def __init__(
        self,
        catalog: TopicCatalog,
        options: CompilerOptions | None = None,
        now: datetime | None = None,
    ) -> None:
        self.catalog = catalog
        self.opt = options or CompilerOptions()
        self.now = now  # pinned clock for LAST; None = wall clock

    # ------------------------------------------------------------------
    def compile(self, q: Query) -> DataFrame:
        self._validate(q)
        # Pin the clock for the WHOLE compile: metadata pruning
        # (_topic_frame), the row filters (_apply_time_bounds) and a
        # join's widened right-side frame each call time_bounds(), and
        # for LAST windows every call would otherwise take its own
        # wall-clock `now` — pruning and filtering would disagree about
        # rows stamped between the two instants (a row in a pruned-out
        # file could pass the filter bound yet never be read).
        pinned = self.now
        if pinned is None:
            self.now = datetime.utcnow()
        try:
            if q.is_join():
                return self._compile_join(q)
            if q.has_aggregates():
                return self._compile_aggregate(q)
            return self._compile_select(q)
        finally:
            self.now = pinned

    # -- validation (server.go:1312-1352, 1888-1911, 2285-2299) --------
    def _validate(self, q: Query) -> None:
        if q.order_by and q.order_by != "_ts":
            raise ValidationError("ORDER BY supports only _ts")
        if q.tail is not None and (q.order_by or q.has_aggregates()):
            raise ValidationError("TAIL cannot be combined with ORDER BY/aggregates")
        if q.has_aggregates():
            if q.order_by:
                raise ValidationError("ORDER BY is not supported with aggregates")
            if any(c.kind == ColumnKind.STAR for c in q.select):
                raise ValidationError("SELECT * cannot be combined with aggregates")
            for c in q.select:
                if c.kind == ColumnKind.FIELD and c.column not in q.group_by:
                    raise ValidationError(
                        f"column {c.column!r} must appear in GROUP BY"
                    )
                if c.kind in (
                    ColumnKind.JSON_VALUE,
                    ColumnKind.JSON_QUERY,
                    ColumnKind.JSON_EXISTS,
                ):
                    raise ValidationError(
                        "JSON helpers are not supported as plain columns with aggregates"
                    )
        if q.group_by and not q.has_aggregates():
            raise ValidationError("GROUP BY requires aggregate functions")
        if q.is_join():
            if q.within_seconds is None or q.last_seconds is None:
                raise ValidationError("joins require WITHIN and LAST")
            if q.tail is not None or q.scan_full:
                raise ValidationError("joins do not support TAIL/SCAN FULL")
            if q.partition is not None or q.offset_min is not None or q.offset_max is not None:
                raise ValidationError("joins do not support partition/offset filters")
            if q.key_eq is not None or q.key_in is not None:
                raise ValidationError("joins do not support _key filters")
            # per-side FOR SYSTEM_TIME/SYSTEM_VERSION is allowed: each
            # side routes through _topic_frame, which still rejects
            # loudly on catalogs without snapshot history
            if q.has_aggregates():
                raise ValidationError("joins do not support aggregates")
        if (
            q.key_in is not None
            and len(q.key_in) > MAX_KEY_IN
            and not q.has_time_bound()
        ):
            # the cap bites only TIME-UNBOUNDED lists (r14 ADVICE —
            # parse-time enforcement broke valid LAST-bounded batch
            # fetches): on the admitted unbounded path >100 random keys
            # cover essentially every bucket of a bucket[16..64] spec,
            # so the bucket-union prunes nothing and the isin plan
            # bloats; a bounded list's files are already time-pruned
            raise ValidationError(
                f"_key IN lists {len(q.key_in)} keys (max {MAX_KEY_IN} "
                "without a time bound); add LAST/_ts bounds, or JOIN "
                "against a topic holding the keys instead"
            )
        if (
            self.opt.require_time_bound
            and not q.scan_full
            and q.tail is None
            and not q.has_time_bound()
            and not self._admits_key_lookup(q)
        ):
            raise ValidationError(
                "unbounded query: add LAST/TAIL/_ts bounds or SCAN FULL"
            )

    def _admits_key_lookup(self, q: Query) -> bool:
        """A ``_key =`` / ``_key IN`` query whose catalog PLANS the
        lookup from bucket metadata (1/N of the files from manifests
        alone) may run without a time bound: its cost is MEASURED —
        ``estimate_topic_scan`` prices the planned file set and the
        engine's ScanBudget enforces the cap before execution — so the
        blanket clause-shape guard (r13) would force SCAN FULL's
        ``max_unbounded_scan`` row cap onto the reference's S7
        point-fetch shape (log.go:468 binary-search-by-offset is its
        offset analogue) for no reason. Non-bucketed topics and
        catalogs without metadata planning keep the loud rejection:
        there a bare key filter IS a full scan."""
        if (q.key_eq is None and q.key_in is None) or q.is_join():
            return False
        plans = getattr(self.catalog, "plans_key_lookup", None)
        if plans is None:
            return False
        try:
            return bool(plans(q.topic))
        except FileNotFoundError:
            return False  # unknown topic: scan() raises its own error

    # -- effective limit (server.go:1321-1346) --------------------------
    def effective_limit(self, q: Query) -> int:
        limit = q.limit if q.limit is not None else self.opt.default_limit
        limit = min(limit, self.opt.max_rows)
        if q.scan_full and not q.has_time_bound() and q.tail is None:
            limit = min(limit, self.opt.max_unbounded_scan)
        return limit

    def _now(self) -> datetime:
        return self.now if self.now is not None else datetime.utcnow()

    # -- scan + row filters (P4-P7) -------------------------------------
    def scan(self, topic: str, q: Query, apply_time: bool = True) -> DataFrame:
        ts_min, ts_max = self.time_bounds(q) if apply_time else (None, None)
        # key_eq and key_in share the catalog's bucket-planning hook: a
        # single key rides as a scalar, an IN list as a tuple (the
        # catalog plans the union of the keys' buckets)
        key_sel = q.key_eq if q.key_eq is not None else q.key_in
        df = self._topic_frame(
            topic, q.partition, ts_min, ts_max, q.offset_min, q.offset_max,
            key_eq=key_sel, as_of=q.as_of, version_of=q.version_of,
            version_ref=q.version_ref,
        )
        if q.partition is not None:
            df = df.filter(F.col("_partition") == q.partition)
        if q.offset_min is not None:
            df = df.filter(F.col("_offset") >= q.offset_min)
        if q.offset_max is not None:
            df = df.filter(F.col("_offset") <= q.offset_max)
        if q.key_eq is not None:
            # exact row filter on top of any bucket prune: the record
            # key is binary; a text literal compares against its UTF-8
            # decode (same convention the join ON `_key` path uses)
            df = df.filter(F.col("_key").cast("string") == q.key_eq)
        if q.key_in is not None:
            df = df.filter(F.col("_key").cast("string").isin(*q.key_in))
        if apply_time:
            df = self._apply_time_bounds(df, q)
        return df

    def _topic_frame(
        self,
        topic: str,
        partition=None,
        ts_min=None,
        ts_max=None,
        offset_min=None,
        offset_max=None,
        key_eq=None,
        as_of=None,
        version_of=None,
        version_ref=None,
    ) -> DataFrame:
        """Catalogs with their own metadata layer (Iceberg) expose
        ``topic_scan``: a read whose planned FILE LIST already honors the
        partition/time/offset bounds (a superset of the matching rows —
        files without stats survive), so a LAST-window query over a
        years-deep table never plans the other years' files and a
        `WHERE _offset >=` fetch never plans below the watermark. The
        exact row filters in scan()/_apply_time_bounds still apply on
        top; catalogs without the hook return the full topic frame and
        rely on Spark-side pruning.

        ``key_eq`` rides along when the catalog understands it (bucket
        point-lookup planning — a catalog without the capability just
        gets the exact row filter). ``as_of`` is different: time travel
        NEEDS snapshot history, so a catalog that cannot honor it must
        reject the query loudly rather than silently serve the current
        state as if it were historical."""
        fn = getattr(self.catalog, "topic_scan", None)
        supported = scan_capabilities(self.catalog, fn)
        if as_of is not None and "as_of" not in supported:
            raise ValidationError(
                "FOR SYSTEM_TIME AS OF requires an Iceberg-backed topic "
                "(snapshot history); this catalog serves only the "
                "current state"
            )
        if (
            version_of is not None and "snapshot_id" not in supported
        ) or (version_ref is not None and "ref" not in supported):
            raise ValidationError(
                "FOR SYSTEM_VERSION AS OF requires an Iceberg-backed "
                "topic (snapshot history); this catalog serves only the "
                "current state"
            )
        if fn is not None:
            kwargs = dict(
                partition=partition,
                ts_min=ts_min,
                ts_max=ts_max,
                offset_min=offset_min,
                offset_max=offset_max,
            )
            if key_eq is not None and "key_eq" in supported:
                kwargs["key_eq"] = key_eq
            if as_of is not None:
                kwargs["as_of"] = as_of
            if version_of is not None:
                kwargs["snapshot_id"] = version_of
            if version_ref is not None:
                kwargs["ref"] = version_ref
            return fn(topic, **kwargs)
        return self.catalog.topic(topic)

    def _apply_time_bounds(self, df: DataFrame, q: Query) -> DataFrame:
        ts_min, ts_max = self.time_bounds(q)
        if ts_min is not None:
            df = df.filter(F.col("_ts") >= F.lit(ts_min))
        if ts_max is not None:
            df = df.filter(F.col("_ts") <= F.lit(ts_max))
        return df

    def time_bounds(self, q: Query) -> tuple[datetime | None, datetime | None]:
        ts_min, ts_max = q.ts_min, q.ts_max
        if q.last_seconds is not None:
            now = self._now()
            lo = now - timedelta(seconds=q.last_seconds)
            ts_min = max(ts_min, lo) if ts_min else lo
            ts_max = min(ts_max, now) if ts_max else now
        return ts_min, ts_max

    # -- plain SELECT pipeline (server.go:1400-1484) --------------------
    def _compile_select(self, q: Query) -> DataFrame:
        df = self.scan(q.topic, q)
        if q.tail is not None:
            # last n in scan order = top-n by (partition, offset) descending
            # (ring buffer server.go:1600-1610); re-emitted in scan order.
            df = df.orderBy(F.desc("_partition"), F.desc("_offset")).limit(q.tail)
            df = df.orderBy("_partition", "_offset")
        elif q.order_by:
            df = df.orderBy(
                F.desc("_ts") if q.order_desc else F.asc("_ts"),
            )
        if q.tail is None:
            df = df.limit(self.effective_limit(q))
        return df.select(*self._projection(q, df))

    # -- projection (P1-P3, F1-F5) --------------------------------------
    def _projection(self, q: Query, df: DataFrame) -> list[Column]:
        cols: list[Column] = []
        for item in q.select:
            if item.kind == ColumnKind.STAR:
                cols.extend(self._star_columns(q))
            else:
                cols.append(self._item_column(q, item))
        return cols

    def _star_columns(self, q: Query) -> list[Column]:
        out = [self._implicit_column(name).alias(name) for name in IMPLICIT_COLUMNS]
        cfg = self.catalog.configs.get(q.topic)
        if cfg:
            out.extend(F.col(c.name) for c in cfg.columns)
        return out

    def _implicit_column(self, name: str, qualifier: str = "") -> Column:
        col = F.col(f"{qualifier}{name}" if qualifier else name)
        if not self.opt.render_text:
            return col
        if name == "_ts":
            return render.ts_text(col)
        if name in ("_key", "_value"):
            return render.bytea_text(col)
        return col

    def _item_column(self, q: Query, item: SelectColumn) -> Column:
        name = item.output_name()
        if item.kind == ColumnKind.FIELD:
            base = (
                self._implicit_column(item.column)
                if item.column in IMPLICIT_COLUMNS
                else F.col(item.column)
            )
            return base.alias(name)
        if item.kind in (ColumnKind.JSON_VALUE, ColumnKind.JSON_QUERY):
            return self._json_extract(item.column, item.json_path).alias(name)
        if item.kind == ColumnKind.JSON_EXISTS:
            return self._json_exists(item.column, item.json_path).alias(name)
        raise ValidationError(f"cannot project {item.raw!r}")

    def _json_extract(self, column: str, path: str, qualifier: str = "") -> Column:
        src = F.col(f"{qualifier}{column}" if qualifier else column).cast("string")
        return F.get_json_object(src, path)

    def _json_exists(self, column: str, path: str) -> Column:
        """Tri-state (server.go:1719-1729): true/false when `_value` is valid
        JSON, NULL when it is not."""
        src = F.col(column).cast("string")
        # `get_json_object(src, '$')` is NULL iff src is not valid JSON
        valid = F.get_json_object(src, "$").isNotNull()
        return F.when(~valid, F.lit(None).cast("boolean")).otherwise(
            F.get_json_object(src, path).isNotNull()
        )

    # -- aggregates (server.go:1762-2010) -------------------------------
    def _agg_arg(self, q: Query, item: SelectColumn) -> Column:
        if item.agg_json_path:
            return self._json_extract(item.agg_column, item.agg_json_path)
        return F.col(item.agg_column)

    def _agg_column(self, q: Query, item: SelectColumn) -> Column:
        fn = item.agg_func
        name = item.output_name()
        if fn == "count":
            if item.agg_star:
                return F.count(F.lit(1)).alias(name)
            return F.count(self._agg_arg(q, item)).alias(name)
        arg = self._agg_arg(q, item)
        if fn in ("sum", "avg"):
            # numeric coercion: strings parse, junk → NULL → skipped
            dec = arg.cast("decimal(38,9)")
            if fn == "sum":
                return F.sum(dec).cast("double").alias(name)
            # avg = exact decimal sum cast to double, / count — bit-exact
            # on any engine (IEEE division of deterministic operands)
            return (
                F.sum(dec).cast("double") / F.count(dec)
            ).alias(name)
        if fn in ("min", "max"):
            kind = self._minmax_kind(q, item)
            if item.agg_json_path and self.opt.first_kind_wins:
                kind = self._peek_kind(q, item)
            typed = arg.cast(kind) if kind else arg
            if kind == "string" and item.agg_json_path and self.opt.first_kind_wins:
                # string kind: number-valued extractions are a kind
                # mismatch and are ignored (server.go:2132-2182)
                typed = F.when(arg.cast("double").isNull(), arg)
            col = F.min(typed) if fn == "min" else F.max(typed)
            if self.opt.render_text and kind == "timestamp":
                col = render.ts_text(col)
            return col.alias(name)
        raise ValidationError(f"unknown aggregate {fn!r}")

    def _peek_kind(self, q: Query, item: SelectColumn) -> str:
        """First-seen-kind emulation: look at the first non-null extraction
        in scan order ((partition, offset)); number-parseable → double kind,
        else string."""
        arg = self._json_extract(item.agg_column, item.agg_json_path)
        rows = (
            self.scan(q.topic, q)
            .filter(arg.isNotNull())
            .orderBy("_partition", "_offset")
            .select(arg.alias("v"))
            .limit(1)
            .collect()
        )
        if not rows:
            return "string"
        try:
            float(rows[0]["v"])
            return "double"
        except (TypeError, ValueError):
            return "string"

    def _minmax_kind(self, q: Query, item: SelectColumn) -> str | None:
        """MIN/MAX value kind. The reference decides per-group from the
        first value seen in scan order (server.go:2132-2182) — inherently
        order-dependent. We resolve the kind *statically*: `_ts` →
        timestamp, declared numeric schema columns and JSON numeric paths →
        double, everything else → string (documented deviation; identical
        on homogeneous data, deterministic on mixed data)."""
        if item.agg_column == "_ts":
            return "timestamp"
        if item.agg_column in ("_offset", "_partition"):
            return None  # already numeric
        cfg = self.catalog.configs.get(q.topic)
        if cfg and not item.agg_json_path:
            for c in cfg.columns:
                if c.name == item.agg_column:
                    return (
                        "double"
                        if c.type in ("int", "long", "double")
                        else ("timestamp" if c.type == "timestamp" else "string")
                    )
        if item.agg_json_path:
            return "string"
        return "string"

    def group_key_string(self, group_cols: list[Column]) -> Column:
        """The reference's group key: values cast to string, NULL → `<nil>`,
        joined with 0x1f (server.go:1968-1981)."""
        parts = [
            F.coalesce(c.cast("string"), F.lit(GROUP_KEY_NULL)) for c in group_cols
        ]
        return F.concat_ws(GROUP_KEY_SEP, *parts)

    def _compile_aggregate(self, q: Query) -> DataFrame:
        df = self.scan(q.topic, q)
        aggs = [
            self._agg_column(q, c)
            for c in q.select
            if c.kind == ColumnKind.AGGREGATE
        ]
        if not q.group_by:
            out = df.agg(*aggs)
            return out.select(*[c.output_name() for c in q.select])
        group_cols = [F.col(g) for g in q.group_by]
        out = df.groupBy(*group_cols).agg(*aggs)
        # deterministic emit order: group-key string ascending (A8)
        out = out.orderBy(self.group_key_string([F.col(g) for g in q.group_by]))
        out = out.limit(self.effective_limit(q))
        # project in select-list order, rendering group cols as needed
        final: list[Column] = []
        for item in q.select:
            if item.kind == ColumnKind.FIELD:
                base = (
                    self._implicit_column(item.column)
                    if item.column in IMPLICIT_COLUMNS
                    else F.col(item.column)
                )
                final.append(base.alias(item.output_name()))
            else:
                final.append(F.col(item.output_name()))
        return out.select(*final)

    # -- joins (server.go:2281-2464) ------------------------------------
    def _join_key_expr(self, expr: JoinExpr, prefix: str) -> Column:
        if expr.kind == JoinExprKind.KEY:
            return F.col(f"{prefix}_key").cast("string")
        return self._json_extract("_value", expr.json_path, qualifier=prefix)

    def _join_names(self, q: Query) -> tuple[set[str], set[str]]:
        """Accepted qualifiers per side: the alias AND the topic name
        (reference resolveJoinSide accepts both even when an alias is
        declared — parser.go:639-693)."""
        left = {q.topic} | ({q.topic_alias} if q.topic_alias else set())
        right = {q.join_topic} | ({q.join_alias} if q.join_alias else set())
        return left, right

    def _compile_join(self, q: Query) -> DataFrame:
        left_alias = q.topic_alias or q.topic
        right_alias = q.join_alias or q.join_topic

        # Left rows are LAST-window-filtered (server.go:2407-2408). The
        # reference scans the right side unfiltered (server.go:2384); the
        # WITHIN band then implies right._ts ∈ [window ± within] — we push
        # that derived bound so the right scan prunes too (same semantics,
        # bounded scan at any scale).
        left = self.scan(q.topic, q)
        ts_min, ts_max = self.time_bounds(q)
        w = timedelta(seconds=q.within_seconds)
        # the right side's metadata pruning must use the WIDENED bounds
        # (window ± band) — the band condition admits right rows up to
        # `within` outside the left window
        right = self._topic_frame(
            q.join_topic,
            ts_min=ts_min - w if ts_min is not None else None,
            ts_max=ts_max + w if ts_max is not None else None,
            as_of=q.join_as_of,
            version_of=q.join_version_of,
            version_ref=q.join_version_ref,
        )
        if ts_min is not None:
            right = right.filter(F.col("_ts") >= F.lit(ts_min - w))
        if ts_max is not None:
            right = right.filter(F.col("_ts") <= F.lit(ts_max + w))

        lcols = [F.col(c).alias(f"__l_{c}") for c in left.columns]
        rcols = [F.col(c).alias(f"__r_{c}") for c in right.columns]
        left = left.select(*lcols)
        right = right.select(*rcols)

        on = q.join_on
        lk = self._join_side_expr(q, on.left, on.right, "left")
        rk = self._join_side_expr(q, on.left, on.right, "right")
        cond = lk == rk
        # WITHIN band: |l._ts - r._ts| <= d (server.go:2644-2650)
        band = (
            F.abs(
                F.unix_micros(F.col("__l__ts")) - F.unix_micros(F.col("__r__ts"))
            )
            <= int(q.within_seconds * 1_000_000)
        )
        how = "left" if q.join_type == "left" else "inner"
        joined = left.join(right, cond & band, how)
        # LIMIT applies to joins too (reference stops at sent >= limit,
        # limit = user LIMIT or DefaultLimit, server.go handleJoinSelect).
        # Deterministic survivor set for a binding limit: emit order is left
        # scan order then right scan order. Limits up to
        # topKSortFallbackThreshold (10k) compile to a distributed top-k
        # heap (TakeOrderedAndProject), not a global sort. The sort applies
        # whenever the user set a LIMIT explicitly (even one equal to or
        # capped at max_rows — it can still bind and must pick a
        # deterministic survivor set); only the purely-implicit guardrail
        # cap skips it.
        limit = self.effective_limit(q)
        if q.limit is not None or limit < self.opt.max_rows:
            joined = joined.orderBy(
                "__l__partition", "__l__offset", "__r__partition", "__r__offset"
            )
        joined = joined.limit(limit)
        return joined.select(*self._join_projection(q, left_alias, right_alias))

    def _join_side_expr(
        self,
        q: Query,
        left_expr: JoinExpr,
        right_expr: JoinExpr,
        want: str,
    ) -> Column:
        """Resolve which ON side belongs to which topic: by qualifier (alias
        OR topic name both accepted, parser.go:639-693), positionally
        otherwise."""
        left_names, right_names = self._join_names(q)
        for i, e in enumerate((left_expr, right_expr)):
            side = (
                "left"
                if e.side in left_names
                else ("right" if e.side in right_names else ("left", "right")[i])
            )
            if side == want:
                prefix = "__l_" if want == "left" else "__r_"
                return self._join_key_expr(e, prefix)
        raise ValidationError("cannot resolve join expression sides")

    def _join_projection(
        self, q: Query, left_alias: str, right_alias: str
    ) -> list[Column]:
        cols: list[Column] = []
        for item in q.select:
            if item.kind == ColumnKind.STAR:
                # left implicit columns under their own names, right under
                # `_right_*` (server.go:2581-2589)
                for name in IMPLICIT_COLUMNS:
                    cols.append(
                        self._implicit_column(name, "__l_").alias(name)
                    )
                for name in IMPLICIT_COLUMNS:
                    cols.append(
                        self._implicit_column(name, "__r_").alias(f"_right{name}")
                    )
                continue
            cols.append(self._join_item(q, item, left_alias, right_alias))
        return cols

    def _join_item(
        self, q: Query, item: SelectColumn, left_alias: str, right_alias: str
    ) -> Column:
        left_names, right_names = self._join_names(q)

        def prefix_for(source: str, column: str) -> str:
            # alias OR topic name resolve to their side; unknown qualifiers
            # fall back to left (reference joinSideFromSource behavior)
            if source in left_names:
                return "__l_"
            if source in right_names:
                return "__r_"
            if not source and column.startswith("_right_"):
                return "__r_"
            return "__l_"

        name = item.output_name()
        if item.kind == ColumnKind.FIELD:
            col_name = item.column
            prefix = prefix_for(item.source, col_name)
            if col_name.startswith("_right_"):
                col_name = "_" + col_name[len("_right_") :]
            if col_name in IMPLICIT_COLUMNS:
                return self._implicit_column(col_name, prefix).alias(name)
            return F.col(f"{prefix}{col_name}").alias(name)
        if item.kind in (ColumnKind.JSON_VALUE, ColumnKind.JSON_QUERY):
            prefix = prefix_for(item.source, item.column)
            return self._json_extract(
                item.column, item.json_path, qualifier=prefix
            ).alias(name)
        if item.kind == ColumnKind.JSON_EXISTS:
            prefix = prefix_for(item.source, item.column)
            src = F.col(f"{prefix}{item.column}").cast("string")
            valid = F.get_json_object(src, "$").isNotNull()
            return (
                F.when(~valid, F.lit(None).cast("boolean"))
                .otherwise(F.get_json_object(src, item.json_path).isNotNull())
                .alias(name)
            )
        raise ValidationError(f"cannot project {item.raw!r} in join")
