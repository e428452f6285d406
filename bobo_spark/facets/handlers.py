"""Facet handlers — the plugin surface of the browse engine.

Each handler supplies (a) a selection predicate (≙ FacetHandler.
buildFilter, facets/FacetHandler.java:165-197), (b) a count plan
(≙ the FacetCountCollector family), and (c) a sort key (≙
DocComparatorSource from facet data, facets/data/FacetDataCache.java:229-256).
All three are plain Spark expressions/plans — counting compiles to
``groupBy().count()`` or one-pass conditional sums, which Catalyst
executes as partial+final hash aggregation (the distributed version of
the reference's per-segment count arrays + cross-segment merge).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_RANGE_RE = re.compile(r"^([\[\(])(.*?) TO (.*?)([\]\)])$")


@dataclass
class TermFormat:
    """Typed term canonicalization (≙ PredefinedTermListFactory,
    facets/data/PredefinedTermListFactory.java:22): values are stored
    as zero-padded strings whose lexicographic order equals numeric
    order; selection inputs are parsed leniently and re-formatted."""

    kind: str = "string"  # "string" | "int"
    width: int = 0

    def canon(self, value: str) -> str:
        if self.kind == "int":
            return str(int(value)).zfill(self.width)
        return value

    @staticmethod
    def int_format(pattern: str) -> "TermFormat":
        """From a Java DecimalFormat-ish pattern like "0000"."""
        return TermFormat(kind="int", width=len(pattern))


def parse_range(value: str, fmt: TermFormat | None = None):
    """Parse Bobo range syntax "[lo TO hi]" / "(lo TO hi)" / "*" ends.

    ≙ facets/filter/FacetRangeFilter.java:224-250.
    Returns (lo, hi, lo_inclusive, hi_inclusive); None = open end.
    """
    m = _RANGE_RE.match(value)
    if not m:
        return None
    lo_b, lo, hi, hi_b = m.groups()
    fmt = fmt or TermFormat()
    lo_v = None if lo == "*" else fmt.canon(lo)
    hi_v = None if hi == "*" else fmt.canon(hi)
    return lo_v, hi_v, lo_b == "[", hi_b == "]"


def _combine_or(preds: list[Column]) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _combine_and(preds: list[Column]) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


class FacetHandler:
    """Base: selection -> predicate; hits -> (value, count) frame."""

    def __init__(self, name: str):
        self.name = name

    # -- selection layer (≙ FacetHandler.buildFilter) ----------------------
    def value_predicate(self, df: DataFrame, value: str) -> Column:
        raise NotImplementedError

    def predicate(self, df: DataFrame, sel) -> Column:
        preds = [self.value_predicate(df, v) for v in sel.values]
        combine = _combine_and if sel.operation == "and" else _combine_or
        pred = combine(preds) if preds else F.lit(True)
        if sel.not_values:
            nots = _combine_or([self.value_predicate(df, v) for v in sel.not_values])
            pred = pred & ~nots
        return pred

    # -- counting layer (≙ FacetCountCollector) ----------------------------
    def counts(self, hits: DataFrame, spec, corpus: DataFrame, sel) -> DataFrame:
        """Unshaped (value string, count long)."""
        raise NotImplementedError

    # -- sort layer (≙ DocComparatorSource) --------------------------------
    def sort_key(self, df: DataFrame) -> Column:
        return F.col(self.name)


class SimpleFacetHandler(FacetHandler):
    """Single-value facet (≙ facets/impl/SimpleFacetHandler.java:210-226)."""

    def __init__(self, name: str, fmt: TermFormat | None = None, column: str | None = None):
        super().__init__(name)
        self.fmt = fmt or TermFormat()
        self.column = column or name

    def _col(self, df) -> Column:
        return F.col(self.column)

    def value_predicate(self, df, value) -> Column:
        try:
            canon = self.fmt.canon(value)
        except ValueError:
            return F.lit(False)  # unknown/unparseable ≙ EmptyFilter
        return self._col(df) == canon

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        c = hits.groupBy(self._col(hits).alias("value")).agg(F.count("*").alias("count"))
        if spec.min_hits <= 0:
            universe = corpus.select(self._col(corpus).alias("value")).distinct()
            c = universe.join(c, "value", "left").select(
                "value", F.coalesce("count", F.lit(0)).alias("count")
            )
        return c

    def sort_key(self, df) -> Column:
        return self._col(df)


class VirtualSimpleFacetHandler(SimpleFacetHandler):
    """Facet over a derived expression (≙ facets/impl/
    VirtualSimpleFacetHandler.java:23,38-110 — FacetDataFetcher as a
    Spark column expression)."""

    def __init__(self, name: str, expr_fn, fmt: TermFormat | None = None):
        super().__init__(name, fmt)
        self.expr_fn = expr_fn

    def _col(self, df) -> Column:
        return self.expr_fn(df)


class RangeFacetHandler(FacetHandler):
    """Range facet with optional predefined ranges (≙ facets/filter/
    FacetRangeFilter.java:169-293 + facets/impl/RangeFacetCountCollector.java).

    Comparison happens on the formatted-string domain — identical to
    Lucene's lexicographic term order in the reference."""

    def __init__(self, name: str, ranges: list[str] | None = None,
                 fmt: TermFormat | None = None, column: str | None = None,
                 numeric: bool = False):
        super().__init__(name)
        self.ranges = ranges or []
        self.fmt = fmt or TermFormat()
        self.column = column or name
        self.numeric = numeric  # compare as longs (for numeric columns)

    def _col(self, df) -> Column:
        c = F.col(self.column)
        return c.cast("long") if self.numeric else c

    def _canon(self, value: str):
        return int(value) if self.numeric else self.fmt.canon(value)

    def _range_pred(self, df, parsed) -> Column:
        lo, hi, lo_inc, hi_inc = parsed
        if self.numeric:
            lo = int(lo) if lo is not None else None
            hi = int(hi) if hi is not None else None
        col = self._col(df)
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (col >= lo if lo_inc else col > lo)
        if hi is not None:
            pred = pred & (col <= hi if hi_inc else col < hi)
        return pred

    def value_predicate(self, df, value) -> Column:
        parsed = parse_range(value, self.fmt)
        if parsed is None:  # plain equality on a single value
            try:
                return self._col(df) == self._canon(value)
            except ValueError:
                return F.lit(False)
        return self._range_pred(df, parsed)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        if not self.ranges:  # no predefined ranges: count raw values
            return hits.groupBy(self._col(hits).alias("value")).agg(
                F.count("*").alias("count")
            )
        aggs = [
            F.sum(F.when(self._range_pred(hits, parse_range(r, self.fmt)), 1).otherwise(0))
            .cast("long").alias(f"r{i}")
            for i, r in enumerate(self.ranges)
        ]
        row = hits.agg(*aggs)
        pairs = ", ".join(f"'{r}', r{i}" for i, r in enumerate(self.ranges))
        return row.selectExpr(f"stack({len(self.ranges)}, {pairs}) as (value, count)")

    def sort_key(self, df) -> Column:
        return self._col(df)


class FilteredRangeFacetHandler(RangeFacetHandler):
    """Range handler restricted to a fixed sub-range (≙ facets/impl/
    FilteredRangeFacetHandler.java:20,29-48): every predicate and
    count is pre-ANDed with the filter range."""

    def __init__(self, name: str, filter_range: str, ranges: list[str] | None = None,
                 fmt: TermFormat | None = None, column: str | None = None,
                 numeric: bool = False):
        super().__init__(name, ranges, fmt, column, numeric)
        self.filter_range = filter_range

    def _filter_pred(self, df) -> Column:
        return self._range_pred(df, parse_range(self.filter_range, self.fmt))

    def value_predicate(self, df, value) -> Column:
        return super().value_predicate(df, value) & self._filter_pred(df)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        return super().counts(hits.where(self._filter_pred(hits)), spec, corpus, sel)


class MultiRangeFacetHandler(RangeFacetHandler):
    """Range facet over a multi-valued column (≙ facets/range/
    MultiRangeFacetHandler.java:29 + FacetRangeFilter.java:95-140):
    a doc matches a range iff ANY element falls inside; counting sums
    per-range element-set membership (doc counted once per range)."""

    def _elem_range_pred(self, x: Column, parsed) -> Column:
        lo, hi, lo_inc, hi_inc = parsed
        if self.numeric:
            lo = int(lo) if lo is not None else None
            hi = int(hi) if hi is not None else None
            x = x.cast("long")
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (x >= lo if lo_inc else x > lo)
        if hi is not None:
            pred = pred & (x <= hi if hi_inc else x < hi)
        return pred

    def value_predicate(self, df, value) -> Column:
        parsed = parse_range(value, self.fmt)
        c = F.col(self.column)
        if parsed is None:
            try:
                return F.array_contains(
                    c.cast("array<long>") if self.numeric else c, self._canon(value))
            except ValueError:
                return F.lit(False)
        return F.exists(c, lambda x: self._elem_range_pred(x, parsed))

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        aggs = [
            F.sum(F.when(self.value_predicate(hits, r), 1).otherwise(0))
            .cast("long").alias(f"r{i}")
            for i, r in enumerate(self.ranges)
        ]
        row = hits.agg(*aggs)
        pairs = ", ".join(f"'{r}', r{i}" for i, r in enumerate(self.ranges))
        return row.selectExpr(f"stack({len(self.ranges)}, {pairs}) as (value, count)")


class PathFacetHandler(FacetHandler):
    """Hierarchical path facet (≙ facets/impl/PathFacetHandler.java:27,137-199).

    Selection: docs under the given path prefix. Counting: roll up to
    ``len(selection path) + depth`` levels via ``substring_index``
    (≙ PathFacetCountCollector.java:28)."""

    def __init__(self, name: str, separator: str = "/", multi: bool = False,
                 column: str | None = None):
        super().__init__(name)
        self.sep = separator
        self.multi = multi
        self.column = column or name

    def _levels(self, path: str) -> int:
        return len([p for p in path.split(self.sep) if p])

    def _nlevels(self, c: Column) -> Column:
        return F.size(F.filter(F.split(c, re.escape(self.sep)), lambda x: x != ""))

    def _prefix_pred_scalar(self, c: Column, value: str, strict: bool = False) -> Column:
        under = (c == value) | c.startswith(value.rstrip(self.sep) + self.sep)
        if strict:
            # strict: only docs strictly deeper than the selected node
            # (facets/impl/PathFacetHandler.java getSelectionProperty strict)
            under = under & (self._nlevels(c) > self._levels(value))
        return under

    def value_predicate(self, df, value) -> Column:
        c = F.col(self.column)
        if self.multi:
            return F.exists(c, lambda x: self._prefix_pred_scalar(x, value))
        return self._prefix_pred_scalar(c, value)

    def predicate(self, df, sel) -> Column:
        c = F.col(self.column)
        def mk(v, strict):
            return lambda x: self._prefix_pred_scalar(x, v, strict)

        preds = []
        for v in sel.values:
            if self.multi:
                preds.append(F.exists(c, mk(v, sel.strict)))
            else:
                preds.append(self._prefix_pred_scalar(c, v, sel.strict))
        combine = _combine_and if sel.operation == "and" else _combine_or
        pred = combine(preds) if preds else F.lit(True)
        if sel.not_values:
            nots = _combine_or([self.value_predicate(df, v) for v in sel.not_values])
            pred = pred & ~nots
        return pred

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        depth = sel.depth if sel is not None else 0
        base_levels = self._levels(sel.values[0]) if (sel and sel.values) else 0
        target = max(1, base_levels + depth)
        c = F.col(self.column)
        if self.multi:
            ex = hits.select(F.explode(F.array_distinct(c)).alias("_p"))
            if sel and sel.values:
                ex = ex.where(_combine_or([self._prefix_pred_scalar(F.col("_p"), v)
                                           for v in sel.values]))
            src = ex.select(F.col("_p").alias("_path"))
        else:
            src = hits.select(c.alias("_path"))
        # paths with a LEADING separator ("/a/b/c") have an empty first
        # split part — keep one extra part so the prefix is "/a", not ""
        p = F.col("_path")
        prefix = F.when(
            p.startswith(self.sep),
            F.substring_index(p, self.sep, target + 1),
        ).otherwise(F.substring_index(p, self.sep, target))
        rolled = src.select(prefix.alias("value"))
        if sel is not None and sel.strict:
            # strict: drop hits shallower than the rollup level, so only
            # target-level nodes appear (≙ PathFacetCountCollector's
            # strict merge, which never emits shallower-than-wantedDepth
            # nodes). Depth = NON-EMPTY parts (_nlevels) — the reference
            # splitString strips empty parts, so '/a/b', 'a/b' and
            # 'a/b/' all have depth 2 (PathFacetCountCollector.java:126-173).
            rolled = src.where(self._nlevels(p) >= target).select(prefix.alias("value"))
        return rolled.groupBy("value").agg(F.count("*").alias("count"))


class MultiValueFacetHandler(FacetHandler):
    """Array-valued facet (≙ facets/impl/MultiValueFacetHandler.java:263-275).

    A doc counts once per *distinct* value it holds (Lucene postings
    list a doc once per term — duplicates collapse at index time)."""

    def __init__(self, name: str, fmt: TermFormat | None = None, column: str | None = None):
        super().__init__(name)
        self.fmt = fmt or TermFormat()
        self.column = column or name

    def _col(self, df) -> Column:
        return F.col(self.column)

    def value_predicate(self, df, value) -> Column:
        try:
            canon = self.fmt.canon(value)
        except ValueError:
            return F.lit(False)
        return F.array_contains(self._col(df), canon)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        return (
            hits.select(F.explode(F.array_distinct(self._col(hits))).alias("value"))
            .groupBy("value")
            .agg(F.count("*").alias("count"))
        )

    def sort_key(self, df) -> Column:
        # element-wise ordinal-array compare ≙ BigNestedIntArray.compare
        return F.array_sort(self._col(df))


class CompactMultiValueFacetHandler(MultiValueFacetHandler):
    """≤32-distinct-value multi facet (≙ facets/impl/
    CompactMultiValueFacetHandler.java:48,217-239). Counting semantics
    equal MultiValue; the sort key is the packed ordinal bitmask, which
    requires the global value dictionary."""

    def __init__(self, name: str, fmt: TermFormat | None = None, column: str | None = None):
        super().__init__(name, fmt, column)
        self._dict: list[str] | None = None

    def bind_dictionary(self, corpus: DataFrame) -> None:
        vals = [
            r[0]
            for r in corpus.select(F.explode(F.array_distinct(self._col(corpus))))
            .distinct()
            .collect()
        ]
        self._dict = sorted(vals)
        if len(self._dict) > 32:
            raise ValueError(f"compact facet {self.name}: >32 distinct values")

    def sort_key(self, df) -> Column:
        if self._dict is None:
            raise RuntimeError("bind_dictionary(corpus) first")
        mask = F.lit(0)
        for i, v in enumerate(self._dict):
            mask = mask + F.when(F.array_contains(self._col(df), v), F.lit(1 << i)).otherwise(0)
        return mask


class MultiValueWithWeightFacetHandler(MultiValueFacetHandler):
    """Weighted multi-value (≙ facets/data/MultiValueWithWeightFacetDataCache
    .java:19-26): column is array<struct<value string, weight int>>."""

    def value_predicate(self, df, value) -> Column:
        return F.exists(self._col(df), lambda x: x["value"] == value)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        return (
            hits.select(
                F.explode(
                    F.array_distinct(F.transform(self._col(hits), lambda x: x["value"]))
                ).alias("value")
            )
            .groupBy("value")
            .agg(F.count("*").alias("count"))
        )

    def sort_key(self, df) -> Column:
        return F.array_sort(F.transform(self._col(df), lambda x: x["value"]))


class BucketFacetHandler(FacetHandler):
    """Named buckets over a depended facet (≙ facets/impl/
    BucketFacetHandler.java:26,31-50 + BucketFacetCountCollector.java:19-30).

    bucket count = Σ member-value counts of the depended facet (a doc
    contributes once per distinct member value — non-disjoint buckets
    allowed)."""

    def __init__(self, name: str, buckets: dict, depends: FacetHandler):
        super().__init__(name)
        self.buckets = {k: list(v) for k, v in buckets.items()}
        self.depends = depends

    def value_predicate(self, df, value) -> Column:
        members = self.buckets.get(value)
        if not members:
            return F.lit(False)
        return _combine_or([self.depends.value_predicate(df, m) for m in members])

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        dep_counts = self.depends.counts(hits, spec, corpus, None)
        spark = hits.sparkSession
        fmt = getattr(self.depends, "fmt", TermFormat())
        rows = [(b, fmt.canon(m)) for b, ms in self.buckets.items() for m in ms]
        mapping = spark.createDataFrame(rows, "bucket string, value string")
        joined = F.broadcast(mapping).join(dep_counts, "value", "left")
        c = joined.groupBy(F.col("bucket").alias("value")).agg(
            F.sum(F.coalesce("count", F.lit(0))).alias("count")
        )
        if spec is None or spec.min_hits > 0:
            c = c.where(F.col("count") > 0)
        return c


class ComboFacetHandler(FacetHandler):
    """Cross-field combo selection "field:value" (≙ facets/impl/
    ComboFacetHandler.java:25,44-78). Selection-only (the reference
    supports no combo counting either)."""

    def __init__(self, name: str, depends: dict):
        super().__init__(name)
        self.depends = depends  # field -> FacetHandler

    def _route(self, df, value) -> Column:
        fld, _, v = value.partition(":")
        handler = self.depends.get(fld)
        if handler is None:
            return F.lit(False)
        return handler.value_predicate(df, v)

    def value_predicate(self, df, value) -> Column:
        return self._route(df, value)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        raise NotImplementedError("combo facets are selection-only (as in the reference)")


class SimpleGroupbyFacetHandler(FacetHandler):
    """Composite group-by facet (≙ facets/impl/
    SimpleGroupbyFacetHandler.java:37,196-233): value = "v1,v2,v3",
    selection may name a prefix of the composite."""

    def __init__(self, name: str, fields: list[str], sep: str = ","):
        super().__init__(name)
        self.fields = fields
        self.sep = sep

    def value_predicate(self, df, value) -> Column:
        parts = value.split(self.sep)
        preds = [F.col(f) == p for f, p in zip(self.fields, parts)]
        return _combine_and(preds)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        return hits.groupBy(
            F.concat_ws(self.sep, *[F.col(f) for f in self.fields]).alias("value")
        ).agg(F.count("*").alias("count"))

    def sort_key(self, df) -> Column:
        return F.concat_ws(self.sep, *[F.col(f) for f in self.fields])


class HistogramFacetHandler(FacetHandler):
    """Runtime histogram over a numeric facet (≙ facets/impl/
    HistogramFacetHandler.java:32-45,105-141): bin = (v-start)/unit,
    label = 10-digit zero-padded bin index; values outside
    [start, end] are excluded."""

    def __init__(self, name: str, source_column: str, start: int, end: int, unit: int):
        super().__init__(name)
        self.source = source_column
        self.start, self.end, self.unit = start, end, unit

    def value_predicate(self, df, value) -> Column:
        v = F.col(self.source).cast("long")
        bin_expr = F.floor((v - self.start) / self.unit)
        return bin_expr == int(value)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        v = F.col(self.source).cast("long")
        binned = hits.where((v >= self.start) & (v <= self.end)).select(
            F.lpad(F.floor((v - self.start) / self.unit).cast("string"), 10, "0").alias("value")
        )
        return binned.groupBy("value").agg(F.count("*").alias("count"))


class AttributesFacetHandler(MultiValueFacetHandler):
    """key=value attribute facet over a multi-value field (≙ facets/
    attribute/AttributesFacetHandler.java:20,53-82 +
    AttributesFacetCountCollector.java:18).

    Selection values may be bare keys ("prop3" — any value of that
    key) or full pairs ("prop3=val1"). When a selection exists, counts
    are restricted to the selected keys; ``max_facets_per_key`` keeps
    the top-N values per key (count desc, value asc)."""

    def __init__(self, name: str, column: str | None = None, separator: str = "=",
                 max_facets_per_key: int = 0):
        super().__init__(name, None, column)
        self.sep = separator
        self.max_facets_per_key = max_facets_per_key

    def value_predicate(self, df, value) -> Column:
        c = self._col(df)
        if self.sep in value:
            return F.array_contains(c, value)
        prefix = value + self.sep

        return F.exists(c, lambda x: x.startswith(prefix))

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        ex = hits.select(F.explode(F.array_distinct(self._col(hits))).alias("value"))
        keys = []
        if sel is not None:
            keys = sorted({v.split(self.sep)[0] for v in sel.values})
        if keys:
            ex = ex.where(
                _combine_or([F.col("value").startswith(k + self.sep) for k in keys])
            )
        c = ex.groupBy("value").agg(F.count("*").alias("count"))
        cap = self.max_facets_per_key
        if sel is not None and getattr(sel, "max_facets_per_key", None):
            cap = sel.max_facets_per_key
        if cap and cap > 0:
            from pyspark.sql.window import Window

            w = Window.partitionBy(
                F.split(F.col("value"), re.escape(self.sep))[0]
            ).orderBy(F.desc("count"), F.asc("value"))
            c = (
                c.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= cap)
                .drop("_rn")
            )
        return c


class DynamicTimeRangeFacetHandler(RangeFacetHandler):
    """Runtime "time ago" buckets over a millis facet (≙ facets/impl/
    DynamicTimeRangeFacetHandler.java:16,22-100 + DynamicRangeFacetHandler).

    Named ranges use the reference's dddhhmmss ago-format; each named
    range R (with predecessor P in sorted order) covers the absolute
    interval [now-R+1, now-P] on the underlying zero-padded-millis
    column. Facet labels are the NAMED ranges."""

    MILLIS = {"day": 86_400_000, "hour": 3_600_000, "min": 60_000, "sec": 1000}
    WIDTH = 20  # NUMBER_FORMAT "00000000000000000000"

    def __init__(self, name: str, data_column: str, now_millis: int, ranges: list[str]):
        super().__init__(name, ranges=None, fmt=TermFormat.int_format("0" * self.WIDTH),
                         column=data_column)
        self.now = now_millis
        self.named = sorted(ranges)
        self.range_string = {}
        prev = "000000000"
        for r in self.named:
            end = self.fmt.canon(str(self._ago(prev)))
            start = self.fmt.canon(str(self._ago(r) + 1))
            self.range_string[r] = f"[{start} TO {end}]"
            prev = r
        self.ranges = [self.range_string[r] for r in self.named]

    def _ago(self, rng: str) -> int:
        if len(rng) != 9:
            raise ValueError(f"invalid range format: {rng}")
        d, h, m, s = int(rng[0:3]), int(rng[3:5]), int(rng[5:7]), int(rng[7:9])
        return (self.now - d * self.MILLIS["day"] - h * self.MILLIS["hour"]
                - m * self.MILLIS["min"] - s * self.MILLIS["sec"])

    def value_predicate(self, df, value) -> Column:
        rs = self.range_string.get(value)
        if rs is None:
            return F.lit(False)
        return super().value_predicate(df, rs)

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        c = super().counts(hits, spec, corpus, sel)
        spark = hits.sparkSession
        mapping = spark.createDataFrame(
            [(self.range_string[r], r) for r in self.named], "value string, named string"
        )
        return (
            c.join(F.broadcast(mapping), "value")
            .select(F.col("named").alias("value"), "count")
        )


class GeoSimpleFacetHandler(FacetHandler):
    """Bounding-box geo facet (≙ facets/impl/GeoSimpleFacetHandler.java:31,39-80):
    value "lat,lon:rad" -> lat/lon range predicates. Numeric compare
    (the reference compares Lucene term strings lexicographically —
    identical on its fixture; numeric is strictly saner)."""

    def __init__(self, name: str, lat_column: str, lon_column: str):
        super().__init__(name)
        self.lat, self.lon = lat_column, lon_column

    @staticmethod
    def parse_value(value: str):
        latlon, _, rad = value.partition(":")
        lat, _, lon = latlon.partition(",")
        return float(lat), float(lon), float(rad)

    def value_predicate(self, df, value) -> Column:
        lat, lon, rad = self.parse_value(value)
        latc = F.col(self.lat).cast("double")
        lonc = F.col(self.lon).cast("double")
        return (
            (latc >= lat - rad) & (latc <= lat + rad)
            & (lonc >= lon - rad) & (lonc <= lon + rad)
        )

    def counts(self, hits, spec, corpus, sel) -> DataFrame:
        # predefined circles = the selection's values (≙ GeoSimpleFacetCountCollector)
        values = sel.values if sel is not None else []
        if not values:
            return hits.sparkSession.createDataFrame([], "value string, count long")
        aggs = [
            F.sum(F.when(self.value_predicate(hits, v), 1).otherwise(0)).cast("long").alias(f"g{i}")
            for i, v in enumerate(values)
        ]
        row = hits.agg(*aggs)
        pairs = ", ".join(f"'{v}', g{i}" for i, v in enumerate(values))
        return row.selectExpr(f"stack({len(values)}, {pairs}) as (value, count)")


class GeoFacetHandler(GeoSimpleFacetHandler):
    """Exact unit-sphere distance facet (≙ facets/impl/GeoFacetHandler.java:28
    + util/GeoMatchUtil.java:3-113): haversine distance in miles."""

    EARTH_RADIUS_MILES = 3956.547

    def value_predicate(self, df, value) -> Column:
        lat, lon, rad = self.parse_value(value)
        lat1 = F.radians(F.col(self.lat).cast("double"))
        lon1 = F.radians(F.col(self.lon).cast("double"))
        lat2 = math.radians(lat)
        lon2 = math.radians(lon)
        a = (
            F.pow(F.sin((lat1 - F.lit(lat2)) / 2), 2)
            + F.cos(lat1) * F.lit(math.cos(lat2)) * F.pow(F.sin((lon1 - F.lit(lon2)) / 2), 2)
        )
        dist = F.lit(2 * self.EARTH_RADIUS_MILES) * F.asin(F.sqrt(a))
        return dist <= rad
