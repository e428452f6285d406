"""The browse engine — MultiBoboBrowser.browse as a DataFrame plan.

Execution (≙ SURVEY.md §3.1, api/MultiBoboBrowser.java:77-216):

1. selections compile to predicates (pre-filters,
   api/BoboSubBrowser.java:209-255)
2. the hit set is one ``where`` over the base frame — Catalyst pushes
   it into the scan
3. each facet runs one aggregation; with ``expand_selection`` the
   facet's own filter is left out (leave-one-out multi-select,
   ≙ search/BoboSearcher.java:102-156) — all N aggregations share one
   cached filtered base
4. output shaping = where/orderBy/limit
   (≙ DefaultFacetCountCollector.getFacets:152-219)
5. hits = orderBy(sort keys, docid tiebreak) + offset/count paging
   (≙ SortCollectorImpl top-k + ListMerger merge — Spark's
   TakeOrderedAndProject does the per-partition heap + merge)
6. optional group-by dedupe via window row_number
   (≙ SortCollectorImpl.java:240-269)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .handlers import CompactMultiValueFacetHandler, FacetHandler, _combine_and


def recency_boost_col(time_col: str, now_ms: int, cutoff_ms: int,
                      max_factor: float):
    """ScorerBuilder analogue of the reference's quadratic time-decay
    (query/RecencyBoostScorerBuilder.java:15,40,58-60, float64 here):
    factor = 1 beyond the cutoff, else A·x² + (max_factor+1) with
    x = now - time and A = -max_factor/cutoff². Pass the returned
    callable in ``BrowseRequest.scorer_builders``."""
    mx = float(max_factor) + 1.0
    a = (1.0 - mx) / (float(cutoff_ms) ** 2)

    def build(df: DataFrame):
        x = (F.lit(float(now_ms)) - F.col(time_col).cast("double"))
        return F.when(x > float(cutoff_ms), F.lit(1.0)).otherwise(
            F.lit(a) * x * x + F.lit(mx))

    return build
from .spec import (
    BooleanFacetQuery,
    BrowseFacet,
    BrowseRequest,
    BrowseResult,
    FacetBoostQuery,
    FacetTermQuery,
)


class BoboBrowser:
    def __init__(self, df: DataFrame, handlers: list[FacetHandler], doc_col: str = "id",
                 doc_order=None):
        self.df = df
        self.handlers = {h.name: h for h in handlers}
        self.doc_col = doc_col
        self._total_docs: int | None = None  # corpus size, counted once
        # collectAll cache: full-corpus facet counts, computed once per
        # field and replayed with zero scans on later unfiltered browses
        # (≙ FacetCountCollector.collectAll serving dataCache.freqs,
        # facets/impl/SimpleFacetHandler.java:222-225)
        self._collectall_cache: dict = {}
        # keys that have been requested unfiltered once already: the
        # cache materializes on the SECOND request, so a one-shot
        # browse pays exactly one aggregation job (no eager collect +
        # local-replan overhead — measured ~2× on one-shot browses)
        self._collectall_seen: set = set()
        # natural doc order (Lucene docID): default = doc_col ascending
        self.doc_order = doc_order if doc_order is not None else F.col(doc_col)
        for h in self.handlers.values():
            if isinstance(h, CompactMultiValueFacetHandler):
                h.bind_dictionary(df)

    # ------------------------------------------------------------------ plan

    def _selection_preds(self, req: BrowseRequest) -> dict:
        preds = {}
        for sel in req.selections:
            h = self.handlers[sel.field]
            p = h.predicate(self.df, sel)
            preds[sel.field] = preds[sel.field] & p if sel.field in preds else p
        return preds

    def _facet_term_ps(self, q: FacetTermQuery):
        h = self.handlers[q.selection.field]
        pred = h.predicate(self.df, q.selection)
        score = F.lit(0.0)
        for v, b in sorted(q.boosts.items()):
            score = score + F.when(h.value_predicate(self.df, v), F.lit(float(b))).otherwise(0.0)
        return pred, score * F.lit(float(q.boost))

    def _query_pred_score(self, req: BrowseRequest):
        q = req.query
        if q is None:
            return None, None
        if isinstance(q, FacetTermQuery):
            return self._facet_term_ps(q)
        if isinstance(q, BooleanFacetQuery):
            parts = [self._facet_term_ps(c) for c in q.clauses]
            pred = parts[0][0]
            for p, _ in parts[1:]:
                pred = pred | p
            score = sum((s for _, s in parts), F.lit(0.0))
            if not q.disable_coord:  # Lucene-4 coord: matched/total clauses
                matched = sum(
                    (F.when(p, 1).otherwise(0) for p, _ in parts), F.lit(0)
                )
                score = score * matched / F.lit(float(len(parts)))
            return pred, score
        if isinstance(q, FacetBoostQuery):  # MatchAll × multiplicative boosts
            score = F.lit(1.0)
            for fld in sorted(q.boost_maps):
                h = self.handlers[fld]
                for v, b in sorted(q.boost_maps[fld].items()):
                    score = score * F.when(
                        h.value_predicate(self.df, v), F.lit(float(b))
                    ).otherwise(1.0)
            return F.lit(True), score
        raise TypeError(f"unsupported query type: {type(q)}")

    def _full_score(self, req: BrowseRequest, score):
        """Query score × scorer-builder chain (raw = 1.0 with no query,
        as a MatchAll inner scorer); None when neither exists."""
        if score is None and not req.scorer_builders:
            return None
        full = score if score is not None else F.lit(1.0)
        for sb in req.scorer_builders:
            full = full * sb(self.df)
        return full

    def hits_frame(self, req: BrowseRequest) -> DataFrame:
        """The full (unpaged) hit set as a DataFrame — the scale API."""
        preds = self._selection_preds(req)
        qpred, score = self._query_pred_score(req)
        out = self.df
        allp = list(preds.values()) + ([qpred] if qpred is not None else [])
        if allp:
            out = out.where(_combine_and(allp))
        full = self._full_score(req, score)
        if full is not None:
            out = out.withColumn("_score", full)
        return out

    def _sort_cols(self, req: BrowseRequest, scored: bool):
        cols = []
        for sf in req.sort:
            if sf.field == "_score":
                key = F.col("_score")
            elif sf.field == "_docid":
                key = self.doc_order
            elif sf.field in self.handlers:
                key = self.handlers[sf.field].sort_key(self.df)
            else:
                key = F.col(sf.field)
            cols.append(key.desc() if sf.reverse else key.asc())
        if not req.sort and scored:
            cols.append(F.col("_score").desc())  # default sort = SCORE when real query
        cols.append(self.doc_order.asc())  # stable tiebreak ≙ docid
        return cols

    # ------------------------------------------------------------------- run

    def facet_counts_df(self, req: BrowseRequest, fld: str,
                        base: DataFrame | None = None) -> DataFrame:
        """Shaped (value, count) facet counts as an uncollected
        DataFrame — the scale API (also used by browse())."""
        spec = req.facet_specs[fld]
        h = self.handlers[fld]
        preds = self._selection_preds(req)
        qpred, _ = self._query_pred_score(req)
        own_sel = next((s for s in req.selections if s.field == fld), None)
        if spec.expand_selection and fld in preds:
            others = [p for f, p in preds.items() if f != fld]
            others += [qpred] if qpred is not None else []
            fhits = self.df.where(_combine_and(others)) if others else self.df
        elif base is not None:
            fhits = base
        else:
            allp = list(preds.values()) + ([qpred] if qpred is not None else [])
            fhits = self.df.where(_combine_and(allp)) if allp else self.df
        unfiltered = not req.selections and req.query is None and base is None
        # cache key carries the one spec-dependent bit baked into
        # handler.counts (min_hits<=0 adds the zero-count universe
        # join): a min_hits=1 entry must never serve a min_hits=0
        # request, which would silently drop all zero-count values
        cache_key = (fld, spec.min_hits <= 0)
        if unfiltered and cache_key in self._collectall_cache:
            rows, ddl = self._collectall_cache[cache_key]
            counts = self.df.sparkSession.createDataFrame(rows, ddl)
        else:
            counts = h.counts(fhits, spec, self.df, own_sel)
            if unfiltered and cache_key in self._collectall_seen:
                # collectAll: pin the full-corpus distribution — but
                # only once the field is requested unfiltered AGAIN
                # (the first request keeps the direct one-job plan)
                ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                                for f in counts.schema.fields)
                rows = [tuple(r) for r in counts.collect()]
                self._collectall_cache[cache_key] = (rows, ddl)
                counts = self.df.sparkSession.createDataFrame(rows, ddl)
            elif unfiltered:
                self._collectall_seen.add(cache_key)
        if spec.min_hits > 0:
            counts = counts.where(F.col("count") >= spec.min_hits)
        if spec.order_by == "custom" and spec.custom_order:
            counts = counts.orderBy(*spec.custom_order)
        elif spec.order_by == "hits":
            counts = counts.orderBy(F.desc("count"), F.asc("value"))
        else:
            counts = counts.orderBy(F.asc("value"))
        if spec.max_count and spec.max_count > 0:
            counts = counts.limit(spec.max_count)
        return counts

    def hits_page_df(self, req: BrowseRequest) -> DataFrame:
        """The requested hit page as a DataFrame with a ``_rank``
        column (1-based global rank).

        Distributed top-(offset+count) first (TakeOrderedAndProject —
        per-partition heaps + driver merge), THEN the rank window: the
        single-partition exchange the window needs carries at most
        ``offset + count`` rows, never the full hit set."""
        _, score = self._query_pred_score(req)
        scored = self._full_score(req, score) is not None
        base = self.hits_frame(req)
        cols = self._sort_cols(req, scored)
        top = base.orderBy(*cols).limit(req.offset + req.count)
        ranked = top.withColumn("_rank", F.row_number().over(Window.orderBy(*cols)))
        return ranked.where(F.col("_rank") > req.offset)

    def browse(self, req: BrowseRequest) -> BrowseResult:
        preds = self._selection_preds(req)
        qpred, score = self._query_pred_score(req)
        base_list = list(preds.values()) + ([qpred] if qpred is not None else [])
        base = self.df.where(_combine_and(base_list)) if base_list else self.df
        full = self._full_score(req, score)
        scored = full is not None
        if scored:
            base = base.withColumn("_score", full)
        base = base.persist()
        try:
            gkey = None
            if req.group_by:
                gh = self.handlers.get(req.group_by)
                gkey = gh.sort_key(base) if gh else F.col(req.group_by)
                # one job: hit count + distinct group-key count
                # (≙ SortCollectorImpl numGroups via groupAccessibles)
                row = base.agg(F.count("*").alias("n"),
                               F.countDistinct(gkey).alias("g")).collect()[0]
                num_hits, num_groups = int(row["n"]), int(row["g"])
            else:
                num_hits = base.count()
                num_groups = num_hits
            if self._total_docs is None:  # once per browser, not per request
                self._total_docs = self.df.count()
            total_docs = self._total_docs

            facet_map = {}
            for fld in req.facet_specs:
                counts = self.facet_counts_df(req, fld, base=base)
                facet_map[fld] = [BrowseFacet(r["value"], r["count"]) for r in counts.collect()]

            ordered = base.orderBy(*self._sort_cols(req, scored))
            if req.group_by:
                w = Window.partitionBy(gkey).orderBy(*self._sort_cols(req, scored))
                ordered = (
                    base.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= req.max_per_group)
                    .drop("_rn")
                    .orderBy(*self._sort_cols(req, scored))
                )
            page = ordered.limit(req.offset + req.count).collect()[req.offset:]
            hit_rows = [r.asDict() for r in page]
            hits = [r[self.doc_col] for r in page]
            return BrowseResult(
                num_hits=num_hits,
                total_docs=total_docs,
                hits=hits,
                facet_map=facet_map,
                hit_rows=hit_rows,
                num_groups=num_groups,
            )
        finally:
            base.unpersist()
