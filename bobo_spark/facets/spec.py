"""Browse request/result model — the Bobo public API surface.

Mirrors (reference file:line for parity checks):
* BrowseSelection — api/BrowseSelection.java (values, notValues,
  ValueOperation, selection properties depth/strict)
* FacetSpec — api/FacetSpec.java:20-40,69-126 (orderBy, maxCount,
  minHitCount, expandSelection)
* BrowseRequest — api/BrowseRequest.java:42-81 (selections,
  facetSpecs, sort, offset/count, groupBy, maxPerGroup, query)
* BrowseResult — api/BrowseResult.java:43,69-80 (numHits, totalDocs,
  hits, facetMap)
* FacetTermQuery — query/scoring/FacetTermQuery.java:29,37-47 with
  DefaultFacetTermScoringFunction (score=boost, collect=sum)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BrowseSelection:
    field: str
    values: list = field(default_factory=list)
    not_values: list = field(default_factory=list)
    operation: str = "or"  # "or" | "and" (ValueOperation)
    depth: int = 0  # path selection property
    strict: bool = False  # path selection property
    max_facets_per_key: int = 0  # attributes selection property


@dataclass
class FacetSpec:
    # "value" (OrderValueAsc, the reference default) | "hits"
    # (OrderHitsDesc) | "custom" (OrderByCustom + custom_order)
    order_by: str = "value"
    max_count: int = 0  # 0 = unlimited
    min_hits: int = 1  # minHitCount; 0 => include zero-count values
    expand_selection: bool = False
    # ComparatorFactory analogue (≙ api/ComparatorFactory.java:12 +
    # FacetSpec.OrderByCustom): sort-key Columns over the (value,
    # count) frame. A comparator must be expressed as key expressions —
    # the distributed sort requirement Spark shares with Lucene's
    # segment merge.
    custom_order: list = field(default_factory=list)


@dataclass
class SortField:
    field: str  # facet field, or "_score" / "_docid"
    reverse: bool = False


@dataclass
class FacetTermQuery:
    """Query whose matches = a facet selection; score = sum of
    per-value boosts over the doc's matching values, times the query
    boost (≙ query/scoring/FacetTermQuery.java:29,37-47 +
    DefaultFacetTermScoringFunction sum-collect)."""

    selection: BrowseSelection
    boosts: dict = field(default_factory=dict)  # value -> float
    boost: float = 1.0


@dataclass
class BooleanFacetQuery:
    """SHOULD-combination of FacetTermQueries (≙ Lucene BooleanQuery
    over FacetTermQuery clauses): matches = union, score = Σ clause
    scores × (matched/total clauses) unless ``disable_coord``
    (Lucene 4 coord factor, BoboTestCase.testFacetQueryBoost)."""

    clauses: list = field(default_factory=list)
    disable_coord: bool = False


@dataclass
class FacetBoostQuery:
    """MatchAll adjusted by multiplicative per-facet-value boosts
    (≙ query/ScoreAdjusterQuery.java + FacetBasedBoostScorerBuilder +
    MultiplicativeFacetTermScoringFunction)."""

    boost_maps: dict = field(default_factory=dict)  # field -> {value -> boost}


@dataclass
class BrowseRequest:
    selections: list = field(default_factory=list)
    facet_specs: dict = field(default_factory=dict)  # field -> FacetSpec
    sort: list = field(default_factory=list)  # [SortField]
    offset: int = 0
    count: int = 10
    query: object | None = None  # FacetTermQuery | BooleanFacetQuery | FacetBoostQuery
    group_by: str | None = None
    max_per_group: int = 1
    # ScorerBuilder chain (≙ query/ScorerBuilder.java): each callable
    # df -> Column multiplies the query score (raw score 1.0 when there
    # is no query, as a Lucene MatchAll inner scorer would give)
    scorer_builders: list = field(default_factory=list)

    def add_selection(self, sel: BrowseSelection) -> "BrowseRequest":
        self.selections.append(sel)
        return self

    def set_facet_spec(self, fld: str, spec: FacetSpec) -> "BrowseRequest":
        self.facet_specs[fld] = spec
        return self


@dataclass
class BrowseFacet:
    value: str
    count: int


@dataclass
class BrowseResult:
    num_hits: int
    total_docs: int
    hits: list  # list of doc ids (doc_col values) in rank order
    facet_map: dict  # field -> list[BrowseFacet]
    hit_rows: list = field(default_factory=list)  # full hit rows (dicts)
    # distinct group-key count over the hit set when group_by is set,
    # else == num_hits (≙ sort/SortCollectorImpl.java:189-190,339-341)
    num_groups: int = 0

    def facets(self, fld: str) -> list[tuple]:
        return [(f.value, f.count) for f in self.facet_map[fld]]
