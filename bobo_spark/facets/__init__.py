"""Bobo-style faceted browse semantics on Spark DataFrames.

The browse engine reimplements the reference's facet machinery
(selections, facet specs, multi-select counting, output shaping,
sorting, paging, group-by) as declarative DataFrame plans that
Catalyst optimizes: facet counting is ``groupBy().count()``
(partial+final hash agg ≙ per-segment collectors + CombinedFacetAccessible
merge), shaping is ``where/orderBy/limit``, group-by dedupe is a
window ``row_number()``.
"""

from .spec import (
    BooleanFacetQuery,
    BrowseFacet,
    BrowseRequest,
    BrowseResult,
    BrowseSelection,
    FacetBoostQuery,
    FacetSpec,
    FacetTermQuery,
    SortField,
)
from .handlers import (
    AttributesFacetHandler,
    BucketFacetHandler,
    ComboFacetHandler,
    CompactMultiValueFacetHandler,
    DynamicTimeRangeFacetHandler,
    FacetHandler,
    FilteredRangeFacetHandler,
    MultiRangeFacetHandler,
    GeoFacetHandler,
    GeoSimpleFacetHandler,
    HistogramFacetHandler,
    MultiValueFacetHandler,
    MultiValueWithWeightFacetHandler,
    PathFacetHandler,
    RangeFacetHandler,
    SimpleFacetHandler,
    SimpleGroupbyFacetHandler,
    TermFormat,
    VirtualSimpleFacetHandler,
)
from .browse import BoboBrowser

__all__ = [
    "AttributesFacetHandler",
    "BoboBrowser",
    "BooleanFacetQuery",
    "FacetBoostQuery",
    "BrowseFacet",
    "DynamicTimeRangeFacetHandler",
    "BrowseRequest",
    "BrowseResult",
    "BrowseSelection",
    "BucketFacetHandler",
    "ComboFacetHandler",
    "CompactMultiValueFacetHandler",
    "FacetHandler",
    "FacetSpec",
    "FilteredRangeFacetHandler",
    "MultiRangeFacetHandler",
    "FacetTermQuery",
    "GeoFacetHandler",
    "GeoSimpleFacetHandler",
    "HistogramFacetHandler",
    "MultiValueFacetHandler",
    "MultiValueWithWeightFacetHandler",
    "PathFacetHandler",
    "RangeFacetHandler",
    "SimpleFacetHandler",
    "SimpleGroupbyFacetHandler",
    "SortField",
    "TermFormat",
    "VirtualSimpleFacetHandler",
]
