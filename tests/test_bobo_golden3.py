"""Goldens for AttributesFacetHandler (facets/attribute/
AttributesFacetHandlerTest.java) and DynamicTimeRangeFacetHandler
(BoboTestCase.testTime, BoboTestCase.java:2737-2853)."""

from __future__ import annotations

import pytest

from bobo_spark.facets import (
    AttributesFacetHandler,
    BoboBrowser,
    BrowseRequest,
    BrowseSelection,
    DynamicTimeRangeFacetHandler,
    FacetSpec,
)


# ---------------------------------------------------------------- attributes

ATTR_ROWS = [  # AttributesFacetHandlerTest.setUp docs 0..5
    (0, ["prop1=val1", "prop2=val1", "prop5=val1"]),
    (1, ["prop1=val2", "prop3=val1", "prop7=val7"]),
    (2, ["prop1=val2", "prop3=val2", "prop3=val3"]),
    (3, ["prop1=val1", "prop2=val1"]),
    (4, ["prop1=val1", "prop2=val1"]),
    (5, ["prop1=val1", "prop2=val1", "prop4=val2", "prop4=val3"]),
]


@pytest.fixture(scope="module")
def attr_browser(spark):
    df = spark.createDataFrame(ATTR_ROWS, "id long, attributes array<string>")
    return BoboBrowser(df, [AttributesFacetHandler("attributes")], doc_col="id")


def _attr_req(values, operation="or", min_hits=1, not_values=(), mfpk=0):
    req = BrowseRequest(count=50)
    req.add_selection(BrowseSelection("attributes", values=list(values),
                                      not_values=list(not_values), operation=operation,
                                      max_facets_per_key=mfpk))
    req.set_facet_spec("attributes", FacetSpec(min_hits=min_hits))
    return req


def test_attr_key_selection(attr_browser):  # test1Filter / test2PropertyRetrieval
    res = attr_browser.browse(_attr_req(["prop3"]))
    assert res.num_hits == 2
    assert res.hits == [1, 2]
    assert res.facets("attributes") == [
        ("prop3=val1", 1), ("prop3=val2", 1), ("prop3=val3", 1)]


def test_attr_every_doc(attr_browser):  # test3PropertyInEachDocRetrieval
    res = attr_browser.browse(_attr_req(["prop1"]))
    assert res.num_hits == 6
    assert res.hits[0] == 0 and res.hits[5] == 5
    assert res.facets("attributes") == [("prop1=val1", 4), ("prop1=val2", 2)]


def test_attr_single_docs(attr_browser):  # test4 / test5
    res = attr_browser.browse(_attr_req(["prop5"]))
    assert res.num_hits == 1 and res.hits == [0]
    assert res.facets("attributes") == [("prop5=val1", 1)]
    res = attr_browser.browse(_attr_req(["prop4"]))
    assert res.num_hits == 1 and res.hits == [5]
    assert res.facets("attributes") == [("prop4=val2", 1), ("prop4=val3", 1)]


def test_attr_missing(attr_browser):  # test6
    assert attr_browser.browse(_attr_req(["propMissing"])).num_hits == 0


def test_attr_and(attr_browser):  # test7AndProperties
    res = attr_browser.browse(_attr_req(["prop1", "prop3"], operation="and"))
    assert res.num_hits == 2 and res.hits == [1, 2]
    assert res.facets("attributes") == [
        ("prop1=val2", 2), ("prop3=val1", 1), ("prop3=val2", 1), ("prop3=val3", 1)]


def test_attr_and_not(attr_browser):  # test8AndPropertiesPlsExclusion
    res = attr_browser.browse(
        _attr_req(["prop1", "prop3"], operation="and", not_values=["prop7"]))
    assert res.num_hits == 1 and res.hits == [2]
    assert res.facets("attributes") == [
        ("prop1=val2", 1), ("prop3=val2", 1), ("prop3=val3", 1)]


def test_attr_max_per_key(attr_browser):  # test9-style: top-1 per key, hits desc
    req = BrowseRequest(count=50)
    req.add_selection(BrowseSelection("attributes", max_facets_per_key=1))
    req.set_facet_spec("attributes", FacetSpec(min_hits=1, order_by="hits"))
    res = attr_browser.browse(req)
    got = res.facets("attributes")
    assert len(got) == 6
    assert got[0] == ("prop1=val1", 4)
    assert got[1] == ("prop2=val1", 4)
    assert got[2] == ("prop3=val1", 1)


# --------------------------------------------------------- dynamic time range

NOW = 1_700_000_000_000
RANGES = ["000000001", "000010000", "000020000", "000030000", "000040000",
          "001000000", "002000000", "003000000", "004000000"]


@pytest.fixture(scope="module")
def time_browser(spark):
    rows = [(i, f"{NOW - i * 3_500_000:020d}") for i in range(53)]
    df = spark.createDataFrame(rows, "id long, timeinmillis string")
    handler = DynamicTimeRangeFacetHandler("timerange", "timeinmillis", NOW, RANGES)
    return BoboBrowser(df, [handler], doc_col="id")


def test_time_value_order(time_browser):  # BoboTestCase.java:2774-2791
    req = BrowseRequest()
    req.set_facet_spec("timerange", FacetSpec())
    facets = time_browser.browse(req).facets("timerange")
    assert facets[0] == ("000000001", 1)
    assert facets[1] == ("000010000", 1)
    assert facets[5] == ("001000000", 20)
    assert facets[7] == ("003000000", 3)


def test_time_hits_desc_minhit0(time_browser):  # :2793-2811
    req = BrowseRequest()
    req.set_facet_spec("timerange", FacetSpec(min_hits=0, order_by="hits"))
    facets = time_browser.browse(req).facets("timerange")
    assert facets[0] == ("002000000", 25)
    assert facets[1] == ("001000000", 20)
    assert facets[2] == ("003000000", 3)
    assert facets[8] == ("004000000", 0)


def test_time_expand_selection(time_browser):  # :2813-2830
    req = BrowseRequest()
    req.add_selection(BrowseSelection("timerange", values=["001000000"]))
    req.set_facet_spec("timerange", FacetSpec(expand_selection=True))
    facets = time_browser.browse(req).facets("timerange")
    assert facets[0] == ("000000001", 1)
    assert facets[6] == ("002000000", 25)
    assert facets[7] == ("003000000", 3)


def test_time_multi_selection(time_browser):  # :2832-2852
    req = BrowseRequest()
    req.add_selection(BrowseSelection(
        "timerange", values=["001000000", "003000000", "004000000"]))
    req.set_facet_spec("timerange", FacetSpec(min_hits=0))
    res = time_browser.browse(req)
    got = dict(res.facets("timerange"))
    assert got["001000000"] == 20
    assert got["003000000"] == 3
    assert got["004000000"] == 0
    assert res.num_hits == 23


# ------------------------------------------------------- multi-valued path

def test_multival_path(spark):  # test/TestPathMultiVal.java:43-72
    from bobo_spark.facets import PathFacetHandler

    df = spark.createDataFrame([(0, ["/a/b/c", "/a/b/d"])],
                               "id long, path array<string>")
    b = BoboBrowser(df, [PathFacetHandler("path", multi=True)], doc_col="id")
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("path", values=["/a"], depth=0, strict=False))
    req.set_facet_spec("path", FacetSpec(min_hits=1))
    res = b.browse(req)
    assert res.num_hits == 1
    assert res.facets("path") == [("/a", 2)]


def test_path_strict_leading_sep(spark):
    """Strict + leading-separator: depth is counted over NON-EMPTY
    parts (reference splitString strips empties,
    PathFacetCountCollector.java:126-173), so '/a/b', 'a/b', 'a/b/'
    all sit at depth 2 and are treated identically."""
    from bobo_spark.facets import PathFacetHandler

    df = spark.createDataFrame(
        [(0, "/a/b"), (1, "/a/b/c"), (2, "/a"), (3, "/a/x")],
        "id long, path string")
    b = BoboBrowser(df, [PathFacetHandler("path")], doc_col="id")
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("path", values=["/a"], depth=1, strict=True))
    req.set_facet_spec("path", FacetSpec(min_hits=1))
    res = b.browse(req)
    # strict selection: docs strictly deeper than '/a' -> 0,1,3
    assert res.num_hits == 3
    # strict count: only target-level (depth 2) nodes; '/a/b' (exact
    # node) and '/a/b/c' both roll to '/a/b'
    assert res.facets("path") == [("/a/b", 2), ("/a/x", 1)]


def test_path_strict_plain_matches_leading(spark):
    """A doc at exactly the target depth counts the same with and
    without a leading separator."""
    from bobo_spark.facets import PathFacetHandler

    for sel_val, paths, expect in (("a", ["a/b", "a/b/c"], "a/b"),
                                   ("/a", ["/a/b", "/a/b/c"], "/a/b")):
        df = spark.createDataFrame(list(enumerate(paths)), "id long, path string")
        b = BoboBrowser(df, [PathFacetHandler("path")], doc_col="id")
        req = BrowseRequest(count=10)
        req.add_selection(BrowseSelection("path", values=[sel_val], depth=1, strict=True))
        req.set_facet_spec("path", FacetSpec(min_hits=1))
        res = b.browse(req)
        assert res.facets("path") == [(expect, 2)], paths
