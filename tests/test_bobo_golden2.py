"""More BoboTestCase goldens: the full combined browse, strict path
rollup, char facet with reverse date sort, and facet-sort shaping."""

from __future__ import annotations

import pytest

from bobo_spark.facets import (
    BoboBrowser,
    BrowseRequest,
    BrowseSelection,
    FacetSpec,
    SortField,
)
from bobo_spark.fixtures import bobo_docs, bobo_handlers


@pytest.fixture(scope="module")
def browser(spark):
    return BoboBrowser(bobo_docs(spark), bobo_handlers(), doc_col="id")


def check(res, num_hits, facets=None, ids=None):
    assert res.num_hits == num_hits
    if facets is not None:
        for fld, expected in facets.items():
            assert res.facets(fld) == expected, f"facet {fld}: {res.facets(fld)}"
    if ids is not None:
        assert res.hits == list(ids)


def test_browse_combined(browser):  # BoboTestCase.java:2329-2390 (testBrowse)
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("color", values=["red"]))
    req.add_selection(BrowseSelection("location", values=["toy/lego"], depth=1))
    req.add_selection(BrowseSelection("tag", values=["rabbit"]))
    expand = FacetSpec(expand_selection=True)
    plain5 = FacetSpec(max_count=5)
    req.set_facet_spec("color", expand)
    req.set_facet_spec("size", plain5)
    req.set_facet_spec("shape", expand)
    req.set_facet_spec("location", plain5)
    req.set_facet_spec("tag", FacetSpec(max_count=5, order_by="hits"))
    check(browser.browse(req), 2, {
        "color": [("green", 1), ("red", 2)],
        "size": [("[* TO 4]", 1), ("[5 TO 8]", 1)],
        "shape": [("square", 2)],
        "location": [("toy/lego/", 1), ("toy/lego/block", 1)],
        "tag": [("rabbit", 2), ("animal", 1), ("dog", 1), ("humane", 1), ("pet", 1)],
    })


def test_tag_rollup_strict(browser):  # BoboTestCase.java:1426-1462 (testTagRollup)
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("location", values=["toy/lego"], depth=1, strict=True))
    req.set_facet_spec("location", FacetSpec())
    req.set_facet_spec("tag", FacetSpec(max_count=50, order_by="hits"))
    check(browser.browse(req), 3, {
        "location": [("toy/lego/block", 3)],
        "tag": [("pet", 2), ("animal", 1), ("dog", 1), ("funny", 1), ("humor", 1),
                ("joke", 1), ("poodle", 1), ("rabbit", 1)],
    })


def test_char(browser):  # BoboTestCase.java:1464-1494 (testChar)
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("char", values=["j"]))
    check(browser.browse(req), 1, None, ["3"])

    req = BrowseRequest(count=10, sort=[SortField("date", reverse=True)])
    req.add_selection(BrowseSelection("color", values=["red"]))
    req.set_facet_spec("char", FacetSpec(max_count=50, order_by="hits"))
    check(browser.browse(req), 3,
          {"char": [("a", 1), ("i", 1), ("k", 1)]}, ["7", "2", "1"])


def test_custom_facet_sort(browser):  # BoboTestCase.java:2620-2694 (testCustomFacetSort)
    from pyspark.sql import functions as F

    req = BrowseRequest(count=10)
    req.set_facet_spec("number", FacetSpec(
        order_by="custom", max_count=3,
        custom_order=[F.col("value").cast("int").desc(), F.col("count").desc()]))
    check(browser.browse(req), 7,
          {"number": [("2130", 1), ("1013", 1), ("0913", 1)]})

    req2 = BrowseRequest(count=10)
    req2.set_facet_spec("number", FacetSpec(order_by="value", max_count=3))
    check(browser.browse(req2), 7,
          {"number": [("0005", 1), ("0010", 1), ("0011", 1)]})


def test_multi_browser(spark):  # BoboTestCase.java:2395-2455 (testMultiBrowser)
    # MultiBoboBrowser([b, b]) ≙ browsing the union of the same segment
    # twice — our cross-segment merge is the DataFrame union itself.
    docs = bobo_docs(spark)
    b = BoboBrowser(docs.unionByName(docs), bobo_handlers(), doc_col="id")
    req = BrowseRequest(count=10, sort=[SortField("compactnum", reverse=True)])
    req.add_selection(BrowseSelection("color", values=["red"]))
    req.add_selection(BrowseSelection("tag", values=["rabbit"]))
    req.set_facet_spec("color", FacetSpec(expand_selection=True, order_by="hits"))
    req.set_facet_spec("tag", FacetSpec())
    req.set_facet_spec("shape", FacetSpec(order_by="hits"))
    req.set_facet_spec("date", FacetSpec(expand_selection=True))
    answer = {
        "color": [("red", 4), ("green", 2)],
        "tag": [("animal", 2), ("dog", 2), ("humane", 2), ("pet", 2), ("rabbit", 4)],
        "shape": [("square", 4)],
        "date": [("[2000/01/01 TO 2003/05/05]", 2)],
    }
    check(b.browse(req), 4, answer, ["7", "7", "1", "1"])

    req.sort = [SortField("multinum", reverse=True)]
    check(b.browse(req), 4, answer, ["7", "7", "1", "1"])


def test_not_values_simple(spark):  # FacetNotValuesTest.java:174-227 (documentSize=10)
    from bobo_spark.facets import SimpleFacetHandler

    docs = spark.createDataFrame(
        [(str(i), "red" if i % 2 == 0 else "green") for i in range(10)],
        "id string, color string")
    b = BoboBrowser(docs, [SimpleFacetHandler("id"), SimpleFacetHandler("color")],
                    doc_col="id", doc_order=None)
    req = BrowseRequest(count=20)
    req.add_selection(BrowseSelection("color", values=["red"]))
    req.add_selection(BrowseSelection("id", not_values=["0"]))
    res = b.browse(req)
    assert res.num_hits == 10 // 2 - 1
    assert [int(h) for h in res.hits] == [(i + 1) * 2 for i in range(res.num_hits)]


def test_not_values_range(spark):  # FacetNotValuesTest.java:229-278
    from bobo_spark.facets import RangeFacetHandler, SimpleFacetHandler

    docs = spark.createDataFrame([("10", "red", 10), ("11", "green", 11)],
                                 "id string, color string, num int")
    b = BoboBrowser(docs, [
        SimpleFacetHandler("id"),
        SimpleFacetHandler("color"),
        RangeFacetHandler("idRange", column="id"),
        RangeFacetHandler("numRange", column="num", numeric=True),
    ], doc_col="id")
    req = BrowseRequest(count=20)
    req.add_selection(BrowseSelection("idRange", not_values=["[10 TO 10]"]))
    # the reference expresses MUST_NOT NUM:[10,10] as a Lucene query;
    # selection-NOT on a numeric range handler is the same predicate
    req.add_selection(BrowseSelection("numRange", not_values=["[10 TO 10]"]))
    res = b.browse(req)
    assert res.num_hits == 1 and res.hits == ["11"]
