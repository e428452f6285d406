"""Goldens: sorts (testSort/testMultiSort), facet queries with boosts
(testFacetQuery/Boolean/Boost/RangeQuery), multiplicative facet boost
(testFacetBoost), runtime filtered date range."""

from __future__ import annotations

import pytest

from bobo_spark.facets import (
    BoboBrowser,
    BooleanFacetQuery,
    BrowseRequest,
    BrowseSelection,
    FacetBoostQuery,
    FacetSpec,
    FacetTermQuery,
    RangeFacetHandler,
    SortField,
)
from bobo_spark.fixtures import bobo_docs, bobo_handlers


@pytest.fixture(scope="module")
def browser(spark):
    return BoboBrowser(bobo_docs(spark), bobo_handlers(), doc_col="id")


def check(res, num_hits, ids=None, scores=None):
    assert res.num_hits == num_hits
    if ids is not None:
        assert res.hits == list(ids)
    if scores is not None:
        got = [r["_score"] for r in res.hit_rows]
        assert got == scores


def test_sort(browser):  # BoboTestCase.java:1795-1835 (testSort)
    req = BrowseRequest(count=10, sort=[SortField("number", reverse=True)])
    check(browser.browse(req), 7, ["6", "5", "4", "3", "2", "1", "7"])
    req.sort = [SortField("name")]
    check(browser.browse(req), 7, ["7", "4", "6", "2", "3", "1", "5"])

    req.add_selection(BrowseSelection("color", values=["red"]))
    req.sort = [SortField("number", reverse=True)]
    check(browser.browse(req), 3, ["2", "1", "7"])
    req.sort = [SortField("name")]
    check(browser.browse(req), 3, ["7", "2", "1"])

    req.selections[0].values = ["red", "blue"]
    req.query = FacetTermQuery(BrowseSelection("shape", values=["square"]))
    req.sort = [SortField("number", reverse=True)]
    check(browser.browse(req), 3, ["5", "1", "7"])
    req.sort = [SortField("name")]
    check(browser.browse(req), 3, ["7", "1", "5"])


def test_multi_sort(browser):  # BoboTestCase.java:1714-1726 (testMultiSort)
    req = BrowseRequest(count=10, sort=[SortField("color"),
                                        SortField("number", reverse=True)])
    check(browser.browse(req), 7, ["5", "4", "6", "3", "2", "1", "7"])


def test_facet_query(browser):  # BoboTestCase.java:2492-2525 (testFacetQuery)
    req = BrowseRequest(count=10)
    req.query = FacetTermQuery(BrowseSelection("color", values=["red", "blue"]),
                               {"red": 3.0, "blue": 2.0})
    check(browser.browse(req), 5, ["1", "2", "7", "4", "5"])
    req.query = FacetTermQuery(BrowseSelection("tag", values=["rabbit", "dog"]),
                               {"rabbit": 100.0, "dog": 50.0})
    check(browser.browse(req), 4, ["7", "1", "3", "2"])


def test_facet_query_boolean(browser):  # BoboTestCase.java:2527-2556
    req = BrowseRequest(count=10)
    req.query = BooleanFacetQuery(
        clauses=[
            FacetTermQuery(BrowseSelection("color", values=["red", "blue"]),
                           {"red": 3.0, "blue": 2.0}),
            FacetTermQuery(BrowseSelection("tag", values=["rabbit", "dog"]),
                           {"rabbit": 100.0, "dog": 50.0}),
        ],
        disable_coord=True,
    )
    check(browser.browse(req), 6, ["7", "1", "3", "2", "4", "5"])


def test_facet_query_boost(browser):  # BoboTestCase.java:2456-2490
    req = BrowseRequest(count=10, sort=[SortField("_score", reverse=True)])
    req.query = BooleanFacetQuery(
        clauses=[
            FacetTermQuery(BrowseSelection("shape", values=["circle", "square"]),
                           {"circle": 3.0, "square": 2.0}, boost=3.0),
            FacetTermQuery(BrowseSelection("color", values=["red", "blue"]),
                           {"red": 5.0, "blue": 4.0}),
        ],
    )
    res = browser.browse(req)
    check(res, 6, ["4", "1", "7", "5", "3", "2"], [13.0, 11.0, 11.0, 10.0, 4.5, 2.5])


def test_facet_range_query(browser):  # BoboTestCase.java:2556-2571
    req = BrowseRequest(count=10)
    req.query = FacetTermQuery(
        BrowseSelection("numendorsers", values=["[* TO 000010]"]),
        {"000002": 100.0, "000010": 50.0},
    )
    check(browser.browse(req), 4, ["5", "2", "1", "6"])


def test_facet_boost(browser):  # BoboTestCase.java:2573-2600 (testFacetBoost)
    req = BrowseRequest(count=10, sort=[SortField("_score", reverse=True)])
    req.query = FacetBoostQuery({
        "color": {"red": 3.0, "blue": 2.0},
        "tag": {"rabbit": 5.0, "dog": 7.0},
    })
    check(browser.browse(req), 7, ["7", "2", "1", "3", "4", "5", "6"])


def test_runtime_filtered_date_range(spark):  # BoboTestCase.java:2602-2620
    handlers = bobo_handlers() + [
        RangeFacetHandler("filtered_date",
                          ["[2001/01/01 TO 2001/12/30]", "[2007/01/01 TO 2007/12/30]"],
                          column="date"),
    ]
    b = BoboBrowser(bobo_docs(spark), handlers, doc_col="id")
    req = BrowseRequest(count=10)
    req.set_facet_spec("filtered_date", FacetSpec())
    res = b.browse(req)
    assert res.num_hits == 7
    assert res.facets("filtered_date") == [
        ("[2001/01/01 TO 2001/12/30]", 1), ("[2007/01/01 TO 2007/12/30]", 1)]
