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
