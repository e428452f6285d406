"""Golden tests ported verbatim from the reference's BoboTestCase
(/root/reference/bobo-browse/src/test/java/com/browseengine/bobo/test/
BoboTestCase.java — line refs on each test). Assertions are exact:
numHits, ordered hit id lists, ordered facet (value, count) lists."""

from __future__ import annotations

import pytest

from bobo_spark.facets import (
    BoboBrowser,
    BrowseRequest,
    BrowseSelection,
    FacetSpec,
    FacetTermQuery,
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


def test_expand_selection(browser):  # BoboTestCase.java:1061-1100
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("color", values=["red"]))
    spec = FacetSpec(expand_selection=True)
    req.set_facet_spec("color", spec)
    req.set_facet_spec("shape", spec)
    check(browser.browse(req), 3,
          {"color": [("blue", 2), ("green", 2), ("red", 3)],
           "shape": [("rectangle", 1), ("square", 2)]},
          ["1", "2", "7"])
    req.add_selection(BrowseSelection("shape", values=["square"]))
    check(browser.browse(req), 2,
          {"color": [("blue", 1), ("red", 2)],
           "shape": [("rectangle", 1), ("square", 2)]},
          ["1", "7"])


def test_path(browser):  # BoboTestCase.java:1102-1137
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("path", values=["a"], depth=1))
    req.set_facet_spec("path", FacetSpec(order_by="value"))
    check(browser.browse(req), 7, {"path": [("a-b", 1), ("a-c", 4), ("a-e", 2)]})
    req.facet_specs["path"] = FacetSpec(order_by="hits")
    check(browser.browse(req), 7, {"path": [("a-c", 4), ("a-e", 2), ("a-b", 1)]})
    req.facet_specs["path"] = FacetSpec(order_by="hits", max_count=2)
    check(browser.browse(req), 7, {"path": [("a-c", 4), ("a-e", 2)]})


def test_combo_selection_only(browser):  # BoboTestCase.java:1139-1191
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("colorShape",
                                      values=["color:green", "shape:rectangle", "shape:square"]))
    check(browser.browse(req), 6, None, ["1", "2", "3", "5", "6", "7"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("colorShape",
                                      values=["color:green", "shape:rectangle"], operation="and"))
    check(browser.browse(req), 1, None, ["6"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection(
        "colorShapeMultinum", values=["color:red", "shape:square"],
        not_values=["multinum:001", "multinum:003"]))
    check(browser.browse(req), 1, None, ["2"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection(
        "colorShapeMultinum", values=["color:red", "shape:square"],
        not_values=["multinum:003"]))
    check(browser.browse(req), 2, None, ["2", "5"])


def test_default_browse(browser):  # BoboTestCase.java:1836-1853
    req = BrowseRequest(count=3, offset=0,
                        sort=[SortField("number")])
    req.set_facet_spec("color", FacetSpec(max_count=2, order_by="hits"))
    check(browser.browse(req), 7, {"color": [("red", 3), ("blue", 2)]}, ["7", "1", "2"])


def test_min_hit(browser):  # BoboTestCase.java:1855-1877
    req = BrowseRequest(count=3)
    req.add_selection(BrowseSelection("shape", values=["square"]))
    req.set_facet_spec("color", FacetSpec(min_hits=0, order_by="hits"))
    check(browser.browse(req), 3, {"color": [("red", 2), ("blue", 1), ("green", 0)]})


def test_date_range(browser):  # BoboTestCase.java:2263-2279
    req = BrowseRequest(count=10)
    req.set_facet_spec("date", FacetSpec(expand_selection=True))
    check(browser.browse(req), 7,
          {"date": [("[2000/01/01 TO 2003/05/05]", 4), ("[2003/05/06 TO 2005/04/04]", 1)]})


def test_new_range_facet(browser):  # BoboTestCase.java:2281-2308
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("date", values=["(2000/01/01 TO 2003/02/14]"]))
    check(browser.browse(req), 3)
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("date", values=["(2000/01/01 TO 2003/02/14)"]))
    check(browser.browse(req), 2)


def test_num_endorsers(browser):  # BoboTestCase.java:2310-2328
    req = BrowseRequest(count=10)
    req.set_facet_spec("numendorsers", FacetSpec(expand_selection=True))
    check(browser.browse(req), 7,
          {"numendorsers": [("[000000 TO 000005]", 2), ("[000006 TO 000010]", 2),
                            ("[000011 TO 000020]", 3)]})


def test_histogram(browser):  # BoboTestCase.java:2855-2893
    req = BrowseRequest(count=0)
    req.set_facet_spec("numberhisto", FacetSpec(max_count=100, min_hits=1))
    check(browser.browse(req), 7,
          {"numberhisto": [("0000000000", 3), ("0000000002", 1), ("0000000009", 1),
                           ("0000000010", 1), ("0000000021", 1)]})
    req.add_selection(BrowseSelection("color", values=["green"]))
    check(browser.browse(req), 2,
          {"numberhisto": [("0000000002", 1), ("0000000021", 1)]})


def test_bucket_numbers(browser):  # BoboTestCase.java:2893-2931
    req = BrowseRequest(count=10)
    req.set_facet_spec("sets", FacetSpec(order_by="hits"))
    check(browser.browse(req), 7, {"sets": [("s1", 5), ("s2", 4), ("s3", 3)]})

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("sets", values=["s1"]))
    req.set_facet_spec("sets", FacetSpec(order_by="hits"))
    check(browser.browse(req), 4, {"sets": [("s1", 5), ("s2", 3), ("s3", 1)]})


def test_bucket_strings(browser):  # BoboTestCase.java:2933-3000
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("groups", values=["g2"]))
    req.set_facet_spec("groups", FacetSpec(order_by="hits"))
    check(browser.browse(req), 3, {"groups": [("g2", 3), ("g1", 1), ("g3", 1)]})

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("groups", values=["g2", "g1"], operation="and"))
    req.set_facet_spec("groups", FacetSpec(order_by="hits"))
    check(browser.browse(req), 1, {"groups": [("g1", 1), ("g2", 1)]})

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("groups", values=["g2", "g1"], operation="or"))
    req.set_facet_spec("groups", FacetSpec(order_by="hits"))
    check(browser.browse(req), 5, {"groups": [("g1", 3), ("g2", 3), ("g3", 1)]})


def test_virtual(browser):  # BoboTestCase.java:3001-3020
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("virtual", values=["10", "11"]))
    req.set_facet_spec("virtual", FacetSpec(order_by="value"))
    check(browser.browse(req), 2, {"virtual": [("0010", 1), ("0011", 1)]}, ["1", "2"])


def test_not_support(browser):  # BoboTestCase.java:2197-2252
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("color", not_values=["red"]))
    req.set_facet_spec("shape", FacetSpec())
    check(browser.browse(req), 4,
          {"shape": [("circle", 2), ("rectangle", 1), ("square", 1)]},
          ["3", "4", "5", "6"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("color", not_values=["red", "green"]))
    req.set_facet_spec("shape", FacetSpec())
    check(browser.browse(req), 2, {"shape": [("circle", 1), ("square", 1)]}, ["4", "5"])

    for fld in ("compactnum", "multinum"):
        req = BrowseRequest(count=10)
        req.add_selection(BrowseSelection(fld, values=["1", "2", "7"], not_values=["3", "4"]))
        check(browser.browse(req), 3, None, ["3", "4", "5"])


def test_missed_selection(browser):  # BoboTestCase.java:2253-2261
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("location", values=["something/stupid"]))
    check(browser.browse(req), 0)


def test_simple_groupby(browser):  # BoboTestCase.java:2694-2736
    req = BrowseRequest()
    req.set_facet_spec("groupby", FacetSpec())
    req.add_selection(BrowseSelection("groupby", values=["red"]))
    check(browser.browse(req), 3,
          {"groupby": [("red,rectangle,0011", 1), ("red,square,0005", 1),
                       ("red,square,0010", 1)]})
    req.selections[0].values = ["red,square"]
    check(browser.browse(req), 2,
          {"groupby": [("red,square,0005", 1), ("red,square,0010", 1)]})
    req.selections[0].values = ["red,square,0005"]
    check(browser.browse(req), 1, {"groupby": [("red,square,0005", 1)]})
    req.selections.clear()
    req.facet_specs["groupby"] = FacetSpec(max_count=2)
    check(browser.browse(req), 7,
          {"groupby": [("blue,circle,0913", 1), ("blue,square,1013", 1)]})


def test_compact_multi_val(browser):  # BoboTestCase.java:1979-2045
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("compactnum", values=["001", "003", "007"]))
    req.set_facet_spec("compactnum", FacetSpec())
    req.sort = [SortField("compactnum", reverse=True)]
    check(browser.browse(req), 6,
          {"compactnum": [("001", 3), ("002", 1), ("003", 3), ("007", 2),
                          ("008", 1), ("012", 1)]},
          ["3", "7", "4", "6", "1", "5"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("compactnum", values=["001", "002", "003"],
                                      operation="and"))
    check(browser.browse(req), 1, None, ["6"])

    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("compactnum", values=["001", "003", "008"]))
    req.add_selection(BrowseSelection("color", values=["red"]))
    req.set_facet_spec("color", FacetSpec())
    req.set_facet_spec("compactnum", FacetSpec())
    check(browser.browse(req), 2,
          {"compactnum": [("001", 1), ("003", 2), ("008", 1)], "color": [("red", 2)]},
          ["1", "7"])


def test_multi_with_weight(browser):  # BoboTestCase.java:2047-2065
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("multiwithweight", values=["cool"]))
    req.set_facet_spec("multiwithweight", FacetSpec())
    req.sort = [SortField("multiwithweight", reverse=True)]
    check(browser.browse(req), 3,
          {"multiwithweight": [("cool", 3), ("good", 2)]}, ["1", "2", "3"])


def test_multi_diff_name(browser):  # BoboTestCase.java:2067-2079
    req = BrowseRequest(count=10)
    req.add_selection(BrowseSelection("diffname", values=["001"]))
    check(browser.browse(req), 3, None, ["1", "5", "6"])


def test_facet_sort(browser):  # BoboTestCase.java:1626-1650
    req = BrowseRequest(count=10)
    req.set_facet_spec("color", FacetSpec(order_by="hits"))
    req.set_facet_spec("shape", FacetSpec(order_by="value"))
    check(browser.browse(req), 7,
          {"color": [("red", 3), ("blue", 2), ("green", 2)],
           "shape": [("circle", 2), ("rectangle", 2), ("square", 3)]})


def test_sort_by_date(browser):  # BoboTestCase.java:1600-1624 (testLuceneSort)
    req = BrowseRequest(count=10, sort=[SortField("date")])
    check(browser.browse(req), 7, None, ["1", "3", "5", "2", "4", "7", "6"])


def test_simple_geo(browser):  # BoboTestCase.java:1197-1255
    req = BrowseRequest(count=10)
    sel = BrowseSelection("distance", values=["30,70:5", "60,120:1"])
    req.add_selection(sel)
    req.set_facet_spec("distance", FacetSpec(order_by="value"))
    check(browser.browse(req), 4,
          {"distance": [("30,70:5", 2), ("60,120:1", 2)]}, ["1", "3", "4", "5"])

    req2 = BrowseRequest(count=10)
    req2.query = FacetTermQuery(BrowseSelection("distance", values=["60,120:1"]),
                                {"0,120:1": 3.0})
    check(browser.browse(req2), 2, None, ["1", "5"])

    req3 = BrowseRequest(count=10)
    req3.query = FacetTermQuery(BrowseSelection("color", values=["red"]), {"red": 3.0})
    req3.set_facet_spec("distance", FacetSpec(order_by="value", min_hits=0))
    req3.add_selection(sel)
    check(browser.browse(req3), 1, {"distance": [("30,70:5", 0), ("60,120:1", 1)]})


def test_geo_exact(browser):  # BoboTestCase.java:1261-1316 (testGeo)
    req = BrowseRequest(count=10)
    sel = BrowseSelection("correctDistance", values=["30,75:100", "60,120:1"])
    req.add_selection(sel)
    req.set_facet_spec("correctDistance", FacetSpec(order_by="value", min_hits=0))
    check(browser.browse(req), 3,
          {"correctDistance": [("30,75:100", 1), ("60,120:1", 2)]})

    req2 = BrowseRequest(count=10)
    req2.query = FacetTermQuery(BrowseSelection("correctDistance", values=["60,120:1"]),
                                {"60,120:1": 3.0})
    check(browser.browse(req2), 2, None, ["1", "5"])

    req3 = BrowseRequest(count=10)
    req3.query = FacetTermQuery(BrowseSelection("color", values=["red"]), {"red": 3.0})
    req3.set_facet_spec("correctDistance", FacetSpec(order_by="value", min_hits=1))
    req3.add_selection(sel)
    check(browser.browse(req3), 1, {"correctDistance": [("60,120:1", 1)]})
