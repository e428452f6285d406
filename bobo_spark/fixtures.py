"""The Bobo 7-document golden fixture as a Spark DataFrame.

Exact port of BoboTestCase.buildData()
(/root/reference/bobo-browse/src/test/java/com/browseengine/bobo/test/
BoboTestCase.java:225-474) and the handler configuration
(:498-631). ~53 reference tests assert exact numHits, ordered hit ids
and facet (value, count) lists against this table; our golden suite
ports those assertions verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .facets import (
    BucketFacetHandler,
    ComboFacetHandler,
    CompactMultiValueFacetHandler,
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
from pyspark.sql import functions as F

_ROWS = [
    # id, shape, color, size, location, tag, number, date, name, char,
    # multinum, compactnum, numendorsers, path, multipath, lat, lon, salary, multiwithweight
    ("1", "square", "red", "4", "toy/lego/block/", ["rabbit", "pet", "animal"], "0010",
     "2000/01/01", "ken", "k", ["001", "003"], ["001", "003"], "000003", "a-b", ["a-b"],
     "60", "120", "04500", [("cool", 200), ("good", 100)]),
    ("2", "rectangle", "red", "2", "toy/lego/block/", ["dog", "pet", "poodle"], "0011",
     "2003/02/14", "igor", "i", ["002", "004"], ["002", "004"], "000010", "a-c-d",
     ["a-c-d", "a-b"], "50", "110", "08500", [("cool", 300), ("good", 200)]),
    ("3", "circle", "green", "3", "toy/lego/", ["rabbit", "cartoon", "funny"], "0230",
     "2001/12/25", "john", "j", ["007", "012"], ["007", "012"], "000015", "a-e",
     ["a-e", "a-b"], "35", "70", "06500", [("cool", 200)]),
    ("4", "circle", "blue", "1", "toy/", ["store", "pet", "animal"], "0913",
     "2004/11/24", "cathy", "c", ["007", "007"], ["007"], "000019", "a-c",
     ["a-c", "a-b"], "30", "75", "11200", []),
    ("5", "square", "blue", "5", "toy/lego/", ["cartoon", "funny", "disney"], "1013",
     "2002/03/08", "mike", "m", ["001", "001"], ["001", "001"], "000002", "a-e-f",
     ["a-e-f", "a-b"], "60", "120", "10500", []),
    ("6", "rectangle", "green", "6", "toy/lego/block/", ["funny", "humor", "joke"], "2130",
     "2007/08/01", "doug", "d", ["001", "002", "003"], ["001", "002", "003"], "000009",
     "a-c-d", ["a-c-d", "a-b"], "80", "-90", "08900", []),
    ("7", "square", "red", "7", "toy/lego/", ["humane", "dog", "rabbit"], "0005",
     "2006/06/01", "abe", "a", ["008", "003"], ["008", "003"], "000013", "a-c",
     ["a-c", "a-b"], "70", "-60", "28500", []),
]

_SCHEMA = (
    "id string, shape string, color string, size string, location string, "
    "tag array<string>, number string, date string, name string, char string, "
    "multinum array<string>, compactnum array<string>, numendorsers string, "
    "path string, multipath array<string>, latitude string, longitude string, "
    "salary string, multiwithweight array<struct<value string, weight int>>"
)


def bobo_docs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_ROWS, _SCHEMA)


def bobo_handlers() -> list:
    """≙ BoboTestCase.buildFieldConf (BoboTestCase.java:498-631)."""
    fmt3 = TermFormat.int_format("000")
    fmt4 = TermFormat.int_format("0000")
    fmt6 = TermFormat.int_format("000000")
    color = SimpleFacetHandler("color")
    shape = SimpleFacetHandler("shape")
    multinum = MultiValueFacetHandler("multinum", fmt3)
    name = SimpleFacetHandler("name")
    handlers = [
        SimpleFacetHandler("id"),
        color,
        shape,
        RangeFacetHandler("size", ["[* TO 4]", "[5 TO 8]", "[9 TO *]"]),
        RangeFacetHandler("numendorsers", ["[000000 TO 000005]", "[000006 TO 000010]",
                                           "[000011 TO 000020]"], fmt6),
        PathFacetHandler("location"),
        PathFacetHandler("path", separator="-"),
        PathFacetHandler("multipath", separator="-", multi=True),
        SimpleFacetHandler("number", fmt4),
        VirtualSimpleFacetHandler("virtual", lambda df: F.col("number"), fmt4),
        name,
        RangeFacetHandler("date", ["[2000/01/01 TO 2003/05/05]",
                                   "[2003/05/06 TO 2005/04/04]"]),
        SimpleFacetHandler("char"),
        MultiValueFacetHandler("tag"),
        multinum,
        MultiValueFacetHandler("diffname", fmt3, column="multinum"),
        MultiValueWithWeightFacetHandler("multiwithweight"),
        CompactMultiValueFacetHandler("compactnum", fmt3),
        RangeFacetHandler("latitude", ["[* TO 30]", "[35 TO 60]", "[70 TO 120]"]),
        RangeFacetHandler("longitude", ["[* TO 30]", "[35 TO 60]", "[70 TO 120]"]),
        GeoSimpleFacetHandler("distance", "latitude", "longitude"),
        GeoFacetHandler("correctDistance", "latitude", "longitude"),
        RangeFacetHandler("salary", ["[04000 TO 05999]", "[06000 TO 07999]",
                                     "[08000 TO 09999]", "[10000 TO *]"]),
        BucketFacetHandler("groups", {"g1": ["ken", "igor", "abe"],
                                      "g2": ["ken", "john", "mike"],
                                      "g3": ["john", "cathy"],
                                      "g4": ["doug"]}, depends=name),
        BucketFacetHandler("sets", {"s1": ["2", "3"], "s2": ["1", "4"],
                                    "s3": ["7", "8"]}, depends=multinum),
        HistogramFacetHandler("numberhisto", "number", 0, 5000, 100),
        SimpleGroupbyFacetHandler("groupby", ["color", "shape", "number"]),
    ]
    combo_deps = {"color": color, "shape": shape, "multinum": multinum}
    handlers.append(ComboFacetHandler("colorShape", {k: combo_deps[k] for k in ("color", "shape")}))
    handlers.append(ComboFacetHandler("colorShapeMultinum", combo_deps))
    return handlers
