"""bobo_spark — a PySpark-native faceted-search / inverted-index engine.

A from-scratch rebuild of the capabilities of mol-pl/bobo (Bobo Browse,
a Lucene-based faceted search engine) on Apache Spark:

* ``bobo_spark.build``   — distributed inverted-index build job
  (term dictionary, varbyte+block-max posting lists, facet forward
  indexes), resumable from snapshot checkpoints.
* ``bobo_spark.query``   — BM25 top-k query engine (conjunctive /
  disjunctive, block-max pruning, per-segment top-k + driver merge)
  with facet counts per hit set.
* ``bobo_spark.facets``  — Bobo-style browse semantics (selections,
  facet specs, multi-select counting, output shaping) executed as
  plain Spark DataFrame plans.
* ``bobo_spark.textops`` — large-scale text-pipeline operators
  (dedup: exact / MinHash-LSH / SimHash / n-gram Jaccard; language id;
  quality scoring; token counts; fingerprints).
* ``bobo_spark.simsearch`` — embedding similarity search (brute-force
  cosine top-k; LSH-bucketed approximate variant).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, with Arrow-vectorized pandas UDFs only where built-in
operators cannot express the semantics (posting codecs, BM25 scoring).
"""

__version__ = "0.1.0"
