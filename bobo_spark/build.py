"""Distributed inverted-index build job (the "BoboIndexer on Spark").

Pipeline (one snapshot; every stage is checkpointed in the catalog
manifest so a killed build resumes from the last completed stage —
the north rule's "resumable from Iceberg snapshot checkpoints"):

1. ``docs``     — extract text (if only html present), facet
   dictionaries (lang, warc_ts day bucket), doc table with facet
   ordinals. Dictionaries are value-sorted on first build; later
   snapshots append new values after the parent max ordinal so
   existing forward/posting data stays valid.
2. ``terms``    — global term dictionary (df, cf) + dense ``term_id``
   assigned by distributed two-pass sorted rank (lexicographic on
   first build; new terms append after parent max id → old postings
   never invalidated). Default (segment_local) pipeline counts terms
   straight off the tokenizer with map-side partials; the classic
   pipeline first materializes a ``pairs`` table (Arrow-vectorized
   tokenize → (doc_id, term, packed, segment) rows incl. facet
   sentinel pairs "\\x00field:ord" for the AdaptiveFacetFilter-style
   inverted access path) and aggregates that.
3. ``postings`` — segment_local (default): ONE wide shuffle of the
   raw text by doc range (driver-computed identity partition keys —
   no boundary-sampling pass when doc ids are dense), then tokenize +
   broadcast term-id map + packed-key sort + block encode inside each
   partition; per-doc forward data rides as pseudo runs (term_id=-1).
   Classic: pairs ⋈ terms → ``repartitionByRange(segment, term_id,
   doc_id)`` (sampled boundaries split a Zipf head term by doc range)
   → ``sortWithinPartitions`` → block encoder. Both emit the same
   self-contained blocks (docID-delta varbyte + tf/doclen/facet
   streams + block-max metadata): scoring and facet counting need no
   query-time joins.
4. ``forward``  — per-segment doc table (doclen, url, facet ordinals),
   the Bobo FacetDataCache analogue (facets/data/FacetDataCache.java:33-37).
5. ``meta``     — per-segment lineage: rows, bytes, term count,
   xxhash64 checksum + build metrics. Runs CONCURRENTLY with forward
   (both are small jobs over the postings output).
6. ``published`` — atomic manifest commit.

Block-max metadata stores ``(max_tf, min_dl)`` per block rather than a
float score bound: the query engine derives a *safe* upper bound from
current global stats (idf/avgdl drift across incremental snapshots can
only be handled this way — a stored float bound would go stale).

Reference parity: build path = index/BoboIndexer.java:40,73-86 +
facet load = facets/data/FacetDataCache.java:97-194, collapsed into
one batch job (SURVEY.md §3.3).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import IndexCatalog, Snapshot, read_table_pdf, write_table_pdf
from .codecs import (binary_array, binary_parts, compact_binary,
                     empty_binary_array, vb_encode_segmented)
from .extract import extract_text
from .tokenizer import term_freq_frame

POSTINGS_SCHEMA = (
    "segment long, term_id long, first_doc long, last_doc long, n_docs int, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, lang_bytes binary, "
    "ts_bytes binary, pos_bytes binary, max_tf int, min_dl int"
)


def _small_table_pdf(paths, max_bytes: int = 64 << 20, columns=None):
    """pyarrow-direct read (zero Spark jobs) when the table's on-disk
    size is under ``max_bytes``; None otherwise so the caller keeps the
    distributed path — the gate is exact (file sizes), never a guess,
    so web-scale dictionaries are unaffected."""
    total = 0
    ps = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    for pth in ps:
        if os.path.isdir(pth):
            total += sum(os.path.getsize(os.path.join(pth, f))
                         for f in os.listdir(pth) if f.endswith(".parquet"))
        elif os.path.exists(pth):
            total += os.path.getsize(pth)
        else:
            return None
    if total > max_bytes:
        return None
    return read_table_pdf(ps, columns=columns)


@dataclass
class BuildConfig:
    docs_per_segment: int = 25_000
    block_size: int = 128
    rows_per_posting_partition: int = 2_000_000  # (term,doc) pairs per shuffle partition
    broadcast_terms_threshold: int = 2_000_000  # broadcast dictionary below this
    ts_bucket: str = "day"
    # store per-posting token positions (delta varbyte; the positions
    # stream Lucene keeps for PhraseQuery). Off => pos_bytes empty and
    # phrase queries raise.
    store_positions: bool = True
    # section geometry for section search (requires store_positions):
    #   None               — no sections (section_search raises)
    #   ("window", W)      — section = token_pos // W; METADATA ONLY,
    #                        zero index bytes
    #   ("regex", pattern) — sections = text split on pattern; per-doc
    #                        boundary arrays land in a ``sections``
    #                        table (token starts, delta varbyte). The
    #                        per-DOC analogue of the reference's
    #                        per-occurrence section payloads
    #                        (search/section/TermNode.java:55-63).
    sections: tuple | None = None
    # posting construction pipeline:
    #   "pairs"         — classic: tokenize → materialized (doc,term)
    #                     pair table → range shuffle on (segment,
    #                     term_id, doc_id) → encode. Resumable at the
    #                     pair level; works for any dictionary size.
    #   "segment_local" — one wide shuffle of the RAW TEXT by doc
    #                     range; tokenize + term-id map (broadcast
    #                     dictionary) + sort + encode happen inside
    #                     each partition. Shuffles ~5× fewer bytes
    #                     (text instead of exploded pairs+positions)
    #                     and never materializes the pair table
    #                     (~30% faster measured at 50k docs);
    #                     requires the term dictionary to fit the
    #                     broadcast threshold (raises otherwise).
    #                     Forward doclen saturates at 65535 (the same
    #                     clamp BM25 scoring uses).
    #   "auto"          — segment_local while the dictionary fits
    #                     broadcast_terms_threshold, else pairs.
    pipeline: str = "auto"


def _segment_col(cfg: BuildConfig):
    return (F.col("doc_id") / F.lit(cfg.docs_per_segment)).cast("long").alias("segment")


def pack_meta(tf: np.ndarray, dl: np.ndarray, lang: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """tf<<40 | dl<<24 | lang<<16 | ts (tf<2^23, dl<2^16, lang<2^8, ts<2^16).

    doclen is CLAMPED at 65535 — BM25 length normalization saturates
    there (Lucene's 1-byte norms are far lossier), so a >64k-token web
    page scores as a 64k-token one instead of corrupting the packed
    word. tf / lang / ts overflow RAISES: silent wraparound would
    corrupt adjacent fields and miscount facets.
    """
    if tf.size:
        if int(tf.max()) >= 1 << 23:
            raise ValueError(f"tf {int(tf.max())} overflows the 23-bit field")
        if int(lang.max()) > 0xFF:
            raise ValueError(
                f"lang ordinal {int(lang.max())} overflows the 8-bit field (>255 languages)")
        if int(ts.max()) > 0xFFFF:
            raise ValueError(
                f"ts ordinal {int(ts.max())} overflows the 16-bit field (>65535 time buckets)")
    dl = np.minimum(dl, 0xFFFF)
    return (tf << 40) | (dl << 24) | (lang << 16) | ts


def unpack_meta(packed: np.ndarray):
    tf = packed >> 40
    dl = (packed >> 24) & 0xFFFF
    lang = (packed >> 16) & 0xFF
    ts = packed & 0xFFFF
    return tf, dl, lang, ts


# ---------------------------------------------------------------- stage: docs


def _dict_aggs(docs: DataFrame, cols: list[str]) -> dict[str, pd.DataFrame]:
    """Per-field (value, df, min_doc, max_doc) stats for ALL facet
    fields in ONE job: a stack() generator unpivots the fields, one
    tiny groupBy covers every dictionary."""
    stacked = docs.selectExpr(
        "doc_id",
        "stack({}, {}) AS (field, value)".format(
            len(cols), ", ".join(f"'{c}', {c}" for c in cols)),
    )
    agg = (
        stacked.groupBy("field", "value")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"))
        .toPandas()
    )
    return {
        c: agg[agg["field"] == c]
        .drop(columns="field")
        .sort_values("value", ignore_index=True)
        for c in cols
    }


def _build_dict(agg: pd.DataFrame, parent_dict: pd.DataFrame | None) -> pd.DataFrame:
    """Facet dictionary (ordinal, value, df, min_doc, max_doc) from the
    per-field stats frame.

    Value-sorted on first build (Bobo's sorted TermValueList,
    facets/data/TermValueList.java:114); incremental snapshots append
    new values after the parent max ordinal for forward-index
    stability.
    """
    if parent_dict is None or parent_dict.empty:
        agg.insert(0, "ordinal", np.arange(1, len(agg) + 1))  # ordinal 0 = missing (Bobo convention)
        return agg
    merged = parent_dict[["ordinal", "value"]].merge(agg, on="value", how="outer")
    new_mask = merged["ordinal"].isna()
    base = int(parent_dict["ordinal"].max()) if len(parent_dict) else 0
    merged.loc[new_mask, "ordinal"] = base + np.arange(1, new_mask.sum() + 1)
    merged["ordinal"] = merged["ordinal"].astype(np.int64)
    # merge df/min/max with parent stats
    p = parent_dict.set_index("value")
    merged = merged.set_index("value")
    for c, fn in (("df", "add"), ("min_doc", "min"), ("max_doc", "max")):
        if c in p.columns:
            a = merged[c].fillna(0 if c == "df" else np.nan)
            b = p[c].reindex(merged.index)
            if fn == "add":
                merged[c] = a.add(b, fill_value=0)
            elif fn == "min":
                merged[c] = pd.concat([a, b], axis=1).min(axis=1)
            else:
                merged[c] = pd.concat([a, b], axis=1).max(axis=1)
    out = merged.reset_index()[["ordinal", "value", "df", "min_doc", "max_doc"]]
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("ordinal").reset_index(drop=True)


# --------------------------------------------------------------- stage: terms


def assign_sorted_ids(terms: DataFrame, spark: SparkSession, id_base: int = 0, n_parts: int | None = None,
                      driver_threshold: int = 1_000_000,
                      as_pandas: bool = False,
                      max_rows_hint: int | None = None):
    """Dense ids by global sort order — distributed two-pass rank.

    Pass 1 counts rows per range partition; pass 2 assigns
    ``offset[partition] + local_index`` inside ``mapInPandas``. The
    result is partitioning-invariant (ids = global lexicographic rank)
    and never funnels through a single-partition window.

    r6: the input is persisted first — ``repartitionByRange``'s range
    sampling otherwise re-evaluates the entire upstream (for the build
    that was a SECOND tokenize pass over the corpus) — and
    dictionaries at or under ``driver_threshold`` rows (exact count,
    not a guess) take a driver-side sort instead: one count + one
    collect replaces sample + shuffle + counts + assign. Ranks are
    identical — pandas sorts by code point and Spark's UTF8String by
    UTF-8 bytes, and UTF-8 byte order IS code-point order.

    ``max_rows_hint``: a caller-known UPPER BOUND on the row count
    (e.g. the merge's parent dictionary size) lets the driver path
    skip the persist+count job and pull directly. ``as_pandas``: on
    the driver path return the pandas frame itself so small callers
    can write it with zero further Spark jobs (the distributed path
    always returns a DataFrame — check the type).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(terms.schema.fields) + [T.StructField("term_id", T.LongType(), False)]
    )
    pdf = None
    if max_rows_hint is not None and max_rows_hint <= driver_threshold:
        pdf = terms.toPandas()
        n_rows = len(pdf)
        if n_rows > driver_threshold:  # hint lied: bound driver memory
            pdf = None
    if pdf is None:
        terms = terms.persist()
        n_rows = terms.count()
    if n_rows <= driver_threshold:
        if pdf is None:
            pdf = terms.toPandas()
            terms.unpersist()
        pdf = pdf.sort_values("term", ignore_index=True)
        pdf = pdf[[f.name for f in out_schema.fields[:-1]]]
        pdf["term_id"] = id_base + np.arange(n_rows, dtype=np.int64)
        if as_pandas:
            return pdf
        return spark.createDataFrame(pdf, schema=out_schema)
    if n_parts is None:
        n_parts = max(8, spark.sparkContext.defaultParallelism)
    ranged = terms.repartitionByRange(n_parts, "term").sortWithinPartitions("term")
    ranged = ranged.persist()
    # Pass 1: per-range-partition row count + first term. Offsets are
    # keyed by the partition's first term (ranges are disjoint and
    # terms unique), NOT by TaskContext.partitionId() — task indexes
    # are stage-local and shift under plan composition (e.g. union).
    counts = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"), F.min("term").alias("first_term"))
        .orderBy("first_term")
        .collect()
    )
    terms.unpersist()  # ranged is materialized now; input cache done
    import bisect

    keys, offsets = [], []
    acc = id_base
    for r in counts:
        keys.append(r["first_term"])
        offsets.append(acc)
        acc += r["n"]
    from pyspark.sql import types as T

    # copy — StructType.add would mutate the DataFrame's cached schema
    schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("term_id", T.LongType(), False)]
    )
    b_keys = spark.sparkContext.broadcast((keys, offsets))

    def assign(batches):
        base = None
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if base is None:
                ks, offs = b_keys.value
                i = bisect.bisect_right(ks, pdf["term"].iloc[0]) - 1
                base = offs[i]
            pdf = pdf.copy()
            pdf["term_id"] = base + seen + np.arange(len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    out = ranged.mapInPandas(assign, schema=schema)
    return out


# ------------------------------------------------------------- stage: postings


def _encode_partition(batches, block_size: int):
    """Encode one sorted shuffle partition into posting block rows.

    Input rows are sorted by (segment, term_id, doc_id); runs are
    found vectorized via boundary diff. Each (segment, term) run is
    cut into blocks of ``block_size`` postings with five varbyte
    streams (doc deltas, tf, doclen, lang ordinal, ts ordinal) and
    (max_tf, min_dl) block-max metadata.
    """
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    seg = pdf["segment"].to_numpy(np.int64)
    tid = pdf["term_id"].to_numpy(np.int64)
    doc = pdf["doc_id"].to_numpy(np.int64)
    tf, dl, lo, to = unpack_meta(pdf["packed"].to_numpy(np.int64))
    n = len(pdf)
    # (segment, term) run boundaries, then block tiling — all vectorized
    boundary = np.flatnonzero((np.diff(seg) != 0) | (np.diff(tid) != 0))
    run_starts = np.concatenate(([0], boundary + 1))
    run_ends = np.concatenate((boundary + 1, [n]))
    run_lens = run_ends - run_starts
    nblk = -(-run_lens // block_size)  # ceil
    total_blocks = int(nblk.sum())
    rrep = np.repeat(np.arange(len(run_starts)), nblk)
    within = np.arange(total_blocks) - np.repeat(np.cumsum(nblk) - nblk, nblk)
    bstarts = run_starts[rrep] + within * block_size
    bends = np.minimum(bstarts + block_size, run_ends[rrep])
    nd = bends - bstarts
    # blocks tile [0, n) contiguously -> reduceat segments == blocks
    max_tf = np.maximum.reduceat(tf, bstarts)
    min_dl = np.minimum.reduceat(dl, bstarts)
    # positions stream: per-pair buffers are already delta-varbyte —
    # a block's stream is the byte-concatenation of its rows' buffers
    # (zero-copy when the column is Arrow-backed)
    pos_all, pos_offs = binary_parts(pdf["pos_bytes"])
    # docID deltas: diff within block, first-of-block dropped (stored raw)
    prev = np.empty_like(doc)
    prev[0] = 0
    prev[1:] = doc[:-1]
    delta = doc - prev
    is_start = np.zeros(n, dtype=bool)
    is_start[bstarts] = True
    doc_vals = delta[~is_start].astype(np.uint64)
    dstarts = np.cumsum(nd - 1) - (nd - 1)
    doc_buf, doc_off = vb_encode_segmented(doc_vals, dstarts)
    tf_buf, tf_off = vb_encode_segmented(tf.astype(np.uint64), bstarts)
    dl_buf, dl_off = vb_encode_segmented(dl.astype(np.uint64), bstarts)
    lo_buf, lo_off = vb_encode_segmented(lo.astype(np.uint64), bstarts)
    to_buf, to_off = vb_encode_segmented(to.astype(np.uint64), bstarts)
    # blocks tile [0, n) contiguously, so every per-block stream is a
    # contiguous slice of ONE encode buffer — emit each stream column
    # as an Arrow binary array over (offsets, buffer) directly; the
    # object-dtype alternative allocates 7 small bytes objects per
    # block (hundreds of thousands per partition), which dominated the
    # encode stage and throttled multi-worker scaling
    pos_block_offs = pos_offs[np.append(bstarts, n)]
    # binary_array degrades >2 GiB buffers to 64-bit-offset
    # large_binary so library-level callers keep working, but THIS
    # frame crosses mapInPandas with POSTINGS_SCHEMA's 32-bit binary
    # columns — surface the actionable error here instead of an
    # obscure Arrow serializer failure
    for nm, off in (("doc", doc_off), ("tf", tf_off), ("dl", dl_off),
                    ("lang", lo_off), ("ts", to_off),
                    ("pos", pos_block_offs)):
        if int(off[-1]) - int(off[0]) >= (1 << 31):
            raise ValueError(
                f"{nm} stream buffer exceeds 2 GiB in one partition — "
                "Spark's Arrow bridge needs 32-bit binary offsets; "
                "lower rows_per_posting_partition (BuildConfig)")
    res = pd.DataFrame(
        {
            "segment": seg[bstarts],
            "term_id": tid[bstarts],
            "first_doc": doc[bstarts],
            "last_doc": doc[bends - 1],
            "n_docs": nd.astype(np.int32),
            "doc_bytes": pd.Series(binary_array(doc_buf, doc_off)),
            "tf_bytes": pd.Series(binary_array(tf_buf, tf_off)),
            "dl_bytes": pd.Series(binary_array(dl_buf, dl_off)),
            "lang_bytes": pd.Series(binary_array(lo_buf, lo_off)),
            "ts_bytes": pd.Series(binary_array(to_buf, to_off)),
            "pos_bytes": pd.Series(binary_array(pos_all, pos_block_offs)),
            "max_tf": max_tf.astype(np.int32),
            "min_dl": min_dl.astype(np.int32),
        }
    )
    yield res


# ----------------------------------------------- segment-local pipeline (v2)


def _sentinel_stats(pdf: pd.DataFrame) -> list[pd.DataFrame]:
    """Per-batch (term, df, cf) partials for the facet sentinel terms
    ('\\x00field:ord', one occurrence per doc)."""
    out = []
    for fld, col in (("lang", "lang_ord"), ("ts", "ts_ord")):
        vc = pdf[col].value_counts()
        out.append(pd.DataFrame({
            "term": ("\x00" + fld + ":") + vc.index.astype(str),
            "df": vc.to_numpy(np.int64),
            "cf": vc.to_numpy(np.int64),
        }))
    return out


def _distinct_pair_codes(rows: np.ndarray, codes: np.ndarray,
                         bc: int, bd: int) -> np.ndarray:
    """``codes`` of the distinct (row, code) pairs — packed-key unique
    when the combined ranges fit 63 bits, structured-dtype unique
    beyond (the same width guard as term_freq_frame; an unguarded
    ``rows << bc`` would silently wrap and corrupt df counts)."""
    if bc + bd <= 63:
        dk = np.unique((rows << bc) | codes)
        return (dk & ((1 << bc) - 1)).astype(np.int64)
    pair = np.empty(rows.size, dtype=[("r", np.int64), ("c", np.int64)])
    pair["r"], pair["c"] = rows, codes
    return np.unique(pair)["c"].astype(np.int64)


def _term_stats_partial(batches):
    """Pass 1 of the segment-local pipeline: per-batch (term, df, cf)
    partials (text terms + facet sentinels). Map-side pre-aggregation:
    the global dictionary then costs one tiny groupBy over ~vocab rows
    per partition instead of a full pair shuffle. Positions are NOT
    computed here — pass 1 only needs counts."""
    from .tokenizer import flat_token_codes

    for pdf in batches:
        if not len(pdf):
            continue
        # straight off the code stream — no run table: cf = token
        # count per code; df = distinct (doc, code) pairs per code via
        # one packed-key unique (23% faster than building the tf frame)
        codes, uniq, doclens = flat_token_codes(pdf["text"])
        if len(uniq):
            cf_ = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
            bc = max(len(uniq) - 1, 0).bit_length()
            bd = max(len(pdf) - 1, 0).bit_length()
            rows = np.repeat(np.arange(len(pdf), dtype=np.int64), doclens)
            df_ = np.bincount(_distinct_pair_codes(rows, codes, bc, bd),
                              minlength=len(uniq)).astype(np.int64)
        else:
            cf_ = df_ = np.zeros(0, dtype=np.int64)
        agg = pd.DataFrame({"term": uniq, "df": df_, "cf": cf_})
        yield pd.concat([agg] + _sentinel_stats(pdf), ignore_index=True)


def _encode_segment_local(batches, cfg: BuildConfig, tmap_bc):
    """Pass 2 of the segment-local pipeline: consume one doc-range
    partition of RAW DOCS, tokenize (with positions), resolve term ids
    against the broadcast dictionary, in-memory lexsort by (segment,
    term_id, doc_id), and emit posting blocks via the shared block
    encoder — the only cluster-wide data movement was the text
    repartition that delivered these docs.

    Also emits one pseudo-posting run per segment with ``term_id=-1``
    whose (doc, dl, lang, ts) streams carry the per-doc forward data
    (doclen saturates at the 16-bit clamp) — the forward stage decodes
    these instead of re-aggregating pairs."""
    tmap = tmap_bc.value  # pandas (term, term_id)
    parts = []
    for pdf in batches:
        if not len(pdf):
            continue
        tf, uniq = term_freq_frame(pdf["doc_id"].to_numpy(np.int64),
                                   pdf["text"],
                                   positions=cfg.store_positions,
                                   term_codes=True)
        # ONE vocab-sized dictionary lookup per batch instead of a
        # per-run string map (runs outnumber the vocab ~50x)
        uniq_tid = pd.Series(np.asarray(uniq, dtype=object)).map(tmap)
        if uniq_tid.isna().any():
            missing = np.asarray(uniq, dtype=object)[
                uniq_tid.isna().to_numpy()][0]
            raise ValueError(
                f"term {missing!r} missing from the "
                "broadcast dictionary — pass-1 stats and pass-2 "
                "tokenization diverged (non-deterministic input?)")
        run_tids = uniq_tid.to_numpy(np.int64)[tf["tcode"].to_numpy(np.int64)]
        side = pdf[["doc_id", "lang_ord", "ts_ord", "segment"]].set_index("doc_id")
        tf = tf.join(side, on="doc_id")
        packed = pack_meta(tf["tf"].to_numpy(np.int64),
                           tf["doclen"].to_numpy(np.int64),
                           tf["lang_ord"].to_numpy(np.int64),
                           tf["ts_ord"].to_numpy(np.int64))
        text_rows = pd.DataFrame({
            "doc_id": tf["doc_id"].to_numpy(np.int64),
            "term_id": run_tids,
            "packed": packed,
            "segment": tf["segment"].to_numpy(np.int64),
            "pos_bytes": (tf["pos_bytes"].reset_index(drop=True)
                          if cfg.store_positions
                          else pd.Series(empty_binary_array(len(tf)))),
        })
        n = len(pdf)
        # facet sentinels (inverted access path for selections):
        # term ids resolved per UNIQUE ordinal, then gathered per row
        sent_packed = pack_meta(
            np.ones(n, dtype=np.int64), np.zeros(n, dtype=np.int64),
            pdf["lang_ord"].to_numpy(np.int64), pdf["ts_ord"].to_numpy(np.int64))
        sent_frames = []
        for fld, col in (("lang", "lang_ord"), ("ts", "ts_ord")):
            ords = pdf[col].to_numpy(np.int64)
            u_ords, inv = np.unique(ords, return_inverse=True)
            names = pd.Series([f"\x00{fld}:{o}" for o in u_ords])
            u_tids = names.map(tmap)
            if u_tids.isna().any():
                raise ValueError(
                    f"sentinel {names[u_tids.isna()].iloc[0]!r} missing "
                    "from the broadcast dictionary")
            sent_frames.append(pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "term_id": u_tids.to_numpy(np.int64)[inv],
                "packed": sent_packed,
                "segment": pdf["segment"].to_numpy(np.int64),
                "pos_bytes": pd.Series(empty_binary_array(n)),
            }))
        # pseudo forward run: term_id -1, one posting per doc, packed
        # carries (tf=1, doclen, lang, ts)
        dl_map = tf.drop_duplicates("doc_id").set_index("doc_id")["doclen"]
        dl = dl_map.reindex(pdf["doc_id"]).fillna(0).to_numpy(np.int64)
        fwd_packed = pack_meta(
            np.ones(n, dtype=np.int64), dl,
            pdf["lang_ord"].to_numpy(np.int64), pdf["ts_ord"].to_numpy(np.int64))
        fwd = pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(np.int64),
            "term_id": np.full(n, -1, dtype=np.int64),
            "packed": fwd_packed,
            "segment": pdf["segment"].to_numpy(np.int64),
            "pos_bytes": pd.Series(empty_binary_array(n)),
        })
        parts.append(pd.concat([text_rows] + sent_frames + [fwd],
                               ignore_index=True))
    if not parts:
        return
    allp = pd.concat(parts, ignore_index=True)
    seg = allp["segment"].to_numpy(np.int64)
    tid = allp["term_id"].to_numpy(np.int64)
    doc = allp["doc_id"].to_numpy(np.int64)
    # single-key packed sort when the per-partition ranges fit 63 bits
    # (they essentially always do: a partition spans few segments and
    # a bounded doc range) — one np.argsort over uint64 beats the
    # 3-key lexsort ~2-3× on the memory-bound sort that dominates the
    # encode stage; lexsort stays as the general fallback
    so, to, do_ = seg.min(), tid.min(), doc.min()
    bs = max(int(seg.max() - so), 0).bit_length()
    bt = max(int(tid.max() - to), 0).bit_length()
    bd = max(int(doc.max() - do_), 0).bit_length()
    if bs + bt + bd <= 63:
        key = (((seg - so) << (bt + bd)) | ((tid - to) << bd) | (doc - do_))
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((doc, tid, seg))
    allp = allp.iloc[order].reset_index(drop=True)
    yield from _encode_partition([allp], cfg.block_size)


def _decode_forward_runs(batches):
    """Decode the pseudo forward runs (term_id = -1) back into per-doc
    (doc_id, doclen) rows — one vectorized pass per partition."""
    from .codecs import vb_decode as _vbd

    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["segment", "first_doc"])
        nds = pdf["n_docs"].to_numpy(np.int64)
        firsts = pdf["first_doc"].to_numpy(np.int64)
        total = int(nds.sum())
        starts = np.cumsum(nds) - nds
        deltas = _vbd(b"".join(pdf["doc_bytes"])).astype(np.int64)
        vals = np.zeros(total, dtype=np.int64)
        mask = np.ones(total, dtype=bool)
        mask[starts] = False
        vals[mask] = deltas
        cums = np.cumsum(vals)
        docs = cums - np.repeat(cums[starts], nds) + np.repeat(firsts, nds)
        dl = _vbd(b"".join(pdf["dl_bytes"])).astype(np.int64)
        yield pd.DataFrame({"doc_id": docs, "doclen": dl})


def _identity_partition_keys(spark: SparkSession, n_parts: int) -> list[int]:
    """For each target partition i, an int key k_i with
    ``pmod(murmur3(k_i), n_parts) == i`` — so ``repartition(n, key)``
    places a DRIVER-computed partition index exactly, turning hash
    partitioning into explicit range partitioning with ZERO sampling
    pass (repartitionByRange would evaluate the whole child once just
    to sample boundaries). The probe asks Spark itself for its hash
    values (one tiny local job), so the mapping can never drift from
    the engine's Murmur3 seed/variant."""
    found: dict[int, int] = {}
    base = 0
    while len(found) < n_parts:
        cand = spark.range(base, base + n_parts * 20).select(
            F.col("id").cast("int").alias("k"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_parts)).alias("p"),
        ).collect()
        for r in cand:
            found.setdefault(r["p"], r["k"])
        base += n_parts * 20
    return [found[i] for i in range(n_parts)]


# ------------------------------------------------------------------ the build


def build_snapshot(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: BuildConfig | None = None,
    resume: bool = True,
    extra_stats: dict | None = None,
) -> Snapshot:
    """Build (or resume building) one index snapshot from a docs frame.

    ``docs`` must have columns (doc_id long, url string, warc_ts
    timestamp, lang string) and either ``text`` or ``html``; doc_ids
    must be new (greater than any previous snapshot's).

    ``extra_stats`` (e.g. a stream batch id) is stamped on the snapshot
    stats in the SAME manifest write that publishes it, so dedup
    markers and the publish commit are atomic.

    DETERMINISM REQUIREMENT (text-bearing inputs): when ``docs``
    already carries a ``text`` column, the doc table stays slim and
    the pairs stage re-evaluates the CALLER'S frame — the input plan
    must therefore be deterministic (no ``monotonically_increasing_id``
    doc_ids, no un-seeded ``rand``/``sample``/``limit`` upstream), or
    the doc table and the postings can disagree on the doc_id→text
    mapping. Reading from storage (parquet/Iceberg) is deterministic;
    for anything synthetic, ``persist()`` or checkpoint the frame
    first. html-only inputs are immune (text is materialized once).
    """
    cfg = cfg or BuildConfig()
    cat = IndexCatalog(index_dir)
    parent = cat.latest()
    snap = cat.pending() if resume else None
    if snap is None:
        snap = cat.begin_snapshot()
    sid = snap.snapshot_id
    _stage_t = [time.time()]

    def mark(name: str) -> None:
        """mark_stage + wall-time profile: per-stage seconds land in
        snap.stats['stage_secs'] (published with the manifest), the
        raw material for scaling work — no separate profiler run."""
        now = time.time()
        snap.stats.setdefault("stage_secs", {})[name] = round(now - _stage_t[0], 2)
        _stage_t[0] = now
        cat.mark_stage(snap, name)

    # text already a column => the doc table stays SLIM (ords + n_bytes,
    # no text rewrite — the pairs stage re-reads text from the caller's
    # frame). Only html-extracted text is materialized (extract once).
    have_text = "text" in docs.columns
    if not have_text:
        docs = docs.withColumn("text", extract_text("html"))
    ts_col = F.date_format(
        F.date_trunc(cfg.ts_bucket, "warc_ts"), "yyyy-MM-dd").alias("ts_bucket")

    docs_path = cat.table_path("_docs", sid)

    # ---- stage: docs + dictionaries -------------------------------------
    docs_pool = docs_fut = None
    if "docs" not in snap.stages:
        parent_lang = parent_ts = None
        if parent is not None:
            parent_lang = read_table_pdf(cat.table_paths(parent, "dict_lang"))
            parent_ts = read_table_pdf(cat.table_paths(parent, "dict_ts_bucket"))
        base = docs.select("doc_id", "url", "text", "lang", ts_col)
        # both dictionaries from ONE stacked aggregation job
        aggs = _dict_aggs(base.select("doc_id", "lang", "ts_bucket"),
                          ["lang", "ts_bucket"])
        # doc-id range of THIS batch (pre-merge aggs cover every doc):
        # lets the postings stage compute range-partition boundaries
        # driver-side instead of paying repartitionByRange's sampling
        # pass over the full text
        snap.stats["doc_min"] = int(aggs["lang"]["min_doc"].min())
        snap.stats["doc_max"] = int(aggs["lang"]["max_doc"].max())
        lang_dict = _build_dict(aggs["lang"], parent_lang)
        ts_dict = _build_dict(aggs["ts_bucket"], parent_ts)
        for name, d in (("dict_lang", lang_dict), ("dict_ts_bucket", ts_dict)):
            write_table_pdf(
                d.astype({"ordinal": "int64", "df": "int64",
                          "min_doc": "int64", "max_doc": "int64"}),
                cat.table_path(name, sid))
        lang_map = spark.createDataFrame(lang_dict[["ordinal", "value"]]).withColumnsRenamed(
            {"ordinal": "lang_ord", "value": "lang"}
        )
        ts_map = spark.createDataFrame(ts_dict[["ordinal", "value"]]).withColumnsRenamed(
            {"ordinal": "ts_ord", "value": "ts_bucket"}
        )
        keep_text = [] if have_text else ["text"]

        def _write_docs_table() -> float:
            t0 = time.time()
            (
                base.join(F.broadcast(lang_map), "lang")
                .join(F.broadcast(ts_map), "ts_bucket")
                .select("doc_id", "url", F.length("text").alias("n_bytes"),
                        "lang_ord", "ts_ord", _segment_col(cfg), *keep_text)
                .write.mode("overwrite")
                .parquet(docs_path)
            )
            return time.time() - t0

        if have_text:
            # guide §2.6 (overlap independent jobs): with a text-bearing
            # input the slim doc-table write feeds only the stats and
            # forward stages — the sections/terms jobs read the CALLER'S
            # frame plus the dictionaries written driver-direct above,
            # never docs_t, so the write runs concurrently with the
            # terms tokenize pass and its wall time disappears behind
            # it. html inputs keep the serial write (later stages read
            # the extracted text FROM docs_t).
            from concurrent.futures import ThreadPoolExecutor

            docs_pool = ThreadPoolExecutor(max_workers=1)
            # dict-aggregation wall up to the submit stays attributed to
            # the docs stage (added to the write secs at join time)
            docs_dict_secs = time.time() - _stage_t[0]
            docs_fut = docs_pool.submit(_write_docs_table)
            _stage_t[0] = time.time()  # next mark() times its own stage
        else:
            _write_docs_table()
            mark("docs")

    def _docs_table() -> DataFrame:
        """Join the overlapped doc-table write (if any) and read the
        table — called at the first point a stage needs docs_t."""
        nonlocal docs_pool, docs_fut
        if docs_fut is not None:
            secs = docs_fut.result()  # re-raises a failed write loud
            docs_fut = None
            docs_pool.shutdown()
            docs_pool = None
            snap.stats.setdefault("stage_secs", {})["docs"] = round(
                docs_dict_secs + secs, 2)
            cat.mark_stage(snap, "docs")
        return spark.read.parquet(docs_path)

    # Everything between the overlapped doc-table submit and the
    # serialization point below runs under a guard: a stage failure
    # must JOIN the in-flight write before propagating, or an
    # immediate same-process retry (resume) would race a second
    # write of docs_path against the leftover thread.
    try:
        # ---- stage: sections (regex mode only) --------------------------------
        # Per-doc section boundary arrays — written once per doc (tiny next
        # to postings); window-mode sections are pure position arithmetic
        # and need no table at all.
        sections_path = cat.table_path("sections", sid)
        if (cfg.sections and cfg.sections[0] == "regex"
                and "sections" not in snap.stages):
            if not cfg.store_positions:
                raise ValueError("sections require store_positions=True")
            pattern = cfg.sections[1]

            def to_sections(batches):
                from .tokenizer import section_starts_frame
                for pdf in batches:
                    if not len(pdf):
                        continue
                    out = section_starts_frame(
                        pdf["doc_id"].to_numpy(np.int64), pdf["text"], pattern)
                    out["segment"] = (pdf["doc_id"].to_numpy(np.int64)
                                      // cfg.docs_per_segment)
                    yield out

            sec_src = (docs.select("doc_id", "text") if have_text
                       else _docs_table().select("doc_id", "text"))
            sec_src.mapInPandas(
                to_sections,
                schema="doc_id long, n_secs int, sec_bytes binary, segment long",
            ).write.mode("overwrite").parquet(sections_path)
            mark("sections")

        # ---- pair source (both pipelines): (doc_id, text, ords, segment) ----
        if have_text:
            # slim-docs path: ords/segment recomputed from the caller's
            # frame + broadcast dict maps — text is never rewritten
            lang_map2 = (
                spark.read.parquet(cat.table_path("dict_lang", sid))
                .select(F.col("ordinal").alias("lang_ord"), F.col("value").alias("lang")))
            ts_map2 = (
                spark.read.parquet(cat.table_path("dict_ts_bucket", sid))
                .select(F.col("ordinal").alias("ts_ord"), F.col("value").alias("ts_bucket")))
            pair_src = (
                docs.select("doc_id", "text", "lang", ts_col)
                .join(F.broadcast(lang_map2), "lang")
                .join(F.broadcast(ts_map2), "ts_bucket")
                .select("doc_id", "text", "lang_ord", "ts_ord", _segment_col(cfg))
            )
        else:
            pair_src = _docs_table().select("doc_id", "text", "lang_ord", "ts_ord", "segment")

        want_v2 = cfg.pipeline in ("auto", "segment_local")

        # ---- stage: pairs (built lazily; classic pipeline / auto-fallback) ---
        # (tf, doclen, lang_ord, ts_ord) are bit-packed into ONE long
        # (tf<<40 | dl<<24 | lang<<16 | ts) — halves the bytes moved
        # through the posting shuffle, the build's dominant memory/IO cost.
        pairs_path = cat.table_path("_pairs", sid)

        def build_pairs_table():
            def to_pairs(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    tf = term_freq_frame(pdf["doc_id"].to_numpy(np.int64), pdf["text"],
                                         positions=cfg.store_positions)
                    side = pdf[["doc_id", "lang_ord", "ts_ord", "segment"]].set_index("doc_id")
                    tf = tf.join(side, on="doc_id")
                    packed = pack_meta(tf["tf"].to_numpy(np.int64),
                                       tf["doclen"].to_numpy(np.int64),
                                       tf["lang_ord"].to_numpy(np.int64),
                                       tf["ts_ord"].to_numpy(np.int64))
                    out = pd.DataFrame({
                        "doc_id": tf["doc_id"],
                        "term": tf["term"],
                        "packed": packed,
                        "segment": tf["segment"],
                        "pos_bytes": (tf["pos_bytes"].reset_index(drop=True)
                                      if cfg.store_positions
                                      else pd.Series(empty_binary_array(len(tf)))),
                    })
                    # facet-value sentinel postings ("\x00field:ord", tf=1):
                    # give selective facet selections an inverted access
                    # path (≙ AdaptiveFacetFilter's OR-of-TermDocIdSet,
                    # facets/filter/AdaptiveFacetFilter.java:56-90).
                    # '\x00' cannot collide with [a-z0-9]+ text tokens.
                    n = len(pdf)
                    sent_packed = pack_meta(
                        np.ones(n, dtype=np.int64), np.zeros(n, dtype=np.int64),
                        pdf["lang_ord"].to_numpy(np.int64), pdf["ts_ord"].to_numpy(np.int64))
                    sent = pd.concat([
                        pd.DataFrame({
                            "doc_id": pdf["doc_id"],
                            "term": ("\x00" + fld + ":") + pdf[col].astype(str),
                            "packed": sent_packed,
                            "segment": pdf["segment"],
                            "pos_bytes": pd.Series(empty_binary_array(len(pdf))),
                        })
                        for fld, col in (("lang", "lang_ord"), ("ts", "ts_ord"))
                    ], ignore_index=True)
                    both = pd.concat([out, sent], ignore_index=True)
                    both["pos_bytes"] = compact_binary(both["pos_bytes"])
                    yield both

            pairs_schema = "doc_id long, term string, packed long, segment long, pos_bytes binary"
            pair_src.mapInPandas(to_pairs, schema=pairs_schema).write.mode("overwrite").parquet(pairs_path)

        _pairs_cache: list = []

        def ensure_pairs() -> DataFrame:
            """Materialize the pair table on first need (classic pipeline,
            or auto-fallback when the dictionary outgrows broadcast)."""
            if not _pairs_cache:
                if "pairs" not in snap.stages:
                    build_pairs_table()
                    mark("pairs")
                _pairs_cache.append(spark.read.parquet(pairs_path))
            return _pairs_cache[0]

        TF = F.shiftright("packed", 40)

        # ---- stage: terms ----------------------------------------------------
        terms_path = cat.table_path("terms", sid)
        if "terms" not in snap.stages:
            if want_v2:
                # pass 1: tokenize-and-count partials, one tiny shuffle of
                # ~vocab rows per partition (no pair materialization)
                delta_terms = (
                    pair_src.mapInPandas(_term_stats_partial,
                                         schema="term string, df long, cf long")
                    .groupBy("term")
                    .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
                )
            else:
                delta_terms = ensure_pairs().groupBy("term").agg(
                    F.count("*").alias("df"), F.sum(TF).alias("cf")
                )
            if parent is not None:
                old = spark.read.parquet(*cat.table_paths(parent, "terms"))
                merged = (
                    delta_terms.join(old.withColumnsRenamed({"df": "df0", "cf": "cf0"}), "term", "full")
                    .select(
                        "term",
                        (F.coalesce("df", F.lit(0)) + F.coalesce("df0", F.lit(0))).alias("df"),
                        (F.coalesce("cf", F.lit(0)) + F.coalesce("cf0", F.lit(0))).alias("cf"),
                        F.col("term_id"),
                    )
                )
                known = merged.where(F.col("term_id").isNotNull())
                novel = merged.where(F.col("term_id").isNull()).drop("term_id")
                max_id = old.agg(F.max("term_id")).collect()[0][0] or -1
                novel_ids = assign_sorted_ids(novel, spark, id_base=max_id + 1)
                full = known.unionByName(novel_ids)
                full.write.mode("overwrite").parquet(terms_path)
            else:
                full = assign_sorted_ids(delta_terms, spark, id_base=0,
                                         as_pandas=True)
                if isinstance(full, pd.DataFrame):
                    # driver-resident dictionary: local parquet write, no
                    # round-trip through a scheduled Spark job
                    write_table_pdf(full, terms_path)
                else:
                    full.write.mode("overwrite").parquet(terms_path)
            mark("terms")

    except BaseException:
        if docs_fut is not None:
            import contextlib
            with contextlib.suppress(Exception):
                docs_fut.result()
            docs_pool.shutdown()
        raise

    terms = spark.read.parquet(terms_path)
    # serialization point for the overlapped doc-table write: stats and
    # forward both consume docs_t
    docs_t = _docs_table()

    # ---- stage: stats ----------------------------------------------------
    if "stats" not in snap.stages:
        agg = docs_t.select(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("bytes"),
        ).collect()[0]
        # corpus token count = Σ cf over the (merged) term dictionary —
        # a scan of the small terms table, not of the pairs; term count
        # rides the same job (reused by postings + publish, no re-count).
        # Facet sentinel terms ('\x00...') are NOT text tokens: exclude.
        tstats = _small_table_pdf(terms_path)
        if tstats is not None:  # small dictionary: zero-job aggregate
            tok_sum = int(tstats.loc[~tstats["term"].str.startswith("\x00"),
                                     "cf"].sum())
            n_terms_stat = len(tstats)
        else:
            trow = terms.agg(
                F.sum(F.when(~F.col("term").startswith("\x00"), F.col("cf"))).alias("tok"),
                F.count("*").alias("n_terms"),
            ).collect()[0]
            tok_sum = trow["tok"] or 0
            n_terms_stat = int(trow["n_terms"])
        n_docs = agg["n"] + (parent.stats["n_docs"] if parent else 0)
        snap.stats.update(
            {
                "n_docs": int(n_docs),
                "tok_sum": int(tok_sum),
                "avgdl": float(tok_sum) / max(1, n_docs),
                "new_docs": int(agg["n"]),
                "new_bytes": int(agg["bytes"] or 0),
                "n_terms": int(n_terms_stat),
                # recorded so the query planner can reject phrase
                # queries driver-side instead of failing in an executor
                "store_positions": bool(cfg.store_positions),
                # section geometry (JSON-serializable); the section
                # search planner reads this to pick window arithmetic
                # vs the per-doc boundary table
                "sections": list(cfg.sections) if cfg.sections else None,
            }
        )
        mark("stats")

    # ---- stage: postings -------------------------------------------------
    postings_path = cat.table_path("postings", sid)
    if "postings" not in snap.stages:
        # pair count ≈ distinct (doc,term) ≤ token count — stats are
        # already on the manifest, no extra count job
        n_pairs = snap.stats.get("tok_sum", 0) or 1
        n_parts = max(
            spark.sparkContext.defaultParallelism,
            math.ceil(n_pairs / cfg.rows_per_posting_partition),
        )
        n_terms = snap.stats.get("n_terms") or terms.count()
        use_v2 = want_v2 and n_terms <= cfg.broadcast_terms_threshold
        if want_v2 and not use_v2 and cfg.pipeline == "segment_local":
            raise ValueError(
                f"segment_local pipeline needs the term dictionary "
                f"({n_terms} terms) within broadcast_terms_threshold "
                f"({cfg.broadcast_terms_threshold}) — use 'auto' or "
                "'pairs' for web-scale dictionaries")
        if use_v2:
            # pass 2: ONE wide shuffle of the raw text by doc range;
            # tokenize + id-map + sort + encode all inside the
            # partition. The dictionary travels as a Spark broadcast.
            tmap_pd = _small_table_pdf(terms_path)
            if tmap_pd is not None:
                tmap_pd = tmap_pd[["term", "term_id"]]
            else:
                tmap_pd = terms.select("term", "term_id").toPandas()
            tmap_bc = spark.sparkContext.broadcast(
                tmap_pd.set_index("term")["term_id"])
            dmin = snap.stats.get("doc_min")
            dmax = snap.stats.get("doc_max")
            span = (dmax - dmin + 1) if dmin is not None else None
            if span and span <= 2 * max(1, snap.stats.get("new_docs", 0)):
                # dense doc ids: boundaries are pure arithmetic — skip
                # repartitionByRange's sampling pass (a full extra
                # evaluation of the text source) via identity keys
                keys = _identity_partition_keys(spark, n_parts)
                part = F.floor(
                    (F.col("doc_id") - F.lit(dmin)) * F.lit(n_parts)
                    / F.lit(span)).cast("int")
                pk = F.element_at(F.array(*[F.lit(k) for k in keys]), part + 1)
                src2 = (pair_src.withColumn("_pk", pk)
                        .repartition(n_parts, "_pk").drop("_pk"))
            else:
                # sparse/unknown id space: fall back to sampled ranges
                src2 = pair_src.repartitionByRange(n_parts, "doc_id")
            (
                src2.mapInPandas(
                    lambda it: _encode_segment_local(it, cfg, tmap_bc),
                    schema=POSTINGS_SCHEMA)
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        else:
            tmap = terms.select("term", "term_id")
            if n_terms <= cfg.broadcast_terms_threshold:
                tmap = F.broadcast(tmap)
            enriched = ensure_pairs().join(tmap, "term").select(
                "segment", "term_id", "doc_id", "packed", "pos_bytes"
            )
            (
                enriched.repartitionByRange(n_parts, "segment", "term_id", "doc_id")
                .sortWithinPartitions("segment", "term_id", "doc_id")
                .mapInPandas(lambda it: _encode_partition(it, cfg.block_size), schema=POSTINGS_SCHEMA)
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        mark("postings")

    # ---- stages: forward + meta (run CONCURRENTLY) ------------------------
    # both are small jobs over the postings output with mostly-fixed
    # driver/scheduling latency — overlapping them removes a fixed cost
    # that would otherwise deflate cluster-scaling efficiency
    forward_path = cat.table_path("forward", sid)
    meta_path = cat.table_path("meta", sid)

    def _run_forward() -> None:
        # same pipeline decision as the postings stage, recomputed so a
        # resume that skipped postings still picks the matching source
        n_terms = snap.stats.get("n_terms") or terms.count()
        if want_v2 and n_terms <= cfg.broadcast_terms_threshold:
            # doclen decoded from the pseudo forward runs written by
            # the encoder — no pair re-aggregation
            dl_df = (
                spark.read.parquet(postings_path)
                .where(F.col("term_id") == -1)
                .select("segment", "first_doc", "n_docs", "doc_bytes", "dl_bytes")
                .mapInPandas(_decode_forward_runs,
                             schema="doc_id long, doclen long")
            )
        else:
            dl_df = (
                ensure_pairs().where(~F.col("term").startswith("\x00"))
                .groupBy("doc_id").agg(F.sum(TF).alias("doclen"))
            )
        fwd_rows = docs_t.join(dl_df, "doc_id", "left").select(
            "segment",
            "doc_id",
            F.coalesce("doclen", F.lit(0)).alias("doclen"),
            "url",
            "lang_ord",
            "ts_ord",
        )
        nfp = max(8, spark.sparkContext.defaultParallelism)
        dmin_f = snap.stats.get("doc_min")
        dmax_f = snap.stats.get("doc_max")
        span_f = (dmax_f - dmin_f + 1) if dmin_f is not None else None
        if span_f and span_f <= 2 * max(1, snap.stats.get("new_docs", 0)):
            # dense ids: arithmetic range partitioning via identity
            # keys — repartitionByRange would evaluate the forward
            # join + pseudo-run decode a second time just to sample
            # boundaries (same trick as the postings text shuffle)
            fkeys = _identity_partition_keys(spark, nfp)
            fpart = F.floor((F.col("doc_id") - F.lit(dmin_f)) * F.lit(nfp)
                            / F.lit(span_f)).cast("int")
            fpk = F.element_at(F.array(*[F.lit(k) for k in fkeys]), fpart + 1)
            fwd_rows = (fwd_rows.withColumn("_pk", fpk)
                        .repartition(nfp, "_pk").drop("_pk"))
        else:
            fwd_rows = fwd_rows.repartitionByRange(nfp, "segment", "doc_id")
        (
            fwd_rows.sortWithinPartitions("segment", "doc_id")
            .write.mode("overwrite")
            .parquet(forward_path)
        )

    def _run_meta() -> None:
        post = spark.read.parquet(postings_path)
        (
            # pseudo forward runs (term_id=-1, segment_local pipeline)
            # are storage detail, not postings — keep lineage counts
            # pipeline-invariant
            post.where(F.col("term_id") >= 0)
            .groupBy("segment")
            .agg(
                F.sum("n_docs").alias("rows"),
                F.sum(
                    F.length("doc_bytes")
                    + F.length("tf_bytes")
                    + F.length("dl_bytes")
                    + F.length("lang_bytes")
                    + F.length("ts_bytes")
                ).alias("bytes"),
                F.countDistinct("term_id").alias("n_terms"),
                F.expr("bit_xor(xxhash64(term_id, first_doc, last_doc, n_docs))").alias("checksum"),
            )
            .withColumn("snapshot_id", F.lit(sid))
            .write.mode("overwrite")
            .parquet(meta_path)
        )

    need_fwd = "forward" not in snap.stages
    need_meta = "meta" not in snap.stages
    if need_fwd or need_meta:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            futs = []
            if need_fwd:
                futs.append(ex.submit(_run_forward))
            if need_meta:
                futs.append(ex.submit(_run_meta))
            for f in futs:
                f.result()
        if need_fwd:
            mark("forward")
        if need_meta:
            mark("meta")

    # ---- publish ----------------------------------------------------------
    if "published" not in snap.stages:
        snap.stats.update(extra_stats or {})
        if "n_terms" not in snap.stats:
            snap.stats["n_terms"] = terms.count()
        snap.stats["n_segments"] = int(
            len(read_table_pdf(meta_path))
            + (parent.stats.get("n_segments", 0) if parent else 0)
        )
        cumulative = {"terms": [terms_path], "dict_lang": [cat.table_path("dict_lang", sid)],
                      "dict_ts_bucket": [cat.table_path("dict_ts_bucket", sid)]}
        for t, p in (("postings", postings_path), ("forward", forward_path), ("meta", meta_path)):
            prev = cat.table_paths(parent, t) if parent else []
            cumulative[t] = prev + [p]
        if cfg.sections and cfg.sections[0] == "regex":
            prev = cat.table_paths(parent, "sections") if parent else []
            cumulative["sections"] = prev + [sections_path]
        # deletes are cumulative across snapshots (Lucene: an append
        # never resurrects tombstoned docs — only a merge purges them)
        if parent and "deletes" in parent.tables:
            cumulative["deletes"] = cat.table_paths(parent, "deletes")
            snap.stats["n_deleted"] = parent.stats.get("n_deleted", 0)
        snap.tables = cumulative
        cat.update_snapshot(snap)
        mark("published")
    return cat.get(sid)


# ------------------------------------------------------------------- deletes


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> Snapshot:
    """Soft-delete documents: publish a new snapshot whose cumulative
    ``deletes`` table carries the tombstoned doc ids
    (≙ IndexWriter.deleteDocuments + reader reopen in the reference's
    testBrowseWithDeletes, BoboTestCase.java:2142-2195).

    Lucene semantics on purpose: deleted docs stop matching queries
    and facet counts immediately, but df/cf/avgdl statistics are
    UNCHANGED until a future segment merge — exactly how Lucene scores
    against an index with deletions. All index tables are shared with
    the parent snapshot; the commit is one atomic manifest write, so
    open readers keep their snapshot and a reopen sees the deletes
    (commit/reopen cycle).

    ``doc_ids``: iterable of ids or a single-column DataFrame.

    Tombstones are stored PER SEGMENT as ``(segment, doc_id)`` —
    the analogue of Lucene's per-segment liveDocs bitsets
    (api/BoboSegmentReader.java): each query task only ever consults
    its own segment's delete set, so query cost never scales with the
    GLOBAL tombstone count. Ids absent from the index are dropped
    (deleting a nonexistent doc is a no-op, as in IndexWriter).
    """
    cat = IndexCatalog(index_dir)
    parent = cat.latest()
    if parent is None:
        raise ValueError(f"no published snapshot in {index_dir}")
    snap = cat.begin_snapshot()
    sid = snap.snapshot_id
    path = cat.table_path("deletes", sid)
    fwd_paths = cat.table_paths(parent, "forward")
    prev_paths = cat.table_paths(parent, "deletes")
    n_deleted = None
    if not isinstance(doc_ids, DataFrame):
        # Driver-direct fast path: the id list is ALREADY driver-
        # resident, so under the shared 64 MB small-table gate
        # (forward + cumulative deletes) the segment lookup is one
        # column-pruned pyarrow read and the publish is a local
        # parquet write — zero scheduled Spark jobs replacing ~4
        # fixed-latency ones. Web-scale forwards exceed the gate and
        # keep the distributed semi-join below; DataFrame inputs
        # always stay distributed (the ids may not fit the driver).
        ids = np.array(sorted({int(d) for d in doc_ids}), dtype=np.int64)
        fwd_pdf = _small_table_pdf(fwd_paths, columns=["segment", "doc_id"])
        prev_pdf = (_small_table_pdf(prev_paths, columns=["doc_id"])
                    if prev_paths else None)
        if fwd_pdf is not None and (not prev_paths or prev_pdf is not None):
            # same semantics as the semi-join: ids absent from the
            # index are dropped (delete-nonexistent is a no-op)
            mask = np.isin(fwd_pdf["doc_id"].to_numpy(np.int64), ids)
            new_pdf = (fwd_pdf.loc[mask, ["segment", "doc_id"]]
                       .astype({"segment": "int64", "doc_id": "int64"})
                       .sort_values(["segment", "doc_id"],
                                    ignore_index=True))
            write_table_pdf(new_pdf, path)
            alldel = new_pdf["doc_id"].to_numpy(np.int64)
            if prev_pdf is not None:
                alldel = np.concatenate(
                    [prev_pdf["doc_id"].to_numpy(np.int64), alldel])
            n_deleted = int(np.unique(alldel).size)
    if n_deleted is None:
        if isinstance(doc_ids, DataFrame):
            del_df = doc_ids.select(F.col(doc_ids.columns[0]).cast("long")
                                    .alias("doc_id")).distinct()
        else:
            del_df = spark.createDataFrame(
                [(int(d),) for d in sorted(set(doc_ids))], "doc_id long")
        # segment lookup: broadcast the (small) delete set against the
        # forward table — one pushed-down semi-join scan, no forward
        # shuffle
        fwd = spark.read.parquet(*fwd_paths)
        del_df = (fwd.select("segment", "doc_id")
                  .join(F.broadcast(del_df), "doc_id")
                  .select("segment", "doc_id"))
        (del_df.repartition("segment").sortWithinPartitions("segment", "doc_id")
         .write.mode("overwrite").parquet(path))
        n_deleted = int(
            spark.read.parquet(*(prev_paths + [path]))
            .select("doc_id").distinct().count())
    snap.stats = dict(parent.stats)
    snap.tables = dict(parent.tables)
    snap.tables["deletes"] = prev_paths + [path]
    snap.stats["n_deleted"] = n_deleted
    cat.update_snapshot(snap)
    cat.mark_stage(snap, "published")
    return cat.get(sid)
