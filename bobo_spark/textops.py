"""Large-scale text-pipeline operators (dedup, language id, quality,
token counts, fingerprints).

Filters, counts and joins are built-in Spark SQL expressions; the
hash-kernel inner loops (shingle minhash, simhash bit fold) run as
Arrow batch kernels in numpy — Catalyst evaluates higher-order
lambdas interpreted, which made them the dominant cost (guide §4.2).
Hash-dependent operators derive ALL hashes from md5 (hashlib ≡ Spark
``md5`` ≡ DuckDB ``md5`` bit-for-bit), so every operator here keeps an
exact cross-engine oracle.

Scale notes (10^12-doc corpus):
* exact dedup — one hash shuffle on md5(text); skew-free (hashes
  uniform).
* MinHash-LSH — signatures via a per-partition Arrow kernel (no
  explode, no shuffle; the output moves k longs per doc); the band
  join shuffles only (band_hash) keys, pairs are scored and
  threshold-filtered BEFORE the distinct so the dedup exchange
  carries survivors, not payloads; ``max_bucket_size`` caps
  degenerate buckets via min-id representative pairing.
* n-gram Jaccard — the exact variant (self-join on shingles) is the
  small-scale oracle; LSH is the scale path.
* SimHash — JVM md5 hashes + numpy bit fold, 64-bit hamming band join.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

TOKEN_PATTERN = "[a-z0-9]+"
MERSENNE31 = 2147483647


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor: round-robin repartition up to
    the session's core count when the source scan produced fewer
    splits (a single small parquet file otherwise runs the whole
    per-row stage on ONE task); never reduces existing parallelism,
    so large inputs (many splits) pass through shuffle-free."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


STOPWORDS_EN = [
    "the", "of", "and", "a", "to", "in", "is", "it", "for", "on",
    "that", "with", "as", "by", "at", "from", "or", "an", "be", "this",
]
LANG_WORDS = {
    "en": STOPWORDS_EN,
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "avec", "un", "une", "de"],
    "es": ["el", "la", "los", "las", "es", "no", "con", "un", "una", "por"],
}


def tokens(text_col: str = "text") -> Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


# ------------------------------------------------------------------ counting


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace and regex (BPE-ish pretoken) token counts per doc."""
    return _spread(df).select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(tokens(text_col)).cast("long").alias("re_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean token length,
    stopword ratio, distinct-token ratio, and a combined score."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    mean_tok_len = F.when(n_tok > 0, (F.aggregate(toks, F.lit(0).cast("double"),
                                                  lambda a, t: a + F.length(t))) / n_tok).otherwise(0.0)
    stop_ratio = F.when(n_distinct > 0, n_stop / n_distinct).otherwise(0.0)
    distinct_ratio = F.when(n_tok > 0, n_distinct / n_tok).otherwise(0.0)
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + stop_ratio * 0.2
    )
    return _spread(df).select(
        F.col(id_col),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def langid(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wordlist-overlap language id (n-gram-heuristic stand-in).

    predicted = language whose wordlist shares the most distinct
    tokens; ties and zero overlap -> 'und'. Deterministic pure
    function of the text."""
    toks = F.array_distinct(tokens(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_WORDS.items()
    }
    langs = list(LANG_WORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    # first language (in fixed order) achieving the unique max
    tie = sum([F.when(scores[lang] == best, 1).otherwise(0) for lang in langs], F.lit(0))
    for lang in reversed(langs):
        pred = F.when((best > 0) & (tie == 1) & (scores[lang] == best), lang).otherwise(pred)
    out = _spread(df).select(F.col(id_col), pred.alias("pred_lang"),
                    *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs])
    return out


# --------------------------------------------------------------- fingerprints


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Word n-gram shingles as strings (empty-safe)."""
    toks = tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 5) -> DataFrame:
    """Document fingerprint = min md5 over word n-gram shingles
    (winnowing-style min-hash fingerprint)."""
    sh = shingles(text_col, n)
    return _spread(df).select(
        F.col(id_col),
        F.array_min(F.transform(sh, F.md5)).alias("fingerprint"),
    )


def _shingle_hash(s: Column) -> Column:
    """60-bit integer hash of a shingle via md5 — identical in DuckDB:
    ('0x' || substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _minhash_params(k: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) for h_i(x) = (a_i x + b_i) mod p."""
    a, b = [], []
    x = 1
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        a.append(x % (MERSENNE31 - 1) + 1)
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        b.append(x % MERSENNE31)
    return a, b


# Default within-bucket expansion cap for the banded-LSH pair
# generators below. A degenerate bucket (a giant duplicate cluster at
# crawl scale) would otherwise expand O(c^2); past the cap, members
# pair only with the bucket's min-id representative (connectivity
# preserved — see _bucket_pairs). Pass max_bucket_size=None for the
# EXACT uncapped expansion (the oracle-equality variant).
DEFAULT_MAX_BUCKET_SIZE = 1000


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3, k: int = 16) -> DataFrame:
    """MinHash signature per doc: sig_i = min over shingles of
    (a_i * (h(s) mod p) + b_i) mod p, p = 2^31-1, h(s) = first 15 hex
    chars of md5(s) as an integer.

    r6: one Arrow batch kernel per partition (guide §4.2) — tokens are
    extracted by the same JVM regex, then shingle strings, md5
    (hashlib ≡ Spark md5 bit-for-bit) and the k permutation mins run
    vectorized in numpy int64 (exact integer arithmetic, so the DuckDB
    oracle equality is unchanged). Replaces the explode + k-min-agg
    formulation whose interpreted `transform(sequence, slice,
    concat_ws)` shingle builder dominated the operator (29.6 s of
    34.6 s at sf1.0, measured single-task); no explode, no shuffle —
    the output moves k longs per doc."""
    a, b = _minhash_params(k)
    a_arr = np.asarray(a, dtype=np.int64).reshape(1, k)
    b_arr = np.asarray(b, dtype=np.int64).reshape(1, k)
    id_type = dict(df.dtypes)[id_col]
    src = _spread(df).select(F.col(id_col), tokens(text_col).alias("_toks"))

    def kernel(batches):
        import pyarrow as pa

        md5 = hashlib.md5
        for batch in batches:
            ids = batch.column(0)
            toks_lists = batch.column(1).to_pylist()
            nrows = len(toks_lists)
            sigs = np.empty((nrows, k), dtype=np.int64)
            for r, tl in enumerate(toks_lists):
                if not tl:
                    tl = []
                if len(tl) >= n:
                    sh = [" ".join(tl[i:i + n]) for i in range(len(tl) - n + 1)]
                else:
                    sh = [" ".join(tl)]
                hs = np.fromiter(
                    (int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % MERSENNE31
                     for s in sh), dtype=np.int64, count=len(sh))
                sigs[r] = ((hs[:, None] * a_arr + b_arr) % MERSENNE31).min(axis=0)
            offs = pa.array((np.arange(nrows + 1) * k).astype(np.int32))
            lst = pa.ListArray.from_arrays(offs, pa.array(sigs.ravel()))
            yield pa.RecordBatch.from_arrays([ids, lst], [id_col, "minhash"])

    return src.mapInArrow(kernel, schema=f"{id_col} {id_type}, minhash array<bigint>")


def _bucket_pairs(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """REFERENCE formulation (join-based) of banded candidate pairing,
    retained for bench_extra's before/after reproduction — the shipped
    operators (minhash_lsh_pairs, simhash_neardup_pairs) now generate
    and score pairs inside a per-partition kernel instead, which
    evaluates the signature subtree once and needs no bucket-sizes
    join; the capped-bucket POLICY below (min-id representative
    pairing) is the contract both implementations share.

    Candidate pairs from a banded frame (id, sig, band, bucket) —
    NOT de-duplicated: a pair agreeing on several bands appears once
    per band. Callers compute their score (a pure function of the
    sigs, so duplicates score identically), apply the threshold, and
    ``distinct()`` the final NARROW projection (guide §2.3: shuffle
    keys and scores, not payloads).

    Uncapped: full within-bucket pairing (O(c²) per bucket — exact,
    the oracle variant). With ``max_bucket_size``: buckets larger than
    the cap are NOT expanded pairwise — each member pairs only with
    the bucket's min-id REPRESENTATIVE (O(c)), which preserves
    duplicate-cluster connectivity for dedup while bounding the worst
    bucket a 100-TB crawl's giant dup cluster can produce."""
    left = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
                         "band", "bucket")
    right = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                          "band", "bucket")
    if max_bucket_size is None:
        joined = left.join(right, ["band", "bucket"])
    else:
        sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("_bsz"))
        sized = banded.join(sizes, ["band", "bucket"])
        small = sized.where(F.col("_bsz") <= max_bucket_size)
        sl = small.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
                          "band", "bucket")
        sr = small.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                          "band", "bucket")
        big = sized.where(F.col("_bsz") > max_bucket_size)
        reps = big.groupBy("band", "bucket").agg(
            F.min("id").alias("id_a"), F.expr("min_by(sig, id)").alias("sig_a"))
        br = big.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                        "band", "bucket")
        joined = sl.join(sr, ["band", "bucket"]).unionByName(
            reps.join(br, ["band", "bucket"]))
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, k: int = 16, bands: int = 4,
                      threshold: float = 0.5,
                      max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Bands of r = k/bands rows; docs sharing any band bucket become
    candidates; est_jaccard = matching signature fraction; pairs kept
    at est_jaccard >= threshold. ``max_bucket_size`` caps
    within-bucket expansion via min-id representative pairing (the
    ``_bucket_pairs`` policy) — capped by DEFAULT (the scale-safe
    path); pass None for the exact uncapped oracle variant.

    r6: candidates are generated and scored INSIDE a per-(band,
    bucket) pandas kernel instead of a bucket self-join — one exchange
    moves each (id, sig) once per band, the signature kernel upstream
    is evaluated ONCE (the join evaluated it per branch), and the
    capped path needs no bucket-sizes join. The kernel's match count
    over the same int64 signatures reproduces the previous
    ``zip_with`` comparison exactly; it pre-filters at threshold minus
    the round-off bound (6e-5 > the 5e-5 a 4-decimal HALF_UP round
    can move a value) and the authoritative
    ``round(est,4) >= threshold`` filter stays a Spark expression, so
    results are identical to the join formulation (oracle-verified)."""
    import pandas as pd

    r = k // bands
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    id_type = dict(df.dtypes)[id_col]
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col("minhash").alias("sig"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.md5(F.concat_ws(",", F.transform(
                        F.slice(F.col("minhash"), bi * r + 1, r), lambda x: x.cast("string")
                    ))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    margin = threshold - 6e-5
    kf = float(k)
    nbands = bands

    def part_pairs(batches):
        # one kernel invocation per shuffle PARTITION (mapInPandas,
        # not per-group applyInPandas): singleton buckets — the vast
        # majority — are skipped by a vectorized size mask instead of
        # each paying a per-group Arrow dispatch (measured ~1 ms each
        # at 20k multi-member buckets)
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if not len(pdf):
            return
        bcodes = pd.factorize(pdf["bucket"])[0].astype(np.int64)
        gcode = bcodes * nbands + pdf["band"].to_numpy(np.int64)
        ids = pdf["id"].to_numpy()
        order = np.lexsort((ids, gcode))
        ids = ids[order]
        gc = gcode[order]
        bnd = np.flatnonzero(np.diff(gc) != 0) + 1
        gstarts = np.concatenate(([0], bnd))
        gends = np.concatenate((bnd, [len(gc)]))
        sizes = gends - gstarts
        multi = np.flatnonzero(sizes >= 2)
        if not len(multi):
            return
        S_all = np.stack(pdf["sig"].to_numpy()[order]).astype(
            np.int64, copy=False)
        out_a, out_b, out_e = [], [], []
        for gi in multi:
            s0, e0 = gstarts[gi], gends[gi]
            c = int(e0 - s0)
            gids = ids[s0:e0]
            S = S_all[s0:e0]
            if max_bucket_size is not None and c > max_bucket_size:
                # representative pairing: min-id row vs every other
                est = (S[0:1] == S[1:]).sum(axis=1) / kf
                keep = est >= margin
                if keep.any():
                    out_a.append(np.repeat(gids[0], int(keep.sum())))
                    out_b.append(gids[1:][keep])
                    out_e.append(est[keep])
            elif c <= 512:
                ia, ib = np.triu_indices(c, k=1)
                est = (S[ia] == S[ib]).sum(axis=1) / kf
                keep = est >= margin
                if keep.any():
                    out_a.append(gids[ia[keep]])
                    out_b.append(gids[ib[keep]])
                    out_e.append(est[keep])
            else:
                # big uncapped bucket (oracle variant — O(c²) BY
                # SPEC): per-anchor rows instead of one triu block, so
                # the temp is O(c·k), never a multi-GB c²-wide array
                for a0 in range(c - 1):
                    est = (S[a0:a0 + 1] == S[a0 + 1:]).sum(axis=1) / kf
                    keep = est >= margin
                    if keep.any():
                        out_a.append(np.repeat(gids[a0], int(keep.sum())))
                        out_b.append(gids[a0 + 1:][keep])
                        out_e.append(est[keep])
        if out_a:
            yield pd.DataFrame({"id_a": np.concatenate(out_a),
                                "id_b": np.concatenate(out_b),
                                "est_jaccard": np.concatenate(out_e)})

    pairs = banded.repartition("band", "bucket").mapInPandas(
        part_pairs,
        schema=f"id_a {id_type}, id_b {id_type}, est_jaccard double")
    return (
        pairs.select("id_a", "id_b",
                     F.round("est_jaccard", 4).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via shingle self-join.

    The exact (oracle) variant — at corpus scale use minhash_lsh_pairs;
    ``max_shingle_df`` drops ubiquitous shingles to bound the join."""
    sh = _spread(df).select(F.col(id_col).alias("id"),
                   F.explode(F.array_distinct(shingles(text_col, n))).alias("s"))
    if max_shingle_df:
        keep = sh.groupBy("s").count().where(F.col("count") <= max_shingle_df).select("s")
        sh = sh.join(keep, "s")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "s")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4)
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash from md5-derived token bits.

    bit_i(doc) = 1 iff Σ over distinct tokens of (2*((h(t)>>i)&1)-1) > 0.

    r6: the md5-derived token hashes stay a JVM expression (cheap,
    codegen'd), but the 60-bit-counter fold — previously an interpreted
    `aggregate` HOF allocating a fresh 60-array per token, 13.3 s
    single-task at sf1.0 — is now one vectorized numpy pass per Arrow
    batch (guide §4.2). Pure integer arithmetic, bit-identical output;
    a null token array still yields a null simhash."""
    id_type = dict(df.dtypes)[id_col]
    src = _spread(df).select(
        F.col(id_col),
        F.transform(F.array_distinct(tokens(text_col)), _shingle_hash).alias("_hs"))

    def kernel(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            hs = batch.column(1)
            nrows = len(hs)
            lens = hs.value_lengths().to_numpy(zero_copy_only=False)
            null_mask = np.asarray(hs.is_null().to_numpy(
                zero_copy_only=False), dtype=bool)
            lens = np.where(null_mask, 0, lens).astype(np.int64)
            offs = np.concatenate([[0], np.cumsum(lens)])
            flat = hs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            sim = np.zeros(nrows, dtype=np.int64)
            for i in range(60):
                contrib = (((flat >> i) & 1) * 2 - 1)
                cs = np.concatenate([[0], np.cumsum(contrib)])
                row = cs[offs[1:]] - cs[offs[:-1]]
                sim |= (row > 0).astype(np.int64) << i
            out = pa.array(sim, mask=null_mask) if null_mask.any() else pa.array(sim)
            yield pa.RecordBatch.from_arrays([ids, out], [id_col, "simhash"])

    return src.mapInArrow(kernel, schema=f"{id_col} {id_type}, simhash bigint")


def simhash_neardup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                          max_hamming: int = 3,
                          max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation via 4 15-bit bands (a pair within hamming 3
    must agree on ≥1 band), exact popcount filter after.
    ``max_bucket_size`` caps within-bucket expansion (min-id
    representative fallback, see ``_bucket_pairs``) — capped by
    DEFAULT; pass None for the exact uncapped oracle variant."""
    import pandas as pd

    sig = simhash64(df, id_col, text_col)
    id_type = dict(df.dtypes)[id_col]
    banded = sig.select(
        F.col(id_col).alias("id"), F.col("simhash").alias("sig"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", 15 * i).bitwiseAND(F.lit(0x7FFF)).alias("bucket"))
            for i in range(4)
        ])).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    # null simhash (null text) never matches anything (the old join's
    # `null <= max_hamming` filter dropped such pairs); filtering
    # BEFORE the Python boundary also keeps the sig column non-null
    # int64 in pandas (a nullable bigint would arrive as float64 and
    # lose 60-bit precision)
    banded = banded.where(F.col("sig").isNotNull())

    # r6: per-partition pandas kernel (mapInPandas over one
    # (band, bucket) hash exchange) instead of a bucket self-join —
    # the signature subtree is evaluated once, no bucket-sizes join on
    # the capped path, and singleton buckets are skipped by a
    # vectorized size mask (see minhash_lsh_pairs). popcount(xor) over
    # the same int64 simhashes is exact integer arithmetic — identical
    # to Spark's bit_count — and the authoritative hamming filter
    # stays a Spark expression.
    def part_pairs(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if not len(pdf):
            return
        gcode = (pdf["bucket"].to_numpy(np.int64) * 4
                 + pdf["band"].to_numpy(np.int64))
        ids = pdf["id"].to_numpy()
        order = np.lexsort((ids, gcode))
        ids = ids[order]
        gc = gcode[order]
        s_all = pdf["sig"].to_numpy()[order].astype(np.int64, copy=False)
        bnd = np.flatnonzero(np.diff(gc) != 0) + 1
        gstarts = np.concatenate(([0], bnd))
        gends = np.concatenate((bnd, [len(gc)]))
        multi = np.flatnonzero(gends - gstarts >= 2)
        if not len(multi):
            return
        out_a, out_b, out_h = [], [], []

        def popcount(x):
            return np.unpackbits(
                x.astype(np.uint64).view(np.uint8).reshape(-1, 8),
                axis=1).sum(axis=1).astype(np.int32)

        for gi in multi:
            s0, e0 = gstarts[gi], gends[gi]
            c = int(e0 - s0)
            gids = ids[s0:e0]
            s = s_all[s0:e0]
            if max_bucket_size is not None and c > max_bucket_size:
                ham = popcount(np.bitwise_xor(s[0], s[1:]))
                keep = ham <= max_hamming
                if keep.any():
                    out_a.append(np.repeat(gids[0], int(keep.sum())))
                    out_b.append(gids[1:][keep])
                    out_h.append(ham[keep])
            elif c <= 1024:
                ia, ib = np.triu_indices(c, k=1)
                ham = popcount(np.bitwise_xor(s[ia], s[ib]))
                keep = ham <= max_hamming
                if keep.any():
                    out_a.append(gids[ia[keep]])
                    out_b.append(gids[ib[keep]])
                    out_h.append(ham[keep])
            else:
                # big uncapped bucket (oracle variant — O(c²) BY
                # SPEC): per-anchor rows bound the temp to O(c), never
                # a c²-wide pair block (15-bit simhash bands collide by
                # construction, so giant buckets are reachable even
                # without giant dup clusters)
                for a0 in range(c - 1):
                    ham = popcount(np.bitwise_xor(s[a0], s[a0 + 1:]))
                    keep = ham <= max_hamming
                    if keep.any():
                        out_a.append(np.repeat(gids[a0], int(keep.sum())))
                        out_b.append(gids[a0 + 1:][keep])
                        out_h.append(ham[keep])
        if out_a:
            yield pd.DataFrame({"id_a": np.concatenate(out_a),
                                "id_b": np.concatenate(out_b),
                                "hamming": np.concatenate(out_h)})

    pairs = banded.repartition("band", "bucket").mapInPandas(
        part_pairs, schema=f"id_a {id_type}, id_b {id_type}, hamming int")
    return (
        pairs.select("id_a", "id_b",
                     F.col("hamming").cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: (text_hash, keeper_id,
    n_dups). One uniform hash shuffle — the canonical 100-TB dedup."""
    return (
        _spread(df).groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )
