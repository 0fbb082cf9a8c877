"""Document deduplication operators for training-data pipelines.

All algorithms are pure DataFrame programs (no Python UDFs) and share a
portable hashing scheme — md5 hex strings — so DuckDB oracles can mirror
them bit-for-bit:

* exact dedup: hash-groupBy on md5(text) — one shuffle, map-side combine.
* MinHash+LSH: shingle -> P minhash signatures (min over md5(j:shingle)
  strings) -> bands -> bucket self-join for candidates -> exact Jaccard
  verification. The candidate join is the only O(pairs) step and is
  bounded by band-bucket sizes, which is the point of LSH at 100 TB.
* SimHash: per-token md5 nibbles vote on 16 signature bits.
* n-gram Jaccard: shingle-overlap self-join with a shared-shingle block.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.text import shingles, tokens

N_PERM = 12
BAND_SIZE = 3


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("_toks", tokens(F.col(text_col)))


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact-duplicate clusters: (text_hash, n_docs, representative)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("representative"))
        .filter(F.col("n_docs") > 1)
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Small-file inputs arrive as 1-2 partitions (a parquet row group
    is unsplittable); fan out before per-row compute so tokenize/md5
    use every core. Only repartitions when the scan is under-parallel —
    Catalyst never elides a user Repartition node, so on pre-partitioned
    production inputs an unconditional repartition would add a full
    extra shuffle of the text corpus."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() >= par:
        return docs
    return docs.repartition(par)


def shingle_rows(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, pos, shingle) built relationally: posexplode the token
    array, then window lead() to stitch k consecutive tokens.

    Why not the array-HOF `shingles()` column function here: Catalyst
    collapses projections, inlining tokens(text) into the transform's
    per-element element_at calls, and higher-order functions evaluate
    interpreted — re-tokenizing per element, O(n^2) per document
    (measured 10x slower on the corpus bench). posexplode evaluates the
    token array once per row and the window runs in whole-stage
    codegen.

    The explicit fan-out BEFORE posexplode matters: tokenization runs
    map-side in the scan stage, and a compact parquet input reads as
    1-2 partitions — without the repartition the expensive tokenize
    would serialize regardless of cluster size."""
    tok = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    return (
        tok.select(
            "doc_id", "pos",
            *[p.alias(f"_p{j}") for j, p in enumerate(parts)],
        )
        .filter(F.col(f"_p{k - 1}").isNotNull())
        .select(
            "doc_id", "pos",
            F.concat_ws(" ", *[F.col(f"_p{j}") for j in range(k)]).alias("shingle"),
        )
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct (doc, shingle) pairs; docs shorter than k tokens drop out."""
    return shingle_rows(docs, id_col, text_col, k).select(
        "doc_id", "shingle"
    ).distinct()


MINHASH_MOD = 2147483647  # 2^31 - 1; a*(H%M)+b stays < 2^62 (exact in both engines)

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants) — used
    only on the DRIVER to derive permutation coefficients."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def minhash_perm_coeffs(n_perm: int = N_PERM):
    """Per-permutation (a_j, b_j) for h_j = (a_j*(H%M) + b_j) % M.
    Derived pseudo-randomly per j via splitmix64 so the family is
    approximately pairwise independent (tiny structured multipliers like
    a=2j+1 make the signature rows strongly correlated and bias the
    Jaccard estimate); a_j != 0, both < M, deterministic on both the
    Spark and DuckDB oracle side."""
    a = [(_splitmix64(2 * j) % (MINHASH_MOD - 1)) + 1 for j in range(n_perm)]
    b = [_splitmix64(2 * j + 1) % MINHASH_MOD for j in range(n_perm)]
    return a, b


def minhash_signatures(sh: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, j, minhash) — universal-hash MinHash: each shingle is
    md5-hashed ONCE (the expensive step), then the j-th permutation is
    h_j = (a_j * (H % M) + b_j) % M over H = the md5's first 13 hex
    digits (52 bits, exact in BIGINT and DOUBLE — mirrors bit-for-bit in
    the DuckDB oracle) with splitmix64-derived coefficients (see
    minhash_perm_coeffs). Hashing per (shingle, permutation) — the naive
    formulation — costs n_perm times more md5 work and dominated the
    whole dedup pipeline."""
    a_c, b_c = minhash_perm_coeffs(n_perm)
    a_arr = F.array(*[F.lit(x).cast("bigint") for x in a_c])
    b_arr = F.array(*[F.lit(x).cast("bigint") for x in b_c])
    base = sh.select(
        "doc_id",
        (F.conv(F.substring(F.md5(F.col("shingle")), 1, 13), 16, 10)
         .cast("bigint") % MINHASH_MOD).alias("_h"),
    )
    perms = F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("j")
    return (
        base.select("doc_id", "_h", perms)
        .select(
            "doc_id", "j",
            ((F.element_at(a_arr, F.col("j") + 1) * F.col("_h")
              + F.element_at(b_arr, F.col("j") + 1))
             % MINHASH_MOD).alias("h"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("minhash"))
    )


def _pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Bucket-join docs sharing any (band, band_hash)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(sigs: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """Band signatures and bucket-join docs sharing any band."""
    bands = (
        sigs.withColumn("band", F.col("j") - (F.col("j") % band_size))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("", F.sort_array(
            F.collect_list(F.concat_ws("=", F.col("j"), F.col("minhash")))
        ))).alias("band_hash"))
    )
    return _pairs_from_bands(bands)


def minhash_doc_profiles(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3,
                         n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, s, mh0..mh{n-1}) — the WHOLE per-doc MinHash state
    computed map-side in one scan: distinct shingle set ``s`` (array),
    and every permutation's minhash via an array fold. No window sort,
    no groupBy, no collect_set — per-doc state never crosses the
    network, which is what makes MinHash scale: the only shuffles left
    in the pipeline are the (tiny) band bucket join and the verify
    joins.

    The token array is persisted before the shingle transform: array
    HOFs referencing a *projected expression* get it inlined per
    element by Catalyst's projection collapse (re-tokenizing per
    shingle, O(n^2) per doc); a cached relation's column is an
    attribute, evaluated once. Docs with fewer than k tokens drop out
    (empty shingle set), as in the relational formulation."""
    tok = _spread(docs).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    ).persist()
    a_c, b_c = minhash_perm_coeffs(n_perm)
    prof = tok.select(
        "doc_id", F.array_distinct(shingles(F.col("_t"), k)).alias("s")
    ).filter(F.size("s") > 0)
    H = F.transform(
        F.col("s"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 13), 16, 10)
        .cast("bigint") % MINHASH_MOD,
    )
    prof = prof.withColumn("_H", H)
    def _fold(j):
        # factory closure: F.aggregate reads the lambda's arity, so the
        # usual `j=j` default-arg capture would add a third parameter
        return lambda acc, x: F.least(
            acc, (F.lit(a_c[j]) * x + F.lit(b_c[j])) % MINHASH_MOD)

    mh = [
        F.aggregate("_H", F.lit(MINHASH_MOD).cast("bigint"), _fold(j))
        .alias(f"mh{j}")
        for j in range(n_perm)
    ]
    return prof.select("doc_id", "s", *mh)


def _bands_from_profiles(prof: DataFrame, n_perm: int = N_PERM,
                         band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band, band_hash) rows from wide profiles — map-side
    explode, no aggregation; band_hash formula identical to
    ``lsh_candidate_pairs`` (md5 of the sorted "j=minhash" strings)."""
    band_structs = []
    for b0 in range(0, n_perm, band_size):
        parts = F.sort_array(F.array(*[
            F.concat_ws("=", F.lit(j), F.col(f"mh{j}"))
            for j in range(b0, min(b0 + band_size, n_perm))
        ]))
        band_structs.append(F.struct(
            F.lit(b0).alias("band"),
            F.md5(F.concat_ws("", parts)).alias("band_hash"),
        ))
    return prof.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_b")
    ).select("doc_id", "_b.band", "_b.band_hash")


def jaccard_verify(pairs: DataFrame, sh: DataFrame,
                   threshold: float = 0.7) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only.

    Physical shape: each doc's (distinct) shingles are packed into ONE
    array row, candidate pairs join against two array columns, and the
    intersection is a JVM hash-set op (array_intersect) per pair. The
    relational alternative — explode pairs x shingles and re-join on
    (doc, shingle) — shuffles |pairs| * |avg shingles| tiny rows
    (hundreds of millions at corpus scale) and dominated the whole
    dedup pipeline; this shape shuffles |pairs| wide rows instead."""
    # collect_set dedups per doc inside a small-group aggregation, so
    # callers may pass raw (non-distinct) shingle rows — a corpus-wide
    # distinct() is a 10^7+-key hash agg whose allocation pressure
    # serializes on a shared heap and is avoided entirely.
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("s"))
    sets = sets.withColumn("n", F.size("s"))
    return jaccard_verify_sets(pairs, sets, threshold)


def jaccard_verify_sets(pairs: DataFrame, sets: DataFrame,
                        threshold: float = 0.7) -> DataFrame:
    """``jaccard_verify`` over pre-built per-doc shingle arrays
    (doc_id, s[, n])."""
    if "n" not in sets.columns:
        sets = sets.withColumn("n", F.size("s"))
    pa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("s").alias("_sa"), F.col("n").alias("na"))
    pb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("s").alias("_sb"), F.col("n").alias("nb"))
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("i", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_lsh_dups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", threshold: float = 0.7) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: (doc_a, doc_b, jaccard).

    Physical shape (the 100 TB one): per-doc profiles — shingle set +
    all minhashes — are computed MAP-SIDE in one scan and persisted;
    bands are a map-side explode of the wide minhash columns. The only
    shuffles in the whole pipeline are the band bucket self-join
    (4 small rows per doc) and the two verify joins (|pairs| rows).
    Earlier relational formulations shuffled the full shingle stream
    three times (window sort, signature groupBy, verify collect_set)
    and were memory-bandwidth-bound instead of CPU-bound."""
    prof = minhash_doc_profiles(docs, id_col, text_col).persist()
    pairs = _pairs_from_bands(_bands_from_profiles(prof)).persist()
    return jaccard_verify_sets(pairs, prof.select("doc_id", "s"), threshold)


def corpus_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash) — a corpus snapshot's exact-dedup index. In a
    production pipeline this is materialized once per snapshot (a
    parquet/Iceberg table bucketed by text_hash) and extended
    incrementally; only ever keys, never text, so the index is ~1/1000
    the corpus size."""
    return docs.select(F.md5(F.col(text_col)).alias("text_hash")).dropDuplicates()


def dedup_new_against_index(new_docs: DataFrame, index: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Incremental exact dedup: surviving rows of a NEW batch against a
    prior corpus index (``corpus_fingerprints`` output) — (id, text_hash)
    where the batch's min id represents each novel text.

    This is the operation a continuously-ingesting corpus actually
    runs: the already-cleaned 100 TB corpus is never rescanned — the
    new batch is fingerprinted map-side, anti-joined against the stored
    index (hash-partitioned on text_hash; AQE broadcasts the smaller
    side), and collapsed within itself by one combinable min-aggregate.
    Cost scales with |new batch| + |index keys|, not |corpus|."""
    fp = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")
    )
    fresh = fp.join(index.select("text_hash"), "text_hash", "left_anti")
    return (
        fresh.groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "text_hash")
    )


def near_dups_against_index(new_docs: DataFrame, index_docs: DataFrame,
                            id_col: str = "doc_id", text_col: str = "text",
                            threshold: float = 0.7) -> DataFrame:
    """Incremental MinHash-LSH near-dedup: (doc_new, doc_index, jaccard)
    pairs where a NEW document is a near-duplicate of a PRIOR-corpus
    document. Ids of the two inputs must be disjoint.

    Physical shape: band rows of the new batch equi-join band rows of
    the index (in production the index side is the stored
    ``minhash_doc_profiles`` table of the existing corpus — computed
    once per snapshot, reused by every ingest batch); NO self-join on
    either side, so within-batch and within-index pairs are never
    generated. Verification joins the candidate pairs against the two
    profile tables' shingle sets. Like ``dedup_new_against_index``,
    cost scales with the new batch and the candidate count, not with
    corpus size."""
    prof_new = minhash_doc_profiles(new_docs, id_col, text_col).persist()
    prof_idx = minhash_doc_profiles(index_docs, id_col, text_col).persist()
    bn = _bands_from_profiles(prof_new).select(
        F.col("doc_id").alias("doc_a"), "band", "band_hash"
    )
    bi = _bands_from_profiles(prof_idx).select(
        F.col("doc_id").alias("doc_b"), "band", "band_hash"
    )
    pairs = (
        bn.join(bi, ["band", "band_hash"])
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sets = prof_new.select("doc_id", "s").unionByName(
        prof_idx.select("doc_id", "s")
    )
    return (
        jaccard_verify_sets(pairs, sets, threshold)
        .select(
            F.col("doc_a").alias("doc_new"),
            F.col("doc_b").alias("doc_index"),
            "jaccard",
        )
    )


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — bit i votes with the high bit of md5 hex
    nibble i across the doc's distinct tokens."""
    toks = (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t"))
        .select("doc_id", F.explode("_t").alias("tok"))
        .distinct()
        .withColumn("h", F.md5(F.col("tok")))
    )
    votes = [
        F.sum(
            F.when(
                F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int") >= 8, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


NGRAM_DF_CAP = 64


def ngram_jaccard_dups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.5,
                       df_cap: int = NGRAM_DF_CAP) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard.

    Blocking = shared RARE shingle: shingles with document frequency
    > ``df_cap`` are dropped from the candidate-generating self-join
    (one hot 3-gram would otherwise produce a quadratic pair blowup —
    the standard prefix/rare-token filter), but KEPT in the
    verification sets, so Jaccard values are exact. Pairs that share
    only hot shingles are below any useful threshold anyway; prefer
    minhash_lsh_dups at scale — this is the exact baseline."""
    sh = shingle_sets(docs, id_col, text_col).persist()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .select("shingle")
    )
    blk = sh.join(rare, "shingle")
    a = blk.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = blk.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(pairs, sh, threshold)
