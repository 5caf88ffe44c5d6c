"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — for training-data pipelines at 100 TB.

Scale design:
- Exact dedup is a hash groupBy (one shuffle on the 32-byte digest, never on
  the document body).
- Pairwise similarity NEVER does a full O(n^2) crossJoin: n-gram Jaccard uses
  an inverted-index self-join on tokens; MinHash prunes via LSH band buckets;
  embedding near-dup buckets via random-hyperplane LSH.  The quadratic blowup
  is confined to same-bucket candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import tokenize, word_shingles


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: groups with >1 member, keeper = min id.

    Mirrors the reference's ingest dedup-by-content-hash
    (ingest_data.py:93-96, tests/test_deduplication.py).
    """
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("dup_count") > 1)
    )


def token_set(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) distinct pairs — the inverted-index input."""
    from cognee_graphdb_spark.session import fan_out

    df = fan_out(df)
    return df.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token")).distinct()


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """n-gram/token Jaccard near-dup pairs via inverted-index self-join.

    |A∩B| from the token self-join, |A∪B| = |A|+|B|-|A∩B|; keeps id_a < id_b.
    The reference computes the same set-Jaccard in jaccard_retrival.py:45-60.

    ``max_df``: drop tokens appearing in more than max_df documents before the
    self-join — a stopword-dense corpus otherwise makes the join quadratic per
    hot token (the classic inverted-index blowup).  Dropping ubiquitous tokens
    changes |A∩B| AND |A∪B| (sizes are computed after the cut, keeping the
    estimate consistent); at 100 TB this cap is mandatory, exact Jaccard on
    ubiquitous tokens is what MinHash is for.
    """
    ts = token_set(df, text_col, id_col)
    if max_df is not None:
        hot = ts.groupBy("token").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df)
        ts = ts.join(F.broadcast(hot.select("token")), "token", "left_anti")
    sizes = ts.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = ts.select(F.col("id").alias("id_a"), "token")
    b = ts.select(F.col("id").alias("id_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse near-duplicate PAIRS into clusters and elect a canonical
    keeper per cluster: (id, keeper_id), keeper = min id of the connected
    component (transitively: if a~b and b~c, all three share one keeper —
    matching the reference's min-id keeper election in exact dedup,
    ingest_data.py:93-96, extended to transitive near-dup closure).

    The pair graph's components are computed with the same alternating-star
    operator as A2 — pair graphs are forests of small cliques, exactly the
    many-tiny-components shape the star rounds converge on in O(1) rounds.
    Docs with no near-dup partner are their own keeper (map-only left join).
    """
    from cognee_graphdb_spark.operators.graph_metrics import connected_components

    ids = df.select(F.col(id_col).cast("string").alias("id")).dropDuplicates()
    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
        F.lit("near_dup").alias("relationship_name"),
    )
    comp = connected_components(ids, edges)
    keepers = comp.groupBy("component").agg(F.min("id").alias("keeper_id"))
    return comp.join(keepers, "component").select("id", "keeper_id")


def _hash64(col, seed: int, hasher: str):
    """Seeded 64-bit hash of a string column.

    ``xxhash64``: fastest (JVM-native) — the production default.
    ``md5_64``: first 60 bits of md5('<seed>|' + s) — bit-identical in DuckDB
    (``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)``), used by the
    correctness oracle.
    """
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hasher == "md5_64":
        return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10).cast("bigint")
    raise ValueError(f"unknown hasher {hasher!r}")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: min over shingles of hash64(shingle, seed_i).

    Deterministic across runs.  Signature is an array<bigint> column
    ``signature``.
    """
    from cognee_graphdb_spark.session import fan_out

    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(tokenize(F.col(text_col)), shingle_k)).alias("shingle"),
    )
    if hasher == "xxhash64":
        # hash the shingle STRING once, then chain the per-seed hashes off the
        # 8-byte base value: xxhash64(h0, i) re-streams 12 bytes instead of the
        # whole shingle text per seed — ~num_hashes x less string hashing,
        # still an independent-enough family (each seed is a fresh avalanche
        # over the base).
        sh = sh.select("id", F.xxhash64("shingle").alias("h0"))
        mins = sh.groupBy("id").agg(
            *[F.min(F.xxhash64(F.col("h0"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
        )
    else:
        mins = sh.groupBy("id").agg(
            *[F.min(_hash64(F.col("shingle"), i, hasher)).alias(f"h{i}") for i in range(num_hashes)]
        )
    return mins.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"))


def _band_rows(sig: DataFrame, num_hashes: int, bands: int, hasher: str) -> DataFrame:
    """(id, band, bucket) LSH band rows from a signature frame — the ONE
    banding definition, shared by the in-run pair join and the persisted
    incremental index."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _hash64(
                            F.concat_ws(",", *[F.element_at("signature", b * rows_per_band + r + 1) for r in range(rows_per_band)]),
                            b,
                            hasher,
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by estimated Jaccard.

    shingle → minhash → band → bucket-join: docs sharing any band bucket become
    candidates; candidate pairs are scored by full-signature agreement
    (estimated Jaccard) and filtered by ``threshold``.

    Default (32 hashes, 16 bands ⇒ 2 rows/band) has candidate-recall
    ≈ 1-(1-J^2)^16 — ~99% at J=0.5 (8 bands × 4 rows was ~40% at J=0.5; see
    the LSH S-curve).  More bands = more candidates = more verify cost.
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(f"bands must divide num_hashes: got bands={bands}, num_hashes={num_hashes}")
    sig = minhash_signatures(df, num_hashes, shingle_k, text_col, id_col, hasher)
    # Materialize signatures ONCE.  The frame is referenced three times below
    # (two band-join sides + the verify joins); relying on Catalyst's
    # ReuseExchange is fragile — when AQE broadcasts one side of the band join
    # the exchanges stop being identical and the whole shingle→minhash chain
    # silently computes twice.  One row per doc (id + num_hashes longs), spills
    # to executor disk at scale — the same trade Spark ML's MinHashLSH makes.
    sig = sig.localCheckpoint(eager=True)
    bands_df = _band_rows(sig, num_hashes, bands, hasher)

    # The hot shuffle carries only (id, band, bucket) — signatures join back in
    # AFTER pair dedup, so the band exchange stays ~24 bytes/row regardless of
    # num_hashes (carrying sig arrays through it multiplies shuffle volume ~10x).
    a = bands_df.select(F.col("id").alias("id_a"), "band", "bucket")
    b = bands_df.select(F.col("id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .join(sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b")), "id_b")
    )
    est = cands.withColumn(
        "est_jaccard",
        F.round(
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)).cast("double")
            / F.lit(num_hashes),
            6,
        ),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")


def minhash_index_build(
    df: DataFrame,
    path: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> None:
    """Persist a near-dup REGISTRY: band buckets (partitioned by band),
    signatures, and the hashing parameters.  The daily-ingest workflow at
    corpus scale is "dedup today's batch against everything ever seen",
    which an in-run pair join cannot do — the registry makes it one
    band-bucket join against yesterday's index (:func:`minhash_index_dedup`)
    instead of re-minhashing the whole corpus."""
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(f"bands must divide num_hashes: got bands={bands}, num_hashes={num_hashes}")
    sig = minhash_signatures(df, num_hashes, shingle_k, text_col, id_col, hasher)
    sig = sig.localCheckpoint(eager=True)  # one compute for both writes
    sig.write.mode("overwrite").parquet(f"{path}/signatures")
    _band_rows(sig, num_hashes, bands, hasher).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(f"{path}/bands")
    spark = df.sparkSession
    spark.createDataFrame(
        [(num_hashes, bands, shingle_k, hasher)],
        "num_hashes int, bands int, shingle_k int, hasher string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def minhash_index_dedup(
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
    update: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs of a NEW batch against the persisted registry:
    (id_old, id_new, est_jaccard), verified on full signatures exactly like
    :func:`minhash_lsh_pairs` — sharing a band bucket is a pairwise
    criterion, so cross-batch candidates match what one big run would have
    produced.  ``update=True`` appends the batch's bands + signatures, so
    the registry accumulates the corpus over successive ingests.

    The incoming batch is small relative to the registry by construction;
    the band join shuffles (id, band, bucket) rows only and AQE broadcasts
    the batch side when it fits."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    num_hashes, bands, shingle_k, hasher = (
        meta["num_hashes"], meta["bands"], meta["shingle_k"], meta["hasher"],
    )
    new_sig = minhash_signatures(
        new_docs, num_hashes, shingle_k, text_col, id_col, hasher
    ).localCheckpoint(eager=True)
    new_bands = _band_rows(new_sig, num_hashes, bands, hasher).localCheckpoint(eager=True)

    old_bands = spark.read.parquet(f"{path}/bands")
    old_sigs = spark.read.parquet(f"{path}/signatures")
    cands = (
        old_bands.select(F.col("id").alias("id_old"), "band", "bucket")
        .join(new_bands.select(F.col("id").alias("id_new"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id_old") != F.col("id_new"))  # re-ingest of a known id
        .select("id_old", "id_new")
        .dropDuplicates(["id_old", "id_new"])
        .join(old_sigs.select(F.col("id").alias("id_old"), F.col("signature").alias("sig_a")), "id_old")
        .join(new_sig.select(F.col("id").alias("id_new"), F.col("signature").alias("sig_b")), "id_new")
    )
    pairs = (
        cands.withColumn(
            "est_jaccard",
            F.round(
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)).cast("double")
                / F.lit(int(num_hashes)),
                6,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_old", "id_new", "est_jaccard")
        # a registry holding a signature row twice (e.g. a replayed append)
        # re-expands the candidate through the sig join — dedup AFTER it
        .dropDuplicates(["id_old", "id_new"])
    )
    if update:
        pairs = pairs.localCheckpoint(eager=True)  # materialize before the index grows
        # register each id at most once: a replayed batch (at-least-once
        # delivery) must not grow the registry — anti-join the batch against
        # the ids already present, materialized BEFORE the append touches
        # the same path (mirrors minhash_index_ingest's survivors-only append)
        registered = old_sigs.select("id").distinct()
        fresh_sig = new_sig.join(registered, "id", "left_anti").localCheckpoint(eager=True)
        fresh_bands = new_bands.join(registered, "id", "left_anti").localCheckpoint(eager=True)
        _index_append(fresh_sig, fresh_bands, path)
    return pairs


def _index_append(sig: DataFrame, bands_df: DataFrame, path: str) -> None:
    sig.write.mode("append").parquet(f"{path}/signatures")
    bands_df.write.mode("append").partitionBy("band").parquet(f"{path}/bands")


def minhash_index_append(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Add documents to an existing registry without querying it — e.g. the
    SURVIVORS of a near-dedup pass (appending the dropped duplicates too
    would only bloat the index)."""
    spark = df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    sig = minhash_signatures(
        df, meta["num_hashes"], meta["shingle_k"], text_col, id_col, meta["hasher"]
    ).localCheckpoint(eager=True)
    _index_append(sig, _band_rows(sig, meta["num_hashes"], meta["bands"], meta["hasher"]), path)


def minhash_index_ingest(
    batch: DataFrame,
    path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One ingest batch through the registry, end to end, with ONE minhash
    pass: drop documents whose id is already registered (exact re-delivery —
    this is what makes a replayed micro-batch a no-op), documents
    near-duplicating the registry, and documents near-duplicating an
    earlier id of the same batch (greedy: the larger id of a pair drops);
    append the SURVIVORS' precomputed signatures/bands; return the
    survivors.

    The batch shingles and min-hashes exactly once — the registry join, the
    in-batch self-join, and the append all reuse the same checkpointed
    signature frame."""
    spark = batch.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    num_hashes, bands, hasher = meta["num_hashes"], meta["bands"], meta["hasher"]

    new_sig = minhash_signatures(
        batch, num_hashes, meta["shingle_k"], text_col, id_col, hasher
    ).localCheckpoint(eager=True)
    new_bands = _band_rows(new_sig, num_hashes, bands, hasher).localCheckpoint(eager=True)
    old_sigs = spark.read.parquet(f"{path}/signatures")
    old_bands = spark.read.parquet(f"{path}/bands")

    def _verified(cands: DataFrame, left: str, right: str, left_sigs: DataFrame) -> DataFrame:
        withsig = cands.join(
            left_sigs.select(F.col("id").alias(left), F.col("signature").alias("sig_a")), left
        ).join(new_sig.select(F.col("id").alias(right), F.col("signature").alias("sig_b")), right)
        est = F.round(
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)).cast("double")
            / F.lit(int(num_hashes)),
            6,
        )
        return withsig.withColumn("est", est).filter(F.col("est") >= threshold)

    known = old_sigs.select(F.col("id").alias("_known")).distinct()
    reg_cands = (
        old_bands.select(F.col("id").alias("id_old"), "band", "bucket")
        .join(new_bands.select(F.col("id").alias("id_new"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id_old") != F.col("id_new"))
        .select("id_old", "id_new")
        .dropDuplicates(["id_old", "id_new"])
    )
    drops_vs_registry = _verified(reg_cands, "id_old", "id_new", old_sigs).select(
        F.col("id_new").alias("drop_id")
    )
    batch_cands = (
        new_bands.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(new_bands.select(F.col("id").alias("id_b"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    drops_in_batch = _verified(batch_cands, "id_a", "id_b", new_sig).select(
        F.col("id_b").alias("drop_id")
    )
    drops = (
        drops_vs_registry.unionByName(drops_in_batch)
        .unionByName(known.select(F.col("_known").alias("drop_id")))
        .distinct()
    )
    survivor_ids = (
        new_sig.select("id").join(drops, new_sig["id"] == drops["drop_id"], "left_anti").select("id")
    ).localCheckpoint(eager=True)
    if not survivor_ids.isEmpty():
        _index_append(
            new_sig.join(survivor_ids, "id", "leftsemi"),
            new_bands.join(survivor_ids, "id", "leftsemi"),
            path,
        )
    return batch.join(survivor_ids.withColumnRenamed("id", id_col), id_col, "leftsemi")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64, hasher: str = "xxhash64"
) -> DataFrame:
    """SimHash fingerprint: sign of per-bit sums of token hashes (multiset —
    repeated tokens weigh more).

    Returns (id, simhash bigint).  Hamming-close simhashes ⇒ similar token sets.
    ``hasher="md5_64"`` limits usable bits to 60 but is DuckDB-reproducible.
    """
    from cognee_graphdb_spark.session import fan_out

    toks = fan_out(df).select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token"))
    hashed = toks.withColumn("h", _hash64(F.col("token"), 0, hasher))
    bit_sums = hashed.groupBy("id").agg(
        *[
            F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("bigint")
    for i in range(bits):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return bit_sums.select("id", sim.alias("simhash"))


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    lsh_bits: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    lsh_bits=0: exact (self-join; only for small/sampled data).
    lsh_bits>0: random-hyperplane LSH — pairs are only compared within equal
    sign-buckets, the scale path (recall<1 by design; raise bits to shrink
    buckets, lower to raise recall).  ``dim`` is the embedding dimension;
    inferred from the first row when None (a dim mismatch would null-pad the
    hyperplane dot products and silently collapse every row into bucket 0).
    """
    from cognee_graphdb_spark.functions.vectors import dot, l2_norm
    from cognee_graphdb_spark.operators.similarity import hyperplane_bucket

    # norms are computed ONCE per row here, not inside every candidate-pair
    # evaluation — the pair set is quadratic-per-bucket, so factoring the two
    # norm reductions out of the pair expression cuts ~2/3 of the arithmetic
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vector_col).cast("array<double>").alias("v"),
        l2_norm(F.col(vector_col)).alias("nrm"),
    )
    if lsh_bits > 0:
        if dim is None:
            first = e.select(F.size("v").alias("d")).first()
            if first is None:
                return e.select(
                    F.col("id").alias("id_a"), F.col("id").alias("id_b"), F.lit(0.0).alias("cos_sim")
                ).limit(0)
            dim = int(first["d"])
        e = e.withColumn("bucket", hyperplane_bucket(F.col("v"), lsh_bits, dim))
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("nrm_a"), "bucket")
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("nrm_b"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("nrm_a"))
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("nrm_b"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_sim", F.round(dot("v_a", "v_b") / (F.col("nrm_a") * F.col("nrm_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _unit_rows(embeddings: DataFrame, id_col: str, vector_col: str) -> DataFrame:
    """(id, u): string ids + L2-normalized double vectors (zero vectors pass
    through unchanged), checkpointed — the shared front half of
    :func:`semdedup` and :func:`~cognee_graphdb_spark.operators.clustering.
    kmeans`."""
    e = embeddings.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vector_col).cast("array<double>").alias("v"),
    )
    nrm = F.sqrt(
        F.aggregate(F.zip_with("v", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    return e.select(
        "id",
        F.when(nrm == 0, F.col("v"))
        .otherwise(F.transform("v", lambda x: x / nrm))
        .alias("u"),
    ).localCheckpoint(eager=True)


def _spherical_kmeans(
    unit: DataFrame, k: int, n_iter: int, hasher: str, seed: int
) -> DataFrame:
    """(id, u, cluster, sim): the deterministic spherical k-means core —
    SemDeDup's clustering stage (Abbas et al. 2023, arXiv:2303.09540 §2),
    extracted (r11 VERDICT #5) so :func:`semdedup`, the public
    ``clustering.kmeans`` operator and the ``CALL gds.kmeans.stream``
    route share ONE implementation.  ``unit`` is :func:`_unit_rows` output.

    - seeds = the ``k`` rows with the smallest (seeded hash(id), id) — no
      RNG;
    - each round: assign every unit vector to the centroid with the
      highest dot product (tie -> lowest cluster index), then recenter
      each cluster at the renormalized elementwise mean of its members
      (an emptied cluster keeps its previous centroid);
    - after ``n_iter`` rounds one final assignment fixes membership.

    Scale shape (r13): centroids are k×d DRIVER literals by construction
    (SemDeDup's k is small; k·d doubles is the model, the same way the PQ
    codebooks are), so the assignment is a MAP-ONLY projection — the old
    crossJoin(k-row broadcast) + groupBy(id) max_by re-shuffled the full
    n-row unit frame once per round (guide §2.4: that exchange decided
    nothing the row itself couldn't) — and the recenter is the one
    remaining groupBy(cluster, pos) partial agg whose k·d output rows are
    collected and normalized on the driver with the exact fold order the
    old in-plan expressions used (bit-identical IEEE)."""
    import math

    h = _hash64(F.col("id"), seed, hasher)
    # seed selection: top-k smallest (hash, id) via orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition heaps + a k-row driver merge) — a
    # global row_number window here would funnel EVERY row through one task.
    # collect() preserves the sorted order, so row i IS cluster i (the rank
    # the old row_number window assigned).
    seed_rows = unit.withColumn("h", h).orderBy("h", "id").limit(k).select("u").collect()
    cents: list[list[float]] = [[float(x) for x in r["u"]] for r in seed_rows]
    if not cents:
        return unit.select(
            "id", "u", F.lit(0).alias("cluster"), F.lit(0.0).alias("sim")
        ).where(F.lit(False))

    def _dlit(x: float) -> str:
        # repr() round-trips doubles exactly; the string-cast parse yields
        # the identical IEEE value an F.lit literal would carry
        return f"CAST('{repr(float(x))}' AS DOUBLE)"

    def _assign() -> DataFrame:
        # sim_j = the same left-to-right fold the old HOF computed
        # (0.0 + u[0]*c[0] + u[1]*c[1] + ...), unrolled as ONE SQL string —
        # the pq_encode discipline: interpreted aggregate/zip_with folds per
        # row per centroid lose to codegen'd scalar arithmetic, and one
        # expr() parse beats thousands of py4j Column objects.  argmax via
        # array_max over (sim, -cluster, cluster) structs == the old
        # max_by(struct(sim, -cluster)) ordering: max sim, tie -> lowest
        # cluster, NaN largest on both paths.
        cands = []
        for j, c in enumerate(cents):
            terms = "0.0D"
            for d_i, x in enumerate(c):
                terms = f"({terms} + (element_at(u, {d_i + 1}) * {_dlit(x)}))"
            cands.append(f"struct({terms} AS sim, {-j} AS nc, {j} AS cluster)")
        best = F.expr(f"array_max(array({', '.join(cands)}))")
        return unit.withColumn("__b", best).select(
            "id", "u", F.col("__b.cluster").alias("cluster"), F.col("__b.sim").alias("sim")
        )

    for _ in range(n_iter):
        members = _assign()
        rows = (
            members.select("cluster", F.posexplode("u").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_c: dict[int, list[tuple[int, float]]] = {}
        for r in rows:
            by_c.setdefault(r["cluster"], []).append((r["pos"], float(r["m"])))
        for j, pm in by_c.items():
            raw = [m for _, m in sorted(pm)]
            # the old plan's renormalization, replicated op for op: a
            # left-to-right 0.0-seeded sum of squares (Python float IS the
            # IEEE double Spark's fold produced), sqrt, elementwise divide;
            # an all-zero mean keeps the raw vector, an emptied cluster
            # (absent from by_c) keeps its previous centroid
            acc = 0.0
            for x in raw:
                acc += x * x
            cn = math.sqrt(acc)
            cents[j] = raw if cn == 0.0 else [x / cn for x in raw]

    # map-only plan: single-pass consumers (the public kmeans operator, the
    # CALL route) scan unit exactly once; semdedup — which self-joins the
    # result — checkpoints at its own call site
    return _assign()


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    hasher: str = "xxhash64",
    seed: int = 41,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings, then pruning near-duplicate pairs WITHIN each
    cluster — the trick that makes embedding dedup sub-quadratic at corpus
    scale without an index (pairs are only ever formed inside a cluster).

    Deterministic spherical k-means, end to end reproducible across engines:

    - seeds = the ``k`` rows with the smallest (seeded hash(id), id) — no RNG;
    - each round: assign every unit vector to the centroid with the highest
      dot product (tie -> lowest cluster index), then recenter each cluster at
      the renormalized elementwise mean of its members (an emptied cluster
      keeps its previous centroid);
    - after ``n_iter`` rounds, one final assignment fixes membership, and a
      doc is DROPPED when its cluster holds another doc with pairwise cosine
      > ``threshold`` whose centroid-similarity is lower (tie -> lower id):
      the paper's keep-the-farthest-from-centroid rule, expressed as a
      per-pair EXISTS instead of a transitive closure.

    Returns (id, cluster, keep) — integer/string/boolean only, so the result
    is float-hash-stable for the correctness oracle.

    Scale shape: the assignment is a map-only argmax against k·d centroid
    literals (k is small by construction — the paper uses n/k in the
    thousands), the recenter is one groupBy(cluster, pos) partial agg, and
    the prune self-joins on cluster id, whose size the clustering bounds.  All
    dot products run as codegen'd sequential folds (functions/vectors.py:dot)
    — bit-identical to DuckDB's list_dot_product, which is what lets the
    oracle restate every branch decision exactly.
    """
    unit = _unit_rows(embeddings, id_col, vector_col)
    final = _spherical_kmeans(
        unit, k=k, n_iter=n_iter, hasher=hasher, seed=seed
    ).localCheckpoint(eager=True)
    a = final.select(F.col("cluster"), F.col("id").alias("id_a"), F.col("u").alias("u_a"), F.col("sim").alias("cs_a"))
    b = final.select(F.col("cluster"), F.col("id").alias("id_b"), F.col("u").alias("u_b"), F.col("sim").alias("cs_b"))
    pair_sim = F.aggregate(
        F.zip_with("u_a", "u_b", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("ps", pair_sim)
        .filter(F.col("ps") > threshold)
        # keep the member FARTHEST from the centroid (paper rule): a is
        # dropped when some near-dup b sits farther out — lower centroid-sim
        # (tie broken toward the lower id)
        .filter(
            (F.col("cs_b") < F.col("cs_a"))
            | ((F.col("cs_b") == F.col("cs_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("drop", F.lit(True))
    )
    return (
        final.join(dropped, "id", "left")
        .select("id", "cluster", F.coalesce(~F.col("drop"), F.lit(True)).alias("keep"))
    )


def fuzzy_name_matches(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_distance: int = 2,
    qgram: int = 3,
    max_df: int | None = None,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, distance): entity near-duplicate pairs by
    Levenshtein edit distance — the name-level resolution step an entity
    dedup / relational-migration cleanup pipeline runs (the reference
    normalizes entity names before keying nodes, ids.py:normalize_name; this
    finds the pairs normalization alone cannot unify).

    Candidate generation is q-gram postings blocking, NEVER all-pairs: names
    are lowercased/trimmed, split into overlapping ``qgram``-substrings
    (names shorter than ``qgram`` block on the whole string), and only pairs
    sharing at least one q-gram are scored.  The standard q-gram count
    filter guarantees two strings within edit distance k share at least
    max(|a|,|b|) - qgram + 1 - k*qgram q-grams — ≥ 1 (recall-complete) when
    the longer name has length ≥ (k+1)*qgram; shorter names may miss pairs
    whose edits destroy every shared q-gram (documented approximation).
    ``max_df`` drops grams present in more than that many names BEFORE the
    postings self-join — the hot-token cap, same as :func:`jaccard_pairs`.

    Scoring is Spark's built-in ``levenshtein`` (JVM codegen, character
    exact).  NOTE for oracle writers: DuckDB's ``levenshtein`` is BYTE-based
    — identical on ASCII, divergent on multibyte UTF-8; cross-engine checks
    must use ASCII data or normalize first.

    Scale: one posexplode (linear in total name length), one co-partitioned
    postings equi-join on the 8-byte gram hash (quadratic ONLY within a
    gram's posting list, capped by ``max_df``), distinct pair set, then the
    edit-distance filter runs once per candidate pair inside codegen.
    """
    if max_distance < 0 or qgram < 1:
        raise ValueError("max_distance must be >= 0 and qgram >= 1")
    names = (
        df.select(
            F.col(id_col).alias("id"), F.lower(F.trim(F.col(name_col))).alias("nm")
        )
        .filter(F.col("nm").isNotNull() & (F.length("nm") > 0))
        .distinct()
    )
    grams = names.select(
        "id",
        "nm",
        F.explode(
            F.when(
                F.length("nm") >= qgram,
                F.transform(
                    F.sequence(F.lit(1), F.length("nm") - qgram + 1),
                    lambda i: F.col("nm").substr(i, F.lit(qgram)),
                ),
            ).otherwise(F.array(F.col("nm")))
        ).alias("g"),
    ).select("id", "nm", _hash64(F.col("g"), 0, hasher).alias("gh")).distinct()
    if max_df is not None:
        keep = (
            grams.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("gh")
        )
        grams = grams.join(keep, "gh", "left_semi")
    a = grams.select("gh", F.col("id").alias("id_a"), F.col("nm").alias("name_a"))
    b = grams.select("gh", F.col("id").alias("id_b"), F.col("nm").alias("name_b"))
    cands = (
        a.join(b, "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("distance"),
    ).filter(F.col("distance") <= max_distance)
