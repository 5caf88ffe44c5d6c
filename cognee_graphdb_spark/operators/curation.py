"""End-to-end corpus curation: the whole training-data pipeline in one call.

Chains the engine's corpus operators in the order real pretraining pipelines
run them (C4 → Gopher → exact dedup → MinHash near-dedup → eval-set
decontamination → learned-quality weighted resampling → reproducible
shuffle/sharding), returning the curated corpus plus a per-stage attrition
trail.  Every stage is one of the individually oracle-checked/tested
operators — this module only composes them, adds no new semantics, and keeps
the whole chain lazy until the caller materializes it.

Scale design: stages are ordered cheapest-first so each shuffle sees less
data (zero-shuffle rule filters run at scan speed before any dedup shuffle;
the quadratic-per-bucket MinHash stage runs after exact dedup shrank the
corpus; decontamination's broadcast filter precedes the learned-quality
scan).  The final shard assignment is the one deliberate global shuffle —
it IS the sharded writer's layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    """The curated corpus plus the lazy per-stage frames for attrition audit."""

    corpus: DataFrame
    stages: list[tuple[str, DataFrame]] = field(default_factory=list)

    def report(self) -> list[tuple[str, int]]:
        """Materialize per-stage row counts (one count job per stage) —
        the filter-rate audit every curation run needs."""
        return [(name, df.count()) for name, df in self.stages]


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_c4: bool = True,
    use_gopher: bool = True,
    minhash_threshold: float = 0.5,
    minhash_num_hashes: int = 32,
    minhash_bands: int = 16,
    decontaminate_n: int = 5,
    quality_weights: dict[str, float] | None = None,
    n_shards: int | None = None,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> CurationResult:
    """Run the standard curation chain over ``docs``; see module docstring
    for ordering rationale.  Optional stages disable cleanly:

    - ``use_c4=False`` / ``use_gopher=False`` skip the rule filters
      (C4 is line-oriented — corpora without line structure should skip it);
    - ``eval_df=None`` skips decontamination;
    - ``quality_weights=None`` skips the learned-quality resampling (pass
      the dict from :func:`~cognee_graphdb_spark.operators.quality_model.
      train_quality_model`);
    - ``n_shards=None`` skips shard assignment (no global shuffle at all).

    ``hasher`` flows to every hash-keyed stage (MinHash, decontamination,
    weighted sampling, sharding): ``xxhash64`` is the JVM-native fast path;
    ``md5_64`` is bit-identical across engines, which is what the driver's
    DuckDB oracle restates.  The returned frames keep (id, text) plus
    ``shard``/``pos`` when sharded.
    """
    from cognee_graphdb_spark.operators.dedup import dedup_clusters, exact_duplicates, minhash_lsh_pairs
    from cognee_graphdb_spark.operators.training_data import (
        c4_line_filter,
        deterministic_shuffle,
        gopher_quality_filter,
        ngram_decontaminate,
        weighted_sample,
    )

    cur = docs.select(F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text"))
    stages: list[tuple[str, DataFrame]] = [("input", cur)]

    if use_c4:
        # C4 is line-LEVEL cleaning, not just a doc filter: surviving docs
        # carry clean_text (blocklisted/short/unpunctuated lines removed), so
        # every downstream stage — dedup, decontamination, quality — sees the
        # cleaned text, as in Raffel et al. §2.2 where filtering precedes
        # dedup on the cleaned pages.
        # c4_line_filter is a row-preserving projection of cur, so the kept
        # rows already carry everything needed — joining them back onto cur
        # would scan and shuffle the corpus twice for an identity mapping
        kept = c4_line_filter(cur, text_col="text").filter(F.col("keep_doc"))
        cur = kept.select("doc_id", F.col("clean_text").alias("text"))
        stages.append(("c4_line_filter", cur))
    if use_gopher:
        kept = gopher_quality_filter(cur, text_col="text").filter(F.col("keep"))
        cur = cur.join(kept.select("doc_id"), "doc_id", "leftsemi")
        stages.append(("gopher_filter", cur))

    # exact dedup first (cheap hash groupBy shrinks the corpus), then MinHash
    # near-dedup on the survivors; both keep the smallest doc_id per group so
    # the kept set is deterministic
    groups = exact_duplicates(cur, text_col="text", id_col="doc_id")
    hashes = cur.select("doc_id", F.md5("text").alias("content_hash"))
    drop_exact = (
        hashes.join(groups.select("content_hash", "keeper_id"), "content_hash")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )
    cur = cur.join(drop_exact, "doc_id", "left_anti")
    stages.append(("exact_dedup", cur))

    pairs = minhash_lsh_pairs(
        cur,
        num_hashes=minhash_num_hashes,
        bands=minhash_bands,
        threshold=minhash_threshold,
        text_col="text",
        id_col="doc_id",
        hasher=hasher,
    )
    # keeper-per-connected-component election (dedup_clusters), not pairwise
    # drop-the-larger: for a chain a~b, b~c (a!~c), pairwise dropping loses
    # both b and c even though c's only duplicate was already removed —
    # over-deletion.  Component election keeps exactly one representative
    # (the min id) per near-dup cluster.  Restricting the component run to
    # docs that appear in a pair keeps the iterative part proportional to the
    # duplicate set, not the corpus.
    members = pairs.select(F.col("id_a").alias("doc_id")).union(
        pairs.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    clusters = dedup_clusters(cur.join(members, "doc_id", "leftsemi"), pairs, id_col="doc_id")
    drop_near = clusters.filter(F.col("id") != F.col("keeper_id")).select(F.col("id").alias("doc_id"))
    cur = cur.join(drop_near, "doc_id", "left_anti")
    stages.append(("minhash_dedup", cur))

    if eval_df is not None:
        contaminated = ngram_decontaminate(
            cur, eval_df, n=decontaminate_n, text_col="text", id_col="doc_id", hasher=hasher
        )
        cur = cur.join(contaminated.select("doc_id"), "doc_id", "left_anti")
        stages.append(("decontaminate", cur))

    if quality_weights is not None:
        from cognee_graphdb_spark.operators.quality_model import score_quality

        scores = score_quality(cur, quality_weights, text_col="text", id_col="doc_id")
        cur = weighted_sample(
            cur.join(scores, "doc_id").withColumnRenamed("quality_score", "__w"),
            "__w",
            id_col="doc_id",
            seed=seed,
            hasher=hasher,
        ).drop("__w")
        stages.append(("quality_resample", cur))

    if n_shards is not None:
        cur = deterministic_shuffle(cur, n_shards=n_shards, id_col="doc_id", seed=seed, hasher=hasher)
        stages.append(("sharded", cur))

    return CurationResult(corpus=cur, stages=stages)
