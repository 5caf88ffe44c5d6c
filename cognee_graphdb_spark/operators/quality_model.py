"""Model-based corpus quality filtering (the DCLM / FineWeb-Edu pattern).

Heuristic rule filters (gopher_quality_filter, c4_line_filter) are the first
pass of a modern pretraining pipeline; the second pass is a LEARNED quality
classifier trained on weak labels (documents a trusted reference set likes vs
random crawl text).  This module provides that loop Spark-first:

- features are the engine's existing cheap signals (text_analysis.
  quality_features + Gopher-style ratios), computed as codegen expressions;
- training runs on a driver-bounded sample via Spark ML logistic regression
  (the labeled set is small by construction — weak labels are cheap but you
  still cap them);
- scoring EXPORTS the coefficients to literals, so corpus-wide inference is
  a pure whole-stage-codegen projection — sigmoid(w·x + b) — with no model
  object shipped to executors and no Python in the hot path (same
  "literal grid" trick as similarity.quantize_int8 / ivf_index).

Compose with ``training_data.weighted_sample(score)`` for soft filtering
(keep probability proportional to model score), the exact DCLM recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import tokenize

_SEED = 20240613

#: feature names in vector order — scoring and training must agree
QUALITY_FEATURES: tuple[str, ...] = (
    "log_n_words",
    "mean_word_len",
    "stopword_ratio",
    "alpha_word_frac",
    "symbol_ratio",
    "dup_word_frac",
)


def _feature_exprs(text_col: str) -> dict[str, Column]:
    from cognee_graphdb_spark.operators.text_analysis import (
        stopword_count,
        word_char_count,
    )

    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    denom = F.greatest(n, F.lit(1)).cast("double")
    hashes = F.size(F.regexp_extract_all(F.col(text_col), F.lit("#"), F.lit(0)))
    ellipses = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\."), F.lit(0)))
    return {
        "log_n_words": F.log1p(n.cast("double")),
        "mean_word_len": word_char_count(toks).cast("double") / denom,
        "stopword_ratio": stopword_count(toks).cast("double") / denom,
        "alpha_word_frac": F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / denom,
        "symbol_ratio": (hashes + ellipses).cast("double") / denom,
        "dup_word_frac": (n - F.size(F.array_distinct(toks))).cast("double") / denom,
    }


def quality_feature_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, <QUALITY_FEATURES...>) — one codegen projection, no shuffle."""
    exprs = _feature_exprs(text_col)
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        *[exprs[name].alias(name) for name in QUALITY_FEATURES],
    )


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rows: int = 100_000,
    reg_param: float = 0.01,
) -> dict[str, float]:
    """Fit logistic regression on weak labels; returns {feature: weight}
    plus ``__intercept__`` — plain floats, serializable, reusable across
    sessions without any model artifact.

    The labeled frame is driver-bounded (``max_rows`` deterministic hash
    sample) — learned-filter training sets are small by construction; the
    corpus-wide cost lives entirely in :func:`score_quality`'s scan.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from cognee_graphdb_spark.operators.training_data import hash_sample

    feats = quality_feature_frame(labeled, text_col, id_col).join(
        labeled.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(label_col).cast("double").alias("label"),
        ),
        "doc_id",
    )
    feats = feats.cache()  # count + (maybe) sample + fit each re-read it
    n = feats.count()
    if n > max_rows:
        feats = hash_sample(feats, max_rows / n)
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        standardization=True,
        maxIter=100,
    )
    model = lr.fit(assembled)
    out = {name: float(w) for name, w in zip(QUALITY_FEATURES, model.coefficients)}
    out["__intercept__"] = float(model.intercept)
    return out


def score_quality(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Corpus-wide inference as a pure projection: sigmoid(w·x + b) over the
    codegen feature expressions.  Zero shuffles, zero Python — at 100 TB this
    is scan-speed, and the score column composes directly with
    ``weighted_sample`` (soft filter) or a threshold filter (hard filter)."""
    exprs = _feature_exprs(text_col)
    z = F.lit(float(weights.get("__intercept__", 0.0)))
    for name in QUALITY_FEATURES:
        z = z + F.lit(float(weights.get(name, 0.0))) * exprs[name]
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"), score.alias(score_col)
    )
