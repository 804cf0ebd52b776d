"""Learned quality-classifier filter — the GPT-3 CommonCrawl recipe
(Brown et al. 2020, Appendix A), Spark-native:

1. train a logistic-regression classifier to separate a CURATED
   positive corpus from the RAW corpus (hashed bag-of-words features —
   the hashing trick bounds the feature space with no vocabulary
   build),
2. score every raw document,
3. keep a document when ``pareto_draw > 1 - score`` — the Pareto draw
   (shape alpha=9) re-admits a long tail of low-scoring docs so the
   filter does not collapse the distribution onto "looks exactly like
   the curated set".

The statistical pieces (IDF weighting, LBFGS logistic regression) are
Spark MLlib — distributed treeAggregate per iteration, standard GLM
economics: each pass is one map over the corpus plus a depth-2
aggregate of a 2^18-dim gradient. Scoring and the keep rule are
map-only. NOT oracle-gated by design: LBFGS float reductions are
order-dependent across engines; determinism is instead pinned where it
matters operationally — the Pareto draw derives from the shared md5
uniform of the doc id, so a re-run KEEPS THE SAME DOCUMENTS given the
same model (tests/test_custom_ops.py).

At 100 TB: train on a sample (the classifier needs ~10^5-10^6 docs,
not the corpus); score + keep are embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.functions.sketches import hash40_expr

_U_DENOM = float(1 << 40)


def _tokenized(docs: DataFrame, text_col: str) -> DataFrame:
    from dtle_spark.functions.textstats import tokens

    return docs.withColumn("__toks", tokens(F.col(text_col)))


def train_quality_classifier(
    positive: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the curated-vs-raw classifier. Returns a fitted
    ``pyspark.ml`` PipelineModel (HashingTF -> IDF -> LogisticRegression).

    The raw side SHOULD overlap the positive distribution — that is the
    point: the model learns the direction separating curated text from
    the average of the raw pool, and scores are calibrated
    probabilities along it."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF

    if positive.isEmpty() or raw.isEmpty():
        raise ValueError(
            "train_quality_classifier needs non-empty positive AND raw sides "
            "(an empty class makes the LR label degenerate)"
        )
    train = _tokenized(
        positive.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            raw.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
    )
    pipe = Pipeline(
        stages=[
            HashingTF(inputCol="__toks", outputCol="__tf", numFeatures=n_features),
            IDF(inputCol="__tf", outputCol="features"),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(train)


def score_quality(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col..., quality_score): P(curated | doc) per document."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_tokenized(docs, text_col))
    return scored.withColumn(
        "quality_score", vector_to_array(F.col("probability"))[1]
    ).drop("__toks", "__tf", "features", "rawPrediction", "probability", "prediction")


def pareto_keep(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    alpha: float = 9.0,
) -> DataFrame:
    """The GPT-3 keep rule, made reproducible: keep a doc when
    ``pareto_draw > 1 - score``. The draw is the inverse-CDF Lomax
    (Pareto II) transform ``(1-u)^(-1/alpha) - 1`` of the md5-derived
    uniform of the doc id — so which documents survive is a pure
    function of (corpus, model), and a re-run of the filter keeps the
    SAME set (resumable corpus builds; no RNG state to ship)."""
    u = f"(CAST({hash40_expr(id_col, 'spark')} AS DOUBLE) / {_U_DENOM})"
    draw = f"(pow(1.0 - {u}, {-1.0 / alpha}) - 1.0)"
    return scored.withColumn("pareto_draw", F.expr(draw)).withColumn(
        "keep", F.col("pareto_draw") > (F.lit(1.0) - F.col(score_col))
    )
