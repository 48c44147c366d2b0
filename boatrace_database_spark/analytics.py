"""Boatrace-domain analytics: the reference's published Colab surface
(SURVEY §2.3 A1-A4, README.md:19-44) as library functions over the
gold tables.

All functions take the silver/gold DataFrames produced by
warehouse.build_warehouse / silver.silver_tables and return
DataFrames; everything is built-in-function DataFrame logic (hash
aggregates with map-side combine, broadcast joins for the per-player
feature table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boatrace_database_spark import schemas as S

def _rank():
    return F.col("順位").try_cast("int")


def player_features(race: DataFrame, result_ext: DataFrame | None = None) -> DataFrame:
    """A1: per-player aggregates — starts, wins, top-2 finishes, mean
    exhibition time, and (with result_ext) mean start timing — the
    README.md:19 feature set (出走回数/優勝回数/平均スタートタイミング).
    """
    feats = race.groupBy(S.PLAYER_ID).agg(
        F.count("*").alias("n_starts"),
        F.count(F.when(_rank() == 1, 1)).alias("n_wins"),
        F.count(F.when(_rank() <= 2, 1)).alias("n_top2"),
        F.round(F.avg(F.col("展示").try_cast("double")), 4).alias("avg_exhibition"),
    )
    if result_ext is not None:
        from boatrace_database_spark.gold import result_ext_typed

        # numeric ST via the typed gold view (F0.01 flying marks count,
        # K ./L . absences stay NULL)
        st = result_ext_typed(result_ext).select(
            F.col("player_id").alias(S.PLAYER_ID),
            F.col("start_timing_s").alias("st"),
        )
        mean_st = st.groupBy(S.PLAYER_ID).agg(
            F.round(F.avg("st"), 4).alias("avg_start_timing")
        )
        feats = feats.join(mean_st, on=S.PLAYER_ID, how="left")
    return feats


def feature_table(race: DataFrame, feats: DataFrame) -> DataFrame:
    """A2: per-row feature assembly — race rows + per-player aggregates.

    The feature side is one row per player (~1.5k rows over two months)
    -> broadcast join, no shuffle of the wide race table.
    """
    return race.join(F.broadcast(feats), on=S.PLAYER_ID, how="left")


def lane1_win_strategy(race: DataFrame) -> DataFrame:
    """The simplest deterministic 'prediction': bet win (単勝) on lane 1
    every race. Returns (race_id, hit) — hit=1 when lane 1 ranked 1st."""
    return (
        race.groupBy(S.RACE_ID)
        .agg(
            F.max(
                F.when((_rank() == 1) & (F.col("艇番") == "1"), 1).otherwise(0)
            ).alias("hit")
        )
    )


def roi_simulation(race: DataFrame, odds: DataFrame) -> DataFrame:
    """A3: payout-rate per bet type for the lane-1 win strategy
    (README.md:23-35 structure: Σ payout-on-hit / (100 × races)).

    `-1` sentinel payouts (cancelled / 特払い) count as no payout.
    """
    hits = lane1_win_strategy(race)
    win = F.col("単勝").try_cast("int")
    joined = odds.join(hits, on=S.RACE_ID, how="inner")
    return joined.agg(
        F.count("*").alias("n_races"),
        F.sum("hit").alias("n_hits"),
        F.round(
            F.sum(F.when((F.col("hit") == 1) & (win > 0), win).otherwise(0))
            / (100.0 * F.count("*")),
            6,
        ).alias("roi_win"),
    )


def accuracy_metrics(race: DataFrame, odds: DataFrame) -> DataFrame:
    """A4: hit-rate of the strategy (README.md:37-44 structure)."""
    hits = lane1_win_strategy(race)
    return odds.join(hits, on=S.RACE_ID, how="inner").agg(
        F.round(F.avg("hit"), 6).alias("hit_rate_win")
    )


def train_win_model(race: DataFrame, algorithm: str = "lr"):
    """A5 (optional surface — README.md:9,20 trains LightGBM in Colab):
    in-engine equivalent via Spark ML on the per-boat features
    predicting a win. Returns (model, auc).

    ``algorithm``: ``"lr"`` = LBFGS logistic regression (fast linear
    baseline); ``"gbt"`` = gradient-boosted trees — the in-cluster
    analogue of the reference's published LightGBM model (boosted
    decision trees capture the same lane×rate interactions the linear
    model cannot).

    Distributed training either way: VectorAssembler and both learners
    scale with the partitioned input; no data leaves the cluster.
    """
    from pyspark.ml.classification import GBTClassifier, LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    feats = race.select(
        (_rank() == 1).cast("int").alias("label"),
        F.col("艇番").try_cast("int").alias("lane"),
        F.col("全国勝率").try_cast("double").alias("natl_win_rate"),
        F.col("当地勝率").try_cast("double").alias("local_win_rate"),
        F.col("モーター2率").try_cast("double").alias("motor_top2"),
        F.col("展示").try_cast("double").alias("exhibition"),
    ).na.drop()
    assembler = VectorAssembler(
        inputCols=["lane", "natl_win_rate", "local_win_rate", "motor_top2", "exhibition"],
        outputCol="features",
    )
    data = assembler.transform(feats)
    if algorithm == "lr":
        learner = LogisticRegression(maxIter=20)
    elif algorithm == "gbt":
        learner = GBTClassifier(maxIter=20, maxDepth=4, seed=0)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'lr' or 'gbt'")
    model = learner.fit(data)
    auc = BinaryClassificationEvaluator().evaluate(model.transform(data))
    return model, auc
