"""DSIR-style importance resampling: select raw-corpus documents whose
hashed n-gram profile looks like a TARGET corpus (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — the
standard recipe for skimming a web crawl toward a high-quality domain
before pretraining).

Pipeline (all built-in functions, no Python in the row path):

1. featurize: every document's unigrams+bigrams hash into ``m``
   buckets (md5-prefix arithmetic — byte-identical in any engine, so
   a DuckDB oracle can audit every weight).
2. model: bucket-count tables for raw and target are two
   explode+groupBy passes whose results are <= m rows each — the
   bag-of-hashed-ngrams language models, add-``alpha`` smoothed.
3. weight: each raw doc's log importance weight
   sum_g log(p_target(b_g) / p_raw(b_g)) via ONE broadcast join of
   the m-row model into the doc-gram stream + a keyed partial-agg
   groupBy(id).
4. resample: Gumbel-top-k on the weights — k docs WITHOUT replacement
   with probability proportional to softmax(log_w), deterministic via
   the repo's engine-portable Knuth hash (operators/corpus._hash32),
   so re-runs and auditing engines select the identical set.

Scale shape (100 TB raw corpus): the model tables are m-bounded (the
2^16 default is a ~1 MB broadcast); the raw corpus is scanned twice
(model pass + scoring pass) — at petabyte scale persist the (id,
bucket) gram stream between the passes instead of re-tokenizing; the
only wide exchange is the groupBy(id) whose rows are (id, double)
pairs after map-side partial aggregation; top-k is a TakeOrdered, not
a global sort. Bucket keys are md5-uniform, so the gram shuffle is
skew-free no matter how skewed the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from boatrace_database_spark.operators.corpus import _hash32
from boatrace_database_spark.operators.retrieval import search_terms


def hashed_gram_buckets(text: Column, m: int) -> Column:
    """array<bigint> of hashed unigram+bigram bucket ids in [0, m).

    Bucket = int(first 8 hex chars of md5(gram)) mod m — chosen over
    xxhash64 for the same reason corpus._hash32 exists: the feature
    hash must be reproducible OUTSIDE Spark (DuckDB oracle, a resumed
    run on another engine), and md5 is everywhere. The SQL twin is
    ``('0x' || substr(md5(g), 1, 8))::BIGINT % m``.
    """
    toks = search_terms(text)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
        % F.lit(m),
    )


def _doc_buckets(df: DataFrame, id_col: str, text_col: str, m: int) -> DataFrame:
    """(id, bucket) — one row per gram OCCURRENCE (counts matter: the
    models and the per-doc weights are over occurrences, not the
    distinct-gram set)."""
    return df.select(
        F.col(id_col),
        F.explode(hashed_gram_buckets(F.col(text_col), m)).alias("bucket"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 65536,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_grams, log_w) for every raw document.

    log_w = sum over the doc's gram occurrences of
    log((n_target(b)+alpha)/(N_target+alpha*m))
    - log((n_raw(b)+alpha)/(N_raw+alpha*m)),
    i.e. the log importance ratio of two add-alpha-smoothed
    bag-of-hashed-ngrams models. Positive = looks more like the
    target than like the average raw doc.

    Documents with no grams at all (empty/NULL text) are kept with
    n_grams=0, log_w=0.0 — "no evidence" scores neutral rather than
    silently vanishing from the resample pool. ``id_col`` must be
    unique per document (the standard corpus contract here; duplicate
    ids would duplicate rows through the re-attach join).

    log_w is rounded to 6 decimals so order-of-summation float noise
    cannot flip an engine-parity comparison (and the Gumbel resample
    key downstream is built on the ROUNDED value for the same reason).
    """
    # r13: (a) single-file corpora arrive as ONE partition, which ran
    # the tokenize+explode of the whole raw corpus on a single core
    # (the profile read 1-task stages end to end); a narrow repartition
    # buys full parallelism for every pass downstream. (b) the gram
    # stream feeds BOTH the model pass and the scoring pass — Spark
    # re-evaluates common subplans, so the corpus was tokenized twice;
    # the lazy localCheckpoint materializes it once (the in-query
    # persist the module docstring always prescribed at scale). Both
    # are plan-shape changes only: per-doc gram rows and their order
    # are unchanged, and log_w stays round(·, 6).
    parallelism = raw.sparkSession.sparkContext.defaultParallelism
    doc_buckets = _doc_buckets(
        raw.repartition(parallelism, F.col(id_col)), id_col, text_col, m
    ).localCheckpoint(eager=False)
    raw_counts = doc_buckets.groupBy("bucket").agg(F.count("*").alias("n_raw"))
    tgt_counts = (
        _doc_buckets(
            target.repartition(parallelism, F.col(id_col)), id_col, text_col, m
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_tgt"))
    )
    model = (
        raw_counts.join(tgt_counts, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
        )
    )
    totals = model.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )  # 1 row — rides along as a broadcast, never a driver collect
    ratios = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("n_tgt") + F.lit(alpha)) / (F.col("t_tgt") + F.lit(alpha * m)))
            - F.log((F.col("n_raw") + F.lit(alpha)) / (F.col("t_raw") + F.lit(alpha * m)))
        ).alias("log_ratio"),
    )
    scored = (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("log_ratio"), 6).alias("log_w"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def _unit_open(col: Column, salt: int) -> Column:
    """corpus._hash32 scaled into the OPEN interval (0,1): the +0.5
    offset keeps -log(-log(u)) finite at both hash extremes (u=0 would
    be -inf; u=1 can't occur since hash < 2^32)."""
    return (_hash32(col, salt) + F.lit(0.5)) / F.lit(float(2**32))


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    m: int = 65536,
    alpha: float = 1.0,
    salt: int = 0xD51A,
) -> DataFrame:
    """Gumbel-top-k importance resample: (rank, id, n_grams, log_w) for
    the k selected documents.

    key = log_w + Gumbel(unit_hash(id)) realizes sampling WITHOUT
    replacement with P(select) proportional to softmax(log_w) (the
    Gumbel-max trick); because the noise comes from the deterministic
    Knuth hash, the selected set is a pure function of (corpus, target,
    m, alpha, salt, k) — reproducible by the SQL oracle and by any
    incremental re-run.

    Scale: top-k by key is a TakeOrdered (per-partition heads + k-row
    merge), NOT a global sort; the rank window then runs on k rows.
    """
    weights = dsir_log_weights(raw, target, id_col, text_col, m, alpha)
    gumbel = -F.log(-F.log(_unit_open(F.col(id_col), salt)))
    keyed = weights.withColumn("gkey", F.col("log_w") + gumbel)
    top = keyed.orderBy(F.desc("gkey"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("gkey"), F.asc(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("rank", id_col, "n_grams", "log_w")
    )
