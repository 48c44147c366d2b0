"""Corpus-assembly operators: the last mile of a training-data pipeline
after scrubbing (privacy.py) and filtering (text.py) — deciding HOW MUCH
of each source to train on (mixture_resample) and how documents map into
fixed-size context windows (pack_sequences).

Both are pure DataFrame plans (window cumsum / arithmetic-hash explode):
JVM-side, oracle-expressible, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2^32 / golden ratio). Chosen over
# xxhash64 deliberately: the decision "is row i sampled at rate r?" must
# be reproducible by ANY engine auditing the pipeline (DuckDB oracle,
# a downstream validator, a resumed run), so the hash is plain integer
# arithmetic, not an engine builtin.
_KNUTH = 2654435761


def _unit_hash(col, salt: int):
    """Deterministic uniform-ish [0,1) from an integer id column —
    identical arithmetic on any SQL engine: (x*K mod 2^32)/2^32 with
    x = (id mod 2^32 + salt) mod 2^32.

    The multiply is split into 16-bit halves (K*lo + (K*hi mod 2^32)
    << 16, all mod 2^32) so every intermediate stays below 2^49: a
    naive (id+salt)*K overflows int64 for ids >= ~3.5e9 — which ANSI
    Spark turns into a query-killing ARITHMETIC_OVERFLOW, and which
    matters precisely at the multi-billion-row scale this module is
    for. For ids < 2^32 the value is identical to the naive formula.
    """
    m32 = F.lit(2**32)
    x = ((col % m32) + F.lit(salt)) % m32
    lo = x % F.lit(65536)
    hi = F.floor(x / F.lit(65536))
    h = (
        lo * F.lit(_KNUTH) + ((hi * F.lit(_KNUTH)) % m32) * F.lit(65536)
    ) % m32
    return h.cast("double") / F.lit(float(2**32))


def mixture_resample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic mixture weighting: repeat/sample each row by its
    stratum's weight — the 'epochs per source' dial of a pretraining
    data recipe (e.g. upweight a small high-quality source to 2.5
    epochs, downsample a crawl to 0.3).

    weight w = k + f (integer + fraction): every row gets k copies,
    plus one more iff unit_hash(id) < f. E[copies] = w exactly;
    the decision is a pure function of (id, salt), so reruns, oracles,
    and incremental rebuilds agree row-for-row. Output adds a ``copy``
    index (0..k) so downstream shuffles can decorrelate the duplicates.

    Scale shape: one narrow projection + explode — no shuffle at all;
    the weight table enters as a broadcast-sized CASE expression (build
    it from a config, not a join, while the stratum count is O(100);
    past that, broadcast-join a weights dim instead). Skew note: an
    upweighted stratum multiplies rows at the SOURCE, before any
    shuffle, so downstream salting sees the true (post-mixture) key
    distribution.
    """
    w = F.lit(float(default_weight))
    for name, weight in weights.items():
        w = F.when(F.col(strata_col) == name, F.lit(float(weight))).otherwise(w)
    whole = F.floor(w).cast("int")
    frac = w - whole
    extra = (_unit_hash(F.col(id_col), salt) < frac).cast("int")
    n_copies = (whole + extra).alias("n_copies")
    return (
        df.withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
        .withColumn("copy", F.col("copy") - 1)
        .drop("n_copies")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk context-window assignment (the GPT-style packing
    model): documents are laid end-to-end in ``id_col`` order (within
    ``group_col`` if given), and each document is assigned the
    ``budget``-token window its FIRST token lands in.

    Output: input columns + ``n_tokens`` (whitespace tokens),
    ``start_offset`` (tokens before this doc in its group's stream) and
    ``pack_id`` (= start_offset // budget). Deterministic: a pure
    function of the ordered token-count prefix sum, so the same corpus
    always packs identically — and the oracle is the same one-line
    window SQL.

    Scale shape: ONE window cumsum per group (shuffle keyed by group,
    sort by id — Spark runs it as a running aggregate, no per-row
    Python). A single giant group serializes its cumsum into one
    task, exactly like any running total; at 100 TB, group by
    (source, shard) — any key whose streams are packed independently —
    to bound partition size. This is why group_col is explicit instead
    of defaulting to a global stream.
    """
    from boatrace_database_spark.operators.text import token_count

    part = [group_col] if group_col else []
    win = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn(
            "start_offset",
            F.sum("n_tokens").over(win) - F.col("n_tokens"),
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
        )
    )
