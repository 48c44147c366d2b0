"""Corpus-assembly operators: the last mile of a training-data pipeline
after scrubbing (privacy.py) and filtering (text.py) — deciding HOW MUCH
of each source to train on (mixture_resample), WHICH rows are held out
(split_assign), the training ORDER (global_shuffle), and how documents
map into fixed-size context windows (pack_sequences).

All are pure DataFrame plans (window cumsum / arithmetic-hash
projection): JVM-side, oracle-expressible, no Python in the row path.
The shared randomness primitive is the split Knuth multiplicative hash
(`_hash32`) — reproducible by ANY engine auditing the pipeline, which
is why it is plain integer arithmetic and not an engine builtin.
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


def _hash32(col, salt: int):
    """Deterministic 32-bit integer hash of an integer id column —
    identical arithmetic on any SQL engine: x*K mod 2^32 with
    x = (id mod 2^32 + salt) mod 2^32, all mods MATHEMATICAL
    (non-negative): Spark's ``%`` is sign-preserving, so a bare
    ``id % 2^32`` on a negative id (xxhash64-derived surrogate keys
    are negative half the time) would make the whole hash negative —
    every negative-id row would then compare below every fraction
    threshold and silently land in the first split/always win the
    fractional mixture copy. ``pmod`` keeps the documented formula.

    The multiply is split into 16-bit halves (K*lo + (K*hi mod 2^32)
    << 16, all mod 2^32) so every intermediate stays below 2^49: a
    naive (id+salt)*K overflows int64 for ids >= ~3.5e9 — which ANSI
    Spark turns into a query-killing ARITHMETIC_OVERFLOW, and which
    matters precisely at the multi-billion-row scale this module is
    for. For 0 <= id < 2^32 the value is identical to the naive
    formula.
    """
    m32 = F.lit(2**32)
    x = F.pmod(F.pmod(col, m32) + F.lit(salt), m32)
    lo = x % F.lit(65536)
    hi = F.floor(x / F.lit(65536))
    return (
        lo * F.lit(_KNUTH) + ((hi * F.lit(_KNUTH)) % m32) * F.lit(65536)
    ) % m32


def _unit_hash(col, salt: int):
    """`_hash32` scaled to [0,1): the integer is < 2^32 (exact in a
    double) and the divisor a power of two, so the quotient is exact
    and order-preserving — comparisons against fraction thresholds are
    engine-portable bit-for-bit."""
    return _hash32(col, salt).cast("double") / F.lit(float(2**32))


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
    return _copies_from_weight(df, id_col, w, salt)


def _copies_from_weight(df: DataFrame, id_col: str, w, salt: int) -> DataFrame:
    """Shared copy-materialization: weight w = k + f → k copies plus
    one more iff unit_hash(id, salt) < f (E[copies] = w exactly, a
    pure function of the id). Narrow projection + explode — no
    shuffle."""
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


def mixture_temperature(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    scale: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Temperature-smoothed mixture at α = 1/2: per-row weight
    w_s = scale · √(N / n_s), so a stratum's sampled mass is
    ∝ √(p_s) — small sources get upweighted, dominant sources
    damped, the standard multilingual/multi-source smoothing recipe
    (per-row weight q_s/p_s with q_s ∝ p_s^α at α = 1/2,
    un-normalized so the arithmetic stays engine-exact).

    α is FIXED at 1/2 deliberately: √ is a correctly-rounded IEEE
    operation on every engine, so w_s — and therefore the exact copy
    draw — is bit-identical between Spark and a SQL oracle. A general
    pow(p, α−1) is not correctly rounded and could flip a
    hash-threshold comparison at the last ulp; callers needing other
    temperatures precompute weights and call ``mixture_resample``.

    Copy materialization is ``mixture_resample``'s exact-draw rule
    (floor + hash-threshold fraction, E[copies] = w). Scale shape:
    one tiny per-stratum count aggregate + a 1-row total, both
    broadcast back — no corpus shuffle, no collect; then the narrow
    explode.
    """
    totals = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n_s"))
    n_rows = df.agg(F.count(F.lit(1)).alias("_n_total"))
    w = F.lit(float(scale)) * F.sqrt(F.col("_n_total") / F.col("_n_s"))
    out = _copies_from_weight(
        df.join(F.broadcast(totals), strata_col).join(F.broadcast(n_rows)),
        id_col, w, salt,
    )
    return out.drop("_n_s", "_n_total")


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


def materialize_packs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    group_col: str | None = None,
    sep: str = " ",
) -> DataFrame:
    """Emit the training sequences ``pack_sequences`` assigns: one row
    per (group, pack_id) with the member documents concatenated in id
    order — the step that actually writes model inputs, downstream of
    the window assignment. Output: group key (if any), ``pack_id``,
    ``doc_ids`` (id-ordered array), ``n_docs``, ``pack_tokens``
    (may exceed ``budget`` by the tail document — a document belongs
    to the window its FIRST token lands in, pack_sequences'
    convention), ``pack_text`` (sep-joined).

    Scale shape: pack_sequences' one window cumsum, then ONE groupBy
    keyed by (group, pack_id). The collect_list per pack is bounded:
    a pack holds at most ~budget tokens of documents (+1 tail doc),
    so state per group is budget-bound regardless of corpus size —
    this is the safe kind of collect_list.
    """
    packed = pack_sequences(df, id_col, text_col, budget, group_col)
    keys = ([group_col] if group_col else []) + ["pack_id"]
    docs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("_id"),
                F.col("n_tokens").alias("_nt"),
                F.col(text_col).alias("_txt"),
            )
        )
    )
    return (
        packed.groupBy(*keys)
        .agg(docs.alias("_docs"))
        .select(
            *keys,
            F.transform("_docs", lambda d: d["_id"]).alias("doc_ids"),
            F.size("_docs").cast("long").alias("n_docs"),
            F.aggregate(
                "_docs",
                F.lit(0).cast("long"),
                lambda acc, d: acc + d["_nt"],
            ).alias("pack_tokens"),
            F.array_join(
                F.transform("_docs", lambda d: d["_txt"]), sep
            ).alias("pack_text"),
        )
    )


#: default salts for the id-hash ops. DISTINCT per operator on purpose:
#: hashing the same ids with the same salt makes decisions correlated
#: (e.g. a mixture's "extra copy" rows would all land in the same split),
#: which silently biases the held-out set. Callers layering several
#: hash-driven ops must keep salts distinct — these defaults already are.
SPLIT_SALT = 0x5917
SHUFFLE_SALT = 0x60BA


def _validate_fractions(fractions: dict[str, float]) -> None:
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must sum to 1 (got {total}): an implicit "
            "remainder bucket would silently mislabel rows"
        )
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"split fractions must be >= 0 (got {fractions})")


def _cum_boundaries(fractions: dict[str, float]) -> list[tuple[str, float]]:
    """Cumulative upper bounds for every split but the last (which
    absorbs the open end). Python float accumulation ON PURPOSE: the
    oracles inline repr() of these exact doubles, so both engines
    compare against bit-identical boundaries."""
    cum, out = 0.0, []
    for name in list(fractions)[:-1]:
        cum += fractions[name]
        out.append((name, cum))
    return out


def _rank_split_case(pos_col: str, total_col: str, fractions):
    """CASE chain assigning a split by rank: pos < floor(cum·n).
    floor(cum·n) in double is engine-portable (n < 2^53, IEEE)."""
    expr = F.lit(list(fractions)[-1])
    for name, bound in reversed(_cum_boundaries(fractions)):
        expr = F.when(
            F.col(pos_col) < F.floor(F.lit(bound) * F.col(total_col)),
            F.lit(name),
        ).otherwise(expr)
    return expr


def _bucketed_running(
    df: DataFrame,
    id_col: str,
    salt: int,
    n_buckets: int,
    strata_cols: tuple[str, ...] = (),
    measure_col: str | None = None,
):
    """The module's shared two-level running value over the
    deterministic shuffle order (within ``strata_cols`` if given),
    WITHOUT a single-task global window: rows hash into ``n_buckets``
    contiguous hash ranges (bucket = floor(h·B) is monotone in h, so
    bucket boundaries are prefixes of the order); each (strata,
    bucket) computes its value locally under a partitioned window,
    and per-bucket totals prefix-sum into broadcast offsets.

    Returns ``(frame, bucket_totals)``: frame = df plus ``_run``
    (the 0-based global RANK when ``measure_col`` is None, else the
    INCLUSIVE running sum of ``measure_col``) with the ``_h``/``_bkt``
    helper columns still attached for the caller to drop;
    bucket_totals = one tiny row per (strata, bucket) with ``_n``,
    for callers that need stratum totals.

    Every rank/cumsum operator in this module (global_shuffle, the
    exact splits, the token budgets) is this helper plus a filter or
    CASE — one copy of the machinery, one set of invariants.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
    # h < 1 strictly (integer hash < 2^32 over 2^32), so floor(h·B) is
    # always <= B-1; with B a power of two both products are exact in
    # double, making bucket assignment portable arithmetic too.
    strata = list(strata_cols)
    hashed = df.withColumn("_h", _unit_hash(F.col(id_col), salt)).withColumn(
        "_bkt", F.floor(F.col("_h") * F.lit(n_buckets)).cast("int")
    )
    agg = F.count(F.lit(1)) if measure_col is None else F.sum(measure_col)
    totals = hashed.groupBy(*strata, "_bkt").agg(agg.alias("_n"))
    # strata·B rows total: the prefix window is deliberate and tiny
    prefix = (
        Window.partitionBy(*strata)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *strata,
        "_bkt",
        F.coalesce(F.sum("_n").over(prefix), F.lit(0)).alias("_off"),
    )
    joined = hashed.join(F.broadcast(offsets), [*strata, "_bkt"])
    if measure_col is None:
        local = Window.partitionBy(*strata, "_bkt").orderBy("_h", id_col)
        run = F.col("_off") + F.row_number().over(local) - 1
    else:
        local = (
            Window.partitionBy(*strata, "_bkt")
            .orderBy("_h", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = F.col("_off") + F.sum(measure_col).over(local)
    return joined.withColumn("_run", run.cast("long")).drop("_off"), totals


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = SPLIT_SALT,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    whose cumulative-fraction interval contains unit_hash(id, salt) —
    the standard hash-split of a training-data pipeline, reproducible
    by any engine (plain integer arithmetic, no engine RNG).

    Properties a sampled split does NOT give you: membership is a pure
    function of (id, salt) — a re-run, a backfill, or an incremental
    batch assigns every old row identically (no eval example ever
    migrates into train); and any auditor can recompute membership
    from the id alone. Expected sizes are |df|·fraction (binomial, not
    exact-count — exact-count splits need a global sort; see
    ``global_shuffle`` if rank-based slicing is required).

    ``fractions`` must sum to 1 (±1e-9): an implicit remainder bucket
    would silently mislabel rows, so an incomplete recipe raises. The
    LAST entry absorbs the interval's open end (h < 1 always).

    Scale shape: one narrow projection — no shuffle, no Python; the
    CASE chain is O(|fractions|) comparisons per row in codegen.
    """
    _validate_fractions(fractions)
    h = _unit_hash(F.col(id_col), salt)
    expr = F.lit(list(fractions)[-1])
    for name, bound in reversed(_cum_boundaries(fractions)):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_exact(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = SPLIT_SALT,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact-count train/val/test split: rank rows by the deterministic
    shuffle order (``global_shuffle``'s shuffle_pos) and cut at the
    cumulative-fraction boundaries floor(cum_k · n). Split k's size is
    floor(cum_k·n) − floor(cum_{k−1}·n) ∈ {⌊f_k·n⌋, ⌈f_k·n⌉} — exactly
    the requested proportions, unlike ``split_assign``'s binomial
    hash-split (whose docstring points here).

    The trade the caller makes: membership is a function of the WHOLE
    corpus (a row's rank moves when other rows are added/removed), so
    incremental batches can migrate rows across splits — use
    ``split_assign`` when stability under growth matters more than
    exact counts. Deterministic for a fixed corpus: same rows + same
    salt → identical assignment on any engine.

    Output: input columns + ``shuffle_pos`` + ``split``.

    Scale shape: global_shuffle's one bucket-keyed shuffle + B-row
    broadcast prefix sum (no single-task global window), plus ONE
    1-row count aggregate broadcast back for the boundaries. The CASE
    chain is O(|fractions|) codegen comparisons per row.
    """
    _validate_fractions(fractions)
    shuffled = global_shuffle(df, id_col, salt=salt, n_buckets=n_buckets)
    # count the INPUT, not the shuffled plan: global_shuffle preserves
    # row count, and the optimizer can't prune its bucket-offsets join
    # out of a count — aggregating `shuffled` would re-run the whole
    # window machinery just to count rows
    n_rows = df.agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        shuffled.join(F.broadcast(n_rows))
        .withColumn(
            "split", _rank_split_case("shuffle_pos", "_n_total", fractions)
        )
        .drop("_n_total")
    )


def take_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    salt: int = SHUFFLE_SALT,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic token-budget prefix: keep the documents whose
    START offset in the deterministic shuffle order falls inside
    ``budget_tokens`` — the "assemble a 10B-token mix from this
    source" step of a pretraining recipe, as a pure DataFrame plan.
    A document is kept iff the total tokens BEFORE it < budget (the
    ``pack_sequences`` start-offset convention), so the kept set
    covers the budget with at most one document of overshoot and is
    a pure function of (corpus, salt) — rerunnable and
    engine-auditable, unlike a rate-based sample that only hits the
    budget in expectation.

    Output: input columns + ``n_tokens`` (whitespace tokens) +
    ``cum_tokens`` (inclusive running total in shuffle order).

    Scale shape: the global running total uses the same two-level
    trick as ``global_shuffle`` — per-bucket window cumsum (parallel)
    plus a broadcast B-row prefix sum of bucket token totals; no
    single-task global window, one shuffle keyed by bucket.
    """
    from boatrace_database_spark.operators.text import token_count

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1 (got {budget_tokens})")
    counted = df.withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )
    frame, _ = _bucketed_running(
        counted, id_col, salt, n_buckets, measure_col="n_tokens"
    )
    return (
        frame.withColumnRenamed("_run", "cum_tokens")
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.lit(budget_tokens))
        .drop("_h", "_bkt")
    )


def take_token_budget_stratified(
    df: DataFrame,
    id_col: str,
    text_col: str,
    strata_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    salt: int = SHUFFLE_SALT,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-stratum token budgets — the token-unit mixture recipe
    ("2B tokens of wiki, 500M of code"): within each stratum, keep the
    documents whose start offset in that stratum's deterministic
    shuffle order falls inside the stratum's budget. Strata absent
    from ``budgets`` get ``default_budget`` (0 drops them — an
    explicit recipe, not a silent pass-through).

    Where ``mixture_resample`` weights sources in EPOCHS (documents),
    this cuts them in TOKENS — what a context-window-budgeted
    pretraining run actually provisions. Composition: resample the
    upweighted sources first, then budget-cut the total.

    Output: input columns + ``n_tokens`` + ``stratum_cum_tokens``
    (inclusive running total within the stratum's shuffle order).

    Scale shape: identical to ``split_exact_stratified`` — the window
    partitions by (stratum, bucket) so no stratum serializes; offsets
    are a broadcast strata·B-row prefix sum; the budget CASE is
    O(|budgets|) codegen comparisons.
    """
    if any(b < 0 for b in budgets.values()) or default_budget < 0:
        raise ValueError(f"budgets must be >= 0 (got {budgets})")
    from boatrace_database_spark.operators.text import token_count

    budget = F.lit(int(default_budget))
    for name, b in budgets.items():
        budget = F.when(
            F.col(strata_col) == name, F.lit(int(b))
        ).otherwise(budget)
    counted = df.withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )
    frame, _ = _bucketed_running(
        counted, id_col, salt, n_buckets,
        strata_cols=(strata_col,), measure_col="n_tokens",
    )
    return (
        frame.withColumnRenamed("_run", "stratum_cum_tokens")
        .where(
            F.col("stratum_cum_tokens") - F.col("n_tokens") < budget
        )
        .drop("_h", "_bkt")
    )


def split_exact_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: int = SPLIT_SALT,
    n_buckets: int = 1024,
) -> DataFrame:
    """``split_exact`` within each stratum: every stratum (source,
    language, domain …) contributes exactly ⌊f·n_s⌋/⌈f·n_s⌉ rows to
    each split — the held-out set preserves the corpus mixture by
    construction, where the global ``split_exact`` only preserves it
    in expectation (a small stratum can easily land entirely in
    train). The standard eval-set recipe when per-source metrics must
    be reportable on exact counts.

    Rank-within-stratum uses the same bucketed prefix-sum as
    ``global_shuffle`` — the window partitions by (stratum, bucket) so
    no stratum serializes into one task; offsets and per-stratum
    totals are two tiny broadcast aggregates (strata·B and strata
    rows). Output adds ``stratum_pos`` (0-based rank within the
    stratum's deterministic shuffle order) and ``split``.

    Same corpus-dependence trade as ``split_exact``: adding rows to a
    stratum re-ranks it, so membership is stable only for a fixed
    corpus; use ``split_assign`` for growth-stable membership.
    """
    _validate_fractions(fractions)
    frame, counts = _bucketed_running(
        df, id_col, salt, n_buckets, strata_cols=(strata_col,)
    )
    totals = counts.groupBy(strata_col).agg(
        F.sum("_n").alias("_n_total")
    )
    return (
        frame.withColumnRenamed("_run", "stratum_pos")
        .join(F.broadcast(totals), strata_col)
        .withColumn(
            "split",
            _rank_split_case("stratum_pos", "_n_total", fractions),
        )
        .drop("_h", "_bkt", "_n_total")
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    salt: int = SHUFFLE_SALT,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global shuffle order for training: adds
    ``shuffle_pos`` (0-based, a permutation of row ranks) ordering rows
    by (unit_hash(id, salt), id) — the "shuffle the corpus before
    epoch 0" step, reproducible across engines and re-runs, with the
    salt as the epoch's shuffle seed.

    A naive global ``row_number() OVER (ORDER BY h)`` funnels every row
    through ONE task (Spark computes an unpartitioned window on a
    single partition) — the classic accidental serialization. Instead:
    rows hash into ``n_buckets`` contiguous hash ranges
    (bucket = floor(h·B), monotone in h, so bucket boundaries are
    prefixes of the global order); each bucket ranks locally (a
    partitioned window — parallel), and bucket offsets come from one
    tiny B-row prefix sum broadcast back. shuffle_pos = offset +
    local_rank − 1 equals the global rank exactly.

    Scale shape: one shuffle keyed by bucket (the partitioned window),
    one O(n_buckets)-row aggregate + broadcast join. Size n_buckets so
    |df|/n_buckets rows fit one task (2^20 buckets at 10^12 rows);
    hash keys make bucket sizes near-uniform regardless of id skew.
    """
    frame, _ = _bucketed_running(df, id_col, salt, n_buckets)
    return frame.withColumnRenamed("_run", "shuffle_pos").drop("_h", "_bkt")


def quantile_gate(
    df: DataFrame,
    score_col: str,
    q: float,
    group_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Percentile-threshold quality filter: keep rows whose
    ``score_col`` sits at or above the q-quantile WITHIN their group —
    the 'drop the worst X% per source' gate every corpus-quality
    pipeline ends with (CCNet buckets by LM perplexity quantile;
    FineWeb ablates per-dump percentile cuts). Output: the input rows
    that survive, plus a ``pctile`` column (the row's percent_rank in
    its group, 0 = worst).

    Two physical strategies, same contract:

    - ``exact=True``: ANSI ``percent_rank`` window per group — one
      shuffle on the group key and a per-group SORT. Exactly
      oracle-expressible; right when groups fit a partition's sort
      budget.
    - ``exact=False`` (the 100 TB path): per-group
      ``approx_percentile(score, q)`` thresholds — a partial-agg
      scan producing ONE ROW PER GROUP, broadcast back and compared.
      No sort, no window, no corpus-sized shuffle; the trade is the
      sketch's rank error at the cut boundary (rows within the
      quantile sketch's error of the threshold may flip sides), so
      ``pctile`` is NULL on this path — the threshold is the sketch's,
      not a true rank.

    Boundary semantics DIFFER by design between the paths, and by
    whole tied runs, not just sketch error: the exact path ranks a
    tied run at its FIRST rank (ANSI percent_rank — identical in both
    engines), so a run straddling q keeps or DROPS as one block
    depending on where the run starts (an all-tied group drops
    entirely for q > 0); the approx path keeps every row EQUAL to the
    threshold value. Pick the path by contract: exact = "keep the top
    (1-q) by rank", approx = "keep scores >= the q-quantile value".
    NULL groups are a group like any other on BOTH paths (the
    threshold join is null-safe).
    """
    if not 0.0 <= q < 1.0:
        raise ValueError(f"q must be in [0, 1) (got {q})")
    grp = F.col(group_col) if group_col else F.lit(1)
    if exact:
        w = Window.partitionBy(grp).orderBy(F.col(score_col))
        return (
            df.withColumn("pctile", F.round(F.percent_rank().over(w), 6))
            .where(F.col("pctile") >= q)
        )
    thresholds = quantile_thresholds(df, score_col, q, group_col)
    return (
        df.join(
            F.broadcast(thresholds), grp.eqNullSafe(F.col("_grp")), "inner"
        )
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_grp", "_thr")
        .withColumn("pctile", F.lit(None).cast("double"))
    )


def quantile_thresholds(
    df: DataFrame,
    score_col: str,
    q: float,
    group_col: str | None = None,
) -> DataFrame:
    """Per-group q-quantile score thresholds (``_grp``, ``_thr``) via
    ``approx_percentile`` — one partial-agg scan, one tiny row per
    group. This is `quantile_gate(exact=False)`'s threshold table,
    exposed so it can be PERSISTED and reused as the static gate of a
    streaming ingest (`stream_quality_gate`): calibrate quantiles on
    the warehouse corpus, gate the firehose against them."""
    grp = F.col(group_col) if group_col else F.lit(1)
    return df.groupBy(grp.alias("_grp")).agg(
        F.percentile_approx(F.col(score_col), F.lit(q)).alias("_thr")
    )


RESERVOIR_SALT = 0x7A1E


def sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: int = RESERVOIR_SALT,
) -> DataFrame:
    """Deterministic per-group reservoir sample: EXACTLY min(k, |group|)
    rows per group — the k smallest (hash32(id, salt), id) within each
    group. The distributed equivalent of seeded reservoir sampling:
    membership is a pure function of (salt, the group's id set), so
    re-runs and backfills agree row-for-row and any engine can
    recompute the member set (plain integer arithmetic, no engine
    RNG). Adds ``sample_rank`` (0-based hash-order rank within the
    group) so callers can take nested prefixes: the rank-<j subset of
    a rank-<k sample IS the j-sample — shrinking a sample never
    reshuffles it.

    vs the built-ins: ``df.sampleBy`` is binomial per-row (group
    yields vary run to run, never exactly k) and seeds don't survive
    repartitioning; ``rdd.takeSample`` collects to the driver. This
    is exact-count, distributed, and engine-portable.

    Scale shape: ONE shuffle on the group key feeding a row_number
    window; the sort is per-group, not global. A monster group bounds
    the longest task at O(|group| log |group|) — the standard
    per-group-rank caveat; if one group outgrows a task, pre-filter
    with an approximate per-partition top-k on the same hash (the
    hash order makes local pruning sound: only a partition's k
    smallest can survive globally).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        _hash32(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(
            "sample_rank", (F.row_number().over(w) - 1).cast("long")
        )
        .where(F.col("sample_rank") < k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    weight_col: str,
    salt: int = RESERVOIR_SALT,
) -> DataFrame:
    """``sample_per_group`` with per-row WEIGHTS: exactly min(k,
    |group|) rows per group, where a row's selection probability
    scales with ``weight_col`` — the Efraimidis–Spirakis A-ES scheme
    (rank by exponential jump -ln(u)/w ascending; u the deterministic
    unit hash). Weight-2 rows win against weight-1 rows exactly as
    often as two independent unit-weight copies would — the classical
    weighted-reservoir guarantee — while staying a pure function of
    (id, salt, weights): re-runs, backfills, and the SQL oracle
    reproduce the member set.

    Rows with NULL, zero, or negative weight are EXCLUDED (they can
    never be drawn — a weight of 0 means "not in the population";
    raise upstream if that's a data bug worth failing on). u is
    shifted to (0,1] so ln(0) can't occur. Same single keyed-window
    scale shape and monster-group caveat as ``sample_per_group``;
    nested-prefix stability holds per fixed weights (changing a
    weight re-keys only that row).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (_hash32(F.col(id_col), salt).cast("double") + F.lit(1.0)) / F.lit(
        float(2**32)
    )
    jump = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        jump.asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(
            "sample_rank", (F.row_number().over(w) - 1).cast("long")
        )
        .where(F.col("sample_rank") < k)
    )
