"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the 100 TB story):
- exact: hash-groupBy on the dedup key — one shuffle, map-side partial.
- n-gram Jaccard: exact pairwise similarity via shingle inverted index
  (explode -> self-join on shingle -> count) — correct but O(pairs);
  use on candidate sets, not the full corpus.
- MinHash+LSH: the scale path. Signatures via xxhash64 (JVM, codegen)
  — k independent hashes from k seeds; banding turns all-pairs into
  per-bucket joins. Only candidate pairs (sharing a band bucket) are
  scored. This is shuffle-bounded by bucket size, not corpus size².
- SimHash: 64-bit weighted-majority fingerprint; near-dup = small
  Hamming distance; banding over 16-bit chunks for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact
def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group (deterministic)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies")
    )


def exact_dedup_by(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    rank_col: str,
    descending: bool = True,
) -> DataFrame:
    """``exact_dedup`` with a keeper POLICY: keep the row maximizing
    (default) or minimizing ``rank_col`` per duplicate group — real
    pipelines keep the BEST duplicate (highest quality score, longest
    text, newest crawl), not the lowest id. Ties break to the lowest
    id, so the choice stays deterministic; id-type generic (the
    tie-break is an ORDER BY, not arithmetic).

    Output: key_cols + ``keeper_id`` + ``keeper_<rank_col>`` +
    ``n_copies``.

    Scale shape: ONE shuffle on the keys feeding two same-partitioned
    windows (rank + group count share the exchange), then the rn=1
    filter — the groupBy path's cost class with an ordering policy
    attached.
    """
    # nulls pin LAST in BOTH directions: a row with no rank must never
    # win keeper over a scored row (Spark's bare asc() is NULLS FIRST)
    direction = (
        F.desc_nulls_last(rank_col)
        if descending
        else F.asc_nulls_last(rank_col)
    )
    w = Window.partitionBy(*key_cols).orderBy(direction, F.asc(id_col))
    wall = Window.partitionBy(*key_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(wall))
        .where(F.col("_rn") == 1)
        .select(
            *key_cols,
            F.col(id_col).alias("keeper_id"),
            F.col(rank_col).alias(f"keeper_{rank_col}"),
            "n_copies",
        )
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_keys: DataFrame,
    key_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Daily-ingest dedup: deduplicate an ARRIVING batch against
    itself AND against the persisted keeper table, without rescanning
    the corpus. ``seen_keys`` is the keeper table's key projection
    (e.g. normalized-text fingerprints already in the warehouse).
    Returns the batch's genuinely NEW keepers — one row per
    previously-unseen key (key_cols + keeper_id + n_copies, counting
    only this batch's copies) — ready to append back to the keeper
    table; batch rows whose key is already known are dropped.

    The batch twin of ``stream_dedup_exact``'s first-seen state: the
    stream holds the seen-set in operator state, this reads it from
    the table the previous batches wrote — the standard daily-ingest
    deployment where state must survive job restarts for free.

    Scale shape — a two-hop probe, because a naive
    ``batch.join(seen, anti)`` CANNOT avoid shuffling the keeper
    table: Spark anti-joins only build/broadcast the RIGHT side, so
    the 100 TB keeper would either exceed the broadcast gate or force
    a sort-merge shuffle of every keeper key. Instead (1) a LEFT-SEMI
    probe streams the keeper table past the BROADCAST batch keys once
    (no keeper shuffle, emits only the tiny hit set — at most one row
    per seen duplicate key), then (2) the batch anti-joins against
    that broadcast hit set. Both joins build the daily-sized side;
    the keeper scan prunes further if the table is bucketed on the
    key. The hit set is not de-duplicated: anti-join semantics ignore
    right-side duplicates, and the set is batch-bounded either way.
    """
    batch_keepers = exact_dedup(new_df, key_cols, id_col).localCheckpoint(
        eager=False
    )  # groupBy output feeds both join branches; materialize once
    hits = seen_keys.select(*key_cols).join(
        F.broadcast(batch_keepers.select(*key_cols)), key_cols, "left_semi"
    )
    return batch_keepers.join(F.broadcast(hits), key_cols, "left_anti")


# --------------------------------------------------------------------------
# shingles
def word_shingles(text_col, n: int = 3):
    """Distinct n-word shingles of a text column (array<string>).

    JVM higher-order functions — measured faster than an Arrow kernel
    at this shingle volume (the per-doc work is tiny; Python worker
    round-trips dominate). Documents with fewer than n tokens yield an
    empty array explicitly: Spark's sequence(1, k) DESCENDS when k < 1,
    which would feed slice() an invalid 0 start."""
    words = F.split(F.trim(text_col), r"\s+")
    k = F.size(words) - (n - 1)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return F.when(k >= 1, shingles).otherwise(F.array().cast("array<string>"))


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) inverted-index rows.

    Repartitions the input first: document tables often arrive as one
    file = one partition, which would serialize the shingle+hash work
    onto a single core. One cheap narrow-input shuffle buys full
    parallelism for everything downstream.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(parallelism, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index pair join)
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold (id_a < id_b).

    Co-occurrence counting via the inverted index: pairs that share no
    shingle are never materialized.
    """
    # the inverted index feeds the sizes aggregate AND both self-join
    # branches; Spark re-evaluates common subplans, so materialize once.
    # Shingles cross every downstream shuffle/join as xxhash64 LONGS:
    # only shingle EQUALITY matters past this point (set sizes, the
    # self-join key, co-occurrence counts) and no output column carries
    # a shingle — an 8-byte key where the string form shuffled ~20+
    # bytes and paid string comparisons in the join (guide §2.3).
    # word_shingles applied array_distinct upstream, so per-doc
    # distinctness is preserved (modulo 64-bit collisions, the same
    # accepted tradeoff as the MinHash/SimHash signatures).
    sh = (
        shingle_table(df, id_col, text_col, n)
        .select("id", F.xxhash64("shingle").alias("shingle"))
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    # carry each id's set size on the index rows (AQE broadcasts the
    # tiny sizes side here; at scale it's a co-partitioned hash join):
    # enables the AllPairs length filter below and makes the final
    # jaccard computable inside the groupBy — no join-back of sizes.
    shs = sh.join(sizes, "id")
    a = shs.alias("a")
    b = shs.alias("b")
    # length filter: jaccard >= t forces t·|B| <= |A| (for |A| <= |B|),
    # so size-incompatible pairs are pruned BEFORE the co-occurrence
    # aggregate ever counts them. Epsilon keeps borderline candidates —
    # pruning is a pure optimization, the jaccard predicate below is
    # still the only thing that decides membership.
    eps = 1e-9
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.set_size") >= threshold * F.col("b.set_size") - eps)
            & (F.col("b.set_size") >= threshold * F.col("a.set_size") - eps),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
def minhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    max_df: float | None = None,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Scalable form: explode shingles once, then one groupBy(id) with k
    static `min(xxhash64(shingle, seed_k))` aggregates — k independent
    JVM-side hash functions, map-side partial mins, a single shuffle.
    (A nested higher-order-function formulation re-evaluates the
    shingle array per hash and serializes on one core — 64x slower.)

    ``max_df`` (document-frequency weighting): drop shingles present in
    more than that fraction of documents BEFORE hashing — the
    shingle-space analog of stopword removal. Boilerplate shared by
    most of a corpus (headers, licence blocks, templates) otherwise
    dominates min-hashes and inflates estimated similarity between
    unrelated documents; at web scale this is the difference between
    banding that prunes and banding that doesn't. One extra groupBy on
    the (already materialized) inverted index; the surviving-shingle
    join is broadcast for small vocabularies and a hash join at scale.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    if max_df is not None:
        n_docs = df.select(id_col).distinct().count()
        cap = int(max_df * n_docs)
        if cap < 1:
            # a cap of 0 would drop EVERY shingle (df >= 1 always) and
            # silently return zero signatures — make the degenerate
            # configuration an explicit decision
            raise ValueError(
                f"max_df={max_df} with {n_docs} documents caps document "
                "frequency below 1 — every shingle would be dropped; "
                "raise max_df or grow the corpus"
            )
        # countDistinct, not count: shingle_table rows are distinct per
        # (id, shingle) today (word_shingles applies array_distinct),
        # but document frequency must not silently become occurrence
        # count if that upstream ever changes
        rare = (
            sh.groupBy("shingle")
            .agg(F.countDistinct("id").alias("_df"))
            .where(F.col("_df") <= cap)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    mins = sh.groupBy("id").agg(
        *[
            F.min(F.xxhash64("shingle", F.lit(seed))).alias(f"m{seed}")
            for seed in range(num_hashes)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{seed}") for seed in range(num_hashes)]).alias("sig")
    )


def _cap_buckets(banded: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop degenerate LSH buckets (the hash-space analog of stopwords).

    A bucket holding b ids yields b²/2 candidate pairs; corpora with a
    shared vocabulary produce a few huge buckets that dominate runtime
    while contributing near-zero precision. Capping bounds the join at
    O(buckets × max_bucket²) — the standard scale guard.

    Broadcasts the KEEP set (one row per surviving bucket) — right for
    batch-sized inputs where that list is bounded; for corpus-sized
    inputs use `_drop_fat_buckets`, which broadcasts the (few) fat
    buckets instead.
    """
    counts = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    return banded.join(
        F.broadcast(counts.where(F.col("_bsz") <= max_bucket)), on=keys
    ).drop("_bsz")


def _drop_fat_buckets(
    banded: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """`_cap_buckets` inverted for CORPUS-sized tables: the broadcast
    side is the fat-bucket list (`_bsz > max_bucket` — few by
    construction, they are the degenerate outliers), anti-joined away.
    Output-identical to `_cap_buckets` (tested); the bucket-count
    aggregate is a map-side-combined pass over the table, bounded by
    distinct bucket keys per partition, and the broadcast never grows
    with table size."""
    counts = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    return banded.join(
        F.broadcast(counts.where(F.col("_bsz") > max_bucket).select(*keys)),
        on=keys,
        how="left_anti",
    )


def _minhash_banded(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a (id, sig) table to (id, sig, band, bucket) rows — one
    row per band, bucket = hash of that band's signature slice."""
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band), b).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-band bucket-size distribution — the banding tuning dial.

    The candidate join's cost is Σ over buckets of b·(b-1)/2, so BEFORE
    running a full near-dup pass at scale you look here: a fat
    max/p99 bucket means degenerate buckets (cap them or deepen the
    bands), est_candidate_pairs ≈ the join's row count. Two groupBy
    cascades, no joins — cheap at any corpus size.

    Columns per band: n_docs, n_buckets, max_bucket, p99_bucket,
    avg_bucket, est_candidate_pairs.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_table(df, id_col, text_col, num_hashes, shingle_n)
    sizes = _minhash_banded(sig, bands, rows_per_band).groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.sum("sz").alias("n_docs"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket"),
            F.percentile_approx("sz", 0.99).alias("p99_bucket"),
            F.round(F.avg("sz"), 2).alias("avg_bucket"),
            F.sum(F.expr("sz * (sz - 1) / 2")).cast("long").alias(
                "est_candidate_pairs"
            ),
        )
        .orderBy("band")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 256,
    max_df: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding + signature-estimated Jaccard.

    rows/band = num_hashes/bands; a pair collides if any band's hash
    slice matches exactly. Estimated Jaccard = fraction of equal
    signature positions. The expensive all-pairs comparison never
    happens — only per-bucket joins. ``max_df`` forwards to
    minhash_table: boilerplate-heavy corpora drop ubiquitous shingles
    before hashing so similarity reflects distinguishing content.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_table(df, id_col, text_col, num_hashes, shingle_n, max_df)

    banded = _minhash_banded(sig, bands, rows_per_band)
    # both self-join branches would recompute the signatures otherwise
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket).localCheckpoint(
        eager=False
    )
    return _banded_pairs(banded, num_hashes, threshold)


def _est_jaccard(num_hashes: int, sig_a: str = "sig_a", sig_b: str = "sig_b"):
    """Signature-estimated Jaccard = matching positions / num_hashes."""
    return F.round(
        F.size(
            F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda e: e)
        )
        / F.lit(float(num_hashes)),
        6,
    )


def _banded_pairs(
    banded: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Self-join an (id, sig, band, bucket) table into scored candidate
    pairs (id_a < id_b, est_jaccard >= threshold). The est filter runs
    BEFORE the pair-dedup: it is a pure function of the pair, so
    filter-then-dedup is output-identical, the dedup shuffle moves only
    the (rare) passing pairs, and the wide signature arrays never ride
    a shuffle at all."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .withColumn("est_jaccard", _est_jaccard(num_hashes))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def _seen_probe(
    seen_banded: DataFrame,
    capped_banded: DataFrame,
    num_hashes: int,
    threshold: float,
    max_seen_bucket: int | None = None,
) -> DataFrame:
    """The incremental near-dup seen-probe: batch ids whose estimated
    Jaccard vs any seen keeper clears the threshold. The seen side is
    only SCANNED — the batch side is broadcast, so every join builds
    the batch (plan-asserted in tests, exposed as a helper precisely
    so the contract stays inspectable past the caller's lineage cut)."""
    seen = seen_banded
    if max_seen_bucket is not None:
        # corpus-sized side: broadcast the FAT buckets (few), not the
        # keep set (≈ every bucket key in the table) — costs one
        # map-side-combined count pass over seen, never a huge broadcast
        seen = _drop_fat_buckets(seen, ["band", "bucket"], max_seen_bucket)
    return (
        seen.alias("s")
        .join(
            F.broadcast(
                capped_banded.selectExpr(
                    "id AS id_b", "sig AS sig_b", "band", "bucket"
                )
            ),
            ["band", "bucket"],
        )
        .select(
            F.col("id_b").alias("id"),
            _est_jaccard(num_hashes, "s.sig", "sig_b").alias("est"),
        )
        .where(F.col("est") >= threshold)
        .select("id")
        .distinct()
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    seen_banded: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 256,
    max_seen_bucket: int | None = None,
) -> DataFrame:
    """Daily-ingest NEAR-dup dedup — `incremental_exact_dedup`'s fuzzy
    twin: drop arriving docs whose estimated Jaccard vs any PREVIOUSLY
    KEPT doc clears ``threshold``, then near-dup the survivors among
    themselves (min-id keeper per connected cluster). ``seen_banded``
    is the persisted keeper band table — exactly this function's own
    output schema (id, sig, band, bucket), so each batch's result
    appends straight back (pass an empty frame for the first batch;
    the batch twin of ``stream_dedup_minhash``'s state, read from the
    warehouse so it survives job restarts for free).

    Returns the banded rows of the batch's genuinely-new keepers.
    Like every LSH dedup, transitivity is approximate: a batch doc
    whose only link to the keeper table runs THROUGH a dropped
    batch-mate survives (same approximation the one-shot pass makes
    for cluster chaining). No ``max_df`` dial here ON PURPOSE:
    document-frequency weighting computed per batch would build
    signatures over batch-dependent shingle sets, making them
    incomparable with the persisted table's — admission would depend
    on batch composition, not content. Weight shingles with a GLOBAL
    df table upstream if boilerplate needs suppressing.

    Capping is candidate-side only and therefore CONSERVATIVE, never
    lossy: ``max_bucket`` caps the batch's degenerate buckets in the
    probe and the self-join (bounding the broadcast and the per-seen-
    row fan-out), but the RETURNED keeper rows are the uncapped
    banding — a doc whose every bucket is capped is simply admitted
    un-compared (possibly a duplicate copy), never silently dropped.
    ``max_seen_bucket`` (off by default) additionally caps the seen
    side at probe time: the accumulated table can concentrate
    hash-colliding-but-dissimilar content in one (band, bucket) over
    many batches, growing probe fan-out with ingest history; capping
    bounds it at the price of possibly admitting duplicates of
    fat-bucket content.

    Scale shape: signatures/banding are computed on the (daily-sized)
    batch only — the corpus is never re-shingled; the seen-probe joins
    the persisted band table on (band, bucket) with the BATCH side
    broadcast, so the 100 TB band table streams past once with no
    shuffle (partition it by ``band`` on disk and the scan prunes to
    the batch's bands — all of them, usually — but stays
    one-pass); est-Jaccard filters INSIDE that probe so only matching
    ids come back. Within-batch dedup is the standard banded
    self-join, trivially sized.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_table(new_df, id_col, text_col, num_hashes, shingle_n)
    banded = _minhash_banded(sig, bands, rows_per_band).localCheckpoint(
        eager=False
    )
    capped = _cap_buckets(banded, ["band", "bucket"], max_bucket)

    dup_of_seen = _seen_probe(
        seen_banded, capped, num_hashes, threshold, max_seen_bucket
    ).localCheckpoint(eager=False)  # feeds the pair stage AND the
    # final removal union — without this the corpus-sized seen probe
    # (scan + fat-bucket aggregate) would run twice per batch

    pairs = _banded_pairs(
        capped.join(F.broadcast(dup_of_seen), "id", "left_anti"),
        num_hashes,
        threshold,
    )
    comp = connected_components(pairs)  # (id, comp=min reachable id)
    dropped = comp.where(F.col("id") != F.col("comp")).select("id")
    removed = dup_of_seen.unionByName(dropped).distinct()
    return banded.join(F.broadcast(removed), "id", "left_anti")


# --------------------------------------------------------------------------
# duplicate clusters (what a pipeline does with the pair lists)
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    collect_max_edges: int = 2_000_000,
) -> DataFrame:
    """Transitive closure over near-dup pairs -> (id, component) with
    component = the smallest id reachable from `id`.

    Strategy is size-gated like the scoring paths in similarity.py:

    - symmetrized edge list <= ``collect_max_edges``: pull it to the
      driver over Arrow and union-find there (the iterative path's
      fixed per-round job overhead dominates small graphs by 10-100x).
      The gate itself is a LIMIT of gate+1 rows, so deciding the path
      and fetching the edges is ONE bounded action, not a count plus a
      separate pull. Output is identical: each node labeled with its
      component's minimum id. Memory math for the gate: the limit is
      over SYMMETRIZED edges (2x the input pair count); the Arrow pull
      is two int64 columns (~32 MB at the 2M default) and the
      union-find dicts hold up to 2·edges Python ints — plan for
      roughly 100-150 bytes per edge of peak driver heap (~300 MB at
      the default gate) before raising it.
    - larger: iterative min-label propagation (the scalable
      alternating small-star/large-star family in its simplest form):
      each round every node adopts the minimum label among itself and
      its neighbors; rounds needed ~= graph diameter (near-dup
      clusters are shallow). Each round is one join + one aggregate;
      lineage is cut per round (localCheckpoint) so plans stay flat.
      Convergence is detected by counting label changes — the loop is
      driver-side but touches only a scalar per round. Set
      ``collect_max_edges=0`` to force this path (tests do).
    """
    # materialize the (possibly expensive) upstream pair plan ONCE
    # before symmetrizing: the two union branches otherwise re-execute
    # the whole pair pipeline each (measured: +27 s on sf1's
    # semantic_dedup, whose scoring pass alone is the query's cost)
    directed = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=False)
    edges = (
        directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # gate + pull folded into ONE bounded action (r14, guide §1): a
    # LIMIT of gate+1 rows decides the path AND, when it wins, already
    # holds the whole edge list (a limit that returns <= gate rows is
    # exhaustive). The old shape ran three jobs here — eager checkpoint,
    # count, toPandas — per invocation. Memory stays bounded by the
    # gate either way; the checkpoint is lazy so the iterative path
    # materializes it on its first join exactly as before.
    pdf = edges.limit(collect_max_edges + 1).toPandas()
    if len(pdf) <= collect_max_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # (pdf arrived over Arrow above: two flat int64 columns, ~5x
        # less driver heap than Row objects at the gate boundary)
        for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for node in parent:
            root = find(node)
            prev = comp_min.get(root)
            comp_min[root] = node if prev is None or node < prev else prev
        id_type = edges.schema["src"].dataType.simpleString()
        spark = pairs.sparkSession
        return spark.createDataFrame(
            [(n, comp_min[find(n)]) for n in parent],
            f"id {id_type}, comp {id_type}",
        )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
                (F.coalesce(F.col("nmin"), F.col("comp")) < F.col("comp")).alias(
                    "changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.where("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    else:
        # silent non-convergence would split one cluster into several
        # keepers; a component wider than max_iterations hops must be
        # an explicit decision (raise, caller bumps the budget)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({n_changed} labels still changing) — raise "
            "max_iterations (rounds needed ~= component diameter)"
        )
    return labels


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str,
    id_a: str = "id_a", id_b: str = "id_b",
) -> DataFrame:
    """Assign every row its duplicate-cluster keeper: rows appearing in
    `pairs` collapse to their component's minimum id, untouched rows
    keep themselves. The end state of a dedup pipeline — filter
    `WHERE id = keeper_id` to drop duplicates."""
    comp = connected_components(pairs, id_a, id_b)
    return df.join(
        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
    ).select(
        id_col,
        F.coalesce("comp", F.col(id_col)).alias("keeper_id"),
    )


# --------------------------------------------------------------------------
# SimHash
def simhash_table(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 2, bits: int = 64
) -> DataFrame:
    """(id, sim) SimHash per row: per-shingle xxhash64, weighted majority
    per bit.

    Scalable form: explode shingles -> one groupBy with `bits` static
    bit-vote aggregates (shift amounts must be Python ints — Spark's
    shiftright takes no column offset). One shuffle on id, map-side
    partial sums. Default 64 bits (the Manku et al. fingerprint width):
    a 10x replicated-corpus probe (scripts/scale_dedup_bench.py)
    measured 32-bit saturating at 50k docs — random Hamming-<=4
    collisions (~1e-5 of all pairs in a 32-bit space) tripled the pair
    count over linear, while 64-bit held linearity 0.99 for +40% CPU
    (the wider codegen'd aggregate). Pass bits=32 only for small
    corpora where compile time dominates.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n).withColumn(
        "h", F.xxhash64("shingle")
    )
    # Each aggregate/reconstruction term is ONE F.expr SQL string rather
    # than a chain of ~6 Column operator calls: with 64 bit positions the
    # operator form cost ~400 py4j round trips ≈ 1.5 s of driver time per
    # invocation (measured r13; the JVM expression trees are identical —
    # same sum((shiftright(h,b) & 1) * 2 - 1) votes, same conditional
    # bit reconstruction — so results are byte-equal).
    votes = sh.groupBy("id").agg(
        *[
            F.expr(
                f"sum((shiftright(h, {b}) & CAST(1 AS BIGINT)) * 2 - 1)"
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    terms = " + ".join(
        f"IF(v{b} > 0, CAST({-(1 << 63) if b == 63 else (1 << b)} AS BIGINT),"
        " CAST(0 AS BIGINT))"
        for b in range(bits)
    )
    return votes.select("id", F.expr(f"CAST(0 AS BIGINT) + {terms}").alias("sim"))


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    shingle_n: int = 2,
    max_bucket: int = 256,
    bits: int = 64,
    chunk_bits: int | None = None,
    key_chunks: int | None = None,
    n_docs: int | None = None,
    skew: float | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on signature
    chunks.

    Blocking: bits/chunk_bits chunks — a pair within Hamming distance <
    n_chunks must share at least one chunk exactly (pigeonhole; the
    64/8 small-corpus plan guarantees distance <= 7 and covers
    max_hamming=8 with high probability), and wider distances still
    collide often. Random non-dup pairs share a given chunk w.p.
    2^-chunk_bits, so candidate noise stays small; degenerate buckets
    are capped (_cap_buckets).

    Banding dials are SIZE- and OCCUPANCY-derived by default (rounds
    12-13, closing the r11 verdict's one silent-cap survivor and the
    r12 skew loop): ``chunk_bits=None, key_chunks=None`` hands the
    geometry to `resolve_hamming_banding` — under ~52k docs the
    uniform model returns the historical ``(8, 1)`` plan
    byte-identically, past it escalates to combinatorial chunk-subset
    bands (Manku et al.'s permute-and-split shape) that are
    pigeonhole-COMPLETE for the full ``max_hamming`` — and the
    candidate plan's REAL bucket occupancy is then probed with one
    aggregate, re-deriving once with the measured p99/avg skew when
    the uniform assumption would drop rows (sf1's real text read
    ``simhash_capped_frac`` 0.193 at the uniform stay plan; r12 only
    measured that number, r13 feeds it back). The old fixed default
    silently dropped EVERY bucket past ~``max_bucket·2^8`` ≈ 65k docs
    — the defect class measured on dHash at sf1 (recall 0.13,
    BENCHNOTES §45b), one decade above simhash's own anchor. Deriving
    costs one count + one occupancy aggregate over the (eagerly
    checkpointed, then reused) signature table; pass ``n_docs`` to
    skip the count, an explicit ``skew`` to pin the multiplier, or
    explicit dials to pin a geometry.

    64-bit signatures are the scale-safe width: the 10x scale probe
    (scripts/scale_dedup_bench.py) showed 32-bit random collisions
    tripling the pair count at 50k docs; 64-bit restores linearity.
    """
    sig = simhash_table(df, id_col, text_col, shingle_n, bits)
    return hamming_pairs_banded(
        sig, "id", "sim", max_hamming, max_bucket, bits, chunk_bits,
        key_chunks, n_rows=n_docs, skew=skew,
    )


def derive_hamming_banding(
    n_rows: int,
    bits: int = 64,
    max_hamming: int = 8,
    max_bucket: int = 256,
    skew: float = 1.0,
) -> tuple[int, int]:
    """Size the banded-Hamming-join dials (``chunk_bits``,
    ``key_chunks``) from the corpus size — the r11-verdict pattern
    (derive every scale knob, the way `ann_nprobe` derives from the
    centroid stamp) applied to the one knob that was still a manual
    kwarg. The failure mode being designed out: a band's key space is
    ``2^(chunk_bits·key_chunks)`` buckets, so past ~``max_bucket ×
    keyspace`` rows EVERY bucket overflows `_cap_buckets` and the join
    silently returns nothing (measured: 7-bit dHash bands at 50k
    images → planted-pair recall 0.13, BENCHNOTES §45b; the simhash
    default sat one decade from the same cliff).

    Two regimes:

    * STAY — while projected uniform occupancy ``n_rows/2^8`` is
      within 80% of ``max_bucket``, return the historical
      ``(8, 1)`` plan unchanged (byte-identical demo points; sf1's
      50k-doc anchor sits at 0.76·max_bucket and reads recall 1.0).
    * ESCALATE — enumerate pigeonhole-COMPLETE configs
      (``key_chunks ≤ bits//chunk_bits − max_hamming``, packed key
      ≤ 63 bits) whose key space keeps projected occupancy under
      ``max_bucket/4`` (4× headroom — derived plans must not sit at a
      cliff), and pick the one exploding the fewest bands
      (``C(n_chunks, key_chunks)``), tie-broken toward fewer chunks
      per key then wider chunks. Escalation is strictly better than
      the stay plan: complete for the FULL ``max_hamming`` (the (8,1)
      64-bit default is only high-probability at d=8).

    Raises when no complete config can hold the corpus (defaults top
    out around ``64·2^32`` ≈ 2.7e11 rows) — lower ``max_hamming`` or
    raise ``max_bucket`` explicitly; silent saturation is the one
    outcome this function exists to prevent.

    ``skew`` (round 12, BENCHNOTES §47): the occupancy model above
    assumes UNIFORM band keys, but real corpora skew them — sf1's
    bench quality line read ``simhash_capped_frac`` 0.193 at the (8,1)
    stay plan where uniform keys predict ~0. ``skew`` multiplies the
    projected occupancy (both the stay threshold and the escalation
    head-room), shifting every decision earlier by that factor. The
    honest way to pick it: run `banding_cap_stats` (or read the bench
    quality fraction) on a sample at the current geometry and pass
    p99_bucket/avg_bucket — the default 1.0 keeps the uniform model
    (and the byte-identical demo points).
    """
    from math import comb

    if n_rows < 0:
        raise ValueError(f"derive_hamming_banding: n_rows={n_rows} < 0")
    if skew < 1.0:
        raise ValueError(
            f"derive_hamming_banding: skew={skew} < 1 — skew can only "
            "make saturation EARLIER than the uniform model"
        )
    n_rows = int(n_rows * skew)
    if bits >= 8 and n_rows * 5 <= max_bucket * (1 << 8) * 4:
        return 8, 1
    occ_target = max(1, max_bucket // 4)
    best = None
    best_key = None
    for cb in range(3, min(16, bits) + 1):
        n_chunks = bits // cb
        max_kc = n_chunks - max_hamming
        for kc in range(1, max_kc + 1):
            if cb * kc > 63:
                break
            if n_rows > occ_target * (1 << (cb * kc)):
                continue
            cand_key = (comb(n_chunks, kc), kc, -cb)
            if best is None or cand_key < best_key:
                best, best_key = (cb, kc), cand_key
    if best is None:
        raise ValueError(
            f"derive_hamming_banding: no pigeonhole-complete banding "
            f"holds {n_rows} rows at bits={bits}, "
            f"max_hamming={max_hamming}, max_bucket={max_bucket} — "
            "lower max_hamming or raise max_bucket"
        )
    return best


def _hamming_chunked(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    chunk_bits: int,
    key_chunks: int,
) -> DataFrame:
    """The pre-cap banded table of `hamming_pairs_banded`: one row per
    (id, band) with the packed ``key_chunks``-chunk band key — factored
    out so `banding_cap_stats` can measure what the cap WILL drop on
    the identical plan the join runs."""
    from itertools import combinations

    chunk_mask = (1 << chunk_bits) - 1
    base = sig.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sim"))

    def _chunk_val(c: int):
        return F.shiftright("sim", c * chunk_bits).bitwiseAND(F.lit(chunk_mask))

    def _packed_key(combo: tuple) -> "F.Column":
        key = _chunk_val(combo[0]).cast("long")
        for j, c in enumerate(combo[1:], start=1):
            key = key + F.shiftleft(
                _chunk_val(c).cast("long"), j * chunk_bits
            )
        return key

    n_chunks = bits // chunk_bits
    combos = list(combinations(range(n_chunks), key_chunks))
    return base.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        _packed_key(combo).alias("key"),
                    )
                    for i, combo in enumerate(combos)
                ]
            )
        ).alias("cc"),
    ).select("id", "sim", "cc.chunk", "cc.key")


def measured_banding_skew(
    banded: DataFrame,
    keys: list[str],
    max_bucket: int,
    model_occupancy: float | None = None,
) -> tuple[float, float]:
    """Measure what the uniform occupancy model cannot see: returns
    ``(capped_row_frac, skew)`` of a banded table in ONE aggregate —
    the fraction of banded rows sitting in buckets `_cap_buckets` will
    drop at ``max_bucket``, and the measured-skew factor for
    `derive_hamming_banding`: the ROW-WEIGHTED p99 bucket size (exact
    ``percentile(size, 0.99, size)`` — the bucket size at the 99th
    percentile of ROWS, not of buckets) over the occupancy the UNIFORM
    MODEL predicts for this geometry (``model_occupancy`` = n_rows /
    keyspace; falls back to the observed average when not given).

    Both choices matter: p99-of-BUCKETS is blind when the fat buckets
    are few but hold most rows (37.5% of rows in 0.7% of buckets reads
    a bucket-p99 of ~avg), and p99/observed-avg reads ~1.0 for a
    low-cardinality key distribution (a few uniformly-FAT buckets —
    e.g. signatures drawn from a small alphabet), exactly the regime
    where the model is most wrong. Row-weighted p99 over the model
    occupancy sees both.

    The r13 feedback loop (r12 verdict item #2): round 12 made cap
    drops OBSERVABLE (`banding_cap_stats` → the bench's
    ``*_capped_frac`` quality keys, sf1 simhash reading 0.193 at the
    uniform-model stay plan) but the auto path still defaulted to
    uniform — the caller had to read the bench line and pass ``skew``
    by hand. This is the measurement that closes the loop inside
    `hamming_pairs_banded`."""
    rows, frac, skew = _banded_rows_frac_skew(
        banded, max_bucket, lambda _rows: model_occupancy, keys=keys
    )
    return frac, skew


def _banded_rows_frac_skew(
    banded: DataFrame,
    max_bucket: int,
    occupancy_of_rows,
    keys: list[str] = ("chunk", "key"),
) -> tuple[int, float, float]:
    """The one occupancy aggregate behind `measured_banding_skew`,
    additionally returning the banded ROW COUNT so the auto-derive path
    can fold its separate count job into the probe (every signature
    explodes into a fixed band count, so n = rows / n_bands exactly).
    ``occupancy_of_rows(rows)`` supplies the uniform-model occupancy
    once the row count is known (None/0 falls back to the observed
    average, exactly the prior contract)."""
    row = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .agg(
            F.coalesce(F.sum("_bsz"), F.lit(0)).cast("long").alias("rows"),
            F.coalesce(
                F.sum(F.when(F.col("_bsz") > max_bucket, F.col("_bsz"))),
                F.lit(0),
            )
            .cast("long")
            .alias("dropped"),
            F.avg("_bsz").alias("avg_bucket"),
            # exact percentile with frequency=_bsz: row-weighted; its
            # state is a (size -> freq) map, small because distinct
            # bucket SIZES are few regardless of bucket count
            F.expr("percentile(_bsz, 0.99, _bsz)").alias("p99_bucket"),
        )
        .collect()[0]
    )
    frac = row.dropped / row.rows if row.rows else 0.0
    model_occupancy = occupancy_of_rows(row.rows)
    denom = model_occupancy if model_occupancy else row.avg_bucket
    skew = (
        max(1.0, float(row.p99_bucket) / float(denom)) if denom else 1.0
    )
    return row.rows, frac, skew


def resolve_hamming_banding(
    sig: DataFrame,
    id_col: str = "id",
    sig_col: str = "sim",
    max_hamming: int = 8,
    max_bucket: int = 256,
    bits: int = 64,
    n_rows: int | None = None,
    skew: float | None = None,
    max_capped_frac: float = 0.001,
) -> tuple[int, int]:
    """Resolve the banded-Hamming-join dials for a signature table —
    the auto path of `hamming_pairs_banded`, exposed so the quality
    harness measures the cap fraction at the geometry the join will
    ACTUALLY run.

    ``skew=None`` (default, round 13) closes the r12 skew loop: derive
    a candidate geometry under the uniform occupancy model, measure
    its real occupancy on the identical banded plan
    (`measured_banding_skew` — one aggregate over the exploded chunk
    table), and if the cap would drop more than ``max_capped_frac`` of
    banded rows, re-derive ONCE with the measured p99/avg skew (lifted
    just past the current plan's escape threshold if the ratio alone
    would not move the decision — a saturating plan must not be
    re-picked). Uniform corpora measure ~0 drops and keep the
    uniform-model plan byte-identically; sf1's real text (19.3%
    dropped at the stay plan) escalates without any manual dial.

    One documented non-goal: buckets fat with IDENTICAL signatures
    (exact-duplicate-heavy corpora) share every chunk, so no geometry
    separates them — run `exact_dedup` first; the cap fraction stays
    visible in `banding_cap_stats` either way.

    An explicit ``skew`` pins the multiplier (the round-12 manual
    contract, byte-identical); the measurement job is skipped.

    ``n_rows=None`` with ``skew=None`` (r13): ONE job instead of two —
    the occupancy probe at the stay-candidate geometry (8, 1) already
    knows the row count exactly (every signature explodes into
    ``bits//8`` bands, so n = banded_rows / n_bands), so the separate
    count job is folded into it. When the derived candidate turns out
    to be a different geometry (the escalate regime), that geometry is
    probed as before — the DECISIONS are a pure function of the same
    (n, occupancy) measurements either way, pinned by
    test_resolve_single_probe_matches_counted_path.
    """
    frac = m_skew = None
    if n_rows is None and skew is None and bits >= 8 and bits % 8 == 0:
        probe = _hamming_chunked(sig, id_col, sig_col, bits, 8, 1)
        n_bands = bits // 8
        banded_rows, frac, m_skew = _banded_rows_frac_skew(
            probe, max_bucket, lambda rows: (rows // n_bands) / (1 << 8)
        )
        n_rows = banded_rows // n_bands
        cand = derive_hamming_banding(n_rows, bits, max_hamming, max_bucket, 1.0)
        if cand != (8, 1):
            frac = m_skew = None  # measured at the wrong geometry
        cb, kc = cand
    else:
        if n_rows is None:
            n_rows = sig.count()
        if skew is not None:
            return derive_hamming_banding(
                n_rows, bits, max_hamming, max_bucket, skew
            )
        cb, kc = derive_hamming_banding(n_rows, bits, max_hamming, max_bucket, 1.0)
    if frac is None:
        probe = _hamming_chunked(sig, id_col, sig_col, bits, cb, kc)
        frac, m_skew = measured_banding_skew(
            probe, ["chunk", "key"], max_bucket,
            model_occupancy=n_rows / (1 << (cb * kc)),
        )
    if frac <= max_capped_frac:
        return cb, kc
    # minimal skew that escapes the CURRENT plan's acceptance test in
    # derive_hamming_banding (stay threshold for (8,1); the 4x-headroom
    # occupancy bound for an escalated plan) — p99/avg is the measured
    # shape, but when drops are real the re-derivation must not hand
    # back the same saturating geometry
    if (cb, kc) == (8, 1):
        escape = max_bucket * (1 << 8) * 4 / (5 * n_rows)
    else:
        escape = max(1, max_bucket // 4) * (1 << (cb * kc)) / n_rows
    return derive_hamming_banding(
        n_rows, bits, max_hamming, max_bucket, max(m_skew, escape * 1.01)
    )


def banding_cap_stats(
    banded: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """One-row report of what `_cap_buckets`/`_drop_fat_buckets` WILL
    drop from a banded table at ``max_bucket`` — the observability
    face of the cap (r11 verdict item #2: cap drops were silent, so
    band-key saturation was only ever found by planted-pair anchors).
    Columns: ``rows`` (banded rows), ``dropped_rows`` (rows in
    over-cap buckets), ``buckets``, ``dropped_buckets``, and
    ``capped_row_frac`` = dropped_rows/rows (0.0 when empty) — the
    number the bench quality dict carries per banding family. One
    map-side-combined aggregate over the banded table, no joins."""
    over = F.col("_bsz") > max_bucket
    return (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .agg(
            F.coalesce(F.sum("_bsz"), F.lit(0)).cast("long").alias("rows"),
            F.coalesce(F.sum(F.when(over, F.col("_bsz"))), F.lit(0))
            .cast("long")
            .alias("dropped_rows"),
            F.count(F.lit(1)).cast("long").alias("buckets"),
            F.coalesce(F.sum(F.when(over, 1)), F.lit(0))
            .cast("long")
            .alias("dropped_buckets"),
        )
        .select(
            "rows",
            "dropped_rows",
            "buckets",
            "dropped_buckets",
            F.when(F.col("rows") > 0, F.col("dropped_rows") / F.col("rows"))
            .otherwise(F.lit(0.0))
            .alias("capped_row_frac"),
        )
    )


def hamming_pairs_banded(
    sig: DataFrame,
    id_col: str = "id",
    sig_col: str = "sim",
    max_hamming: int = 8,
    max_bucket: int = 256,
    bits: int = 64,
    chunk_bits: int | None = 8,
    key_chunks: int | None = 1,
    n_rows: int | None = None,
    skew: float | None = None,
) -> DataFrame:
    """Generic banded Hamming join over any integer-signature table —
    the blocking core of `simhash_pairs`, factored out (round 9) so
    other fixed-width fingerprints (perceptual image dHash in
    `multimodal.dhash_media`) reuse the identical scale shape:
    bits/chunk_bits exploded chunk keys, capped buckets, equi-join on
    (chunk, key), exact bit_count(xor) filter BEFORE the pair-dedup
    shuffle. Pigeonhole completeness: a pair within Hamming distance
    ``d`` damages at most ``d`` chunks, so with ``max_hamming <
    n_chunks`` it shares at least one chunk exactly and the banded
    result EQUALS the all-pairs brute force (what lets a SQL oracle
    verify the banded plan).

    ``key_chunks`` (round 11): band keys built from COMBINATIONS of
    ``key_chunks`` distinct chunks — the scale lever for narrow
    chunks. A single ``chunk_bits``-bit key space saturates at
    ``2^chunk_bits`` buckets, so past ~``max_bucket * 2^chunk_bits``
    rows EVERY bucket overflows the cap and the join silently loses
    pairs (measured: the 7-bit dHash bands at sf1's 50k images →
    planted-pair recall 0.13). Pairing chunks squares the key space
    (and triples-plus beyond) while completeness still holds: a pair
    within ``max_hamming`` keeps ``n_chunks − max_hamming`` chunks
    intact, and any ``key_chunks``-subset of those is a shared band —
    requires ``key_chunks <= n_chunks − max_hamming`` (validated).
    ``key_chunks=1`` is the original plan, byte-identical.

    ``chunk_bits=None, key_chunks=None`` (round 12): SIZE-DERIVED
    dials via `resolve_hamming_banding` — the signature table is
    checkpointed and counted ONCE (a batch entry point's one-time
    count, not the r10 probe-path per-query count class), then the
    dial pair comes from the corpus size AND (round 13) the measured
    bucket occupancy: the uniform-model candidate plan is probed with
    one aggregate and re-derived once with the measured p99/avg skew
    when it would actually drop rows (the r12 skew loop, closed —
    sf1's stay plan silently dropped 19.3% of banded rows under the
    uniform assumption). Pass ``n_rows`` to skip the count when the
    caller already knows the size, and an explicit ``skew`` to pin
    the multiplier and skip the measurement job. Mixing one explicit
    dial with one None raises — the pair is a single geometry
    decision — and passing ``n_rows``/``skew`` alongside explicit
    dials raises too (r13 ADVICE #4: they would be silently ignored,
    the inconsistent sibling of the mixed-None contract)."""
    if (chunk_bits is None) != (key_chunks is None):
        raise ValueError(
            "hamming_pairs_banded: chunk_bits and key_chunks are one "
            "geometry decision — pass both or neither (None, None "
            "derives both from the corpus size)"
        )
    if chunk_bits is not None and (n_rows is not None or skew is not None):
        raise ValueError(
            "hamming_pairs_banded: n_rows/skew feed the size-derived "
            "geometry and have no effect with explicit chunk_bits/"
            "key_chunks — drop them or pass chunk_bits=key_chunks=None"
        )
    if chunk_bits is None:
        if n_rows is None or skew is None:
            # the count and/or occupancy-measurement aggregate re-scan
            # the signature table before the join does
            sig = sig.localCheckpoint(eager=True)
        # n_rows=None stays None: resolve_hamming_banding folds the
        # count into its occupancy probe (one job, r13)
        chunk_bits, key_chunks = resolve_hamming_banding(
            sig, id_col, sig_col, max_hamming, max_bucket, bits,
            n_rows=n_rows, skew=skew,
        )

    n_chunks = bits // chunk_bits
    if key_chunks < 1 or key_chunks > n_chunks:
        raise ValueError(
            f"hamming_pairs_banded: key_chunks={key_chunks} out of "
            f"range 1..{n_chunks}"
        )
    if key_chunks > 1 and key_chunks > n_chunks - max_hamming:
        # key_chunks=1 may run as APPROXIMATE blocking past the
        # pigeonhole bound (simhash's documented mode); multi-chunk
        # keys exist only to keep the COMPLETE plan scalable, so a
        # non-complete combination is a caller error, not a mode
        raise ValueError(
            f"hamming_pairs_banded: key_chunks={key_chunks} breaks "
            f"pigeonhole completeness (need key_chunks <= "
            f"n_chunks - max_hamming = {n_chunks - max_hamming})"
        )
    if chunk_bits * key_chunks > 63:
        raise ValueError(
            "hamming_pairs_banded: packed band key exceeds 63 bits"
        )
    chunked = _hamming_chunked(sig, id_col, sig_col, bits, chunk_bits, key_chunks)
    chunked = _cap_buckets(chunked, ["chunk", "key"], max_bucket).localCheckpoint(
        eager=False
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        # hamming is a pure function of the pair, so filtering BEFORE the
        # pair-dedup is output-identical and shrinks that shuffle to just
        # the close pairs (sf0.1: 4.4k rows deduped instead of 235k)
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# --------------------------------------------------------------------------
# edit-distance fuzzy join (SymSpell-style deletion neighborhoods)
def deletion_neighborhood(text_col, k: int = 1):
    """All strings reachable from ``text_col`` by deleting at most
    ``k`` characters (including the string itself), distinct, as
    array<string>. JVM higher-order functions only — no Python on the
    hot path.

    This is the SymSpell blocking key set: two strings within
    Damerau/Levenshtein distance k always share at least one
    ≤k-deletion variant, so an equi-join on variants yields a
    complete candidate set (with false positives — e.g. "ax"/"xa"
    share "a" and "x" at distance 2 > 1 — which the verify step
    removes). The empty-string guard matters: Spark's sequence(1, 0)
    DESCENDS, which would feed substr() an invalid slice.
    """
    def _del1(col):
        return F.when(
            F.length(col) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    col.substr(F.lit(1), i - F.lit(1)),
                    col.substr(i + F.lit(1), F.length(col)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    frontier = F.array(text_col)
    seen = frontier
    for _ in range(k):
        frontier = F.array_distinct(F.flatten(F.transform(frontier, _del1)))
        seen = F.array_distinct(F.concat(seen, frontier))
    return seen


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
    max_bucket: int = 256,
) -> DataFrame:
    """Exact Levenshtein-distance-≤-k pairs via SymSpell deletion-
    neighborhood blocking: explode each string's ≤k-deletion variants,
    equi-join on the variant, then VERIFY candidates with the built-in
    `levenshtein(…, threshold=k)` (JVM, early-exit above threshold).
    Output: (id_a, id_b, dist) with id_a < id_b and 0 ≤ dist ≤ k —
    exact-duplicate pairs surface as dist 0.

    Scope: SHORT keys — names, titles, codes — where typo-tolerant
    matching is the real operation; long documents belong to
    MinHash/SimHash. The variant table carries the text through the
    explode ON PURPOSE (length-L text appears ~L·k times): for short
    keys that duplication is cheaper than the two extra id→text joins
    the skinny layout would need, and it keeps the verify step inside
    the same join stage.

    Scale shape: the join is an EQUI-join on the variant string —
    never a cartesian — and candidates are bounded by neighborhood
    size (≈ (L choose k)) × bucket size. Degenerate variant buckets
    (short common fragments collapse many keys onto one variant) are
    capped with the LSH family's `_cap_buckets` guard — same
    precision/recall trade, same knob. `dist` is a pure function of
    the pair, so the threshold filter runs BEFORE pair-dedup and only
    verified-close pairs ride that shuffle.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.explode(deletion_neighborhood(F.col(text_col), k)).alias("v"),
    )
    capped = _cap_buckets(base, ["v"], max_bucket)
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein(F.col("a.txt"), F.col("b.txt"), threshold=k)
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") >= 0)  # threshold form returns -1 above k
        .dropDuplicates(["id_a", "id_b"])
    )
