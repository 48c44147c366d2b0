"""Unit tests for the round-5 training-data-pipeline operators:
train/eval n-gram decontamination, Gopher-style repetition profiling,
and PII redaction. Oracle parity at sf0.01 lives in test_oracle_parity;
these cover edge semantics (short docs, hash_keys equivalence, pattern
ordering, count/redaction agreement) on small constructed frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boatrace_database_spark.operators import privacy as P
from boatrace_database_spark.operators import text as TX


# ---------------------------------------------------------------- contamination
@pytest.fixture(scope="module")
def contam_frames(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        ["id", "text"],
    )
    ev = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the fence"),  # shares 3-grams
            (11, "completely novel sentence with no overlap at all"),
            (12, "too short"),  # < n tokens -> 0/0/0
        ],
        ["id", "text"],
    )
    return train, ev


def _contam_map(train, ev, **kw):
    rows = TX.ngram_contamination(train, ev, "id", "text", **kw).collect()
    return {r.eval_id: r for r in rows}


def test_contamination_counts_hand_checked(spark, contam_frames):
    train, ev = contam_frames
    got = _contam_map(train, ev, n=3, hash_keys=False)
    # doc 10: 6 distinct 3-grams; "the quick brown", "quick brown fox",
    # "brown fox jumps", "fox jumps over" and "jumps over the" occur in
    # train doc 1; "over the fence" does not.
    assert got[10].n_ngrams == 6
    assert got[10].n_contaminated == 5
    assert got[10].contamination_rate == pytest.approx(5 / 6, abs=1e-6)
    assert got[11].n_contaminated == 0
    assert got[11].contamination_rate == 0.0
    # shorter than n: reports a 0/0/0 row rather than vanishing
    assert got[12].n_ngrams == 0
    assert got[12].n_contaminated == 0
    assert got[12].contamination_rate == 0.0


def test_contamination_hash_keys_equivalent(spark, contam_frames):
    train, ev = contam_frames
    plain = _contam_map(train, ev, n=3, hash_keys=False)
    hashed = _contam_map(train, ev, n=3, hash_keys=True)
    assert set(plain) == set(hashed)
    for k in plain:
        assert (plain[k].n_ngrams, plain[k].n_contaminated) == (
            hashed[k].n_ngrams,
            hashed[k].n_contaminated,
        )


def test_contamination_self_overlap_is_total(spark, contam_frames):
    train, _ = contam_frames
    got = _contam_map(train, train, n=3, hash_keys=True)
    for r in got.values():
        assert r.contamination_rate == 1.0


def test_compression_profile_ordering_bounds_determinism(spark):
    """The Gopher signal's contract: repetitive text compresses far
    below high-entropy noise with prose in between; ratios live in
    (0, ~1.1]; empty text reports 1.0, null stays null; two runs are
    identical (zlib at a fixed level is deterministic)."""
    import random

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(200)
    )
    prose = (
        "the quick brown fox jumps over the lazy dog and then "
        "pauses to consider the state of the river beyond the mill "
    ) * 20
    repetitive = "spam ham " * 400
    df = spark.createDataFrame(
        [(1, repetitive), (2, prose), (3, noise), (4, ""), (5, None)],
        "id LONG, text STRING",
    )
    out = {r.id: r for r in TX.compression_profile(df, "id", "text").collect()}
    assert out[1].zlib_ratio < out[2].zlib_ratio < out[3].zlib_ratio
    assert out[1].zlib_ratio < 0.1, "repetition must compress away"
    assert out[3].zlib_ratio > 0.5, "noise must not"
    for i in (1, 2, 3):
        assert 0.0 < out[i].zlib_ratio <= 1.1
        assert out[i].n_bytes == len(out[i].text.encode("utf-8"))
    assert out[4].zlib_ratio == 1.0 and out[4].n_bytes == 0
    assert out[5].zlib_ratio is None
    again = {
        r.id: r.zlib_ratio
        for r in TX.compression_profile(df, "id", "text").collect()
    }
    assert again == {i: out[i].zlib_ratio for i in out}


@pytest.mark.slow
def test_decontaminate_corpus_drops_and_audits(spark, contam_frames):
    """Removal direction: with the roles flipped (corpus scored against
    a benchmark), docs over the rate bar are dropped, survivors keep
    original columns + audit counts; max_rate=0 is the any-overlap
    drop; an empty benchmark keeps everything."""
    bench, corpus = contam_frames  # score the 3-doc frame as the corpus

    out = TX.decontaminate_corpus(
        corpus, bench, "id", "text", n=3, max_rate=0.5
    )
    got = {r.id: r for r in out.collect()}
    # doc 10 overlaps 5/6 = 0.83 > 0.5 -> dropped; 11 (0.0) and the
    # too-short 12 (0/0 -> rate 0) survive with audit columns
    assert set(got) == {11, 12}
    assert got[11].text.startswith("completely novel")
    assert got[11].n_contaminated == 0
    assert got[12].n_ngrams == 0 and got[12].contamination_rate == 0.0

    strict = TX.decontaminate_corpus(
        corpus, bench, "id", "text", n=3, max_rate=0.0
    )
    assert {r.id for r in strict.collect()} == {11, 12}

    empty_bench = bench.where("id < 0")
    kept = TX.decontaminate_corpus(
        corpus, empty_bench, "id", "text", n=3, max_rate=0.0
    )
    assert {r.id for r in kept.collect()} == {10, 11, 12}


# ---------------------------------------------------------------- repetition
def test_repetition_profile_hand_checked(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 words, 1 distinct
            (2, "a b c d"),          # all distinct
            (3, "ab"),               # 1 word: no 2/3-grams
        ],
        ["id", "text"],
    )
    rows = {r.id: r for r in TX.repetition_profile(df, "id", "text", max_n=3).collect()}
    r1 = rows[1]
    assert r1.dup_frac_1 == pytest.approx(0.75)   # 1 - 1/4
    assert r1.top_frac_1 == 1.0
    assert r1.dup_frac_2 == pytest.approx(1 - 1 / 3)  # "a a" x3
    assert r1.top_frac_2 == 1.0
    assert r1.dup_frac_3 == pytest.approx(0.5)    # "a a a" x2
    r2 = rows[2]
    for c in ("dup_frac_1", "dup_frac_2", "dup_frac_3"):
        assert getattr(r2, c) == 0.0
    assert r2.top_frac_1 == pytest.approx(0.25)
    # doc 3 too short for n>=2: zero-filled, not missing
    r3 = rows[3]
    assert r3.dup_frac_2 == 0.0 and r3.top_frac_3 == 0.0
    assert r3.top_frac_1 == 1.0


# ---------------------------------------------------------------- PII redaction
def test_redact_patterns_and_order(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail a.user+tag@example.co.uk, site https://x.io/p?q=1, "
                "host 192.168.0.1, call +1 (555) 123-4567, acct 1234567890",
            ),
            (2, "nothing sensitive here"),
        ],
        ["id", "t"],
    )
    out = {r.id: r for r in P.pii_redact(df, ["t"]).collect()}
    r1 = out[1]
    assert "<EMAIL>" in r1.t and "<URL>" in r1.t and "<IP>" in r1.t
    assert "<PHONE>" in r1.t and "<ID>" in r1.t
    # the email's local-part digits were consumed by the email pattern,
    # not double-counted as an id_run; each pattern hit exactly once
    assert (r1.n_email, r1.n_url, r1.n_ipv4, r1.n_phone, r1.n_id_run) == (
        1, 1, 1, 1, 1,
    )
    r2 = out[2]
    assert r2.t == "nothing sensitive here"
    assert (r2.n_email, r2.n_url, r2.n_ipv4, r2.n_phone, r2.n_id_run) == (
        0, 0, 0, 0, 0,
    )


def test_redact_multi_column_counts_sum(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com writes", "see https://a.io and c@d.org")],
        ["id", "x", "y"],
    )
    r = P.pii_redact(df, ["x", "y"]).collect()[0]
    assert r.n_email == 2 and r.n_url == 1
    assert r.x == "<EMAIL> writes"
    assert r.y == "see <URL> and <EMAIL>"


# ---------------------------------------------------------------- corpus assembly
def test_mixture_resample_weights(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(i, "up" if i < 100 else ("drop" if i < 150 else "keep"))
         for i in range(200)],
        ["id", "src"],
    )
    out = C.mixture_resample(df, "id", "src", {"up": 2.5, "drop": 0.0}).collect()
    per_id: dict[int, int] = {}
    for r in out:
        per_id[r.id] = per_id.get(r.id, 0) + 1
        assert r.src != "drop"
    # integer part guaranteed: every 'up' row has 2 or 3 copies
    ups = [per_id[i] for i in range(100)]
    assert set(ups) <= {2, 3}
    # fractional part: mean approaches 2.5 (deterministic hash, fixed set)
    assert 2.2 <= sum(ups) / len(ups) <= 2.8
    # default weight 1.0: 'keep' rows appear exactly once, copy index 0
    assert all(per_id[i] == 1 for i in range(150, 200))
    # copy indices are 0..n-1 per id
    copies = sorted(r.copy for r in out if r.id == ups.index(3))
    assert copies == list(range(per_id[ups.index(3)]))


def test_mixture_resample_large_ids_no_overflow(spark):
    """ids past 2^32 must not overflow the hash arithmetic (ANSI Spark
    turns int64 overflow into a query-killing exception), and small ids
    must produce the same copies as the documented naive formula."""
    from boatrace_database_spark.operators import corpus as C

    big = 2**62 + 12345
    df = spark.createDataFrame(
        [(7, "s"), (4_000_000_000, "s"), (big, "s")], ["id", "src"]
    )
    out = C.mixture_resample(df, "id", "src", {"s": 1.5}).collect()
    per_id: dict[int, int] = {}
    for r in out:
        per_id[r.id] = per_id.get(r.id, 0) + 1
    assert set(per_id) == {7, 4_000_000_000, big}
    # id=7: naive ((7*K) % 2^32)/2^32 decides the fractional copy
    naive = ((7 * 2654435761) % 2**32) / 2**32
    assert per_id[7] == (2 if naive < 0.5 else 1)


def test_mixture_resample_deterministic_across_partitionings(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(i, "s") for i in range(500)], ["id", "src"])
    a = C.mixture_resample(df, "id", "src", {"s": 1.3}).collect()
    b = C.mixture_resample(df.repartition(13), "id", "src", {"s": 1.3}).collect()
    assert sorted((r.id, r.copy) for r in a) == sorted((r.id, r.copy) for r in b)


def test_pack_sequences_hand_checked(spark):
    from boatrace_database_spark.operators import corpus as C

    # group g: token counts 3, 4, 5 -> offsets 0, 3, 7; budget 5 ->
    # packs 0, 0, 1 (doc 2 starts at 3, INSIDE window 0, even though it
    # spills over the boundary — concat-and-chunk semantics)
    df = spark.createDataFrame(
        [
            (1, "a b c", "g"),
            (2, "a b c d", "g"),
            (3, "a b c d e", "g"),
            (10, "x y z w v u", "h"),  # other group: independent stream
        ],
        ["id", "text", "src"],
    )
    rows = {
        r.id: r
        for r in C.pack_sequences(df, "id", "text", budget=5, group_col="src").collect()
    }
    assert (rows[1].start_offset, rows[1].pack_id) == (0, 0)
    assert (rows[2].start_offset, rows[2].pack_id) == (3, 0)
    assert (rows[3].start_offset, rows[3].pack_id) == (7, 1)
    assert (rows[10].start_offset, rows[10].pack_id) == (0, 0)
    assert rows[10].n_tokens == 6


def test_redact_no_counts_mode(spark):
    df = spark.createDataFrame([(1, "a@b.com")], ["id", "t"])
    out = P.pii_redact(df, ["t"], with_counts=False)
    assert out.columns == ["id", "t"]
    assert out.collect()[0].t == "<EMAIL>"


# ---------------------------------------------------------------- split/shuffle
def test_split_assign_partitions_and_sizes(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    rows = C.split_assign(
        df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    assert len(rows) == 2000  # every row labeled, none dropped
    sizes = {}
    for r in rows:
        sizes[r.split] = sizes.get(r.split, 0) + 1
    assert set(sizes) == {"train", "val", "test"}
    # binomial sizes: loose 5-sigma-ish bounds on a fixed deterministic set
    assert 1500 <= sizes["train"] <= 1700
    assert 140 <= sizes["val"] <= 260
    assert 140 <= sizes["test"] <= 260


def test_split_assign_membership_is_pure_function_of_id(spark):
    """Incremental batches / re-runs must agree: a subset frame (and a
    differently-partitioned frame) assigns every id identically."""
    from boatrace_database_spark.operators import corpus as C

    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    full = {r.id: r.split for r in C.split_assign(df, "id", fr).collect()}
    sub = {
        r.id: r.split
        for r in C.split_assign(
            df.where(F.col("id") % 3 == 0).repartition(7), "id", fr
        ).collect()
    }
    assert all(full[i] == s for i, s in sub.items())


def test_split_assign_incomplete_fractions_raise(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="sum to 1"):
        C.split_assign(df, "id", {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match=">= 0"):
        C.split_assign(df, "id", {"train": 1.5, "val": -0.5})


@pytest.mark.slow
def test_split_exact_sizes_are_exact(spark):
    """split_exact's whole point: every split's size is exactly
    ⌊f·n⌋ or ⌈f·n⌉ (cumulative-floor boundaries), for awkward n that
    a binomial split would miss by many rows."""
    import math

    from boatrace_database_spark.operators import corpus as C

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    for n in (10, 97, 500, 1001):
        df = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        rows = C.split_exact(df, "id", fr, n_buckets=16).collect()
        assert len(rows) == n
        sizes = {}
        for r in rows:
            sizes[r.split] = sizes.get(r.split, 0) + 1
        for name, f in fr.items():
            got = sizes.get(name, 0)
            assert got in (math.floor(f * n), math.ceil(f * n)), (
                f"n={n} split={name}: {got} not in "
                f"{{⌊{f}·{n}⌋, ⌈{f}·{n}⌉}}"
            )
        assert sum(sizes.values()) == n


def test_split_exact_deterministic_and_rank_consistent(spark):
    """Same corpus → identical assignment regardless of partitioning
    or bucket count; the cut respects shuffle_pos order (every train
    rank < every val rank < every test rank)."""
    from boatrace_database_spark.operators import corpus as C

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame([(i,) for i in range(303)], ["id"])
    base = {r.id: (r.shuffle_pos, r.split) for r in
            C.split_exact(df, "id", fr).collect()}
    again = {r.id: (r.shuffle_pos, r.split) for r in
             C.split_exact(df.repartition(13), "id", fr,
                           n_buckets=7).collect()}
    assert base == again
    by_split = {}
    for pos, split in base.values():
        by_split.setdefault(split, []).append(pos)
    assert max(by_split["train"]) < min(by_split["val"])
    assert max(by_split["val"]) < min(by_split["test"])


def test_split_exact_stratified_per_stratum_sizes(spark):
    """Every stratum contributes exactly ⌊f·n_s⌋/⌈f·n_s⌉ rows per
    split — including a stratum far smaller than the others (which a
    global split would happily put entirely in train)."""
    import math

    from boatrace_database_spark.operators import corpus as C

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(83)]
        + [(2000 + i, "tiny") for i in range(11)]
    )
    df = spark.createDataFrame(rows, "id LONG, src STRING")
    out = C.split_exact_stratified(df, "id", "src", fr, n_buckets=16)
    got = {}
    for r in out.collect():
        got.setdefault(r.src, {}).setdefault(r.split, 0)
        got[r.src][r.split] += 1
    n_by_src = {"big": 900, "mid": 83, "tiny": 11}
    for src, n in n_by_src.items():
        assert sum(got[src].values()) == n
        for name, f in fr.items():
            c = got[src].get(name, 0)
            assert c in (math.floor(f * n), math.ceil(f * n)), (
                f"{src}/{name}: {c} for n={n}"
            )
    # rank-consistency within each stratum: train ranks < val < test
    pos = {}
    for r in out.collect():
        pos.setdefault((r.src, r.split), []).append(r.stratum_pos)
    for src, n in n_by_src.items():
        ordered = []
        for name in ("train", "val", "test"):
            ordered.extend(sorted(pos.get((src, name), [])))
        assert ordered == list(range(n)), f"{src}: ranks not contiguous"


def test_split_exact_validation(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="sum to 1"):
        C.split_exact(df, "id", {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match=">= 0"):
        C.split_exact(df, "id", {"train": 1.5, "val": -0.5})


def test_materialize_packs_partition_and_token_closure(spark):
    """Materialized packs are a PARTITION of the corpus (every doc in
    exactly one pack, id-ordered within it), and re-tokenizing
    pack_text recovers pack_tokens exactly (the sep-join loses no
    tokens — closure under the module's own tokenizer)."""
    from boatrace_database_spark.operators import corpus as C
    from boatrace_database_spark.operators.text import token_count

    rows = [
        (i, "g%d" % (i % 3), "tok " * (1 + i % 11)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id LONG, grp STRING, text STRING")
    packs = C.materialize_packs(df, "id", "text", 40, group_col="grp")
    got = packs.collect()
    seen = [i for r in got for i in r.doc_ids]
    assert sorted(seen) == list(range(120)), "not a partition"
    for r in got:
        assert list(r.doc_ids) == sorted(r.doc_ids), "not id-ordered"
        assert r.n_docs == len(r.doc_ids)
    # token closure via the engine's own tokenizer
    recounted = packs.withColumn(
        "_rt", token_count(F.col("pack_text")).cast("long")
    ).where(F.col("_rt") != F.col("pack_tokens"))
    assert recounted.count() == 0
    # window consistency with pack_sequences: each doc's assigned pack
    assigned = {
        r.id: r.pack_id
        for r in C.pack_sequences(
            df, "id", "text", 40, group_col="grp"
        ).collect()
    }
    for r in got:
        for i in r.doc_ids:
            assert assigned[i] == r.pack_id, (i, assigned[i], r.pack_id)


@pytest.mark.slow
def test_take_token_budget_coverage_and_naive_parity(spark):
    """The kept set covers the budget with at most one doc of
    overshoot (total-before-last < budget <= total unless the corpus
    is smaller than the budget), equals the naive single-window
    computation, and is invariant to partitioning and n_buckets."""
    from pyspark.sql import Window as W

    from boatrace_database_spark.operators import corpus as C
    from boatrace_database_spark.operators.corpus import (
        SHUFFLE_SALT,
        _unit_hash,
    )
    from boatrace_database_spark.operators.text import token_count

    rows = [(i, "tok " * (1 + i % 17)) for i in range(400)]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    budget = 1000
    out = C.take_token_budget(df, "id", "text", budget, n_buckets=8)
    got = {r.id: (r.n_tokens, r.cum_tokens) for r in out.collect()}
    assert got, "budget must keep at least one doc"
    total = max(c for _, c in got.values())
    last_n = next(n for n, c in got.values() if c == total)
    assert total - last_n < budget <= total

    # naive single-window parity
    naive = (
        df.withColumn("_h", _unit_hash(F.col("id"), SHUFFLE_SALT))
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                W.orderBy("_h", "id").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
        .where(F.col("cum_tokens") - F.col("n_tokens") < budget)
    )
    expect = {r.id: (r.n_tokens, r.cum_tokens) for r in naive.collect()}
    assert got == expect
    for variant in (
        C.take_token_budget(df.repartition(13), "id", "text", budget),
        C.take_token_budget(df, "id", "text", budget, n_buckets=1),
    ):
        assert {
            r.id: (r.n_tokens, r.cum_tokens) for r in variant.collect()
        } == expect

    # budget >= corpus keeps everything
    assert C.take_token_budget(df, "id", "text", 10**9).count() == 400
    with pytest.raises(ValueError, match=">= 1"):
        C.take_token_budget(df, "id", "text", 0)


def test_take_token_budget_stratified_per_source_coverage(spark):
    """Each stratum's kept set is its own budget-bound token prefix
    (per-stratum coverage with <=1 doc overshoot); a zero/default-0
    stratum is dropped entirely; disjoint strata don't interact."""
    from boatrace_database_spark.operators import corpus as C

    rows = (
        [(i, "a", "tok " * 10) for i in range(50)]
        + [(100 + i, "b", "tok " * 5) for i in range(50)]
        + [(200 + i, "c", "tok " * 3) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "id LONG, src STRING, text STRING")
    out = C.take_token_budget_stratified(
        df, "id", "text", "src", {"a": 100, "b": 60}, default_budget=0,
        n_buckets=8,
    )
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.src, []).append((r.n_tokens, r.stratum_cum_tokens))
    assert set(by_src) == {"a", "b"}, "default_budget=0 must drop src c"
    for src, budget in (("a", 100), ("b", 60)):
        total = max(c for _, c in by_src[src])
        last_n = next(n for n, c in by_src[src] if c == total)
        assert total - last_n < budget <= total, (src, total, last_n)
    with pytest.raises(ValueError, match=">= 0"):
        C.take_token_budget_stratified(
            df, "id", "text", "src", {"a": -1}
        )


@pytest.mark.slow
def test_global_shuffle_exact_permutation_and_naive_parity(spark):
    """shuffle_pos must be exactly 0..n-1, equal to the naive global
    row_number rank, and invariant to n_buckets and input partitioning
    (the bucketed prefix-sum is an implementation detail, not a
    semantics knob)."""
    from pyspark.sql import Window as W

    from boatrace_database_spark.operators import corpus as C
    from boatrace_database_spark.operators.corpus import (
        SHUFFLE_SALT,
        _unit_hash,
    )

    df = spark.createDataFrame([(i,) for i in range(777)], ["id"])
    out = {r.id: r.shuffle_pos for r in C.global_shuffle(df, "id").collect()}
    assert sorted(out.values()) == list(range(777))
    naive = {
        r.id: r.pos
        for r in df.withColumn("_h", _unit_hash(F.col("id"), SHUFFLE_SALT))
        .withColumn(
            "pos", F.row_number().over(W.orderBy("_h", "id")) - 1
        )
        .collect()
    }
    assert out == naive
    for variant in (
        C.global_shuffle(df.repartition(11), "id"),
        C.global_shuffle(df, "id", n_buckets=1),
        C.global_shuffle(df, "id", n_buckets=4096),
    ):
        assert {r.id: r.shuffle_pos for r in variant.collect()} == naive


def test_global_shuffle_salt_is_the_seed(spark):
    """Different salts = different epochs: orders differ, both are
    permutations."""
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(i,) for i in range(300)], ["id"])
    a = {r.id: r.shuffle_pos for r in C.global_shuffle(df, "id", salt=1).collect()}
    b = {r.id: r.shuffle_pos for r in C.global_shuffle(df, "id", salt=2).collect()}
    assert sorted(a.values()) == list(range(300))
    assert sorted(b.values()) == list(range(300))
    assert a != b


def test_split_and_shuffle_decorrelated_defaults(spark):
    """The documented salt contract: layering split_assign and
    global_shuffle with their DEFAULT salts must not correlate — val
    members should be spread across the shuffle order, not clumped."""
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    labeled = C.global_shuffle(
        C.split_assign(df, "id", {"train": 0.5, "val": 0.5}), "id"
    ).collect()
    first_half_val = sum(
        1 for r in labeled if r.shuffle_pos < 1000 and r.split == "val"
    )
    total_val = sum(1 for r in labeled if r.split == "val")
    # perfectly correlated hashes would put ~all val in one half
    assert 0.35 <= first_half_val / total_val <= 0.65


# ---------------------------------------------------------------- chunking
def test_chunk_documents_hand_checked(spark):
    """Boundaries: 7 tokens, chunk 5, overlap 2 (stride 3) -> chunks at
    offsets 0 and 3; the second window [3,8) reaches the end, so no
    third chunk. A short doc yields exactly one chunk."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], ["id", "text"]
    )
    rows = sorted(
        (
            (r.id, r.chunk_id, r.chunk_text, r.chunk_n_tokens)
            for r in TX.chunk_documents(
                df, "id", "text", chunk_tokens=5, overlap=2
            ).collect()
        )
    )
    assert rows == [
        (1, 0, "a b c d e", 5),
        (1, 1, "d e f g", 4),
        (2, 0, "x y", 2),
    ]


def test_chunk_documents_covers_every_token(spark):
    """Reassembling chunk 0 + each later chunk's non-overlapping tail
    must reproduce the document exactly — no token lost or duplicated."""
    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(n)))
         for i, n in [(0, 1), (1, 8), (2, 9), (3, 25), (4, 40)]],
        ["id", "text"],
    )
    out = TX.chunk_documents(df, "id", "text", chunk_tokens=8, overlap=3)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append(r)
    originals = {r.id: r.text for r in df.collect()}
    stride = 8 - 3
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        toks = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            toks.extend(c.chunk_text.split()[3:])  # drop the overlap
        assert " ".join(toks) == originals[doc], doc
        # consecutive chunks actually overlap by `overlap` tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk_text.split()[stride:] == b.chunk_text.split()[: 8 - stride]


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        TX.chunk_documents(df, "id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match=">= 0"):
        TX.chunk_documents(df, "id", "text", chunk_tokens=4, overlap=-1)


def test_hash_ops_negative_ids_use_mathematical_mod(spark):
    """xxhash64-derived surrogate ids are negative half the time; the
    hash primitive must use mathematical mod (Spark's % is
    sign-preserving) or every negative-id row lands in the first split
    and always wins the fractional mixture copy."""
    from boatrace_database_spark.operators import corpus as C
    from boatrace_database_spark.operators.corpus import _KNUTH, SPLIT_SALT

    ids = [-1, -5, -(2**33) - 7, 3, 2**33 + 11]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    fr = {"train": 0.5, "val": 0.5}
    got = {r.id: r.split for r in C.split_assign(df, "id", fr).collect()}
    for i in ids:
        u = (((i % 2**32) + SPLIT_SALT) % 2**32 * _KNUTH % 2**32) / 2**32
        # python % IS mathematical mod — the documented formula
        assert got[i] == ("train" if u < 0.5 else "val"), (i, u, got[i])
    # both splits actually occur across the negative ids (the bug made
    # them all 'train')
    neg = {got[i] for i in ids if i < 0}
    assert neg == {"train", "val"}
    # shuffle positions remain an exact permutation with negatives
    pos = [r.shuffle_pos for r in C.global_shuffle(df, "id").collect()]
    assert sorted(pos) == list(range(len(ids)))


# --------------------------------------------------------------------------
# robust JSONL ingest
def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Good lines parse under the enforced schema; unparseable JSON and
    type-contradicting lines land in quarantine with the raw line
    preserved; nothing is silently dropped (good + bad == input)."""
    from boatrace_database_spark.sources.jsonl import CORRUPT_COL, read_jsonl
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "beta"}',
        '{"doc_id": "not-a-number", "text": "gamma"}',  # type clash
        '{broken json',                                  # unparseable
        '',                                              # blank line
        '   ',                                           # whitespace only
        '\t \t',                                         # tabs (trim misses)
        '{"doc_id": 5, "text": "epsilon"}',
    ]
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(lines) + "\n")
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    qdir = str(tmp_path / "quarantine")
    good, bad = read_jsonl(spark, str(src), schema, quarantine_path=qdir)

    assert {r.doc_id for r in good.collect()} == {1, 2, 5}
    assert CORRUPT_COL not in good.columns
    # no silent all-null rows from blank/whitespace lines on the good side
    assert good.where(F.col("doc_id").isNull()).count() == 0
    bad_rows = bad.collect()
    assert len(bad_rows) == 5
    raws = {r[CORRUPT_COL] for r in bad_rows}
    assert '{broken json' in raws
    assert any('not-a-number' in r for r in raws)  # raw line preserved
    # blank/whitespace lines (incl. tabs) quarantined, not nulled
    assert {'', '   ', '\t \t'} <= raws
    assert good.count() + bad.count() == len(lines)
    # the quarantine sink got the same rows
    q = spark.read.parquet(qdir)
    assert q.count() == 5


def test_read_jsonl_rejects_reserved_column(spark, tmp_path):
    from boatrace_database_spark.sources.jsonl import read_jsonl
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(tmp_path), schema)


# --------------------------------------------------------------------------
# per-group reservoir sample (corpus.sample_per_group)
def test_sample_per_group_exact_counts_and_nesting(spark):
    from boatrace_database_spark.operators import corpus as C

    rows = [(i, f"g{i % 3}") for i in range(100)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, ["id", "grp"])
    k10 = C.sample_per_group(df, "id", "grp", k=10)
    got = {r.grp: r.cnt for r in k10.groupBy("grp").agg(
        F.count("*").alias("cnt")).collect()}
    # exactly min(k, |group|) per group
    assert got == {"g0": 10, "g1": 10, "g2": 10, "tiny": 1}
    # nested-prefix property: rank-<5 subset of the k=10 sample IS k=5
    k5 = {(r.grp, r.id) for r in
          C.sample_per_group(df, "id", "grp", k=5).collect()}
    k10_prefix = {(r.grp, r.id) for r in
                  k10.where(F.col("sample_rank") < 5).collect()}
    assert k5 == k10_prefix
    # determinism across partitionings
    again = {(r.grp, r.id) for r in
             C.sample_per_group(df.repartition(7), "id", "grp", k=5).collect()}
    assert again == k5


def test_sample_per_group_rejects_bad_k(spark):
    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame([(1, "a")], ["id", "grp"])
    with pytest.raises(ValueError, match="k must be"):
        C.sample_per_group(df, "id", "grp", k=0)


# --------------------------------------------------------------------------
# declarative data-quality audit (validate.audit_table)
def test_audit_table_counts_planted_violations(spark):
    from boatrace_database_spark.operators.validate import audit_table

    rows = [
        (1, 10.0, "ok", 100),
        (2, -5.0, "ok", 100),      # range violation
        (None, 10.0, "bad!", 200),  # null id + regex violation
        (4, None, "ok", 999),       # null price NOT a range violation
        (4, 20.0, "ok", 100),       # duplicate id; fk 100 ok, 999 orphan
    ]
    df = spark.createDataFrame(rows, "id int, price double, tag string, fk int")
    dim = spark.createDataFrame([(100,), (200,)], ["pk"])
    got = {
        (r.rule, r.target): (r.violations, r.rows_checked)
        for r in audit_table(
            df,
            not_null=["id"],
            ranges={"price": (0, 100)},
            matches={"tag": r"^[a-z]+$"},
            unique=[["id"]],
            foreign_keys=[(["fk"], dim, ["pk"])],
        ).collect()
    }
    assert got[("not_null", "id")] == (1, 5)
    assert got[("range", "price[0,100]")] == (1, 5)  # null price skipped
    assert got[("matches", "tag~^[a-z]+$")] == (1, 5)
    # 5 rows, 4 distinct ids (incl. the NULL-id row's null) -> 1 surplus?
    # count_distinct over struct counts the null-id struct too, so
    # distinct = {1,2,null,4} = 4 and surplus = 1 (the repeated 4)
    assert got[("unique", "id")] == (1, 5)
    assert got[("foreign_key", "fk")] == (1, 5)  # the 999 row


def test_audit_table_composite_fk_and_empty_rules(spark):
    import pytest as _pytest

    from boatrace_database_spark.operators.validate import audit_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k1 int, k2 string"
    )
    dim = spark.createDataFrame([(1, "a")], "p1 int, p2 string")
    got = audit_table(
        df, foreign_keys=[(["k1", "k2"], dim, ["p1", "p2"])]
    ).collect()[0]
    # NULL-keyed row excluded from the check (rows_checked 2), one orphan
    assert (got.violations, got.rows_checked) == (1, 2)
    with _pytest.raises(ValueError, match="no checks"):
        audit_table(df)


def test_audit_table_empty_and_all_null_frames_count_zero(spark):
    """r6 ADVICE: sum() over zero rows is NULL — violations must stay a
    COUNT (0) on an empty audited frame and on an FK check whose keys
    are all NULL, or rate math (violations / rows_checked) NULL-poisons."""
    from boatrace_database_spark.operators.validate import audit_table

    empty = spark.createDataFrame([], "id int, price double, tag string")
    dim = spark.createDataFrame([(1,)], ["pk"])
    got = {
        (r.rule, r.target): (r.violations, r.rows_checked)
        for r in audit_table(
            empty,
            not_null=["id"],
            ranges={"price": (0, 100)},
            matches={"tag": r"^[a-z]+$"},
            unique=[["id"]],
            foreign_keys=[(["id"], dim, ["pk"])],
        ).collect()
    }
    for key, (violations, rows_checked) in got.items():
        assert violations == 0, f"{key}: violations must be 0, not NULL"
        assert rows_checked == 0

    all_null_fk = spark.createDataFrame(
        [(None,), (None,)], "id int"
    )
    row = audit_table(
        all_null_fk, foreign_keys=[(["id"], dim, ["pk"])]
    ).collect()[0]
    assert (row.violations, row.rows_checked) == (0, 0)


def test_mixture_temperature_smooths_toward_sqrt(spark):
    """α=1/2 temperature mixture: per-row weight √(N/n_s), so each
    stratum's expected output mass is √(N·n_s) — a 4:1 input imbalance
    becomes 2:1 in expectation. Per-row copies must be exactly
    floor(w) or ceil(w) (the deterministic draw), and the per-stratum
    totals must sit within a binomial-noise band of n_s·w_s."""
    import math

    from boatrace_database_spark.operators import corpus as C

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = C.mixture_temperature(df, "doc_id", "source").collect()
    n_total = 500
    per_row = {}
    for r in out:
        per_row[r.doc_id] = max(per_row.get(r.doc_id, 0), r.copy + 1)
    totals = {"big": 0, "small": 0}
    for r in out:
        if r.copy == 0:
            totals[r.source] += per_row[r.doc_id]
    for src, n_s in (("big", 400), ("small", 100)):
        w = math.sqrt(n_total / n_s)
        lo, hi = math.floor(w), math.ceil(w)
        ids = {r.doc_id for r in out if r.source == src}
        for i in ids:
            assert per_row[i] in (lo, hi), (i, per_row[i], w)
        expect = n_s * w
        assert abs(totals[src] - expect) < 4 * math.sqrt(n_s) + 1, (
            src, totals[src], expect
        )
    # determinism: the exact same row set on a re-run
    again = C.mixture_temperature(df, "doc_id", "source").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@pytest.mark.slow
def test_weighted_sample_per_group_favors_heavy_rows(spark):
    """A-ES weighted reservoir: across many salts, weight-3 rows must
    be drawn ~3x as often as weight-1 rows (loose 2x bound — the test
    is a sanity check on the direction and magnitude, not a chi-square);
    counts stay exactly k; zero/NULL-weight rows never appear."""
    from boatrace_database_spark.operators import corpus as C

    rows = (
        [(i, "g", 3.0) for i in range(50)]
        + [(100 + i, "g", 1.0) for i in range(50)]
        + [(900, "g", 0.0), (901, "g", None)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    heavy = light = 0
    for salt in range(12):
        got = C.weighted_sample_per_group(
            df, "id", "grp", 20, "w", salt=salt
        ).collect()
        assert len(got) == 20
        ids = {r.id for r in got}
        assert 900 not in ids and 901 not in ids
        heavy += sum(1 for i in ids if i < 100)
        light += sum(1 for i in ids if 100 <= i < 200)
    assert heavy > 2 * light, (heavy, light)


def test_weighted_sample_determinism_and_guards(spark):
    import pytest as _pytest

    from boatrace_database_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 1.0), (3, "a", 1.0)], "id long, grp string, w double"
    )
    a = {r.id for r in C.weighted_sample_per_group(df, "id", "grp", 2, "w").collect()}
    b = {r.id for r in C.weighted_sample_per_group(
        df.repartition(5), "id", "grp", 2, "w").collect()}
    assert a == b
    with _pytest.raises(ValueError, match="k must be"):
        C.weighted_sample_per_group(df, "id", "grp", 0, "w")
