"""Pure-DataFrame parse: the reference state machine as window functions.

The imperative kernel (kernel.py) is the production path; this module
proves the same semantics express declaratively (SURVEY §2.2 P3/P4/P6
Spark mappings, §7.1 M2 "pure-DataFrame variant"):

- P3 header context  -> last(ignorenulls) over (file, line_no) windows,
  with the name/place lines reached by fixed lead() offsets (+2/+4),
- P4 race counter    -> running sum of distance markers minus the count
  at the last section header,
- P6 odds stanza     -> fixed lead(k) offsets from the 単勝 anchor line
  (the reference cursor advances one line per payout except 複勝1/複勝2
  which share a line — so the k-th pattern always reads lead(k') for a
  fixed k'; its misalignment-on-missing-line behavior is reproduced
  exactly because the offsets never resync),
- the reference's lookahead consumption (lines h+1..h+3 never being
  re-processed) -> an explicit "distance since header" mask.

One shuffle: the per-file window sort. The equivalence test
(tests/test_dataframe_parse.py) checks row-set equality against the
kernel on the full committed month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from boatrace_database_spark.parse import patterns as P

_N = "\n"  # bronze lines are stripped; regexes need the readline-style tail


def _U(pattern: str) -> str:
    """Java-regex twin of a Python pattern: (?U) makes \\s/\\d/\\D use
    Unicode classes — Python's \\s matches the full-width space U+3000
    (load-bearing in these layouts), Java's plain \\s does not."""
    return "(?U)" + pattern


def _ctx(bronze: DataFrame) -> DataFrame:
    """Per-line parsing context: race name/place, race number, mask."""
    w = Window.partitionBy("file").orderBy("line_no")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ln = F.concat(F.col("line"), F.lit(_N))
    df = bronze.withColumn("is_header", ln.rlike(_U(P.SECTION_HEADER.pattern)))
    # fixed lookahead: the race name sits 2 lines below the banner, the
    # venue 2 further (reference main.py:139-154)
    name_src = F.lead(F.col("line"), 2).over(w)
    place_src = F.concat(F.lead(F.col("line"), 4).over(w), F.lit(_N))
    # Wrap both extracts in ONE struct tagged to the header line: the
    # struct is non-null at every header even when an inner extract
    # fails (regexp_extract returns '' on no-match -> nullif), so
    # last(ignorenulls) always carries the CURRENT section's context.
    # A malformed name/venue line therefore yields NULL name/place for
    # the whole section — race_id concats to NULL and the records drop,
    # matching the kernel's emit() semantics (names[j] is None).
    df = df.withColumn(
        "hdr_ctx",
        F.when(
            F.col("is_header"),
            F.struct(
                F.nullif(
                    F.regexp_extract(name_src, _U(r"^\s{10}([^\s]+)"), 1), F.lit("")
                ).alias("name"),
                F.nullif(
                    F.regexp_extract(place_src, _U(P.RACE_PLACE.pattern), 1), F.lit("")
                ).alias("place"),
            ),
        ),
    )
    df = (
        df.withColumn("_ctx", F.last("hdr_ctx", ignorenulls=True).over(wcum))
        .withColumn("race_name", F.col("_ctx.name"))
        .withColumn("race_place", F.col("_ctx.place"))
        .withColumn(
            "hdr_line_no",
            F.last(F.when(F.col("is_header"), F.col("line_no")), ignorenulls=True).over(
                wcum
            ),
        )
    )
    # the reference's readline() lookahead consumes h+1..h+3 without
    # re-processing them; the venue line h+4 IS re-processed
    since_hdr = F.col("line_no") - F.col("hdr_line_no")
    df = df.withColumn(
        "processed", ~since_hdr.between(1, 3) | F.col("hdr_line_no").isNull()
    )
    # P4: running marker count, reset at each section header
    marker = (
        F.col("processed") & F.col("line").rlike(_U(P.DISTANCE_MARKER.pattern))
    ).cast("long")
    df = df.withColumn("marker_cum", F.sum(marker).over(wcum))
    df = df.withColumn(
        "hdr_marker_cum",
        F.last(F.when(F.col("is_header"), F.col("marker_cum")), ignorenulls=True).over(
            wcum
        ),
    )
    df = df.withColumn(
        "race_num", F.col("marker_cum") - F.coalesce("hdr_marker_cum", F.lit(0))
    )
    return df.withColumn(
        "race_id",
        F.concat(
            F.col("race_date"),
            F.col("race_place"),
            F.col("race_name"),
            F.col("race_num").cast("string"),
            F.lit("R"),
        ),
    )


def _extract_groups(pattern: str, n: int) -> list:
    src = F.concat(F.col("line"), F.lit(_N))
    # regexp_extract with a non-anchored pattern searches — matching the
    # reference's re.search/re.match semantics
    return [F.regexp_extract(src, _U(pattern), i) for i in range(1, n + 1)]


def schedule_df(bronze: DataFrame) -> DataFrame:
    ctx = _ctx(bronze.where(F.col("kind") == "B"))
    gs = _extract_groups(P.SCHEDULE.pattern, 13)
    from boatrace_database_spark.schemas import SCHEDULE_COLUMNS

    keep = ctx.where(
        F.col("processed")
        & F.col("race_id").isNotNull()
        & F.concat(F.col("line"), F.lit(_N)).rlike(_U(P.SCHEDULE.pattern))
    )
    cols = [F.col("race_id").alias(SCHEDULE_COLUMNS[0])] + [
        g.alias(c) for g, c in zip(gs, SCHEDULE_COLUMNS[1:])
    ]
    return keep.select("race_date", *cols)


def result_df(bronze: DataFrame) -> DataFrame:
    ctx = _ctx(bronze.where(F.col("kind") == "K"))
    gs = _extract_groups(P.RESULT.pattern, 3)
    from boatrace_database_spark.schemas import RESULT_COLUMNS

    keep = ctx.where(
        F.col("processed")
        & F.col("race_id").isNotNull()
        & F.concat(F.col("line"), F.lit(_N)).rlike(_U(P.RESULT.pattern))
    )
    cols = [F.col("race_id").alias(RESULT_COLUMNS[0])] + [
        g.alias(c) for g, c in zip(gs, RESULT_COLUMNS[1:])
    ]
    return keep.select("race_date", *cols)


def env_df(bronze: DataFrame) -> DataFrame:
    ctx = _ctx(bronze.where(F.col("kind") == "K"))
    gs = _extract_groups(P.ENV.pattern, 4)
    from boatrace_database_spark.schemas import ENV_COLUMNS

    keep = ctx.where(
        F.col("processed")
        & F.col("race_id").isNotNull()
        & F.concat(F.col("line"), F.lit(_N)).rlike(_U(P.ENV.pattern))
    )
    cols = [F.col("race_id").alias(ENV_COLUMNS[0])] + [
        g.alias(c) for g, c in zip(gs, ENV_COLUMNS[1:-1])
    ] + [F.col("race_place").alias(ENV_COLUMNS[-1])]
    return keep.select("race_date", *cols)


# fixed lead() offset of each payout pattern from the 単勝 anchor
# (reference main.py:173-185: the cursor advances after every kind
# except 複勝1, so offsets are 0,1,1,2,3,4,5,6,7,8)
_ODDS_OFFSETS = (0, 1, 1, 2, 3, 4, 5, 6, 7, 8)


def odds_df(bronze: DataFrame) -> DataFrame:
    from boatrace_database_spark.schemas import ODDS_COLUMNS

    ctx = _ctx(bronze.where(F.col("kind") == "K"))
    w = Window.partitionBy("file").orderBy("line_no")
    anchors = ctx.withColumn(
        "is_anchor",
        F.col("processed")
        & F.concat(F.col("line"), F.lit(_N)).rlike(_U(P.ODDS_ANCHOR.pattern)),
    )
    for k in sorted(set(_ODDS_OFFSETS)):
        anchors = anchors.withColumn(
            f"lead{k}",
            F.concat(F.coalesce(F.lead(F.col("line"), k).over(w), F.lit("")), F.lit(_N)),
        )
    keep = anchors.where(F.col("is_anchor") & F.col("race_id").isNotNull())
    cancelled = F.col("line").contains(P.CANCELLED)
    payout_cols = []
    for (name, pat), off in zip(
        zip(ODDS_COLUMNS[1:], P.ODDS_STANZA), _ODDS_OFFSETS
    ):
        # re.match semantics: anchor the pattern at line start
        extracted = F.regexp_extract(F.col(f"lead{off}"), _U("^" + pat.pattern), 1)
        val = F.when(cancelled, F.lit("-1")).otherwise(
            F.when(extracted == "", F.lit("-1")).otherwise(extracted)
        )
        payout_cols.append(val.alias(name))
    return keep.select(
        "race_date", F.col("race_id").alias(ODDS_COLUMNS[0]), *payout_cols
    )


def silver_tables_df(bronze: DataFrame) -> dict[str, DataFrame]:
    """All four parity tables via the declarative path."""
    return {
        "schedule": schedule_df(bronze),
        "result": result_df(bronze),
        "odds": odds_df(bronze),
        "env": env_df(bronze),
    }
