"""Gold layer: the denormalized ``race`` table and typed views.

``race`` = result ⋈ env on レースID, ⋈ schedule on (レースID, 選手登番),
inner joins (reference main.py:262). Inner semantics are part of the
spec: lanes whose result line carried a disqualification code have no
result row and therefore drop out (SURVEY §2.4).

Column order follows the committed golden CSVs (result columns first —
reference table/2020-08-01.csv header), not the current reference code's
env-first order; SURVEY §2.4 documents why the committed files are the
intended semantics.

Join strategy at scale: env is 1 row/race and schedule 6 rows/race —
per-day slices are tiny, the full-history tables shard by race_date.
All three tables are written partitioned by race_date, so the join keys
(race_id) are co-located within a date partition; Catalyst picks
broadcast-hash for the env side (small) and AQE handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boatrace_database_spark import schemas as S


def race_table(
    result: DataFrame, env: DataFrame, schedule: DataFrame
) -> DataFrame:
    """Build the wide gold table (golden-CSV column order)."""
    joined = (
        result.join(env.drop("race_date"), on=S.RACE_ID, how="inner")
        .join(
            schedule.drop("race_date"),
            on=[S.RACE_ID, S.PLAYER_ID],
            how="inner",
        )
    )
    order = (
        S.RESULT_COLUMNS
        + [c for c in S.ENV_COLUMNS if c != S.RACE_ID]
        + [c for c in S.SCHEDULE_COLUMNS if c not in (S.RACE_ID, S.PLAYER_ID)]
    )
    return joined.select("race_date", *order)


def odds_map_view(odds: DataFrame) -> DataFrame:
    """Spark-idiomatic enrichment (SURVEY §1.3): odds as a
    map<bet_type, payout_yen>, NULL for `-1` sentinels. The wide
    10-column layout stays primary (it is what the reference
    publishes); this view derives the map for consumers that want
    per-bet-type access without 10 hardcoded columns."""
    entries = [
        F.struct(
            F.lit(c).alias("key"),
            F.when(F.col(c) != "-1", F.col(c).try_cast("int")).alias("value"),
        )
        for c in S.ODDS_COLUMNS[1:]
    ]
    return odds.select(
        "race_date",
        F.col(S.RACE_ID).alias("race_id"),
        F.map_from_entries(F.array(*entries)).alias("payouts"),
    )


def typed_view(df: DataFrame, columns: list[str], aliases: list[str]) -> DataFrame:
    """Romanized, typed, NULL-normalized view of a silver/gold table.

    ``-1`` payout sentinels become NULL; numeric strings cast to their
    real types (SURVEY §1.3). ``try_cast`` keeps ANSI mode safe against
    stray unparseable values.
    """
    out = []
    for orig, alias in zip(columns, aliases):
        col = F.col(orig)
        target = S.GOLD_TYPES.get(alias)
        if target is not None:
            col = col.try_cast(target)
            if alias in {
                "win", "place1", "place2", "exacta", "quinella",
                "wide12", "wide13", "wide23", "trifecta", "trio",
            }:
                col = F.when(col == -1, F.lit(None)).otherwise(col)
        out.append(col.alias(alias))
    return df.select(*out)
