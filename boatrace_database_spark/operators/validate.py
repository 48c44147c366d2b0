"""Declarative data-quality audit: expectations evaluated in as few
passes as the check classes allow, emitting one violations row per
check — the admission gate a 100 TB ingest runs before anything
downstream trusts a landed batch.

Check classes and their scale shapes:
- scalar row predicates (not-null, range, regex): ALL fused into ONE
  conditional-aggregate scan — adding a check adds a codegen sum, not
  a pass. Exact-distinct uniqueness rides the same aggregate (Spark
  plans the distinct via one expand+shuffle).
- referential integrity: ONE left join + conditional aggregate per
  foreign key against the referenced table's de-duplicated key
  projection — orphan count and rows-checked come out of the same
  pass (Catalyst/AQE picks broadcast vs shuffle from the dim's size;
  at 100 TB the big-dim case is exactly when a forced broadcast would
  be wrong).

Output contract (every check): ``rule`` (kind), ``target`` (column
spec), ``violations``, ``rows_checked`` — a table, not an exception,
so pipelines can threshold, alert on rates, or join audits across
batches. Callers wanting fail-fast wrap it:
``audit.where("violations > 0").count() == 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audit_table(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
    matches: dict[str, str] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Run the declared expectations over ``df``.

    - ``not_null``: columns that must never be NULL.
    - ``ranges``: col -> (lo, hi) inclusive bounds; either side None
      for one-sided. NULLs are NOT range violations (declare the
      column in not_null if absence is itself a defect) — one check,
      one failure mode.
    - ``matches``: col -> regex the full value must match (anchored
      with ^$ by the caller if intended); NULLs skipped as above.
    - ``unique``: key column lists that must identify rows uniquely;
      violations = surplus rows (count - distinct count).
    - ``foreign_keys``: (fk_cols, referenced_df, pk_cols) triples;
      violations = rows whose non-NULL key tuple has no match (NULL
      keys are the not_null check's business).

    Returns the audit table sorted by (check, target) so the output is
    deterministic and oracle-comparable.
    """
    not_null = not_null or []
    ranges = ranges or {}
    matches = matches or {}
    unique = unique or []
    foreign_keys = foreign_keys or []

    pieces: list[DataFrame] = []

    # -- one fused scan for every scalar predicate + exact uniqueness --
    aggs = [F.count(F.lit(1)).alias("_n")]
    labels: list[tuple[str, str, str]] = []  # (check, target, agg alias)

    def add(check: str, target: str, cond):
        alias = f"_v{len(labels)}"
        # coalesce: sum over ZERO rows is NULL — violations is a
        # count, and NULL would poison rate math (violations / rows)
        aggs.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(alias)
        )
        labels.append((check, target, alias))

    for c in not_null:
        add("not_null", c, F.col(c).isNull())
    for c, (lo, hi) in ranges.items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        add("range", f"{c}[{lo},{hi}]", F.col(c).isNotNull() & cond)
    for c, pattern in matches.items():
        add(
            "matches",
            f"{c}~{pattern}",
            F.col(c).isNotNull() & ~F.col(c).rlike(pattern),
        )
    for key in unique:
        alias = f"_v{len(labels)}"
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(k) for k in key]))
            ).alias(alias)
        )
        labels.append(("unique", ",".join(key), alias))

    if labels:
        row = df.agg(*aggs)
        pieces.append(
            row.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(check).alias("rule"),
                                F.lit(target).alias("target"),
                                F.col(alias).alias("violations"),
                                F.col("_n").alias("rows_checked"),
                            )
                            for check, target, alias in labels
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )

    # -- one left join + conditional aggregate per declared foreign
    # key: violations (no match) and rows_checked (non-NULL keys) come
    # out of the SAME single pass over the keyed projection --
    for fk_cols, dim, pk_cols in foreign_keys:
        keyed = df.select(*fk_cols).na.drop("any")
        dim_keys = dim.select(*pk_cols).dropDuplicates()
        cond = None
        for f_, p_ in zip(fk_cols, pk_cols):
            c = keyed[f_] == dim_keys[p_]
            cond = c if cond is None else (cond & c)
        joined = keyed.join(dim_keys, cond, "left")
        pieces.append(
            joined.agg(
                # coalesce: all-NULL-key (or empty) audited frames
                # leave zero joined rows and sum() would return NULL
                F.coalesce(
                    F.sum(dim_keys[pk_cols[0]].isNull().cast("long")),
                    F.lit(0),
                ).alias("violations"),
                F.count(F.lit(1)).alias("rows_checked"),
            ).select(
                F.lit("foreign_key").alias("rule"),
                F.lit(",".join(fk_cols)).alias("target"),
                "violations",
                "rows_checked",
            )
        )

    if not pieces:
        raise ValueError("audit_table: no checks declared")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule", "target")
