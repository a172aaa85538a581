"""Declarative data-quality constraint suite (the Deequ/Great-Expectations
pattern): a set of named checks over a table — completeness, uniqueness,
domain membership, range, pattern, freshness — evaluated in ONE aggregate
pass and emitted as a long-format (check, value) report.

Every check compiles to a Column aggregate, so N checks cost one scan
with a single map-side-combinable aggregate regardless of N — the
property that matters when the table is 100 TB and a naive
one-query-per-check harness would scan it N times. Values are BIGINT
(counts, epoch-days) so reports are engine-exact and diffable across
runs.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_CHECK_NAME = re.compile(r"^[A-Za-z0-9_]+$")


def completeness(col: str) -> Column:
    """Number of NULL values in ``col`` (0 = fully complete)."""
    return F.sum(F.col(col).isNull().cast("long"))


def uniqueness_gap(col: str) -> Column:
    """count(col) - count(DISTINCT col): 0 = unique (primary-key check)."""
    return F.count(col) - F.count_distinct(F.col(col))


def violations(pred: Column) -> Column:
    """Number of rows violating ``pred`` (rows where pred is FALSE/NULL)."""
    return F.sum((~F.coalesce(pred, F.lit(False))).cast("long"))


def profile_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate all ``checks`` (name -> BIGINT aggregate Column) in one
    pass; returns the long-format report (check, value) — one row per
    check, ordered by name for deterministic output.

    Check names are interpolated into a ``stack()`` SQL string, so they
    are restricted to ``[A-Za-z0-9_]+`` — a quote/backtick in a name
    would otherwise produce a parse error or a malformed report."""
    bad = [n for n in checks if not _CHECK_NAME.match(n)]
    if bad:
        raise ValueError(
            f"check names must match [A-Za-z0-9_]+, got: {bad!r}"
        )
    agg = df.agg(
        *[c.cast("long").alias(name) for name, c in checks.items()]
    )
    stack_args = ", ".join(f"'{n}', `{n}`" for n in checks)
    return (
        agg.select(
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (check, value)"
            )
        )
        .orderBy("check")
    )


def fd_audit(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Approximate-functional-dependency audit (the Metanome/profiling
    "does LHS -> RHS hold, and how badly not" question): for each
    candidate pair, how many LHS keys map to more than one RHS value,
    and what fraction of rows survives enforcing the majority mapping.

    Output per pair: n_keys, n_violating_keys, n_rows, kept_rows (sum of
    each key's majority-RHS count — the rows a repair-to-majority would
    keep), support_e6 = (1e6 * kept_rows) div n_rows. support_e6 =
    1_000_000 iff the FD holds exactly.

    Plan shape: per pair, groupBy(lhs, rhs) -> groupBy(lhs) -> global
    agg — two partial-aggregated shuffles whose key cardinality SHRINKS
    each step, then a one-row reduce; pairs evaluate as independent
    branches of one union (Spark schedules them concurrently). No
    all-pairs column scan: candidates are caller-declared, which is how
    a 100 TB profiler must run — FD discovery over all column pairs is
    O(cols^2) scans and belongs in a sampled pre-pass, not the full-data
    audit."""
    outs = []
    for lhs, rhs in pairs:
        per_val = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("__n"))
        per_key = per_val.groupBy(lhs).agg(
            F.count(F.lit(1)).alias("__n_rhs"),
            F.max("__n").alias("__maj"),
            F.sum("__n").alias("__tot"),
        )
        outs.append(
            per_key.agg(
                F.lit(lhs).alias("lhs_col"),
                F.lit(rhs).alias("rhs_col"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("__n_rhs") > 1).cast("long"))
                .cast("long")
                .alias("n_violating_keys"),
                F.sum("__tot").cast("long").alias("n_rows"),
                F.sum("__maj").cast("long").alias("kept_rows"),
                F.expr("(1000000 * sum(__maj)) div sum(__tot)")
                .cast("long")
                .alias("support_e6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def duck_fd_audit_sql(source_sql: str, pairs: list[tuple[str, str]]) -> str:
    """DuckDB mirror of :func:`fd_audit` — a UNION ALL of one aggregate
    chain per candidate pair over ``source_sql``. Caller appends ORDER BY."""
    parts = []
    for lhs, rhs in pairs:
        parts.append(f"""
SELECT '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
       count(*)::BIGINT AS n_keys,
       sum((__n_rhs > 1)::BIGINT)::BIGINT AS n_violating_keys,
       sum(__tot)::BIGINT AS n_rows,
       sum(__maj)::BIGINT AS kept_rows,
       ((1000000 * sum(__maj)) // sum(__tot))::BIGINT AS support_e6
FROM (
  SELECT {lhs}, count(*)::BIGINT AS __n_rhs, max(__n) AS __maj,
         sum(__n) AS __tot
  FROM (SELECT {lhs}, {rhs}, count(*)::BIGINT AS __n
        FROM ({source_sql}) GROUP BY {lhs}, {rhs})
  GROUP BY {lhs}
)""")
    return "\nUNION ALL\n".join(parts)


def duplicate_burden(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str,
    size_col: str,
) -> DataFrame:
    """Per-group duplicate burden: how much of the corpus volume is
    redundant copies? (grp, n_docs, n_dup_excess, size_total,
    size_excess, burden_e6) where a doc is EXCESS if it is not the
    minimum-id member of its exact-content (md5) cluster — the
    keep-first convention of the dedupe family — and burden_e6 is the
    excess share of ``size_col`` volume. The number a curation team
    reads as "dedup would save this fraction of tokens/compute".

    One md5 groupBy for cluster minima (content-hash keyed, combinable),
    one join back, one per-group rollup — the td1 exact-dedupe plan plus
    a weighted audit head."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("__id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__h"),
        F.col(size_col).cast("long").alias("__sz"),
    )
    keep = base.groupBy("__h").agg(F.min("__id").alias("__keep"))
    flagged = base.join(keep, "__h").withColumn(
        "__excess", (F.col("__id") != F.col("__keep")).cast("long")
    )
    return flagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__excess").cast("long").alias("n_dup_excess"),
        F.sum("__sz").cast("long").alias("size_total"),
        F.sum(F.col("__excess") * F.col("__sz")).cast("long").alias(
            "size_excess"
        ),
        F.expr(
            "CASE WHEN sum(__sz) > 0 THEN"
            " CAST((1000000 * sum(__excess * __sz)) div sum(__sz) AS BIGINT)"
            " END"
        ).alias("burden_e6"),
    )


def duck_duplicate_burden(source_sql: str) -> str:
    """DuckDB CTE body mirroring :func:`duplicate_burden`; exposes
    ``dburden(grp, n_docs, n_dup_excess, size_total, size_excess,
    burden_e6)``. ``source_sql`` must project (grp, id, text, sz)."""
    return f"""__db_base AS (
  SELECT grp, id, md5(coalesce(text, '')) AS h, CAST(sz AS BIGINT) AS sz
  FROM ({source_sql})
),
__db_keep AS (SELECT h, min(id) AS keep_id FROM __db_base GROUP BY h),
__db_f AS (
  SELECT b.grp, b.sz,
         CASE WHEN b.id <> k.keep_id THEN 1 ELSE 0 END AS excess
  FROM __db_base b JOIN __db_keep k USING (h)
),
dburden AS (
  SELECT grp, count(*)::BIGINT AS n_docs,
         sum(excess)::BIGINT AS n_dup_excess,
         sum(sz)::BIGINT AS size_total,
         sum(excess * sz)::BIGINT AS size_excess,
         CASE WHEN sum(sz) > 0 THEN
           CAST((1000000 * sum(excess * sz)) // sum(sz) AS BIGINT) END
           AS burden_e6
  FROM __db_f GROUP BY grp
)"""


def expectation_suite(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Declarative data-quality expectations (the Great-Expectations
    shape): each rule is (name, boolean Column predicate over a row);
    the suite evaluates ALL rules in ONE scan — a conditional sum per
    rule inside a single partial-combinable aggregate — and reports

        (check, n_rows, n_pass, n_fail, pass_e6)

    one row per rule. NULL predicate results count as FAILURES (an
    expectation you cannot evaluate is not met — the conservative gate
    convention), which also makes the arithmetic total: n_pass + n_fail
    = n_rows always. Rule names are restricted to [A-Za-z0-9_]+ (same
    injection guard as profile_checks). profile_checks measures column
    STATISTICS; this asserts row-level CONTRACTS — the pass/fail gate a
    pipeline actually blocks on."""
    bad = [n for n, _ in rules if not _CHECK_NAME.match(n)]
    if bad:
        raise ValueError(f"check names must match [A-Za-z0-9_]+, got: {bad!r}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.coalesce(pred.cast("long"), F.lit(0))).alias(f"__p_{name}")
        )
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({n}, {args}) AS (check, n_rows, n_pass)".format(
            n=len(rules),
            args=", ".join(f"'{name}', __n, __p_{name}" for name, _ in rules),
        )
    )
    return stacked.select(
        "check",
        F.col("n_rows").cast("long").alias("n_rows"),
        # sum over ZERO rows is NULL — coalesce so an empty input reads
        # (0, 0, 0, NULL), keeping n_pass + n_fail = n_rows total
        F.coalesce(F.col("n_pass"), F.lit(0)).cast("long").alias("n_pass"),
        (F.col("n_rows") - F.coalesce(F.col("n_pass"), F.lit(0)))
        .cast("long")
        .alias("n_fail"),
        # n_rows = 0 guard: `div` by zero THROWS under an ANSI session
        # (the abtest.py rate guard); an unevaluable rate is NULL
        F.expr(
            "CASE WHEN n_rows > 0"
            " THEN CAST((1000000 * n_pass) div n_rows AS BIGINT) END"
        ).alias("pass_e6"),
    )


def key_discovery(
    df: DataFrame, candidates: list[list[str]]
) -> DataFrame:
    """Candidate-key profiling (the uniqueness face of fd_audit): for
    each candidate column set, (candidate, n_rows, n_distinct,
    n_dup_rows, is_key) — is_key = 1 iff the set is unique over the
    data. One count_distinct-of-struct aggregate per candidate over a
    shared scan; the schema-inference pass run before choosing merge
    keys or dedupe identities."""
    out = None
    for cols in candidates:
        name = "+".join(cols)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(
                "n_distinct"
            ),
        ).select(
            F.lit(name).alias("candidate"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("long")
            .alias("n_dup_rows"),
            (F.col("n_rows") == F.col("n_distinct"))
            .cast("long")
            .alias("is_key"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def duck_key_discovery(source_sql: str, candidates: list[list[str]]) -> str:
    """DuckDB SELECT mirroring :func:`key_discovery` (UNION ALL, same
    aliases)."""
    parts = []
    for cols in candidates:
        name = "+".join(cols)
        tup = ", ".join(cols)
        parts.append(f"""
SELECT '{name}' AS candidate, count(*)::BIGINT AS n_rows,
       count(DISTINCT ({tup}))::BIGINT AS n_distinct,
       (count(*) - count(DISTINCT ({tup})))::BIGINT AS n_dup_rows,
       (CASE WHEN count(*) = count(DISTINCT ({tup}))
             THEN 1 ELSE 0 END)::BIGINT AS is_key
FROM ({source_sql})""")
    return "\nUNION ALL\n".join(parts)
