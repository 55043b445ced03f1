"""Declarative data-quality validation — the expectations gate every
production ingest runs before data reaches training (Great-
Expectations / dbt-test shape, public): a rule list compiles into ONE
Catalyst plan whose output is a bounded per-rule violation summary.

100 TB shape: every ROW-LEVEL rule (not_null / in_range / in_set /
regex_match / expr and the uniqueness counter) folds into a SINGLE
scan-and-aggregate — one pass over the table no matter how many rules
— because each rule is just a conditional-count column pair in the
same groupBy().agg(); referential-integrity rules each add one
left-anti join against their (usually broadcastable) reference key
set. The driver sees one row per rule: exact int64 counts and one
pinned division."""

from __future__ import annotations

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame

_ROW_RULES = ("not_null", "in_range", "in_set", "regex_match", "expr")


def _rule_counters(rule: dict):
    """(checked Column, violated Column) — both 0/1 ints — for a
    row-level rule. ``checked`` is the rule's precondition (non-null
    for value rules, every row for not_null/expr); ``violated``
    implies checked."""
    kind = rule["rule"]
    if kind == "not_null":
        c = F.col(rule["col"])
        return F.lit(1), c.isNull().cast("int")
    if kind == "in_range":
        c = F.col(rule["col"])
        lo, hi = rule["min"], rule["max"]
        bad = (c < F.lit(lo)) | (c > F.lit(hi))
        return c.isNotNull().cast("int"), (c.isNotNull() & bad).cast("int")
    if kind == "in_set":
        c = F.col(rule["col"])
        ok = c.isin(*[v for v in rule["values"]])
        return c.isNotNull().cast("int"), (c.isNotNull() & ~ok).cast("int")
    if kind == "regex_match":
        c = F.col(rule["col"])
        ok = c.rlike(rule["pattern"])
        return c.isNotNull().cast("int"), (c.isNotNull() & ~ok).cast("int")
    if kind == "expr":
        ok = F.expr(rule["expr"])
        return F.lit(1), (~F.coalesce(ok, F.lit(False))).cast("int")
    raise ValueError(f"unknown row rule: {kind!r}")


def validate(frame, rules):
    """Run ``rules`` against ``frame`` → DaskFrame(rule, n_checked,
    n_violations, violation_rate) ordered as given. Rule dicts:

    - ``{"rule": "not_null", "name", "col"}``
    - ``{"rule": "in_range", "name", "col", "min", "max"}`` (nulls
      skip — pair with not_null to also reject them)
    - ``{"rule": "in_set", "name", "col", "values"}``
    - ``{"rule": "regex_match", "name", "col", "pattern"}`` (keep
      patterns in the RE2-compatible subset — the engine evaluates
      Java regex, an ANSI oracle evaluates RE2)
    - ``{"rule": "expr", "name", "expr"}`` — violation when the SQL
      predicate is false OR null (a null check outcome is a failure,
      the conservative gate)
    - ``{"rule": "unique", "name", "cols"}`` — n_violations = rows
      minus distinct key combinations (extra copies; key columns with
      nulls count per SQL distinct semantics)
    - ``{"rule": "ref_integrity", "name", "col", "ref", "ref_col"}``
      — non-null values with no match in the reference frame
      (one left-anti join; ``ref`` may be DaskFrame or DataFrame)
    """
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    if not rules:
        raise ValueError("validate: empty rule list")
    names = [r.get("name") or r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("validate: duplicate rule names")

    aggs = []
    row_rules = []
    for name, rule in zip(names, rules):
        kind = rule["rule"]
        if kind in _ROW_RULES:
            checked, viol = _rule_counters(rule)
            aggs.append(F.sum(checked).cast("bigint").alias(f"c_{name}"))
            aggs.append(F.sum(viol).cast("bigint").alias(f"v_{name}"))
            row_rules.append(name)
        elif kind == "unique":
            cols = [F.col(c) for c in rule["cols"]]
            aggs.append(F.count(F.lit(1)).cast("bigint").alias(f"c_{name}"))
            aggs.append(
                (F.count(F.lit(1)) - F.countDistinct(*cols))
                .cast("bigint").alias(f"v_{name}")
            )
            row_rules.append(name)
        elif kind != "ref_integrity":
            raise ValueError(f"unknown rule: {kind!r}")

    parts = []
    spark = sdf.sparkSession
    if row_rules:
        one = sdf.agg(*aggs)
        stacked = one.select(F.expr(
            "stack({n}, {args}) AS (rule, n_checked, n_violations)".format(
                n=len(row_rules),
                args=", ".join(
                    f"'{name}', c_{name}, v_{name}" for name in row_rules
                ),
            )
        ))
        parts.append(stacked)
    for name, rule in zip(names, rules):
        if rule["rule"] != "ref_integrity":
            continue
        ref = rule["ref"]
        rsdf = ref._sdf if isinstance(ref, DaskFrame) else ref
        keys = rsdf.select(
            F.col(rule["ref_col"]).alias("__k")
        ).distinct()
        vals = sdf.filter(F.col(rule["col"]).isNotNull()).select(
            F.col(rule["col"]).alias("__k")
        )
        miss = vals.join(F.broadcast(keys), "__k", "left_anti")
        parts.append(
            vals.agg(F.count(F.lit(1)).cast("bigint").alias("n_checked"))
            .crossJoin(
                miss.agg(F.count(F.lit(1)).cast("bigint")
                         .alias("n_violations"))
            )
            .select(F.lit(name).alias("rule"), "n_checked", "n_violations")
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    order = spark.createDataFrame(
        [(n, i) for i, n in enumerate(names)], "rule string, __i int"
    )
    out = (
        out.join(F.broadcast(order), "rule")
        .select(
            "rule", "n_checked", "n_violations",
            F.when(
                F.col("n_checked") > 0,
                F.round(
                    F.col("n_violations").cast("double")
                    / F.col("n_checked").cast("double"), 6
                ),
            ).alias("violation_rate"),
            "__i",
        )
        .orderBy("__i")
        .drop("__i")
    )
    return DaskFrame(out)
