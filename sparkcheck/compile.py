"""RuleSpec → Spark Column compilation.

Pure functions building the per-rule outcome struct columns the engine chains
into a single pass. The compilation strategy implements the reference's
sequential fail-fast interpreter (/root/reference/src/index.ts:125-152) as a
per-row first-failure selection (SURVEY.md §2.B B5): every rule's outcome is a
struct column ``_r{i} = struct(ok, emissions)`` and the verdict is the first
``!ok`` by rule index via a CASE/COALESCE cascade — one job, single pass, no
side effects, so evaluating later rules' expressions for already-failed rows is
observationally equivalent to the reference's "remaining rules never run".

Everything stays in Spark SQL expressions (whole-stage codegen; no per-row
Python, per BASELINE.json input_hint).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .model import Check, FieldConstraint, FieldRule

# Emission struct fields (violation payload before rule attribution):
#   key    string  -- field key; NULL → global error (src/index.ts:18-26)
#   message string
#   value  string  -- stringified offending value
#   seq    int     -- emission order inside the rule (B11 insertion order)
EMISSION_FIELDS = ("key", "message", "value", "seq")


def as_pred(x) -> Column:
    """Boolean predicate: SQL string → expr, Column passthrough."""
    return F.expr(x) if isinstance(x, str) else x


def as_msg(x) -> Column:
    """Message: plain str → literal, Column passthrough (interpolated msgs)."""
    return F.lit(x) if isinstance(x, str) else x


def as_val(x) -> Column:
    if x is None:
        return F.lit(None).cast("string")
    c = F.expr(x) if isinstance(x, str) else x
    return c.cast("string")


def check_fired(check: Check) -> Column:
    """True when this check emits a violation.

    NULL predicate results count as failure (conservative null-guard for
    context-dependent rules, SURVEY.md §4.2 'short-circuit fail-fast');
    a false guard makes the check pass vacuously (C10 conditional chains)."""
    failed = ~F.coalesce(as_pred(check.ok_expr), F.lit(False))
    if check.guard is not None:
        failed = F.when(F.coalesce(as_pred(check.guard), F.lit(False)), failed) \
                  .otherwise(F.lit(False))
    return failed


def emission_struct(check: Check, seq: int, fired: Column) -> Column:
    key = F.lit(check.key).cast("string") if check.key is not None \
        else F.lit(None).cast("string")
    return F.struct(
        key.alias("key"),
        as_msg(check.message).cast("string").alias("message"),
        as_val(check.value).alias("value"),
        F.lit(seq).alias("seq"),
        fired.alias("fired"),
    )


def _bare_emission(check: Check, seq: int) -> Column:
    key = F.lit(check.key).cast("string") if check.key is not None \
        else F.lit(None).cast("string")
    return F.struct(key.alias("key"),
                    as_msg(check.message).cast("string").alias("message"),
                    as_val(check.value).alias("value"),
                    F.lit(seq).alias("seq"))


def checks_outcome(checks: list[Check]) -> Column:
    """Compile a list of checks into struct(ok boolean, emissions array).

    The rule fails iff ≥1 emission fired; all fired emissions are retained
    (intra-rule multi-error accumulation, B6: src/test.spec.ts:681-703).

    Single-check rules (the overwhelmingly common case) get a flat CASE
    expression instead of the array/filter/transform machinery — expression
    tree size drives Catalyst analysis time, which is the engine's main
    fixed (non-scaling) cost."""
    if len(checks) == 1:
        fired = check_fired(checks[0])
        emissions = F.when(fired, F.array(_bare_emission(checks[0], 0))) \
                     .otherwise(empty_emissions())
        return F.struct((~fired).alias("ok"), emissions.alias("emissions"))

    structs = []
    for seq, check in enumerate(checks):
        fired = check_fired(check)
        structs.append(emission_struct(check, seq, fired))
    all_em = F.array(*structs)
    fired_em = F.filter(all_em, lambda e: e["fired"])
    emissions = F.transform(
        fired_em,
        lambda e: F.struct(e["key"].alias("key"), e["message"].alias("message"),
                           e["value"].alias("value"), e["seq"].alias("seq")),
    )
    ok = F.size(fired_em) == 0
    return F.struct(ok.alias("ok"), emissions.alias("emissions"))


def field_rule_outcome(rule: FieldRule) -> Column:
    return checks_outcome(rule.checks)


def schema_emissions(constraints: list[FieldConstraint]) -> Column:
    """Schema-stage violations: ALL failing constraints are reported together
    (the reference surfaces every schema issue at once, src/index.ts:96-121),
    unlike rules which fail-fast at rule granularity."""
    checks = [Check(ok_expr=c.check, key=c.key, message=c.message,
                    value=F.col(c.key.split(".")[0]) if "." not in c.key else None)
              for c in constraints]
    if not checks:
        return F.array().cast(
            "array<struct<key:string,message:string,value:string,seq:int>>")
    return checks_outcome(checks)["emissions"]


def empty_emissions() -> Column:
    return F.array().cast(
        "array<struct<key:string,message:string,value:string,seq:int>>")


def outcome_from_flag(failed: Column, key: Optional[str], message,
                      value=None) -> Column:
    """Single-emission outcome struct from a precomputed boolean (used by
    join-backed rules: unique / referential / enrich / array_all)."""
    check = Check(ok_expr=~failed, key=key, message=message, value=value)
    return checks_outcome([check])
