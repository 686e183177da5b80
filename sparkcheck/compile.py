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

ANSI-mode totality contract: because every rule's expression is evaluated for
every row (fail-fast is verdict SELECTION, not execution gating), a rule
expression that can THROW under Spark's ANSI mode (CAST of a non-numeric
string, element_at out of bounds, division by zero) would abort the whole job
for rows the reference would never have evaluated. Rule expressions must be
total: use try_cast / try_element_at / try_divide (and NULL results count as
failure via check_fired's coalesce). This is the one observable difference
from the reference's "remaining rules never run" — asserted by
tests/test_extraction_paths.py and the events suite (try_cast on props).
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


def schema_emissions(constraints: list[FieldConstraint],
                     shape_checks: list[Check] | None = None,
                     df=None) -> Column:
    """Schema-stage violations: ALL failing constraints are reported together
    (the reference surfaces every schema issue at once, src/index.ts:96-121),
    unlike rules which fail-fast at rule granularity.

    Declared-shape checks (missing/extra/type-mismatch, from
    apply_declared_struct) come first, then per-field constraints — seq keeps
    B11 insertion order across both. A dotted constraint key (B4 nested
    paths, src/index.ts:101-113) doubles as the offending-value expression,
    so `props.k` reports the nested field's value; keys that are not
    resolvable column paths (e.g. array-index segments like `tags.0`) fall
    back to a NULL value unless FieldConstraint.value overrides it."""

    def default_value(key: str):
        e = F.expr(key)
        if df is None:
            return e
        try:
            df.select(e)  # driver-side analysis probe, no job
            return e
        except Exception:
            return None

    checks = list(shape_checks or [])
    checks += [Check(ok_expr=c.check, key=c.key, message=c.message,
                     value=c.value if c.value is not None
                     else default_value(c.key))
               for c in constraints]
    if not checks:
        return empty_emissions()
    return checks_outcome(checks)["emissions"]


def apply_declared_struct(df, declared):
    """A2 declared-StructType enforcement ("parse, don't validate",
    src/standard-schema.ts:18-37): diff the declared shape against the
    DataFrame schema and return (df', shape_checks) where

    - a MISSING declared column → always-firing Check (key=name) AND the
      column is projected in as a typed NULL so later rules/constraints
      still compile against the declared shape;
    - an EXTRA undeclared column → always-firing Check (underscore-prefixed
      engine-internal columns exempt);
    - a TYPE MISMATCH → always-firing Check with the per-row value as the
      offending value; nested StructTypes are diffed recursively, emitting
      dotted-path keys.

    Spark schemas are uniform per DataFrame, so these checks are static per
    batch — they compile to literal emissions, costing nothing per row."""
    from pyspark.sql.types import StructType

    if declared is None:
        return df, []
    if isinstance(declared, str):
        declared = StructType.fromDDL(declared)
    actual = df.schema
    checks: list[Check] = []

    def diff(dec: StructType, act: StructType, prefix: str) -> None:
        act_by_name = {f.name: f for f in act.fields}
        for f in dec.fields:
            path = f"{prefix}{f.name}"
            a = act_by_name.get(f.name)
            if a is None:
                checks.append(Check(
                    ok_expr=F.lit(False), key=path,
                    message=f"Required column '{path}' is missing"))
                continue
            if a.dataType == f.dataType:
                continue
            if isinstance(f.dataType, StructType) \
                    and isinstance(a.dataType, StructType):
                diff(f.dataType, a.dataType, f"{path}.")
                continue
            checks.append(Check(
                ok_expr=F.lit(False), key=path,
                message=(f"Invalid type for column '{path}': expected "
                         f"{f.dataType.simpleString()}, received "
                         f"{a.dataType.simpleString()}"),
                value=F.expr(path)))
        for f in act.fields:
            if f.name not in {d.name for d in dec.fields} \
                    and not f.name.startswith("_"):
                checks.append(Check(
                    ok_expr=F.lit(False), key=f"{prefix}{f.name}",
                    message=f"Unexpected column '{prefix}{f.name}'"))

    diff(declared, actual, "")
    # parse, don't validate: project missing top-level columns in as typed
    # NULLs so the declared shape holds downstream
    present = set(df.columns)
    add = [F.lit(None).cast(f.dataType).alias(f.name)
           for f in declared.fields if f.name not in present]
    if add:
        df = df.select("*", *add)
    # ...and rebuild existing struct columns whose DECLARED NESTED members are
    # missing, adding them as typed NULLs (withField) — a later rule
    # referencing the nested path compiles instead of AnalysisException
    act_by_name = {f.name: f for f in actual.fields}
    for f in declared.fields:
        a = act_by_name.get(f.name)
        if a is not None and isinstance(f.dataType, StructType) \
                and isinstance(a.dataType, StructType) \
                and _struct_needs_patch(f.dataType, a.dataType):
            df = df.withColumn(f.name, _patch_struct(
                F.col(f.name), f.dataType, a.dataType))
    return df, checks


def _struct_needs_patch(dec, act) -> bool:
    """True when a declared nested member is absent from the actual struct
    (at any depth)."""
    from pyspark.sql.types import StructType

    act_by = {f.name: f for f in act.fields}
    for f in dec.fields:
        a = act_by.get(f.name)
        if a is None:
            return True
        if isinstance(f.dataType, StructType) \
                and isinstance(a.dataType, StructType) \
                and _struct_needs_patch(f.dataType, a.dataType):
            return True
    return False


def _patch_struct(col: Column, dec, act) -> Column:
    """Rebuild a struct column with declared-but-missing members added as
    typed NULLs, recursively. Rows where the struct itself is NULL stay NULL
    (withField preserves null structs)."""
    from pyspark.sql.types import StructType

    act_by = {f.name: f for f in act.fields}
    out = col
    for f in dec.fields:
        a = act_by.get(f.name)
        if a is None:
            out = out.withField(f.name, F.lit(None).cast(f.dataType))
        elif isinstance(f.dataType, StructType) \
                and isinstance(a.dataType, StructType) \
                and _struct_needs_patch(f.dataType, a.dataType):
            out = out.withField(f.name, _patch_struct(
                col.getField(f.name), f.dataType, a.dataType))
    return out


def empty_emissions() -> Column:
    return F.array().cast(
        "array<struct<key:string,message:string,value:string,seq:int>>")


def outcome_from_flag(failed: Column, key: Optional[str], message,
                      value=None) -> Column:
    """Single-emission outcome struct from a precomputed boolean (used by
    join-backed rules: unique / referential / enrich / array_all)."""
    check = Check(ok_expr=~failed, key=key, message=message, value=value)
    return checks_outcome([check])
