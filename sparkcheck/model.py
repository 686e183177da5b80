"""Rule model + fluent builder (the logical-plan API).

Re-expresses the reference's plan-construction surface
(/root/reference/src/index.ts:349-497 — FluentValidatorBuilder) as a Python
builder that collects declarative RuleSpecs; `compile.py` turns them into Spark
Column expressions and join/aggregate stages; `engine.py` executes them in one
partition-parallel pass.

Semantics preserved (SURVEY.md §2.A):
- A1  build_validator() — empty plan state
- A2  .input(schema, constraints) — declared shape + per-field predicates
- A3  .deps(*names) — required-dependency gate, three states
      (src/index.ts:210 DepsStatus = not-required | required | passed)
- A4  .rule(...) — ordered rule append; first failing rule per row wins
- A5  .provide(**deps) — binds dependency instances, flips gate to "passed"
- A6  .command(execute) — terminal action stage (command.py)
- A8  .plan() — introspection (≙ ~unsafeInternals src/index.ts:407-409)
- A9  chaining mutates one shared instance, returns self (src/index.ts:376-388)

Runtime gate messages are byte-identical to the reference's invariants
(src/index.ts:431-438, 271-278), asserted by the parity suite exactly as
src/test.spec.ts:86-96,316-328 asserts them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

ColumnLike = Any  # pyspark Column or SQL-expression string


def invariant(condition: Any, message: str) -> None:
    """Throw-on-false assertion (src/index.ts:5-9)."""
    if not condition:
        raise ValueError(message)


# ---------------------------------------------------------------------------
# Schema stage: declared shape + per-field constraints (StandardSchemaV1 ≙
# StructType + predicate list; src/standard-schema.ts:1-57)
# ---------------------------------------------------------------------------


@dataclass
class FieldConstraint:
    """One per-field shape predicate (archetype C1).

    `key` is the violation key — a dotted path for nested fields, matching
    the reference's path-join convention (src/index.ts:101-113), and is also
    the default offending-value expression (so a constraint on `props.k`
    reports the nested field's value, not NULL).
    `check` is a SQL boolean expression over the input columns; rows where it
    is false (or null) emit a schema violation.
    `value` optionally overrides the offending-value expression (e.g.
    `try_element_at(tags, 1)` for array elements under ANSI mode).
    """

    key: str
    check: ColumnLike
    message: str
    value: Optional[ColumnLike] = None


@dataclass
class InputSchema:
    """Declared shape: Spark StructType + ordered field constraints.

    `struct` (StructType or DDL string) is ENFORCED at validate() time
    ("parse, don't validate", src/standard-schema.ts:18-37): missing columns,
    undeclared extra columns, and type mismatches all become schema-stage
    violations (step='schema', rule=None), and missing columns are projected
    in as typed NULLs so later rules still compile against the declared
    shape. Underscore-prefixed columns are engine-internal and exempt from
    the extra-column check. Spark schemas are uniform per DataFrame, so these
    issues fire for every row — exactly what per-record StandardSchema
    validation would do on a homogeneous batch."""

    struct: Any  # pyspark StructType | DDL string | None (None = inherit)
    constraints: list[FieldConstraint] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Rule specs — §2.E kinds. Each carries (id, description); violation rows are
# attributed to exactly one rule (rule-granularity id/description per
# src/index.ts:133-139, asserted e.g. src/order-cancellation.spec.ts:166-167).
# ---------------------------------------------------------------------------


@dataclass
class Check:
    """One predicate + emission inside a rule.

    ok_expr: boolean SQL/Column — True means the check passes.
    key: violation key (None → global error, ≙ addGlobalError src/index.ts:18-21).
    message: str literal or Column/SQL expr (for interpolated messages, C8).
    value: expression for offending_value (stringified); None → NULL.
    guard: optional boolean expr; when guard is false the check passes
           vacuously (conditional chains, C10).
    """

    ok_expr: ColumnLike
    key: Optional[str]
    message: ColumnLike
    value: Optional[ColumnLike] = None
    guard: Optional[ColumnLike] = None


@dataclass
class RuleSpec:
    id: str
    description: str = ""
    kind: str = "field"


@dataclass
class FieldRule(RuleSpec):
    """Per-row predicate rule (C1, C5, C6, C8, C10, C11, C12).

    Multiple checks → multi-emission rule sharing one rule_id (B6/C12:
    src/test.spec.ts:681-703 — both errors retained, verdict attributes to the
    one rule)."""

    checks: list[Check] = field(default_factory=list)


@dataclass
class UniqueRule(RuleSpec):
    """In-table uniqueness on a key column (C3), salted two-phase at scale.

    salt_buckets: number of salt partitions for the partial count
    (explicit skew handling per BASELINE.json north_rule)."""

    col: str = ""
    message: Optional[str] = None
    salt_buckets: int = 64
    kind: str = "unique"


@dataclass
class ReferentialRule(RuleSpec):
    """Existence / membership vs a dimension table via broadcast join (C2/C4).

    anti=False → violation when key NOT in dim (existence, e.g. lang vs ISO dim)
    anti=True  → violation when key IS in dim (blacklist membership)
    derive: optional SQL expr computing the lookup key from input cols
            (derived-key blacklist, C4: split(email,'@')[1]).
    global_error: emit as global error instead of field issue (C7 miss)."""

    col: str = ""
    dim: str = ""  # deps name of the dimension DataFrame
    dim_key: str = ""
    message: ColumnLike = ""
    anti: bool = False
    derive: Optional[ColumnLike] = None
    guard: Optional[ColumnLike] = None
    global_error: bool = False
    kind: str = "referential"


@dataclass
class EnrichRule(RuleSpec):
    """Enrichment join adding context columns (C7).

    Shallow-merge-overwrite context semantics (src/index.ts:141-151) ≙ joined
    columns replace same-named existing columns. A miss (no dim row) emits a
    global error when `required`."""

    dim: str = ""
    on: str = ""  # input column name
    dim_key: str = ""
    adds: list[str] = field(default_factory=list)  # dim columns to project in
    required: bool = True
    message: ColumnLike = ""  # emitted on miss when required
    prefix: str = ""  # optional rename prefix for added context columns
    key: Optional[str] = None  # violation key; None → global error on miss
    kind: str = "enrich"


@dataclass
class ArrayAllRule(RuleSpec):
    """Nested-array membership + aggregated offender message (C9).

    posexplode(items) → broadcast join dim on item_key ↔ dim_key →
    offenders where NOT dim[flag_col] → per-row ordered collect_list of
    format(item_fmt) joined with ', ' (byte-for-byte message parity with
    src/order-cancellation.example.ts:123-145)."""

    items_col: str = ""
    item_key: str = ""  # field inside the item struct
    dim: str = ""
    dim_key: str = ""
    flag_col: str = ""  # boolean dim column; False → offender
    item_fmt: str = "%s (%s)"
    fmt_cols: list[str] = field(default_factory=list)  # dim cols fed to format
    message_prefix: str = ""
    global_error: bool = True
    missing_ok: bool = False  # item key absent from dim → offender too?
    kind: str = "array_all"


@dataclass
class ColumnStatsRule(RuleSpec):
    """Per-column stats over the surviving frontier (north_star metrics):
    null-rate, distinct (HLL), min/max, length histogram. Not a pass/fail rule
    — produces the `column_stats` output table."""

    cols: list[str] = field(default_factory=list)
    hll_rsd: float = 0.05
    hist_bin_width: int = 50
    hist_cols: list[str] = field(default_factory=list)
    kind: str = "column_stats"


@dataclass
class DriftKLRule(RuleSpec):
    """KL-divergence drift vs a baseline histogram snapshot (north_star).

    bucket_expr: SQL expr producing the bucket id for each row (e.g. lang, or
    floor(length(text)/50)). baseline: deps name of DataFrame
    (col, bucket, p). Violation (run-level) when KL > threshold."""

    col: str = ""
    bucket_expr: ColumnLike = ""
    baseline: str = "baseline_stats"
    threshold: float = 0.1
    smoothing: float = 1e-9
    kind: str = "drift_kl"


@dataclass
class CustomPandasRule(RuleSpec):
    """Vectorized pandas-UDF escape hatch (≙ the reference's arbitrary rule fn,
    src/index.ts:161-171; Arrow-batched, never per-row Python per input_hint).

    fn: pandas.Series -> pandas.Series mappings declared via `make_check`
    returning (ok_expr Column, emissions) — see functions/extraction.py for the
    flagship HTML→text rule."""

    make_check: Optional[Callable[..., Any]] = None
    kind: str = "custom_pandas"


Rule = Union[
    FieldRule,
    UniqueRule,
    ReferentialRule,
    EnrichRule,
    ArrayAllRule,
    ColumnStatsRule,
    DriftKLRule,
    CustomPandasRule,
]


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------


class ValidatorBuilder:
    """Fluent plan builder. One mutable instance, methods return self (A9)."""

    def __init__(self) -> None:
        self._schema: InputSchema | None = None
        self._rules: list[Rule] = []
        self._deps_required: tuple[str, ...] = ()
        self._deps: dict[str, Any] = {}
        self._deps_status: str = "not-required"  # src/index.ts:210
        self._key_col: str = "url"

    # -- plan construction -------------------------------------------------

    def input(self, struct=None, constraints: list[FieldConstraint] | None = None,
              key_col: str | None = None) -> "ValidatorBuilder":
        self._schema = InputSchema(struct=struct, constraints=constraints or [])
        if key_col:
            self._key_col = key_col
        return self

    def deps(self, *names: str) -> "ValidatorBuilder":
        """Declare required dependency names; gate flips to 'required' (A3)."""
        self._deps_required = names
        if self._deps_status != "passed":
            self._deps_status = "required"
        return self

    def provide(self, **deps: Any) -> "ValidatorBuilder":
        """Bind dependency instances; re-provide overwrites (A5; re-bind per
        run mirrors src/order-cancellation.spec.ts:139-141)."""
        self._deps = dict(deps)
        self._deps_status = "passed"
        return self

    def rule(self, rule: Rule) -> "ValidatorBuilder":
        self._rules.append(rule)
        return self

    # convenience constructors --------------------------------------------

    def field_rule(self, id: str, ok_expr: ColumnLike, message: ColumnLike,
                   key: str | None = None, value: ColumnLike | None = None,
                   guard: ColumnLike | None = None,
                   description: str = "") -> "ValidatorBuilder":
        return self.rule(FieldRule(id=id, description=description, checks=[
            Check(ok_expr=ok_expr, key=key, message=message, value=value,
                  guard=guard)]))

    def unique(self, col: str, id: str | None = None, message: str | None = None,
               salt_buckets: int = 64, description: str = "") -> "ValidatorBuilder":
        return self.rule(UniqueRule(id=id or f"unique-{col}",
                                    description=description, col=col,
                                    message=message, salt_buckets=salt_buckets))

    def referential(self, col: str, dim: str, dim_key: str, message: ColumnLike,
                    id: str | None = None, anti: bool = False,
                    derive: ColumnLike | None = None,
                    guard: ColumnLike | None = None, global_error: bool = False,
                    description: str = "") -> "ValidatorBuilder":
        return self.rule(ReferentialRule(
            id=id or f"referential-{col}", description=description, col=col,
            dim=dim, dim_key=dim_key, message=message, anti=anti, derive=derive,
            guard=guard, global_error=global_error))

    def enrich(self, id: str, dim: str, on: str, dim_key: str,
               adds: list[str], message: ColumnLike = "", required: bool = True,
               prefix: str = "", key: str | None = None,
               description: str = "") -> "ValidatorBuilder":
        return self.rule(EnrichRule(id=id, description=description, dim=dim,
                                    on=on, dim_key=dim_key, adds=adds,
                                    required=required, message=message,
                                    prefix=prefix, key=key))

    def column_stats(self, cols: list[str], id: str = "column-stats",
                     hll_rsd: float = 0.05, hist_bin_width: int = 50,
                     hist_cols: list[str] | None = None) -> "ValidatorBuilder":
        """Per-column stats over the surviving frontier; hist_cols adds a
        length-histogram output frame (ValidationResult.hists — long format
        (col, bucket, n), bucket = floor(length/hist_bin_width))."""
        return self.rule(ColumnStatsRule(id=id, cols=cols, hll_rsd=hll_rsd,
                                         hist_bin_width=hist_bin_width,
                                         hist_cols=hist_cols or []))

    def drift_kl(self, col: str, bucket_expr: ColumnLike, baseline: str,
                 threshold: float, id: str | None = None,
                 smoothing: float = 1e-9) -> "ValidatorBuilder":
        return self.rule(DriftKLRule(id=id or f"drift-{col}", col=col,
                                     bucket_expr=bucket_expr, baseline=baseline,
                                     threshold=threshold, smoothing=smoothing))

    # -- introspection (A8) -------------------------------------------------

    def plan(self) -> dict:
        return {
            "schema": self._schema,
            "rules": list(self._rules),
            "deps_status": self._deps_status,
            "deps_required": self._deps_required,
            "key_col": self._key_col,
        }

    def explain(self, df, extended: bool = False) -> str:
        """Compiled-plan introspection (A8 ≙ ~unsafeInternals,
        src/index.ts:407-409): the rule DAG plus Spark's physical plan for
        the verdicts output."""
        lines = [f"sparkcheck plan (key_col={self._key_col})"]
        for c in (self._schema.constraints if self._schema else []):
            lines.append(f"  schema: [{c.key}] {c.check!r}")
        for i, r in enumerate(self._rules):
            lines.append(f"  rule {i}: {r.kind} id={r.id}")
        res = self.validate(df, persist=False)
        jqe = res.verdicts._jdf.queryExecution()
        spark_plan = jqe.toString() if extended \
            else jqe.executedPlan().toString()
        return "\n".join(lines) + "\n" + spark_plan

    # -- execution ----------------------------------------------------------

    def validate(self, df, override: dict | None = None, run_ts=None,
                 persist: bool = True, persist_drop: list[str] | None = None):
        """Gate checks with the reference's exact messages
        (src/index.ts:431-438), then delegate to the engine."""
        invariant(self._deps_status != "required",
                  "Deps should be provided before calling validate")
        invariant(self._schema is not None,
                  "Schema must be defined before calling validate")
        from .engine import run_validation
        return run_validation(df, self, override=override, run_ts=run_ts,
                              persist=persist, persist_drop=persist_drop)

    def command(self, execute: Callable[..., Any]):
        """Attach the post-validation action (A6; src/index.ts:483-492)."""
        from .command import Command
        return Command(self, execute)


def build_validator() -> ValidatorBuilder:
    """A1 — empty builder (src/index.ts:495-497)."""
    return ValidatorBuilder()
