"""Property-based equivalence (SURVEY.md §5.2 item 5): on Hypothesis-generated
tables and rule chains, the Spark engine's verdicts/violations must equal a
naive per-row Python interpreter that restates the reference's validate loop
(/root/reference/src/index.ts:63-159) directly: schema issues all-at-once,
sequential rules, fail-fast after the first rule that wrote the bag,
intra-rule multi-emission.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from sparkcheck import FieldConstraint, build_validator
from sparkcheck.model import Check, FieldRule

COLS = ["a", "b", "c"]
OPS = [">=", "<=", "==", "!="]


@dataclass(frozen=True)
class SimpleCheck:
    col: str
    op: str  # >=, <=, ==, !=, not_null
    lit: int
    key: str | None  # None → global


def to_sql(c: SimpleCheck) -> str:
    if c.op == "not_null":
        return f"{c.col} IS NOT NULL"
    op = "=" if c.op == "==" else c.op
    return f"{c.col} {op} {c.lit}"


def eval_py(c: SimpleCheck, row: dict):
    """Tri-state predicate mirroring SQL null semantics: None operand → NULL
    → engine treats as failure (compile.check_fired coalesces to False)."""
    v = row[c.col]
    if c.op == "not_null":
        return v is not None
    if v is None:
        return None
    return {"<=": v <= c.lit, ">=": v >= c.lit,
            "==": v == c.lit, "!=": v != c.lit}[c.op]


@dataclass(frozen=True)
class RefRule:
    """Referential lookup vs a literal dim set (C2/C4 in miniature)."""

    col: str
    dim: tuple[int, ...]
    anti: bool


@dataclass(frozen=True)
class UniqRule:
    """Dataset-level uniqueness (C3 in miniature): fails rows whose non-NULL
    value duplicates among the rows still alive when the rule runs (the
    engine's frontier semantics, SURVEY.md §7 hard part a)."""

    col: str


@dataclass(frozen=True)
class EnRule:
    """Enrichment fetch (C7 in miniature): required miss → violation."""

    col: str
    dim: tuple[int, ...]
    required: bool


@dataclass(frozen=True)
class ArrRule:
    """Array membership + ordered aggregate message (C9 in miniature):
    dim rows are (k, okflag, label); an item is an offender when its dim
    okflag is False, or when it is missing from the dim (incl. NULL items)
    and missing_ok is False. Message = prefix + offender parts joined ', '
    in array position order; a missing offender's part is the literal
    'null' (Spark's format_string renders NULL arguments as 'null', it does
    not return NULL — the interpreter mirrors that exactly)."""

    dim: tuple[tuple[int, bool, str], ...]
    missing_ok: bool
    global_error: bool


@dataclass(frozen=True)
class PdRule:
    """CustomPandasRule in miniature: the same tri-state predicate as
    SimpleCheck but evaluated INSIDE an Arrow-batched pandas UDF (the
    engine's escape-hatch path: make_check adds a derived column, failed =
    NOT coalesce(ok, FALSE))."""

    col: str
    op: str
    lit: int
    key: str


def eval_rule_py(rule, i: int, r: dict):
    """One rule's emissions under the reference loop semantics."""
    if isinstance(rule, ArrRule):
        d = {k: (flag, label) for k, flag, label in rule.dim}
        parts: list[str] = []
        failed = False
        for item in (r["arr"] or []):
            if item is not None and item in d:
                flag, label = d[item]
                if not flag:
                    failed = True
                    parts.append(label)
            elif not rule.missing_ok:
                failed = True
                parts.append("null")
        if not failed:
            return []
        key = None if rule.global_error else "arr"
        return [(key, f"arr{i}: " + ", ".join(parts))]
    if isinstance(rule, PdRule):
        ok = eval_py(SimpleCheck(rule.col, rule.op, rule.lit, rule.key), r)
        return [] if ok is True else [(rule.key, f"pd{i}")]
    if isinstance(rule, EnRule):
        v = r[rule.col]
        hit = v is not None and v in rule.dim
        return [(f"en{i}", f"enr{i}")] if (rule.required and not hit) else []
    if isinstance(rule, RefRule):
        v = r[rule.col]
        hit = v is not None and v in rule.dim
        failed = hit if rule.anti else not hit
        return [(rule.col, f"ref{i}")] if failed else []
    emissions = []
    for j, c in enumerate(rule):
        ok = eval_py(c, r)
        if ok is not True:
            emissions.append((c.key, f"r{i}c{j}"))
    return emissions


def interpret(rows, constraints, rules):
    """Direct Python restatement of the reference's validate() extended with
    dataset-level frontier semantics: per-row rules run sequentially with
    fail-fast; a UniqRule counts values over the rows still ALIVE when it
    runs (rows failed by any earlier stage don't contribute), exactly the
    engine's frontier. Returns per-row (success, step, rule_idx,
    [(key, message), ...])."""
    from collections import Counter

    rws = [dict(zip(["rowid"] + COLS + ["arr"], row)) for row in rows]
    state: dict = {}
    alive = []
    for r in rws:
        issues = []
        for c in constraints:  # schema: every failing issue reported
            ok = eval_py(c, r)
            if ok is not True:
                issues.append((c.key, f"schema:{c.col}{c.op}{c.lit}"))
        if issues:
            state[r["rowid"]] = (False, "schema", -1, tuple(issues))
        else:
            alive.append(r)
    for i, rule in enumerate(rules):
        if isinstance(rule, UniqRule):
            cnt = Counter(r[rule.col] for r in alive
                          if r[rule.col] is not None)
            still = []
            for r in alive:
                v = r[rule.col]
                if v is not None and cnt[v] > 1:
                    state[r["rowid"]] = (False, "rules", i,
                                         ((rule.col, f"uniq{i}"),))
                else:
                    still.append(r)
            alive = still
            continue
        still = []
        for r in alive:
            emissions = eval_rule_py(rule, i, r)
            if emissions:  # bag.hasErrors() after the rule → stop
                state[r["rowid"]] = (False, "rules", i, tuple(emissions))
            else:
                still.append(r)
        alive = still
    for r in alive:
        state[r["rowid"]] = (True, None, None, ())
    return sorted((rid,) + v for rid, v in state.items())


check_st = st.builds(
    SimpleCheck,
    col=st.sampled_from(COLS),
    op=st.sampled_from(OPS + ["not_null"]),
    lit=st.integers(-3, 3),
    key=st.sampled_from([None, "a", "b", "c"]),
)

rows_st = st.lists(
    st.tuples(*([st.one_of(st.none(), st.integers(-3, 3)) for _ in COLS]
                + [st.lists(st.one_of(st.none(), st.integers(-3, 3)),
                            max_size=3)])),
    min_size=1, max_size=12)

ref_rule_st = st.builds(
    RefRule,
    col=st.sampled_from(COLS),
    dim=st.sets(st.integers(-3, 3), min_size=1, max_size=4).map(tuple),
    anti=st.booleans())

uniq_rule_st = st.builds(UniqRule, col=st.sampled_from(COLS))

enrich_rule_st = st.builds(
    EnRule,
    col=st.sampled_from(COLS),
    dim=st.sets(st.integers(-3, 3), min_size=1, max_size=4).map(tuple),
    required=st.booleans())

arr_rule_st = st.builds(
    ArrRule,
    dim=st.dictionaries(st.integers(-3, 3), st.booleans(),
                        min_size=1, max_size=4)
        .map(lambda d: tuple(sorted((k, v, f"L{k}") for k, v in d.items()))),
    missing_ok=st.booleans(),
    global_error=st.booleans())

pd_rule_st = st.builds(
    PdRule,
    col=st.sampled_from(COLS),
    op=st.sampled_from(OPS + ["not_null"]),
    lit=st.integers(-3, 3),
    key=st.sampled_from(COLS))

rule_st = st.one_of(st.lists(check_st, min_size=1, max_size=2), ref_rule_st,
                    uniq_rule_st, enrich_rule_st, arr_rule_st, pd_rule_st)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=rows_st,
       constraints=st.lists(check_st.map(
           lambda c: SimpleCheck(c.col, c.op, c.lit, c.col)), max_size=2),
       rules=st.lists(rule_st, max_size=3))
def test_engine_equals_naive_interpreter(spark, rows, constraints, rules):
    _assert_engine_equals_interpreter(spark, rows, constraints, rules)


def _pd_make_check(pdr: PdRule, i: int):
    """make_check for the generated CustomPandasRule: the predicate runs in
    an Arrow-batched pandas UDF, NULL operand → NULL ok → failure (matching
    compile.check_fired's coalesce-to-False)."""
    from pyspark.sql.functions import pandas_udf

    def make(df, deps):
        @pandas_udf("boolean")
        def ok(s: pd.Series) -> pd.Series:
            if pdr.op == "not_null":
                return s.notna()
            res = {"<=": s <= pdr.lit, ">=": s >= pdr.lit,
                   "==": s == pdr.lit, "!=": s != pdr.lit}[pdr.op]
            return res.mask(s.isna(), None)
        df = df.withColumn(f"_pdok{i}", ok(F.col(pdr.col)))
        failed = ~F.coalesce(F.col(f"_pdok{i}"), F.lit(False))
        return df, failed, pdr.key, F.lit(f"pd{i}"), F.col(pdr.col)
    return make


def _assert_engine_equals_interpreter(spark, rows, constraints, rules):
    from sparkcheck.model import ArrayAllRule, CustomPandasRule, \
        ReferentialRule

    # rows may predate the arr column (older deterministic tests): pad
    rows = [r if len(r) == len(COLS) + 1 else r + ([],) for r in rows]
    data = [(i,) + r for i, r in enumerate(rows)]
    sdata = [(i,) + r[:len(COLS)]
             + ([(v,) for v in r[len(COLS)]],) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        sdata, "rowid int, a int, b int, c int, arr array<struct<k:int>>")

    v = build_validator().input(constraints=[
        FieldConstraint(c.key, to_sql(c), f"schema:{c.col}{c.op}{c.lit}")
        for c in constraints], key_col="rowid")
    deps = {}
    for i, rule in enumerate(rules):
        if isinstance(rule, UniqRule):
            v = v.unique(rule.col, id=f"rule-{i}", message=f"uniq{i}")
        elif isinstance(rule, EnRule):
            dim_name = f"edim{i}"
            deps[dim_name] = spark.createDataFrame(
                [(x, x * 10) for x in rule.dim], "k int, ctx int")
            v = v.enrich(id=f"rule-{i}", dim=dim_name, on=rule.col,
                         dim_key="k", adds=["ctx"], prefix=f"e{i}_",
                         required=rule.required, message=f"enr{i}",
                         key=f"en{i}")
        elif isinstance(rule, RefRule):
            dim_name = f"dim{i}"
            deps[dim_name] = spark.createDataFrame(
                [(x,) for x in rule.dim], "k int")
            v = v.rule(ReferentialRule(id=f"rule-{i}", col=rule.col,
                                       dim=dim_name, dim_key="k",
                                       anti=rule.anti, message=f"ref{i}"))
        elif isinstance(rule, ArrRule):
            dim_name = f"adim{i}"
            deps[dim_name] = spark.createDataFrame(
                list(rule.dim), "ak int, okflag boolean, label string")
            v = v.rule(ArrayAllRule(
                id=f"rule-{i}", items_col="arr", item_key="k",
                dim=dim_name, dim_key="ak", flag_col="okflag",
                item_fmt="%s", fmt_cols=["label"],
                message_prefix=f"arr{i}: ",
                global_error=rule.global_error,
                missing_ok=rule.missing_ok))
        elif isinstance(rule, PdRule):
            v = v.rule(CustomPandasRule(id=f"rule-{i}",
                                        make_check=_pd_make_check(rule, i)))
        else:
            v = v.rule(FieldRule(id=f"rule-{i}", checks=[
                Check(ok_expr=to_sql(c), key=c.key, message=f"r{i}c{j}")
                for j, c in enumerate(rule)]))
    v.provide(**deps)
    res = v.validate(df, persist=False)

    verd = {r["rowid"]: r for r in res.verdicts.collect()}
    viols = {}
    for r in res.violations.collect():
        viols.setdefault(r["rowid"], []).append(
            (r["rule_idx"], r["seq"], r["key"], r["message"]))

    got = []
    for rid in verd:
        r = verd[rid]
        em = tuple((k, m) for _, _, k, m in sorted(viols.get(rid, [])))
        idx = r["rule_idx"] if r["step"] == "rules" else (
            -1 if r["step"] == "schema" else None)
        got.append((rid, bool(r["success"]), r["step"], idx, em))
    expected = interpret(data, constraints, rules)
    assert sorted(got) == expected


def test_unique_counts_over_frontier_not_raw_rows(spark):
    """Deterministic regression for SURVEY §7 hard part a: a value shared by
    two rows is NOT a duplicate when one of the rows already failed an
    earlier rule — the unique count runs over the frontier only."""
    rows = [(1, 0, 0), (1, None, 0)]  # a duplicates; row 1 fails b not_null
    rules = [[SimpleCheck("b", "not_null", 0, "b")], UniqRule("a")]
    _assert_engine_equals_interpreter(spark, rows, [], rules)
    # and the interpreter itself says what we think it says
    out = interpret([(i,) + r for i, r in enumerate(rows)], [], rules)
    assert out == [(0, True, None, None, ()),
                   (1, False, "rules", 0, (("b", "r0c0"),))]


def test_enrich_required_miss_fails_optional_does_not(spark):
    rows = [(2, 0, 0), (-3, 0, 0)]
    _assert_engine_equals_interpreter(
        spark, rows, [], [EnRule("a", (2,), True)])
    _assert_engine_equals_interpreter(
        spark, rows, [], [EnRule("a", (2,), False)])


def test_array_all_offender_message_and_missing_semantics(spark):
    """Deterministic C9 regression: flagged-False items aggregate labels in
    position order; a missing item fails the row and contributes the
    literal 'null' part (format_string renders NULL args as 'null'); with
    missing_ok=True the missing item passes."""
    rows = [(0, 0, 0, [2, -1, 3]),   # -1 flagged False, 3 missing
            (0, 0, 0, [2]),          # all ok
            (0, 0, 0, [])]           # empty array → pass
    dim = ((-1, False, "L-1"), (2, True, "L2"))
    _assert_engine_equals_interpreter(
        spark, rows, [], [ArrRule(dim, missing_ok=False, global_error=True)])
    _assert_engine_equals_interpreter(
        spark, rows, [], [ArrRule(dim, missing_ok=True, global_error=False)])
    # interpreter spot-check: offender labels join in position order,
    # missing offender adds no label
    out = interpret([(0, 0, 0, 0, [3, -1, -1])], [],
                    [ArrRule(dim, False, True)])
    assert out == [(0, False, "rules", 0,
                    ((None, "arr0: null, L-1, L-1"),))]


def test_custom_pandas_rule_matches_interpreter(spark):
    """Deterministic CustomPandasRule regression: Arrow-batched predicate,
    NULL operand → failure, fail-fast ordering with a later rule."""
    rows = [(2, 0, 0), (None, 0, 0), (-3, 0, 0)]
    _assert_engine_equals_interpreter(
        spark, rows, [], [PdRule("a", ">=", 0, "a"), UniqRule("b")])
