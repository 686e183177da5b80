"""Property-based equivalence (SURVEY.md §5.2 item 5): on Hypothesis-generated
tables and rule chains, the Spark engine's verdicts/violations must equal a
naive per-row Python interpreter that restates the reference's validate loop
(/root/reference/src/index.ts:63-159) directly: schema issues all-at-once,
sequential rules, fail-fast after the first rule that wrote the bag,
intra-rule multi-emission.
"""

from __future__ import annotations

from dataclasses import dataclass

from hypothesis import HealthCheck, given, settings
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


def eval_rule_py(rule, i: int, r: dict):
    """One rule's emissions under the reference loop semantics."""
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

    rws = [dict(zip(["rowid"] + COLS, row)) for row in rows]
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
    st.tuples(*[st.one_of(st.none(), st.integers(-3, 3)) for _ in COLS]),
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

rule_st = st.one_of(st.lists(check_st, min_size=1, max_size=2), ref_rule_st,
                    uniq_rule_st, enrich_rule_st)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=rows_st,
       constraints=st.lists(check_st.map(
           lambda c: SimpleCheck(c.col, c.op, c.lit, c.col)), max_size=2),
       rules=st.lists(rule_st, max_size=3))
def test_engine_equals_naive_interpreter(spark, rows, constraints, rules):
    _assert_engine_equals_interpreter(spark, rows, constraints, rules)


def _assert_engine_equals_interpreter(spark, rows, constraints, rules):
    from sparkcheck.model import ReferentialRule
    data = [(i,) + r for i, r in enumerate(rows)]
    df = spark.createDataFrame(data, "rowid int, a int, b int, c int")

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
