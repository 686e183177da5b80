"""A2/B3/B4 — declared-StructType enforcement and nested-path constraints.

The reference delegates shape checking to a StandardSchemaV1 vendor
(src/standard-schema.ts:18-37; zod in src/test.spec.ts:5-41): a declared
shape produces issues for missing keys, undeclared keys, and type mismatches,
with nested paths joined by "." (src/index.ts:101-113). Spark schemas are
uniform per DataFrame, so the engine enforces the diff statically and emits
the same schema-stage violations (step='schema', rule=None) for every row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

from sparkcheck import FieldConstraint, build_validator


def _validator(struct, constraints=None):
    return (build_validator()
            .input(struct=struct, constraints=constraints or [],
                   key_col="id"))


def test_missing_column_is_schema_violation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    v = _validator(StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("age", IntegerType()),
    ]))
    res = v.validate(df, persist=False)
    vd = res.verdicts.collect()[0]
    assert not vd["success"] and vd["step"] == "schema"
    viol = res.violations.collect()
    assert [(r["key"], r["message"], r["rule_id"]) for r in viol] == [
        ("age", "Required column 'age' is missing", None)]


def test_missing_column_projected_as_typed_null_for_later_rules(spark):
    # "parse, don't validate": rules over the declared-but-missing column
    # still compile (they see a typed NULL), instead of AnalysisException
    df = spark.createDataFrame([(1,)], "id long")
    v = (_validator("id long, age int")
         .field_rule("age-range", "age BETWEEN 0 AND 150", "age out of range",
                     key="age"))
    res = v.validate(df, persist=False)
    vd = res.verdicts.collect()[0]
    assert vd["step"] == "schema"  # schema failure wins (fail-fast order)
    assert dict(res.annotated.select("age").collect()[0].asDict()) == {
        "age": None}


def test_extra_column_is_schema_violation(spark):
    df = spark.createDataFrame([(1, "x", 9)], "id long, name string, rogue int")
    v = _validator("id long, name string")
    res = v.validate(df, persist=False)
    viol = res.violations.collect()
    assert [(r["key"], r["message"]) for r in viol] == [
        ("rogue", "Unexpected column 'rogue'")]


def test_engine_internal_columns_exempt_from_extra_check(spark):
    df = spark.createDataFrame([(1, "f1")], "id long, _input_file string")
    v = _validator("id long")
    res = v.validate(df, persist=False)
    assert res.verdicts.collect()[0]["success"]


def test_type_mismatch_reports_expected_and_received(spark):
    df = spark.createDataFrame([(1, "not-an-int")], "id long, age string")
    v = _validator("id long, age int")
    res = v.validate(df, persist=False)
    viol = res.violations.collect()
    assert [(r["key"], r["message"], r["offending_value"]) for r in viol] == [
        ("age", "Invalid type for column 'age': expected int, received string",
         "not-an-int")]


def test_nested_struct_mismatch_emits_dotted_paths(spark):
    df = spark.createDataFrame(
        [(1, ("deep", 2))],
        "id long, meta struct<inner string, extra2 int>")
    declared = ("id long, meta struct<inner int, missing_inner string>")
    res = _validator(declared).validate(df, persist=False)
    got = {(r["key"], r["message"]) for r in res.violations.collect()}
    assert got == {
        ("meta.inner",
         "Invalid type for column 'meta.inner': expected int, received string"),
        ("meta.missing_inner",
         "Required column 'meta.missing_inner' is missing"),
        ("meta.extra2", "Unexpected column 'meta.extra2'"),
    }


def test_matching_struct_passes_and_all_issues_reported_at_once(spark):
    df = spark.createDataFrame([(1, "ok")], "id long, name string")
    assert _validator("id long, name string").validate(
        df, persist=False).verdicts.collect()[0]["success"]

    # B3: schema stage reports ALL issues together (shape + constraints)
    df2 = spark.createDataFrame([(1, 5)], "id long, age int")
    v = _validator("id long, name string",
                   [FieldConstraint("id", "id > 100", "id too small")])
    viol = v.validate(df2, persist=False).violations.collect()
    assert [(r["key"], r["seq"]) for r in
            sorted(viol, key=lambda r: r["seq"])] == [
        ("name", 0), ("age", 1), ("id", 2)]


def test_nested_path_constraint_value_and_key(spark):
    """B4: a constraint over a nested struct field emits the dotted key AND
    the nested field's value as offending_value."""
    df = spark.createDataFrame(
        [(1, (150,)), (2, (42,))], "id long, props struct<k int>")
    v = _validator(None, [FieldConstraint(
        "props.k", "props.k BETWEEN 0 AND 100", "props.k out of range")])
    res = v.validate(df, persist=False)
    viol = res.violations.collect()
    assert [(r["id"], r["key"], r["offending_value"]) for r in viol] == [
        (1, "props.k", "150")]


def test_array_element_constraint_with_value_override(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])], "id long, tags array<string>")
    v = _validator(None, [FieldConstraint(
        "tags.0", "size(tags) > 0", "tags must be non-empty",
        value=F.expr("try_element_at(tags, 1)"))])
    res = v.validate(df, persist=False)
    viol = res.violations.collect()
    assert [(r["id"], r["key"], r["offending_value"]) for r in viol] == [
        (2, "tags.0", None)]


def test_missing_nested_member_projected_as_typed_null(spark):
    """ADVICE r02: a declared nested member absent from an existing struct is
    both flagged (dotted-path schema violation) AND projected in as a typed
    NULL, so a later rule referencing the nested path compiles — the same
    'parse, don't validate' contract as top-level columns."""
    df = spark.createDataFrame([(1, (7,))],
                               "id long, props struct<k:int>")
    v = (_validator("id long, props struct<k:int, m:string>")
         .field_rule("m-required", "props.m IS NOT NULL", "m required",
                     key="props.m"))
    res = v.validate(df, persist=False)
    vd = res.verdicts.collect()[0]
    assert vd["step"] == "schema"
    keys = {r["key"] for r in res.violations.collect()}
    assert "props.m" in keys
    row = res.annotated.select("props").collect()[0]["props"].asDict()
    assert row == {"k": 7, "m": None}


def test_null_struct_rows_survive_nested_patch(spark):
    df = spark.createDataFrame(
        [(1, (7,)), (2, None)], "id long, props struct<k:int>")
    v = _validator("id long, props struct<k:int, m:string>")
    res = v.validate(df, persist=False)
    vals = {r["id"]: r["props"] for r in
            res.annotated.select("id", "props").collect()}
    assert vals[2] is None and vals[1].asDict() == {"k": 7, "m": None}
