"""Port of the behavioral core of /root/reference/src/test.spec.ts:
schema stage, deps gating, builder reuse, context overwrite, intra-rule
multi-emission (C12), registration scenarios (duplicate email C3-as-lookup,
blacklist with derived domain key C4), and the 5-scenario money-transfer
command (:631-825).
"""

from __future__ import annotations

import pytest

from sparkcheck import FieldConstraint, build_validator
from sparkcheck.errors import ErrorBag
from sparkcheck.model import Check, FieldRule, ReferentialRule


def one_row(spark, schema: str, *values):
    return spark.createDataFrame([tuple(values)], schema)


REG_SCHEMA = "email string, name string, age int"
REG_CONSTRAINTS = [
    FieldConstraint("email", "email rlike '^[^@\\\\s]+@[^@\\\\s]+\\\\.[^@\\\\s]+$'",
                    "Invalid email"),
    FieldConstraint("name", "length(name) >= 2", "Name too short"),
    FieldConstraint("age", "age >= 18", "Must be 18 or older"),
]


# --- schema stage (spec :5-41) ----------------------------------------------

def test_schema_failure_reports_all_issues_and_no_rule(spark):
    v = build_validator().input(constraints=REG_CONSTRAINTS, key_col="email")
    df = one_row(spark, REG_SCHEMA, "not-an-email", "J", 15)
    r = v.validate(df).single()
    assert not r.success
    assert r.step == "schema"
    assert r.rule is None  # schema failures carry no rule (src/index.ts:96-121)
    obj = r.errors.to_object()
    assert obj["issues"] == {"email": ["Invalid email"],
                             "name": ["Name too short"],
                             "age": ["Must be 18 or older"]}
    assert r.errors.first_error("name") == "Name too short"


def test_schema_pass_runs_rules(spark):
    v = (build_validator().input(constraints=REG_CONSTRAINTS, key_col="email")
         .field_rule("always-fails", "1 = 0", "nope", key="email"))
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    r = v.validate(df).single()
    assert not r.success
    assert r.step == "rules"
    assert r.rule["id"] == "always-fails"


# --- deps gating (spec :43-132, asserts exact invariant messages) ------------

def test_deps_gate_blocks_validate(spark):
    v = build_validator().input(constraints=[]).deps("svc")
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    with pytest.raises(ValueError,
                       match="Deps should be provided before calling validate"):
        v.validate(df)


def test_deps_gate_blocks_command_run(spark):
    v = build_validator().input(constraints=[]).deps("svc")
    cmd = v.command(lambda **kw: None)
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    with pytest.raises(ValueError,
                       match="Deps should be provided before calling run"):
        cmd.run_single(df)


def test_schema_gate_blocks_validate(spark):
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    with pytest.raises(ValueError,
                       match="Schema must be defined before calling validate"):
        build_validator().validate(df)


def test_provide_after_deps_unblocks(spark):
    v = (build_validator().input(constraints=[], key_col="email")
         .deps("svc").provide(svc=object()))
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    assert v.validate(df).single().success


# --- builder reuse (spec :134-150, A9) ----------------------------------------

def test_builder_chaining_reuses_one_instance(spark):
    v = build_validator()
    assert v.input(constraints=[]) is v
    assert v.deps("x") is v
    assert v.provide(x=1) is v
    assert v.field_rule("r1", "1=1", "m") is v


def test_reprovide_overwrites_deps(spark):
    """Specs re-provide per scenario on one validator
    (src/order-cancellation.spec.ts:139-141)."""
    dim_a = spark.createDataFrame([("a@b.co",)], "email string")
    dim_b = spark.createDataFrame([("z@z.co",)], "email string")
    v = (build_validator().input(constraints=[], key_col="email")
         .deps("existing")
         .rule(ReferentialRule(id="duplicate-email-check", col="email",
                               dim="existing", dim_key="email", anti=True,
                               message="Email already exists")))
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    r1 = v.provide(existing=dim_a).validate(df).single()
    assert not r1.success
    r2 = v.provide(existing=dim_b).validate(df).single()
    assert r2.success


# --- context overwrite (spec :152-207, B7 shallow merge last-wins) ------------

def test_context_overwrite_last_wins(spark):
    dim1 = spark.createDataFrame([("a@b.co", "first")], "k string, message string")
    dim2 = spark.createDataFrame([("a@b.co", "second")], "k string, message string")
    v = (build_validator().input(constraints=[], key_col="email")
         .deps("d1", "d2")
         .enrich("set-1", dim="d1", on="email", dim_key="k", adds=["message"])
         .enrich("set-2", dim="d2", on="email", dim_key="k", adds=["message"])
         .provide(d1=dim1, d2=dim2))
    df = one_row(spark, REG_SCHEMA, "a@b.co", "Jane", 30)
    r = v.validate(df).single()
    assert r.success
    assert r.context["message"] == "second"


# --- intra-rule multi-emission (spec :681-703, C12/B6) ------------------------

BAD_ACCOUNTS = "('closed-account','suspended-account','frozen-account')"
TRANSFER_SCHEMA = "fromAccount string, toAccount string, amount double"


def transfer_command(spark):
    v = (build_validator()
         .input(constraints=[
             FieldConstraint("amount", "amount > 0", "Amount must be positive"),
         ], key_col="fromAccount")
         .field_rule("no-self-transfer", "fromAccount != toAccount",
                     "Cannot transfer to same account", key="toAccount",
                     description="Validate no transfer to same account")
         .rule(FieldRule(
             id="account-status-check", description="Validate account status",
             checks=[
                 Check(ok_expr=f"fromAccount NOT IN {BAD_ACCOUNTS}",
                       key="fromAccount",
                       message="Account is not in a valid state to transfer"),
                 Check(ok_expr=f"toAccount NOT IN {BAD_ACCOUNTS}",
                       key="toAccount",
                       message="Account is not in a valid state to transfer"),
             ]))
         .field_rule("balance-check",
                     "CASE WHEN fromAccount = 'insufficient-funds' THEN 50 "
                     "ELSE 1000 END >= amount",
                     "Insufficient funds", key="amount",
                     description="Check if from account has sufficient balance"))

    def execute(data, deps, context, bag: ErrorBag):
        if data["fromAccount"] == "fails-in-transfer":
            return bag.add_global_error(
                "External service error: Failed in transfer") or bag
        return {"transactionId": "ext-txn-1", "status": "completed",
                "from": data["fromAccount"], "to": data["toAccount"],
                "amount": data["amount"]}
    return v.command(execute)


def transfer(spark, frm, to, amount):
    return one_row(spark, TRANSFER_SCHEMA, frm, to, float(amount))


def test_transfer_self_transfer_fails_validation(spark):
    res = transfer_command(spark).run_single(
        transfer(spark, "account-123", "account-123", 100))
    assert not res.success and res.step == "validation"
    assert "Cannot transfer to same account" in res.errors.first_error("toAccount")
    assert res.rule == {"id": "no-self-transfer",
                        "description": "Validate no transfer to same account"}


def test_transfer_insufficient_funds(spark):
    res = transfer_command(spark).run_single(
        transfer(spark, "insufficient-funds", "account-456", 100))
    assert not res.success and res.step == "validation"
    assert "Insufficient funds" in res.errors.first_error("amount")
    assert res.rule["id"] == "balance-check"


def test_transfer_frozen_account(spark):
    res = transfer_command(spark).run_single(
        transfer(spark, "frozen-account", "account-456", 100))
    assert not res.success and res.step == "validation"
    assert "Account is not in a valid state to transfer" in \
        res.errors.first_error("fromAccount")
    assert res.rule["id"] == "account-status-check"


def test_transfer_fails_in_execution(spark):
    res = transfer_command(spark).run_single(
        transfer(spark, "fails-in-transfer", "account-456", 100))
    assert not res.success and res.step == "execution"
    assert "Failed in transfer" in res.errors.global_error
    assert res.rule is None


def test_transfer_success(spark):
    res = transfer_command(spark).run_single(
        transfer(spark, "account-456", "account-789", 50))
    assert res.success
    assert res.result["status"] == "completed"
    assert res.result["amount"] == 50


def test_multi_emission_both_errors_retained(spark):
    """Both sub-checks of account-status-check emit in ONE rule; both are in
    the bag (src/test.spec.ts:681-703), verdict attributes the one rule."""
    v = transfer_command(spark)._builder
    r = v.validate(transfer(spark, "frozen-account", "closed-account", 10)) \
         .single()
    assert not r.success
    assert r.rule["id"] == "account-status-check"
    obj = r.errors.to_object()
    assert obj["issues"]["fromAccount"] == \
        ["Account is not in a valid state to transfer"]
    assert obj["issues"]["toAccount"] == \
        ["Account is not in a valid state to transfer"]


# --- registration scenarios (spec :400-629) -----------------------------------

def registration_validator(spark, with_blacklist=False, rule_ids=True):
    existing = spark.createDataFrame(
        [("existing@example.com",), ("newemail@example.com",)], "email string")
    v = (build_validator().input(constraints=REG_CONSTRAINTS, key_col="email")
         .deps("existing")
         .rule(ReferentialRule(
             id="duplicate-email-check" if rule_ids else "rule-0",
             description="Check for duplicate email",
             col="email", dim="existing", dim_key="email", anti=True,
             message="Email already exists")))
    if with_blacklist:
        v = v.field_rule(
            "blacklist-check",
            "NOT (email IN ('admin@badactor.com') OR "
            "split(email, '@')[1] IN ('spam.com', 'blocked.net'))",
            "Email domain is not allowed", key="email",
            description="Check for blacklisted email")
    return v.provide(existing=existing)


def reg(spark, email, name="John Doe", age=25):
    return one_row(spark, REG_SCHEMA, email, name, age)


def test_duplicate_email_detected(spark):
    v = registration_validator(spark)
    r = v.validate(reg(spark, "existing@example.com")).single()
    assert not r.success
    assert r.errors.first_error("email") == "Email already exists"
    assert r.rule == {"id": "duplicate-email-check",
                      "description": "Check for duplicate email"}
    r2 = v.validate(reg(spark, "new@example.com", "Jane Doe", 30)).single()
    assert r2.success
    # parsed value surfaces on success (src/index.ts:157)
    assert r2.value["email"] == "new@example.com"


def test_blacklisted_domain_and_exact_email(spark):
    v = registration_validator(spark, with_blacklist=True)
    r1 = v.validate(reg(spark, "user@spam.com")).single()
    assert not r1.success
    assert r1.errors.first_error("email") == "Email domain is not allowed"
    assert r1.rule["id"] == "blacklist-check"
    r2 = v.validate(reg(spark, "admin@badactor.com", "Jane Doe", 30)).single()
    assert not r2.success
    assert r2.errors.first_error("email") == "Email domain is not allowed"
    r3 = v.validate(reg(spark, "user@gooddomain.com", "Bob Smith", 28)).single()
    assert r3.success


def test_fail_fast_first_rule_only(spark):
    """Existing AND blacklisted email → only the first failing rule's error
    is in the bag (spec :504-542 'combine errors' actually demonstrates
    fail-fast: firstError is the duplicate-check's)."""
    v = registration_validator(spark, with_blacklist=True)
    r = v.validate(reg(spark, "existing@example.com")).single()
    assert not r.success
    assert r.errors.first_error("email") == "Email already exists"
    assert r.rule["id"] == "duplicate-email-check"
    # blacklist-check's message must NOT be present (it never "ran")
    assert all(m != "Email domain is not allowed"
               for _, m in r.errors.issues)


# --- override merge (B2: src/index.ts:84-87) ----------------------------------

def test_override_applied_before_schema(spark):
    v = registration_validator(spark)
    df = reg(spark, "not-an-email")
    r = v.validate(df, override={"email": "fixed@example.com"}).single()
    assert r.success  # override replaced the invalid email pre-schema


def test_errors_object_df_insertion_order_not_lexicographic(spark):
    """B13 distributed grouping preserves insertion order (rule_idx, seq) —
    exactly ErrorBag.to_object() — even when messages sort differently."""
    from sparkcheck.model import Check, FieldRule
    v = (build_validator()
         .input(constraints=[], key_col="id")
         .rule(FieldRule(id="m", checks=[
             Check(ok_expr="FALSE", key="f", message="zz emitted first"),
             Check(ok_expr="FALSE", key="f", message="aa emitted second"),
         ])))
    df = spark.createDataFrame([(1,)], "id long")
    res = v.validate(df, persist=False)
    got = res.errors_object_df().collect()
    assert [(r["key"], r["messages"]) for r in got] == [
        ("f", "zz emitted first|aa emitted second")]
    bag = res.single().errors
    assert bag.to_object()["issues"]["f"] == [
        "zz emitted first", "aa emitted second"]
