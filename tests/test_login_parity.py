"""Port of /root/reference/src/login.example.ts: lookup-or-global-error,
password check with the same opaque message, context user flowing to the
admin rule and the command execute, runShape gate."""

from __future__ import annotations

import hashlib

import pytest

from sparkcheck import FieldConstraint, build_validator

USERS = [
    # (email, role, password_hash=md5(password))
    ("alice@example.com", "customer", hashlib.md5(b"password123").hexdigest()),
    ("root@example.com", "admin", hashlib.md5(b"adminpass99").hexdigest()),
]

LOGIN_DDL = "email string, password string"


def login_command(spark):
    users = spark.createDataFrame(
        USERS, "u_email string, role string, password_hash string")
    v = (build_validator()
         .input(constraints=[
             FieldConstraint("email",
                             "email rlike '^[^@\\\\s]+@[^@\\\\s]+\\\\.[^@\\\\s]+$'",
                             "Invalid email"),
             FieldConstraint("password", "length(password) >= 8",
                             "Password too short"),
         ], key_col="email")
         .deps("users")
         .enrich("find-user", dim="users", on="email", dim_key="u_email",
                 adds=["role", "password_hash"],
                 message="Invalid email or password")
         .field_rule("password-check", "password_hash = md5(password)",
                     "Invalid email or password")
         .field_rule("no-admin-password-login", "role != 'admin'",
                     "Admin users cannot login with password", key="email")
         .provide(users=users))

    def execute(data, deps, context, bag):
        return {"user": context["role"], "token": f"tok-{data['email']}"}
    return v.command(execute)


def req(spark, email, password):
    return spark.createDataFrame([(email, password)], LOGIN_DDL)


def test_login_success_returns_token_from_context(spark):
    res = login_command(spark).run_single(
        req(spark, "alice@example.com", "password123"))
    assert res.success
    assert res.result == {"user": "customer", "token": "tok-alice@example.com"}


def test_unknown_email_is_opaque(spark):
    res = login_command(spark).run_single(
        req(spark, "nobody@example.com", "password123"))
    assert not res.success and res.step == "validation"
    assert res.errors.global_error == "Invalid email or password"
    assert res.rule["id"] == "find-user"


def test_wrong_password_same_opaque_message(spark):
    res = login_command(spark).run_single(
        req(spark, "alice@example.com", "wrongpass1"))
    assert not res.success
    assert res.errors.global_error == "Invalid email or password"
    assert res.rule["id"] == "password-check"


def test_admin_cannot_password_login(spark):
    res = login_command(spark).run_single(
        req(spark, "root@example.com", "adminpass99"))
    assert not res.success
    assert res.errors.first_error("email") == \
        "Admin users cannot login with password"


def test_schema_stage_blocks_short_password(spark):
    res = login_command(spark).run_single(req(spark, "a@b.co", "short"))
    assert not res.success and res.step == "validation"
    assert res.errors.first_error("password") == "Password too short"


def test_run_shape_gate_message(spark):
    v = build_validator().input(constraints=[]).deps("users")
    cmd = v.command(lambda **kw: None)
    with pytest.raises(ValueError,
                       match="Deps should be provided before calling runShape"):
        cmd.run_shape(req(spark, "a@b.co", "password123"))
