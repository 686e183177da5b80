"""Port of /root/reference/src/order-cancellation.spec.ts (19 tests) to the
Spark engine: one 1-row DataFrame plays the single input object; assertions
are verbatim — exact messages, rule ids, step attribution, fail-fast ordering,
context accumulation.
"""

from __future__ import annotations

import re

import pytest

from .order_fixture import (DAY, MOCK_SHIPPING, RUN_TS, build_order_validator,
                            make_execute, mock_order, request_df)


def validate(spark, user=None, orders=None, shipping=None, request=None,
             **req_over):
    v = build_order_validator(
        spark, user or {"id": "customer-456", "role": "customer"},
        orders=orders, shipping=shipping)
    df = request if request is not None else request_df(spark, **req_over)
    return v.validate(df).single()


# --- Validation Rules (spec :134-417) --------------------------------------

def test_pass_when_all_conditions_met(spark):
    r = validate(spark)
    assert r.success


def test_fail_when_order_does_not_exist(spark):
    r = validate(spark, order_id="non-existent")
    assert not r.success
    assert r.errors.first_error("orderId") == "Order not found"
    assert r.rule["id"] == "order-exists"


def test_fail_when_no_permission(spark):
    r = validate(spark, user={"id": "another-customer", "role": "customer"})
    assert not r.success
    assert r.errors.global_error == \
        "You do not have permission to cancel this order"
    assert r.rule["id"] == "permission-to-cancel"


def test_pass_when_admin_cancels_any_order(spark):
    r = validate(spark, user={"id": "admin-789", "role": "admin"},
                 reason="Customer requested cancellation", source="admin-panel")
    assert r.success


def test_fail_when_already_cancelled(spark):
    r = validate(spark, orders=[mock_order(status="cancelled")])
    assert not r.success
    assert r.errors.global_error == "Order is already cancelled"
    assert r.rule["id"] == "order-not-cancelled"


def test_fail_when_already_shipped(spark):
    r = validate(spark, shipping=[("shipping-123", True, None)])
    assert not r.success
    assert r.errors.global_error == \
        "Cannot cancel orders that have already been shipped"
    assert r.rule["id"] == "not-shipped-or-shipping-soon"


def test_fail_when_shipping_within_24_hours(spark):
    r = validate(spark,
                 shipping=[("shipping-123", False, RUN_TS + 12 * 3600)])
    assert not r.success
    assert re.search(
        r"Cannot cancel orders scheduled to ship within 24 hours",
        r.errors.global_error)
    assert "(ships in 12 hours)" in r.errors.global_error
    assert r.rule["id"] == "not-shipped-or-shipping-soon"


def test_fail_when_non_cancellable_items(spark):
    items = mock_order()["items"] + [
        ("item-3", "product-3", "personalized", 1, 45.0)]
    r = validate(spark, orders=[mock_order(items=items)])
    assert not r.success
    assert ("Order contains non-cancellable items: "
            "Personalized Mug (personalized)") in r.errors.global_error
    assert r.rule["id"] == "all-items-cancellable"


def test_fail_when_special_discount(spark):
    r = validate(spark, orders=[mock_order(discount_code="SPECIAL50")])
    assert not r.success
    assert r.errors.global_error == \
        "Orders with special discount codes cannot be cancelled"
    assert r.rule["id"] == "no-special-discounts"


def test_fail_when_third_party_fulfillment(spark):
    r = validate(spark, orders=[mock_order(fulfillment_type="third-party")])
    assert not r.success
    assert r.errors.global_error == ("Orders fulfilled by third-party vendors "
                                     "cannot be cancelled through this system")
    assert r.rule["id"] == "no-third-party-fulfillment"


def test_fail_when_older_than_10_days(spark):
    r = validate(spark,
                 orders=[mock_order(created_epoch=RUN_TS - 15 * DAY)])
    assert not r.success
    assert re.search(r"Order cannot be cancelled after 10 days",
                     r.errors.global_error)
    assert "(created 15 days ago)" in r.errors.global_error
    assert r.rule["id"] == "within-time-limit"


def test_shipping_service_error_handled_gracefully(spark):
    r = validate(spark, shipping=[])  # no shipping status available
    assert not r.success
    assert r.errors.global_error == ("Cannot process cancellation for this "
                                     "order for now, please try again later")
    assert r.rule["id"] == "fetch-shipping-info"


# --- Cancel Order Command (spec :420-527) -----------------------------------

def _command(spark, user=None, orders=None, **exec_kw):
    orders = orders if orders is not None else [mock_order()]
    v = build_order_validator(
        spark, user or {"id": "customer-456", "role": "customer"},
        orders=orders)
    return v.command(make_execute(orders, **exec_kw))


def test_command_success(spark):
    res = _command(spark).run_single(request_df(spark))
    assert res.success
    assert res.result["success"] is True
    assert res.result["orderId"] == "order-123"
    assert res.result["status"] == "cancelled"
    assert res.result["refundAmount"] == 130.0
    assert res.result["message"] == ("Order successfully cancelled. Refund "
                                     "will be processed within 3-5 business "
                                     "days.")


def test_command_fails_at_validation_step(spark):
    res = _command(spark).run_single(request_df(spark,
                                                order_id="non-existent"))
    assert not res.success
    assert res.step == "validation"
    assert res.errors.first_error("orderId") == "Order not found"


def test_command_fails_at_execution_step(spark):
    res = _command(spark, cancel_error="Database connection failed") \
        .run_single(request_df(spark))
    assert not res.success
    assert res.step == "execution"
    assert res.errors.global_error == ("Failed to cancel order: Database "
                                       "connection failed. Try again later.")


def test_command_notification_failure(spark):
    res = _command(spark, notify_error="Notification service unavailable") \
        .run_single(request_df(spark))
    assert not res.success
    assert res.step == "execution"
    assert "Notification service unavailable" in res.errors.global_error


def test_command_validates_input_schema(spark):
    res = _command(spark).run_single(
        request_df(spark, order_id="", reason="Too short"))
    assert not res.success
    assert res.step == "validation"
    assert res.errors.first_error("orderId") == "Order ID is required"
    assert "10 characters" in res.errors.first_error("reason")


# --- Complex Scenarios (spec :530-579) ---------------------------------------

def test_fail_fast_on_first_failing_rule(spark):
    """Multiple violations present → verdict attributes the FIRST failing
    rule in declaration order (no-special-discounts before third-party and
    time-limit)."""
    r = validate(spark, orders=[mock_order(
        status="processing", fulfillment_type="third-party",
        discount_code="SPECIAL50", created_epoch=RUN_TS - 15 * DAY)])
    assert not r.success
    assert r.errors.global_error == \
        "Orders with special discount codes cannot be cancelled"
    assert r.rule["id"] == "no-special-discounts"


def test_context_accumulates_through_rule_chain(spark):
    r = validate(spark)
    assert r.success
    assert r.context["order_order_id"] == "order-123"
    assert r.context["shipping_shipping_id"] == "shipping-123"
    assert r.context["order_status"] == "processing"
    assert r.context["shipping_is_shipped"] is False
