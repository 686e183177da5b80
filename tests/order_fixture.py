"""Spark analog of the reference's flagship order-cancellation validator
(/root/reference/src/order-cancellation.example.ts:26-230) with the mock data
of its spec (/root/reference/src/order-cancellation.spec.ts:18-132).

'now' is pinned to RUN_TS (the reference's hidden Date.now() nondeterminism,
fixed per SURVEY.md §2.C C8); relative dates in the mocks become offsets from
RUN_TS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck import build_validator, FieldConstraint
from sparkcheck.errors import ErrorBag
from sparkcheck.model import ArrayAllRule, Check, FieldRule, \
    ReferentialRule

RUN_TS = 1704067200  # pinned 'now'
DAY = 86400

ITEMS_SCHEMA = ("array<struct<id:string,product_id:string,product_type:string,"
                "quantity:int,price:double>>")
ORDER_SCHEMA = ("order_id string, customer_id string, status string, "
                f"items {ITEMS_SCHEMA}, total_amount double, "
                "discount_code string, fulfillment_type string, "
                "created_epoch bigint, shipping_id string")


def mock_order(**over) -> dict:
    base = dict(
        order_id="order-123", customer_id="customer-456", status="processing",
        items=[("item-1", "product-1", "physical", 2, 50.0),
               ("item-2", "product-2", "digital", 1, 30.0)],
        total_amount=130.0, discount_code="SUMMER20",
        fulfillment_type="internal", created_epoch=RUN_TS - 2 * DAY,
        shipping_id="shipping-123")
    base.update(over)
    return base


MOCK_PRODUCTS = [
    ("product-1", "Regular T-Shirt", "physical", True),
    ("product-2", "Digital Album", "digital", True),
    ("product-3", "Personalized Mug", "personalized", False),
    ("product-4", "Software License", "downloadable", False),
]

# (shipping_id, is_shipped, planned_ship_epoch)
MOCK_SHIPPING = [("shipping-123", False, RUN_TS + 3 * DAY)]


def build_order_validator(spark, user: dict, orders: list[dict] | None = None,
                          products=None, shipping=None, special=None):
    orders = orders if orders is not None else [mock_order()]
    orders_df = spark.createDataFrame(
        [tuple(o.values()) for o in orders], ORDER_SCHEMA)
    products_df = spark.createDataFrame(
        products or MOCK_PRODUCTS,
        "product_id string, name string, type string, is_cancellable boolean")
    shipping_df = spark.createDataFrame(
        shipping if shipping is not None else MOCK_SHIPPING,
        "shipping_id string, is_shipped boolean, planned_ship_epoch bigint")
    special_df = spark.createDataFrame(
        [(c,) for c in (special or ["SPECIAL50"])], "code string")

    hours_expr = f"(shipping_planned_ship_epoch - {RUN_TS}) / 3600.0"
    days_expr = f"({RUN_TS} - order_created_epoch) / 86400.0"

    v = (build_validator()
         .input(constraints=[
             FieldConstraint("orderId", "length(orderId) >= 1",
                             "Order ID is required"),
             FieldConstraint("customerId", "length(customerId) >= 1",
                             "Customer ID is required"),
             FieldConstraint("reason", "length(reason) >= 10",
                             "Cancellation reason must be at least 10 characters"),
             FieldConstraint("reason", "length(reason) <= 500", "Reason too long"),
             FieldConstraint("source",
                             "source IN ('customer-portal','admin-panel','api')",
                             "Invalid source"),
         ], key_col="orderId")
         .deps("orders", "products", "shipping", "special")
         .enrich("order-exists", dim="orders", on="orderId", dim_key="order_id",
                 adds=["order_id", "customer_id", "status", "items",
                       "total_amount", "discount_code", "fulfillment_type",
                       "created_epoch", "shipping_id"],
                 prefix="order_", key="orderId", message="Order not found",
                 description="Check if order exists and belongs to customer")
         .field_rule("order-not-cancelled", "order_status != 'cancelled'",
                     "Order is already cancelled",
                     description="Check if order is not already cancelled")
         .field_rule("permission-to-cancel",
                     F.lit(user["role"] == "admin") |
                     (F.col("order_customer_id") == F.lit(user["id"])),
                     "You do not have permission to cancel this order",
                     description="Check if user has permission to cancel the order")
         .enrich("fetch-shipping-info", dim="shipping", on="order_shipping_id",
                 dim_key="shipping_id",
                 adds=["shipping_id", "is_shipped", "planned_ship_epoch"],
                 prefix="shipping_",
                 message="Cannot process cancellation for this order for now, "
                         "please try again later",
                 description="Fetch shipping information for the order")
         .rule(FieldRule(
             id="not-shipped-or-shipping-soon",
             description="Check if order is not shipped or planned to ship "
                         "within 24 hours",
             checks=[
                 Check(ok_expr="NOT shipping_is_shipped", key=None,
                       message="Cannot cancel orders that have already been "
                               "shipped"),
                 # the reference returns early when shipped, so the 24h check
                 # only fires for un-shipped orders with a planned date
                 Check(ok_expr=f"NOT ({hours_expr} <= 24 AND {hours_expr} > 0)",
                       key=None,
                       message=F.format_string(
                           "Cannot cancel orders scheduled to ship within 24 "
                           "hours (ships in %d hours)",
                           F.expr(f"CAST(round({hours_expr}) AS INT)")),
                       guard="NOT shipping_is_shipped AND "
                             "shipping_planned_ship_epoch IS NOT NULL"),
             ]))
         .rule(ArrayAllRule(
             id="all-items-cancellable",
             description="Check if all items in the order are cancellable",
             items_col="order_items", item_key="product_id",
             dim="products", dim_key="product_id", flag_col="is_cancellable",
             item_fmt="%s (%s)", fmt_cols=["name", "type"],
             message_prefix="Order contains non-cancellable items: ",
             missing_ok=True, global_error=True))
         .rule(ReferentialRule(
             id="no-special-discounts",
             description="Check if order doesn't have special discount codes",
             col="order_discount_code", dim="special", dim_key="code",
             anti=True,
             guard="order_discount_code IS NOT NULL AND order_discount_code != ''",
             global_error=True,
             message="Orders with special discount codes cannot be cancelled"))
         .field_rule("no-third-party-fulfillment",
                     "order_fulfillment_type != 'third-party'",
                     "Orders fulfilled by third-party vendors cannot be "
                     "cancelled through this system",
                     description="Check if order is not fulfilled by third party")
         .field_rule("within-time-limit",
                     f"{days_expr} <= 10",
                     F.format_string(
                         "Order cannot be cancelled after 10 days "
                         "(created %d days ago)",
                         F.expr(f"CAST(round({days_expr}) AS INT)")),
                     description="Check if order was created within the last "
                                 "10 days")
         .provide(orders=orders_df, products=products_df, shipping=shipping_df,
                  special=special_df))
    return v


def request_df(spark, order_id="order-123", customer_id="customer-456",
               reason="Changed my mind about the purchase",
               source="customer-portal"):
    return spark.createDataFrame(
        [(order_id, customer_id, reason, source)],
        "orderId string, customerId string, reason string, source string")


def make_execute(orders: list[dict], cancel_error: str | None = None,
                 notify_error: str | None = None):
    """Mirrors cancelOrderCommand.execute
    (src/order-cancellation.example.ts:191-225): cancel + notify, exceptions
    caught into the bag and the bag returned."""
    by_id = {o["order_id"]: o for o in orders}

    def execute(data, deps, context, bag: ErrorBag):
        try:
            order = by_id.get(data["orderId"])
            if order is None or cancel_error:
                raise RuntimeError(cancel_error or "Order not found")
            if notify_error:
                raise RuntimeError(notify_error)
            return {
                "success": True,
                "orderId": data["orderId"],
                "status": "cancelled",
                "refundAmount": order["total_amount"],
                "message": "Order successfully cancelled. Refund will be "
                           "processed within 3-5 business days.",
            }
        except Exception as e:  # graceful: convert to bag + return it
            bag.add_global_error(f"Failed to cancel order: {e}. "
                                 "Try again later.")
            return bag
    return execute
