"""The reference's 4 jaffle-shop demo models (models_demo/) as builders,
with their schema.yml tests attached (models_demo/schema.yml:8-41)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_repo_spark.plans.runner import model


@model(
    "stg_customers",
    deps=("raw_customers",),
    materialized="view",
    layer="stg",
    tests={"customer_id": ["unique", "not_null"]},
)
def stg_customers(ctx) -> DataFrame:
    """models_demo/stg_customers.sql"""
    return ctx["raw_customers"].select(
        F.col("id").alias("customer_id"), "first_name", "last_name"
    )


@model(
    "stg_orders",
    deps=("raw_orders",),
    materialized="view",
    layer="stg",
    tests={
        "order_id": ["unique", "not_null"],
        "status": [
            {
                "accepted_values": [
                    "placed",
                    "shipped",
                    "completed",
                    "return_pending",
                    "returned",
                ]
            }
        ],
        "customer_id": [
            "not_null",
            {"relationships": ("stg_customers", "customer_id")},
        ],
    },
)
def stg_orders(ctx) -> DataFrame:
    """models_demo/stg_orders.sql"""
    return ctx["raw_orders"].select(
        F.col("id").alias("order_id"),
        F.col("user_id").alias("customer_id"),
        "order_date",
        "status",
    )


@model("stg_customer_orders", deps=("stg_orders",), materialized="view", layer="stg")
def stg_customer_orders(ctx) -> DataFrame:
    """models_demo/stg_customer_orders.sql — min/max/count per customer."""
    return ctx["stg_orders"].groupBy("customer_id").agg(
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("most_recent_order_date"),
        F.count("order_id").alias("number_of_orders"),
    )


@model(
    "customers",
    deps=("stg_customers", "stg_customer_orders"),
    materialized="table",
    tests={"customer_id": ["unique", "not_null"]},
)
def customers(ctx) -> DataFrame:
    """models_demo/customers.sql — LEFT join USING + coalesce."""
    c = ctx["stg_customers"]
    o = ctx["stg_customer_orders"]
    return c.join(o, "customer_id", "left").select(
        "customer_id",
        "first_name",
        "last_name",
        "first_order_date",
        "most_recent_order_date",
        F.coalesce("number_of_orders", F.lit(0)).alias("number_of_orders"),
    )


DEMO_MODELS = [stg_customers, stg_orders, stg_customer_orders, customers]
