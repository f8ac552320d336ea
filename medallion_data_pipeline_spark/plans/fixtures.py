"""Deterministic dirty-data fixture generator for the supply-chain
star schema (FIXTURES.md; mirrors the reference's bronze layer
including its deliberate dirtiness, bronze/database_setup.py:66-143).

Every dirty variant appears in a few % of rows so every cleaning branch
in the silver layer is exercised. seed=42; pure-Python generation (test
fixture scale), loaded through spark.createDataFrame with explicit
all-TEXT supply_orders — exactly the reference's "accept dirty data,
clean later" contract.
"""

from __future__ import annotations

import random
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession

REGIONS = ["North", "South", "East", "West"]
CITIES = ["Pune", "Delhi", "Mumbai", "Chennai", "Kolkata"]
CATEGORIES = [
    "Automotive Parts > Batteries",
    "autmootive parts - battreies",
    "Safety | high vis",
    "asfety/filters",
    "Automotive Parts > Tires",
    "Electronics",
    "automotiev parts>body parts",
]
ORDER_STATUSES = ["delivered", "Delivered", "DISPATCHED", "In Transit", "shipped",
                  "pending", "Awaiting", "Processing", "cancelled", "Void", "Complete"]
STORE_STATUSES = ["active", "OPEN", "Closed", "shutdown", "inactive", "ACTIVE"]
PRODUCT_STATUSES = ["active", "ACTIVE", "Discontinued", "inactive", "in stock"]
SENTINELS = ["NULL", "N/A", "TBD", ""]


def _maybe_dirty_text(rng: random.Random, base: str, sentinel_p: float = 0.04) -> str:
    roll = rng.random()
    if roll < sentinel_p:
        return rng.choice(SENTINELS)
    if roll < 0.10:
        return f"  {base.upper()}!! "
    if roll < 0.14:
        return base.lower().replace(" ", "   ")
    return base


def generate_bronze(spark: SparkSession, n_orders: int = 5000,
                    seed: int = 42) -> dict[str, DataFrame]:
    rng = random.Random(seed)
    n_suppliers, n_products, n_warehouses, n_stores = 100, 300, 20, 50
    n_inventory = 2000

    suppliers = []
    for i in range(1, n_suppliers + 1):
        suppliers.append((
            i,
            _maybe_dirty_text(rng, f"Supplier {i} Corp"),
            rng.choice([f"contact{i}@example.com", f"  CONTACT{i}@EXAMPLE.COM ", "not-an-email", "N/A"]),
            rng.choice([f"+1-555-{i:03d}-{rng.randint(1000, 9999)}", "12345", f"(555) {i:03d}-{rng.randint(1000, 9999)} ext 9"]),
        ))

    products = []
    for i in range(1, n_products + 1):
        cost = round(rng.uniform(5, 500), 2)
        price = round(cost * rng.uniform(1.1, 2.5), 2)
        cost_s = rng.choice([f"{cost}", f"${cost:,.2f}", f"-{cost}"]) if rng.random() < 0.15 else f"{cost}"
        if rng.random() < 0.01:
            cost_s = "N/A"                                        # reject path
        products.append((
            i,
            _maybe_dirty_text(rng, f"Part {i}", sentinel_p=0.01),
            cost_s,
            f"{price}",
            rng.randint(1, n_suppliers),
            rng.choice(CATEGORIES),
            rng.choice(PRODUCT_STATUSES),
        ))

    warehouses = []
    for i in range(1, n_warehouses + 1):
        cap = rng.randint(200, 999) * 1000
        warehouses.append((
            i,
            _maybe_dirty_text(rng, f"Warehouse {i}"),
            rng.choice(CITIES),
            rng.choice(REGIONS),
            rng.choice([f"{cap}", f"{cap:,} units"]),
        ))

    stores = []
    for i in range(1, n_stores + 1):
        stores.append((
            i,
            _maybe_dirty_text(rng, f"MegaMart {i}"),
            rng.choice(CITIES),
            rng.choice(REGIONS),
            rng.choice(["Franchise", "Company Owned", "franchise"]),
            rng.choice(STORE_STATUSES),
        ))

    inventory = []
    for i in range(1, n_inventory + 1):
        qty = rng.randint(-50, 500) if rng.random() < 0.03 else rng.randint(0, 500)
        d = date(2024, 1, 1) + timedelta(days=rng.randint(0, 500))
        inventory.append((
            i,
            rng.randint(1, n_products + 5),       # a few dangling FKs
            rng.randint(1, n_warehouses),
            qty,
            rng.choice([d.isoformat(), "N/A", "TBD"]) if rng.random() < 0.05 else d.isoformat(),
        ))

    date_fmts = ["%Y-%m-%d", "%m/%d/%Y", "%d-%m-%Y", "%Y/%m/%d"]
    orders = []
    for i in range(1, n_orders + 1):
        qty = rng.randint(1, 200)
        price = round(rng.uniform(10, 400), 2)
        invoice = round(qty * price, 2)
        if rng.random() < 0.05:
            invoice = round(invoice + rng.uniform(1, 50), 2)     # calc drift
        od = date(2023, 1, 1) + timedelta(days=rng.randint(0, 730))
        sd = od + timedelta(days=rng.randint(0, 10))
        if rng.random() < 0.03:
            sd = od - timedelta(days=2)                           # bad date logic
        dd = sd + timedelta(days=rng.randint(1, 7))
        qty_s = f"{qty} pcs" if rng.random() < 0.08 else str(qty)
        if rng.random() < 0.02:
            qty_s = rng.choice(["", "unknown"])                  # reject path
        price_s = f"${price:,.2f}" if rng.random() < 0.1 else str(price)
        fmt = rng.choice(date_fmts)
        orders.append((
            i,
            str(rng.randint(1, n_products + 3)) if rng.random() > 0.03 else f"P-{rng.randint(1, n_products)}",
            str(rng.randint(1, n_warehouses)),
            str(rng.randint(1, n_stores)),
            qty_s,
            price_s,
            str(invoice),
            od.strftime(fmt) if rng.random() > 0.02 else "N/A",   # reject path
            sd.strftime(fmt),
            dd.strftime(fmt) if rng.random() > 0.15 else None,    # pending deliveries
            rng.choice(ORDER_STATUSES),
        ))

    def _df(rows: list[tuple], schema: str) -> DataFrame:
        # pandas + Arrow ingest: list-of-tuples createDataFrame pickles
        # every row through py4j (measured 9s for the 50K-order batch);
        # the Arrow path batches columns and cuts that to ~2s.
        import pandas as pd

        names = [f.split()[0] for f in schema.split(",")]
        pdf = pd.DataFrame(rows, columns=names, dtype=object)
        return spark.createDataFrame(pdf, schema)

    return {
        "suppliers": _df(
            suppliers, "supplier_id long, supplier_name string, contact_email string, phone_number string"),
        "products": _df(
            products, "product_id long, product_name string, unit_cost string, selling_price string, "
                      "supplier_id long, product_category string, status string"),
        "warehouses": _df(
            warehouses, "warehouse_id long, warehouse_name string, city string, region string, storage_capacity string"),
        "retail_stores": _df(
            stores, "retail_store_id long, store_name string, city string, region string, store_type string, store_status string"),
        "inventory": _df(
            inventory, "inventory_id long, product_id long, warehouse_id long, quantity_on_hand long, last_stocked_date string"),
        # the fact table: ALL non-key fields TEXT (reference
        # bronze/database_setup.py:128-143 stores dirty data as TEXT)
        "supply_orders": _df(
            orders, "supply_order_id long, product_id string, warehouse_id string, retail_store_id string, "
                    "quantity string, price string, total_invoice string, order_date string, "
                    "shipped_date string, delivered_date string, status string"),
    }
