"""S2 — CSV review/product loaders (the reference's Amazon/Disney caches).

The reference materializes its corpora as two CSV files and re-serves them
with pandas (src/data/amazon_load_preprocess.py:140-177: products
``id,name,description,created_at,updated_at`` and reviews
``id,product_id,content,rating``). This module is the distributed analog:
`spark.read.csv` with explicit schemas (no inference scan — one pass, and
the schema is a contract, not a guess), plus adapters into the pipeline's
`pages` boundary so a CSV corpus runs through the same E1-E7 plan as crawl
parquet. Malformed rows are dropped (PERMISSIVE would silently null out
columns mid-pipeline; DROPMALFORMED keeps the contract honest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REVIEWS_SCHEMA = "id long, product_id long, content string, rating double"
PRODUCTS_SCHEMA = (
    "id long, name string, description string, created_at timestamp, updated_at timestamp"
)


def load_reviews_csv(spark: SparkSession, path: str) -> DataFrame:
    """reviews CSV cache -> (id, product_id, content, rating); empty/blank
    review bodies dropped, matching the reference's ingest filter
    (amazon_load_preprocess.py:118)."""
    df = spark.read.csv(
        path, schema=REVIEWS_SCHEMA, header=True, multiLine=True, escape='"', mode="DROPMALFORMED"
    )
    # DROPMALFORMED only drops structurally broken lines; a failed type cast
    # yields nulls — require the key columns, keeping the contract explicit
    return df.filter(
        F.col("id").isNotNull()
        & F.col("product_id").isNotNull()
        & (F.trim(F.coalesce(F.col("content"), F.lit(""))) != "")
    )


def load_products_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(
        path, schema=PRODUCTS_SCHEMA, header=True, multiLine=True, escape='"', mode="DROPMALFORMED"
    )


def reviews_to_pages(reviews: DataFrame, products: DataFrame | None = None) -> DataFrame:
    """(id, product_id, content, rating) -> pages(url, warc_ts, html, text,
    lang): the adapter that lets a CSV corpus run the full KG pipeline.

    group analog = product_id (the reference groups reviews per product);
    the url embeds it as the first path segment, which is exactly what
    cleaning.extract_docs parses back out as group_id. `html` wraps the
    review body so E1's HTML-to-text contract is exercised, not bypassed.
    Products, when given, are a broadcast dim join for the group name."""
    out = reviews
    group = F.col("product_id").cast("string")
    if products is not None:
        name = F.regexp_replace(F.lower(F.coalesce(F.col("name"), group)), r"[^a-z0-9]+", "-")
        out = out.join(
            F.broadcast(products.select(F.col("id").alias("product_id"), "name")),
            "product_id",
            "left",
        )
        group = name
    return out.select(
        F.concat(
            F.lit("https://reviews.test/"), group, F.lit("/r"),
            F.lpad(F.col("id").cast("string"), 9, "0"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>"), F.col("content"), F.lit("</p></body></html>")
            ),
            "utf-8",
        ).alias("html"),
        F.col("content").alias("text"),
        F.lit("en").alias("lang"),
    )
