"""S2 CSV loaders: schema contract, blank-review filter, pages adapter, and
a CSV corpus running the full pipeline boundary (extract_docs)."""

import pytest
from pyspark.sql import functions as F

from llm_review_aggregation_spark import sources
from llm_review_aggregation_spark.functions import cleaning

REVIEWS_CSV = '''id,product_id,content,rating
1,10,"the lens is great. the battery is bad.",4.0
2,10,"screen works fine",3.0
3,11,"   ",5.0
4,11,"body feels solid, zoom is nice",4.5
'''

PRODUCTS_CSV = '''id,name,description,created_at,updated_at
10,Acme Camera,nice camera,2023-01-01T00:00:00,2023-01-02T00:00:00
11,Zoomer 9,other camera,2023-01-01T00:00:00,2023-01-02T00:00:00
'''


@pytest.fixture()
def csv_paths(tmp_path):
    r = tmp_path / "reviews.csv"
    p = tmp_path / "products.csv"
    r.write_text(REVIEWS_CSV)
    p.write_text(PRODUCTS_CSV)
    return str(r), str(p)


def test_load_reviews_schema_and_blank_filter(spark, csv_paths):
    reviews_path, _ = csv_paths
    df = sources.load_reviews_csv(spark, reviews_path)
    assert [f.name for f in df.schema.fields] == ["id", "product_id", "content", "rating"]
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}  # blank review 3 dropped
    assert rows[1]["rating"] == 4.0 and rows[4]["product_id"] == 11


def test_products_schema(spark, csv_paths):
    _, products_path = csv_paths
    df = sources.load_products_csv(spark, products_path)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[10]["name"] == "Acme Camera"
    assert rows[10]["created_at"].year == 2023


def test_reviews_to_pages_roundtrip(spark, csv_paths):
    reviews_path, products_path = csv_paths
    reviews = sources.load_reviews_csv(spark, reviews_path)
    products = sources.load_products_csv(spark, products_path)
    pages = sources.reviews_to_pages(reviews, products)
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    # the pages boundary feeds E1 unchanged: group_id parses back out and
    # the html wrap survives clean_text
    docs = {r["url"]: r for r in cleaning.extract_docs(pages).collect()}
    by_group = {r["group_id"] for r in docs.values()}
    assert by_group == {"acme-camera", "zoomer-9"}
    assert any("lens is great" in r["text"] for r in docs.values())


def test_reviews_to_pages_without_products(spark, csv_paths):
    reviews_path, _ = csv_paths
    pages = sources.reviews_to_pages(sources.load_reviews_csv(spark, reviews_path))
    groups = {r[0] for r in cleaning.extract_docs(pages).select("group_id").collect()}
    assert groups == {"10", "11"}


def test_malformed_rows_dropped(spark, tmp_path):
    # a failed type cast nulls the key columns (CSV DROPMALFORMED only
    # drops structurally broken lines) -> the loader's key filter drops it
    p = tmp_path / "bad.csv"
    p.write_text('id,product_id,content,rating\n1,10,"ok text",4.0\nnot_a_long,x,y,z\n')
    df = sources.load_reviews_csv(spark, str(p))
    assert df.count() == 1
