"""Three-level catalog.schema.table namespaces (reference parity:
framework.py:79-80) via a runtime-registered in-memory V2 catalog."""

from __future__ import annotations

import pytest

from python_tool_setup_spark.ingestion.catalog_plugins import (
    register_memory_catalog,
)


@pytest.fixture(scope="module")
def cat(spark):
    return register_memory_catalog(spark, "testcat")


def test_three_level_ddl_dml_roundtrip(spark, cat):
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.bronze")
    spark.sql(f"DROP TABLE IF EXISTS {cat}.bronze.kv")
    spark.sql(f"CREATE TABLE {cat}.bronze.kv (k INT, v STRING)")
    spark.sql(f"INSERT INTO {cat}.bronze.kv VALUES (1, 'a'), (2, 'b')")
    got = sorted(
        (r.k, r.v) for r in spark.table(f"{cat}.bronze.kv").collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_catalog_is_listed_and_default_untouched(spark, cat):
    spark.sql(f"SHOW NAMESPACES IN {cat}")  # force instantiation
    names = {c.name for c in spark.catalog.listCatalogs()}
    assert cat in names and "spark_catalog" in names
    assert spark.catalog.currentCatalog() == "spark_catalog"


def test_ctas_from_default_catalog_data(spark, cat):
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.silver")
    spark.sql(f"DROP TABLE IF EXISTS {cat}.silver.agg")
    src = spark.range(100).selectExpr("id % 7 AS g", "id AS v")
    src.createOrReplaceTempView("_mc_src")
    spark.sql(
        f"CREATE TABLE {cat}.silver.agg AS "
        "SELECT g, COUNT(*) AS n, SUM(v) AS s FROM _mc_src GROUP BY g"
    )
    back = spark.table(f"{cat}.silver.agg")
    assert back.count() == 7
    total = back.agg({"s": "sum"}).collect()[0][0]
    assert total == sum(range(100))


def test_registration_is_idempotent(spark, cat):
    assert register_memory_catalog(spark, "testcat") == cat
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.bronze")


def test_ingestion_shim_accepts_registered_catalog(spark, cat, tmp_path, sf_dir):
    """The pipeline's catalog guard must accept a V2-registered catalog
    name (it fails fast on unregistered ones — test_ingestion covers
    that side)."""
    from python_tool_setup_spark.config import IngestionConfig
    from python_tool_setup_spark.ingestion import make_ingestion
    from python_tool_setup_spark.tables import table_path

    cfg = IngestionConfig(
        source_path=table_path(sf_dir, "region"),
        source_format="parquet",
        catalog="spark_catalog",
        target_path=str(tmp_path / "t"),
        write_mode="overwrite",
    )
    make_ingestion(spark, cfg).run()
    assert spark.read.parquet(str(tmp_path / "t")).count() == 5
