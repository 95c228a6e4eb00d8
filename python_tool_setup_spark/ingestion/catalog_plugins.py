"""Second-catalog registration: REAL three-level namespaces in OSS Spark.

The reference addresses tables as ``catalog.schema.table``
(framework.py:79-80) against a platform metastore. OSS Spark has no
CREATE CATALOG, but Spark 4's DataSourceV2 catalog-plugin API
instantiates any conf-registered implementation lazily on first
reference — and the runtime classpath already ships both the pieces
needed for a self-contained catalog: ``JDBCTableCatalog`` (the V2 JDBC
catalog) and Apache Derby (pulled in for the Hive metastore). Pointing
the one at an in-memory instance of the other yields a fully
functional second catalog — CREATE NAMESPACE / CTAS / INSERT / 3-level
SELECT / SHOW CATALOGS all work — with zero external services and no
test-scope jars.

Registration is a plain runtime conf set, so it works on a session the
caller does not control (the driver contract hands us its own vanilla
SparkSession).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_JDBC_CATALOG_IMPL = (
    "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog"
)
_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def register_memory_catalog(spark: SparkSession, name: str) -> str:
    """Register an in-memory (Derby-backed) V2 catalog under ``name``
    and return the name. Idempotent: re-registering the same name is a
    no-op (`;create=true` tolerates an existing in-memory database,
    and catalog instances are cached per session after first use).

    The catalog supports the full 3-level DDL/DML surface the
    reference uses: ``CREATE NAMESPACE <name>.<schema>``,
    ``CREATE TABLE <name>.<schema>.<table> AS SELECT ...``, INSERT,
    DROP, and 3-level SELECT. Data lives in the JVM (Derby in-memory),
    so this is a metadata-fidelity shim for single-JVM use — external
    parquet data stays in ``spark_catalog``; at cluster scale the same
    conf keys point at a real JDBC metastore instead.
    """
    spark.conf.set(f"spark.sql.catalog.{name}", _JDBC_CATALOG_IMPL)
    spark.conf.set(
        f"spark.sql.catalog.{name}.url",
        f"jdbc:derby:memory:{name};create=true",
    )
    spark.conf.set(f"spark.sql.catalog.{name}.driver", _DERBY_DRIVER)
    return name
