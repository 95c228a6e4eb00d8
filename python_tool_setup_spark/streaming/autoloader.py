"""Incremental file ingestion — OSS equivalent of Databricks Auto Loader.

Parity target: the reference's ``_write_stream``
(framework.py:177-209): ``readStream.format("cloudFiles")`` with a
schema location and inferColumnTypes, written as a checkpointed delta
append, blocking until the source is drained.

OSS re-expression:
- source: Structured Streaming *file source* — same incremental
  discovery semantics (new files per micro-batch, exactly-once via the
  checkpointed file index);
- schema: a JSON **schema registry** file we manage (Auto Loader's
  ``cloudFiles.schemaLocation``). First run infers from existing files
  and persists; later runs re-infer and additively merge new columns
  (Auto Loader's evolution mode), persisting the union;
- drain-and-return: ``trigger(availableNow=True)`` + awaitTermination —
  the cleaner OSS idiom for the reference's ``processAllAvailable()``
  (framework.py:202,207);
- sink: parquet (or delta when installed) append with
  ``checkpointLocation``; ``start(path)`` for external targets,
  ``toTable`` for managed (framework.py:200-207).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from python_tool_setup_spark.config import IngestionConfig
from python_tool_setup_spark.sources.fs import get_object, path_exists, put_object


def _registry_file(cfg: IngestionConfig) -> str:
    base = cfg.schema_registry_path or f"{cfg.checkpoint_path.rstrip('/')}/_schema"
    return f"{base.rstrip('/')}/schema.json"


def load_or_evolve_schema(spark: SparkSession, cfg: IngestionConfig) -> StructType:
    """Return the schema to stream with; persist first-seen / evolved
    schemas to the registry (additive evolution: new columns appended,
    existing column types keep their registered type)."""
    reg_path = _registry_file(cfg)
    registered: StructType | None = None
    if path_exists(spark, reg_path):
        registered = StructType.fromJson(
            json.loads(get_object(spark, reg_path).decode("utf-8"))
        )

    if cfg.schema is not None:
        inferred = StructType.fromDDL(cfg.schema)
    else:
        from python_tool_setup_spark.sources.files import read_batch

        inferred = read_batch(
            spark,
            cfg.source_path,
            cfg.source_format,
            cfg.source_options,
            schema=None,
            infer_schema=cfg.infer_schema,
        ).schema

    if registered is None:
        merged = inferred
    else:
        merged = StructType(list(registered.fields))
        have = {f.name for f in registered.fields}
        for f in inferred.fields:
            if f.name not in have:
                merged = merged.add(f)
    if registered is None or merged.jsonValue() != registered.jsonValue():
        put_object(spark, reg_path, json.dumps(merged.jsonValue()))
    return merged


def _merge_microbatch(cfg: IngestionConfig):
    """foreachBatch body for streaming upsert: each micro-batch merges
    into the path-backed target via the staged-rewrite merge_upsert.

    foreachBatch is at-least-once; replaying the SAME micro-batch
    through merge_upsert is a fixpoint (matched rows are replaced with
    identical values), so the sink is effectively idempotent as long as
    merge keys are unique per batch (enforce with cfg.dedup_order)."""
    from python_tool_setup_spark.operators.merge import merge_upsert
    from python_tool_setup_spark.operators.relational import dedup_by_keys
    from python_tool_setup_spark.sources.fs import replace_dir

    def apply(batch_df, batch_id: int) -> None:
        import uuid

        spark = batch_df.sparkSession
        tgt = cfg.target_path
        if cfg.dedup_order:
            batch_df = dedup_by_keys(batch_df, cfg.merge_keys, cfg.dedup_order)
        if cfg.merge_bucket_count:
            # O(touched buckets) per micro-batch instead of O(table)
            from python_tool_setup_spark.operators.merge import (
                merge_upsert_bucketed,
            )

            merge_upsert_bucketed(
                spark,
                tgt,
                batch_df,
                cfg.merge_keys,
                cfg.merge_bucket_count,
                fmt=cfg.target_format,
            )
            return
        if path_exists(spark, tgt):
            target = spark.read.format(cfg.target_format).load(tgt)
            merged = merge_upsert(target, batch_df, cfg.merge_keys)
        else:
            merged = batch_df
        staging = f"{tgt.rstrip('/')}__merge_{uuid.uuid4().hex[:8]}"
        merged.write.format(cfg.target_format).mode("overwrite").save(staging)
        replace_dir(spark, staging, tgt)

    return apply


def run_autoloader(spark: SparkSession, cfg: IngestionConfig) -> None:
    """One drain-everything-available streaming run (T1-T3; merge mode
    runs the upsert per micro-batch via foreachBatch)."""
    schema = load_or_evolve_schema(spark, cfg)
    reader = (
        spark.readStream.format(cfg.source_format)
        .schema(schema)
        .options(**(cfg.source_options or {}))
    )
    if cfg.source_format == "csv":
        reader = reader.option("header", "true")
    stream = reader.load(cfg.source_path)

    if cfg.write_mode == "merge":
        query = (
            stream.writeStream.foreachBatch(_merge_microbatch(cfg))
            .outputMode("append")
            .option("checkpointLocation", cfg.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return

    writer = (
        stream.writeStream.format(cfg.target_format)
        .outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_path)
        .option("mergeSchema", "true")
        .trigger(availableNow=True)
    )
    if cfg.partition_by:
        writer = writer.partitionBy(*cfg.partition_by)
    if cfg.target_path:
        query = writer.start(cfg.target_path)
    else:
        query = writer.toTable(cfg.full_table_name)
    query.awaitTermination()
