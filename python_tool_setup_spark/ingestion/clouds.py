"""Cloud-specific pipeline specializations + factory dispatch.

Parity: the reference dispatches on the source URI scheme
(framework.py:297-302 — abfss/abfs/wasbs/adl → Azure, s3 → S3) and each
subclass validates its URI prefix (framework.py:276-280, 288-292) and
exposes an auth hook (framework.py:272-274, 284-286). We add a Local
specialization (file:// or bare paths) so tests and on-prem runs use
the identical lifecycle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from python_tool_setup_spark.config import IngestionConfig, IngestionError
from python_tool_setup_spark.ingestion.base import IngestionPipeline

_AZURE_SCHEMES = ("abfss://", "abfs://", "wasbs://", "wasb://", "adl://")
_S3_SCHEMES = ("s3://", "s3a://", "s3n://")
_LOCAL_SCHEMES = ("file://", "/", "./", "hdfs://")


class AzureIngestion(IngestionPipeline):
    def validate_source_uri(self) -> None:
        if not self.cfg.source_path.startswith(_AZURE_SCHEMES):
            raise IngestionError(
                f"Azure ingestion requires an abfss/abfs/wasbs/adl URI, "
                f"got {self.cfg.source_path!r}"
            )

    def configure_auth(self) -> None:
        # Spark-native auth: the cluster's hadoop conf (OAuth/SAS/keys)
        # is expected to be provisioned out-of-band; hook kept for parity.
        pass


class S3Ingestion(IngestionPipeline):
    def validate_source_uri(self) -> None:
        if not self.cfg.source_path.startswith(_S3_SCHEMES):
            raise IngestionError(
                f"S3 ingestion requires an s3/s3a/s3n URI, "
                f"got {self.cfg.source_path!r}"
            )

    def configure_auth(self) -> None:
        # s3a credential chain (env, instance profile, …) is the
        # Spark-native path; hook kept for parity with framework.py:284-286.
        pass


class LocalIngestion(IngestionPipeline):
    def validate_source_uri(self) -> None:
        pass


def make_ingestion(spark: SparkSession, cfg: IngestionConfig) -> IngestionPipeline:
    """Factory keyed on URI scheme (parity framework.py:297-302)."""
    src = cfg.source_path
    if src.startswith(_AZURE_SCHEMES):
        return AzureIngestion(spark, cfg)
    if src.startswith(_S3_SCHEMES):
        return S3Ingestion(spark, cfg)
    return LocalIngestion(spark, cfg)
