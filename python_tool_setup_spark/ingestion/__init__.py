"""Config-driven ingestion pipelines (reference framework parity)."""

from python_tool_setup_spark.config import IngestionConfig, IngestionError
from python_tool_setup_spark.ingestion.base import IngestionPipeline
from python_tool_setup_spark.ingestion.clouds import (
    AzureIngestion,
    S3Ingestion,
    LocalIngestion,
    make_ingestion,
)

__all__ = [
    "IngestionConfig",
    "IngestionError",
    "IngestionPipeline",
    "AzureIngestion",
    "S3Ingestion",
    "LocalIngestion",
    "make_ingestion",
]
