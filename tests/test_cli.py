"""spark-ingest console entry point (packaging parity: the reference
ships a [project.scripts] CLI in both packaging templates)."""

from __future__ import annotations

import pytest

from python_tool_setup_spark.cli import build_parser, main


def test_dry_run_prints_plan(capsys):
    rc = main(
        [
            "--source",
            "s3a://lake/raw/events",
            "--format",
            "json",
            "--database",
            "analytics",
            "--table",
            "events",
            "--target",
            "s3a://lake/silver/events",
            "--mode",
            "merge",
            "--merge-keys",
            "event_id",
            "--partition-by",
            "event_date",
            "--dry-run",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "IngestionPipeline plan:" in out
    assert "merge_keys   : ['event_id']" in out
    assert "table analytics.events (external @ s3a://lake/silver/events)" in out


def test_source_is_required():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--target", "/t"])


def test_mode_choices_are_validated():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--source", "/s", "--mode", "upsert"])


def test_cli_batch_roundtrip(spark, sf_dir, tmp_path):
    """End-to-end: the CLI path (minus its own get_spark) through the
    same IngestionConfig it builds."""
    from python_tool_setup_spark.config import IngestionConfig
    from python_tool_setup_spark.ingestion import make_ingestion
    from python_tool_setup_spark.tables import table_path

    target = str(tmp_path / "cli_rt")
    args = build_parser().parse_args(
        [
            "--source",
            table_path(sf_dir, "region"),
            "--format",
            "parquet",
            "--target",
            target,
            "--mode",
            "overwrite",
        ]
    )
    cfg = IngestionConfig(
        source_path=args.source,
        source_format=args.source_format,
        target_path=args.target,
        write_mode=args.write_mode,
    )
    make_ingestion(spark, cfg).run()
    assert spark.read.parquet(target).count() == 5
