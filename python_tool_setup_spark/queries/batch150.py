"""Round-5 gates, batch 150 (multimodal widening): audio loudness /
clipping audit (q511 — the ingest QA every audio corpus needs
before feature extraction: per clip the true peak, the clipped-
sample rate (samples pinned at int16 full scale), and RMS loudness
— clips with non-trivial clipping are unusable for training and
must be flagged at ingest, not discovered in the loss curve) and
PNG header audit (q512 — dataset curation reads IMAGE METADATA
without decoding pixels: IHDR width/height/bit-depth/color-type
parsed JVM-side with substring/hex/conv expressions over the raw
binaryFile bytes — zero Python in the scan path, which is the
entire point at 100 TB of images).

Multimodal stubbing contract: no audio codec exists in this
container, so the PCM bytes are synthesized deterministically
(q183's waveform, amplified per doc so a known subset clips); the
PNG bytes are REAL files written by the stdlib encoder in
llm/png.py and re-read through binaryFile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import staging_dir
from python_tool_setup_spark.tables import load_table

_PCM_N = 2000
_FS = 32767  # int16 full scale


@register(
    "q511_audio_clipping_audit",
    f"""
    WITH samples AS (
        SELECT doc_id, i.i,
               GREATEST(-32768, LEAST({_FS},
                   ((doc_id * 31 + i.i * 73) % 997 - 498)
                   * (1 + (doc_id % 5) * 20))) AS s
        FROM documents,
             (SELECT unnest(generate_series(0, {_PCM_N - 1})) AS i) i
        WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak,
           CAST(ROUND(SUM(CASE WHEN ABS(s) >= {_FS} THEN 1 ELSE 0
               END) * 1000000.0 / COUNT(*)) AS BIGINT)
               AS clipped_ppm,
           CAST(ROUND(SQRT(SUM(CAST(s AS HUGEINT) * s)
               / ({_PCM_N} * 1.0)) * 1000) AS BIGINT) AS rms_milli,
           MAX(ABS(s)) >= {_FS} AS is_clipped
    FROM samples GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Audio loudness / clipping audit (ingest QA: per clip the "
    "true peak, the rate of samples pinned at int16 full scale, "
    "and RMS loudness — clipped clips must be flagged at ingest, "
    "not discovered in the loss curve): the PCM binary column is "
    "synthesized deterministically (q183's waveform, per-doc gain "
    "1/21/41/61/81 so exactly the gain-81 docs clip), saturated "
    "to int16 like a real ADC, and audited by an Arrow "
    "mapInPandas stage (numpy frombuffer -> peak / clipped count "
    "/ exact integer sum of squares; RMS milli-quantized through "
    "an IEEE-exact SQRT). The oracle regenerates the same "
    "samples arithmetically with LEAST/GREATEST saturation. "
    "Scale: pure map stage, no shuffle — each clip audited where "
    "its bytes live.",
)
def q511_audio_clipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id")
    )

    def synth(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            i = np.arange(_PCM_N)
            out = []
            for k in ids:
                raw = ((k * 31 + i * 73) % 997 - 498) * (
                    1 + (k % 5) * 20
                )
                out.append(
                    np.clip(raw, -32768, _FS)
                    .astype("<i2")
                    .tobytes()
                )
            yield pd.DataFrame({"doc_id": ids, "pcm": out})

    audio = d.mapInPandas(synth, "doc_id long, pcm binary")

    def audit(batches):
        for pdf in batches:
            rows = {
                "doc_id": [],
                "peak": [],
                "clipped_ppm": [],
                "rms_milli": [],
                "is_clipped": [],
            }
            for k, buf in zip(pdf["doc_id"], pdf["pcm"]):
                s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                peak = int(np.max(np.abs(s)))
                clipped = int(np.sum(np.abs(s) >= _FS))
                sumsq = int(np.sum(s * s))
                rows["doc_id"].append(int(k))
                rows["peak"].append(peak)
                rows["clipped_ppm"].append(
                    round(clipped * 1_000_000 / len(s))
                )
                rows["rms_milli"].append(
                    round((sumsq / float(len(s))) ** 0.5 * 1000)
                )
                rows["is_clipped"].append(peak >= _FS)
            yield pd.DataFrame(rows)

    return audio.mapInPandas(
        audit,
        "doc_id long, peak long, clipped_ppm long,"
        " rms_milli long, is_clipped boolean",
    ).orderBy("doc_id")


# ---------------------------------------------------------------- q512
@register(
    "q512_png_header_audit",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 7 AS BIGINT) AS width,
           CAST(FLOOR(LENGTH(text) * 1.0 / (1 + doc_id % 7))
               AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(0 AS BIGINT) AS color_type,
           CAST(1 + doc_id % 7 AS BIGINT)
               * CAST(FLOOR(LENGTH(text) * 1.0 / (1 + doc_id % 7))
                      AS BIGINT) AS n_pixels
    FROM documents WHERE doc_id < 60 ORDER BY doc_id
    """,
    doc="PNG header audit (dataset curation reads image metadata "
    "WITHOUT decoding pixels: IHDR width/height/bit-depth/color-"
    "type live at fixed offsets after the 8-byte signature, so "
    "substring/hex/conv JVM expressions over the raw binaryFile "
    "bytes extract them — zero Python in the scan path, no "
    "inflate, no filter pass; at 100 TB of images this is the "
    "difference between a metadata sweep and a decode job): 60 "
    "REAL grayscale PNGs are written by the stdlib encoder "
    "(llm/png.py, one byte per text character, width 1+doc_id%7) "
    "into a staging dir, re-read via binaryFile, and the header "
    "fields parsed with CONV(HEX(SUBSTRING(content, off, 4)), "
    "16, 10). The oracle derives the expected dimensions "
    "arithmetically from the staging rule — a mismatch means the "
    "encoder, the reader, or the header parse broke.",
)
def q512_png_header_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from python_tool_setup_spark.llm.multimodal import read_media
    from python_tool_setup_spark.llm.png import encode_png

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    media_dir = staging_dir("pngh_")
    for row in d.collect():  # 60 small local files (bounded staging)
        raw = row["text"].encode("utf-8")
        w = 1 + row["doc_id"] % 7
        h = len(raw) // w
        with open(
            os.path.join(media_dir, f"doc_{row['doc_id']}.png"), "wb"
        ) as f:
            f.write(encode_png(w, h, raw[: w * h], channels=1))
    media = read_media(spark, media_dir, glob="*.png")
    # IHDR layout: 8B signature, 4B chunk len, 4B 'IHDR', then
    # width(4) height(4) bit_depth(1) color_type(1) — 1-indexed
    # substring offsets 17, 21, 25, 26.
    be32 = lambda off: F.conv(
        F.hex(F.substring(F.col("content"), off, 4)), 16, 10
    ).cast("long")
    be8 = lambda off: F.conv(
        F.hex(F.substring(F.col("content"), off, 1)), 16, 10
    ).cast("long")
    return (
        media.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.png", 1)
            .cast("long")
            .alias("doc_id"),
            be32(17).alias("width"),
            be32(21).alias("height"),
            be8(25).alias("bit_depth"),
            be8(26).alias("color_type"),
        )
        .withColumn(
            "n_pixels", F.col("width") * F.col("height")
        )
        .orderBy("doc_id")
    )
