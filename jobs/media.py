#!/usr/bin/env python
"""spark-submit entrypoint for the multimodal media pipeline.

The media-side counterpart of jobs/extract.py: run one of the media
operators over a table carrying a ``binary`` payload column and write
the result — the pre-decode filter / fingerprint / provenance passes
a 100 TB multimodal corpus runs before any training::

    spark-submit --py-files goose_parser_spark.zip jobs/media.py \\
        --op probe|phash|frames|audio|exif|id3 \\
        --input  /path/to/table --output /path/to/output \\
        [--payload-col payload] [--id-col doc_id] \\
        [--every 1]            # frames: sample every k-th frame \\
        [--frame 400]          # audio: samples per feature frame \\
        [--min-width 0 --min-height 0 --max-duration-ms 0]

Ops map 1:1 to ops/multimodal.py (probe → media_probe, phash →
phash_image, frames → video_frames, audio → audio_features, exif →
exif_metadata, id3 → id3_metadata). The ``--min-*`` /
``--max-duration-ms`` knobs apply AFTER a probe op as plain
DataFrame filters — the LAION-style size/length gate expressed
declaratively so Catalyst handles it. Every op is a map-only
Arrow-batched plan: payload bytes never shuffle.
"""

from __future__ import annotations

import argparse


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="goose-spark media job")
    p.add_argument("--op", required=True,
                   choices=["probe", "phash", "frames", "audio",
                            "exif", "id3"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--input-format", default="parquet")
    p.add_argument("--format", default="parquet")
    p.add_argument("--payload-col", default="payload")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--every", type=int, default=1,
                   help="frames: sample every k-th frame")
    p.add_argument("--frame", type=int, default=400,
                   help="audio: samples per feature frame")
    p.add_argument("--min-width", type=int, default=0,
                   help="probe: drop rows below this width")
    p.add_argument("--min-height", type=int, default=0)
    p.add_argument("--max-duration-ms", type=int, default=0,
                   help="probe: drop rows above this duration")
    return p.parse_args(argv)


def run_op(df, args):
    """Build the result DataFrame for the chosen op (separated from
    main() so tests can drive it without spark-submit)."""
    from goose_parser_spark.ops import multimodal as mm

    kw = {"payload_col": args.payload_col, "id_col": args.id_col}
    if args.op == "probe":
        out = mm.media_probe(df, **kw)
        if args.min_width:
            out = out.filter(f"width >= {int(args.min_width)}")
        if args.min_height:
            out = out.filter(f"height >= {int(args.min_height)}")
        if args.max_duration_ms:
            out = out.filter(
                f"duration_ms <= {int(args.max_duration_ms)}")
        return out
    if args.op == "phash":
        return mm.phash_image(df, **kw)
    if args.op == "frames":
        return mm.video_frames(df, every=args.every, **kw)
    if args.op == "audio":
        return mm.audio_features(df, frame=args.frame, **kw)
    if args.op == "exif":
        return mm.exif_metadata(df, **kw)
    return mm.id3_metadata(df, **kw)


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from goose_parser_spark.deploy import ship_package

    args = parse_args(argv)
    spark = (
        SparkSession.builder.appName(f"goose-spark-media-{args.op}")
        .config("spark.sql.adaptive.enabled", "true")
        # multi-MB media blobs: bound the Arrow batch size the same
        # way the extraction job bounds html batches
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
    ship_package(spark)
    df = (spark.read.format(args.input_format).load(args.input)
          if args.input_format != "iceberg"
          else spark.read.table(args.input))
    out = run_op(df, args)
    writer = out.write.mode("overwrite")
    if args.format == "iceberg":
        writer.saveAsTable(args.output)
    else:
        writer.format(args.format).save(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
