from goose_parser_spark.streaming.ingest import stream_extract

__all__ = ["stream_extract"]
