"""Non-parquet sources and sinks (GENESIS cube text parser, NDJSON docs)."""
