"""Source/sink connectors (parquet, csv, jsonl, text, inline rows)."""
