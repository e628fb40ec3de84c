"""Sources and sinks: parquet table readers, checkpoint/lineage."""
