"""Sources / sinks: pruned parquet readers, corpus synthesis, media codec."""
