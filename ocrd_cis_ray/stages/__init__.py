"""Batch-transform stages (stateless map_batches UDFs and actor-pool classes)."""
