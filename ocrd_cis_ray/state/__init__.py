"""Per-partition lineage / checkpoint manifests for resumable runs."""
