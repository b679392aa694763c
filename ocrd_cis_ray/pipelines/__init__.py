"""End-to-end pipelines chaining stages over ray.data Datasets."""
