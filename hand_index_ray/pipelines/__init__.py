"""End-to-end Ray Data pipelines (build / query / dedup / ann / text)."""
