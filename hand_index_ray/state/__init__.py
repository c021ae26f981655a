"""Per-partition lineage / checkpoint state (north rule resumability)."""
