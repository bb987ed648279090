"""Host-side utilities: metric aggregation, pair manifests, logging, checkpoint
conversion."""
