"""Plan-level utilities: stage checkpointing, lineage manifests, metrics."""
