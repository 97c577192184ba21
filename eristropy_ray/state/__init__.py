"""Checkpoint manifest + lineage/metrics sidecars."""
