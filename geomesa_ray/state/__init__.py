"""Checkpoint / lineage state."""
