"""Composed Ray Data pipelines: ingest, scans, joins, tiles, kNN."""
