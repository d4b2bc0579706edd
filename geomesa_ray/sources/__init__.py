"""Sources: synthetic pages/polygons generators + parquet helpers."""
