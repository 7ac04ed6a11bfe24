"""End-to-end pipeline drivers (stage DAG, lineage, resume)."""
