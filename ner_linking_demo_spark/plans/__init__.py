"""End-to-end pipeline plans + checkpoint/lineage runtime."""
