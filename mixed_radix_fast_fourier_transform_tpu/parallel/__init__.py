"""Mesh-sharded distributed transforms (new subsystem; the reference is
single-core scalar C with no parallelism of any kind — SURVEY.md §2.3)."""
