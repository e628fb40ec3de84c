"""Logical pipelines (fixed DAGs the reference drives from its CLI),
declared as DataFrame compositions so Catalyst plans them."""
