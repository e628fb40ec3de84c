"""Scalar / per-document functions (JVM column expressions first;
Arrow-batched pandas UDFs only where column exprs genuinely can't
express the semantics, e.g. NFKC normalization)."""
