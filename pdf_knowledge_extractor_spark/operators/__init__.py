"""Relational + linking operators (DataFrame-first; Arrow-batched
pandas UDFs only for genuinely non-relational pieces)."""
