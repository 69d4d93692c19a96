"""DataFrame operators: extraction, linking, canonicalization, materialization,
dedup, similarity, text statistics, graph algorithms."""
