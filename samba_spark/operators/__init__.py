"""Operators: the provenance-wrapped relational surface (Layer A wrapper
over Layer B) plus the large-scale extension operators (dedup, similarity
search, text analysis, multimodal)."""
