"""LLM-data-pipeline extension queries (dedup, similarity search, text
analysis, multimodal). Populated in the extensions milestone."""
