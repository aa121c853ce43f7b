"""Reusable large-scale operators: dedup, similarity, multimodal."""
