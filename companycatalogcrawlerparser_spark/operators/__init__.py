"""Operators: extraction, url-seen dedup, frontier scheduling, dedup
family, similarity search, text quality, multimodal plumbing."""
