"""Function library: text analysis, tokenization, hashing helpers."""
