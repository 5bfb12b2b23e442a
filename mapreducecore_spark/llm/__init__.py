"""LLM-data-pipeline operator implementations (dedup / similarity /
multimodal). The query registry in queries/llm.py wraps these."""
