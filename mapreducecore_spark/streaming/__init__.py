"""Structured Streaming surface: incremental forms of the event
operators (SURVEY §2.D Streaming row). The reference has no streaming
(SURVEY §0); this is north-star scope."""
