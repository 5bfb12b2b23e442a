"""Reusable distributed operators (skew handling, top-k)."""

from mapreducecore_spark.operators.skew import salted_aggregate, salted_join  # noqa: F401
from mapreducecore_spark.operators.topk import top_k_per_group  # noqa: F401
