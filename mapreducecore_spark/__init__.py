"""mapreducecore_spark — a PySpark-native analytics engine.

Brand-new engine with the data-processing capabilities of the reference
MapReduce framework (JasperWoo/MapReduceCore, a C++11 master/worker
MapReduce per /root/reference/src/), re-expressed Spark-first:

- the reference's map/reduce contract (`mr_task_factory.h:14-43`) becomes a
  thin typed layer over RDD/DataFrame primitives (`mapreduce.py`),
- its runtime (sharding `file_shard.h`, shuffle `mr_tasks.h:43-63`,
  scheduling `master.h`) is replaced wholesale by Spark's scheduler,
- the relational / streaming / LLM-pipeline surface (SURVEY.md §2.D) is
  declared with the DataFrame API so Catalyst owns the physical plan.

Nothing in this package is a translation of the reference's C++; citations
in docstrings identify which reference *semantics* each piece reproduces.
"""

__version__ = "0.1.0"

from mapreducecore_spark.session import get_spark  # noqa: F401
from mapreducecore_spark.catalog import load_tables, TABLES  # noqa: F401
