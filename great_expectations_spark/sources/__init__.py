"""Batch acquisition: readers, splitters, samplers.

Mirrors the reference's batch-acquisition surface (SURVEY.md §2.1–2.2):
``BatchSpec``-driven readers (great_expectations/execution_engine/
sparkdf_execution_engine.py::get_batch_data_and_markers), data splitters
(great_expectations/execution_engine/split_and_sample/
sparkdf_data_splitter.py) and samplers (…/sparkdf_data_sampler.py) —
re-expressed as pure DataFrame transformations so every split/sample
predicate stays inside Catalyst and prunes partitions / pushes down to the
scan.
"""

from great_expectations_spark.sources.batch import BatchSpec, read_batch
from great_expectations_spark.sources import splitters, samplers

__all__ = ["BatchSpec", "read_batch", "splitters", "samplers"]
