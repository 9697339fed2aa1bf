"""PySpark-native analytics engine with the query/data-processing
capabilities of the DIPA collaborative IDS reference
(benk125/DIPA-Collaborative-Pulsar-IDPS).

The reference is a streaming log-analytics pipeline (SDN flow telemetry →
rate/bias detection → Pulsar collaboration). This engine re-expresses that
capability surface Spark-first:

- ``session``    — SparkSession factory (AQE, tuned shuffle, UTC).
- ``tables``     — canonical loaders for the relational test tables.
- ``config``     — detection thresholds (all constants cited to the reference).
- ``operators``  — counter deltas, detection spine, windows, set ops, top-k,
                   as-of/range joins.
- ``functions``  — scalar/text/dedup/similarity function library.
- ``queries``    — the declared relational query surface (each entry maps to a
                   SURVEY.md §2 operator row and has a DuckDB oracle).
- ``streaming``  — Structured Streaming sources, stateful alert machine,
                   EP1/EP2/EP3 pipeline composition.
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions).
"""

__version__ = "0.1.0"
