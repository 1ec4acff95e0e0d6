"""pycasselastic_spark — a PySpark-native analytics/sync engine.

Re-expresses the capabilities of the reference sync daemon
(AdrianoW/PyCassElastic, surveyed in SURVEY.md) as lazy
DataFrame -> DataFrame operators, and extends the surface with
relational, streaming, and LLM-data-pipeline operators designed for
cluster scale.

Layout:
    core/       sync semantics: incremental scans, LWW merge, schema
                alignment, scalar conversions, sync-spec config
    operators/  relational & pipeline operators: top-k, as-of join,
                dedup (exact/minhash/simhash), similarity search,
                multimodal column plumbing
    functions/  scalar/column function suites (text analysis, conversions)
    sources/    source/sink registry (parquet/csv/json/jdbc; Cassandra &
                Elasticsearch adapters behind import-guards)
    plans/      plan-inspection helpers (pushdown/broadcast assertions)
    streaming/  Structured Streaming pipelines (windowed aggs, foreachBatch)
    pipeline/   batch sync-cycle orchestration (the reference's run())
"""

__version__ = "0.1.0"
