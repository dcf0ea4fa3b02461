"""finance_pipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capability surface of
``gervais-amoah/finance_pipeline`` (multi-source forex ETL: CSV window
loads, REST ingestion, HTML-scrape ingestion, idempotent keyed loads,
incremental watermark sync, ordered inspection queries), built
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, plus a
scale tier the reference lacks (grouped/window aggregation, streaming
windows, dedup families, similarity search, text analysis, multimodal
column plumbing) designed for 100 TB / multi-executor operation while
tested on local[N].

Layout:
    session.py        SparkSession factory (UTC, AQE, Arrow)
    registry.py       query registry powering __spark_entry__ and bench
    schemas.py        explicit StructTypes (forex tables, natural keys)
    operators/        oracle-checked query implementations (SURVEY.md §2)
    sources/          csv / rest-json / html-scrape connectors
    sinks/            idempotent keyed writer, csv sinks, REST sink
    pipelines/        api / csv / scrape pipelines + sync + orchestrator
    alerting.py       SMTP admin alerts (env-gated, injectable transport)
    logging_utils.py  structured step logging
"""

__version__ = "0.1.0"
