"""film_media_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo Hari3008/Film-Media-ETL (an R-based
star-schema ETL + BI workload), extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    session     — SparkSession factory (AQE, shuffle sizing, Arrow)
    sources     — parquet/JDBC readers + view registration
    functions   — scalar expression library (dates, money, text, vectors)
    operators   — composite relational operators (dedup, similarity, top-k,
                  pivot, rollup, NULL-tolerant lookup joins)
    etl         — star-schema pipeline (dims + fact builders)
    queries     — the full SURVEY §2 operator inventory + report workload +
                  extensions, each as (spark, sf_dir) -> DataFrame with a
                  matching DuckDB oracle SQL string
    streaming   — structured-streaming operators + batch-mode equivalents
    plans       — explain/plan-inspection helpers
"""

__version__ = "0.1.0"
