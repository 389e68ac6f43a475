"""Query inventory: every operator from SURVEY §2 (op01..op41), the star
ETL + report workload, and the LLM-pipeline extensions — each registered as
an (spark, sf_dir) -> DataFrame callable with (where SQL-expressible) a
matching DuckDB oracle.

Importing this package populates the registry.
"""

from .registry import EngineQuery, all_oracles, all_queries, get, register

# Registration side effects — order groups the inventory logically.
from . import reference_ops  # noqa: E402,F401  ops 01-41
from . import star_etl  # noqa: E402,F401  star-schema pipeline
from . import reports  # noqa: E402,F401  rmd report workload
from . import extensions  # noqa: E402,F401  dedup/similarity/text
from . import events_windows  # noqa: E402,F401  §2.J batch-window surface
from . import io_formats  # noqa: E402,F401  csv/json/orc/partitioned + JSON col
from . import scale_ops  # noqa: E402,F401  skew-proof aggregation + sketches
from . import temporal  # noqa: E402,F401  as-of / interval joins
from . import tfidf  # noqa: E402,F401  tf-idf + text normalization
from . import pipeline  # noqa: E402,F401  composed corpus-cleaning pipeline
from . import analytic_windows  # noqa: E402,F401  ranking/offset windows, semi/anti, HAVING
from . import analytic_stats  # noqa: E402,F401  stats/grouping-sets/unpivot/sample/regex
from . import event_analytics  # noqa: E402,F401  funnel/retention/SCD2
from . import sql_analytics  # noqa: E402,F401  EXISTS/islands/argmax/mode/frames/pivot
from . import corpus_quality  # noqa: E402,F401  repetition/survivors/stratified/quantize/zipf
from . import warehouse_ops  # noqa: E402,F401  merge-upsert/fk-audit/distribution/ewma
from . import advanced_analytics  # noqa: E402,F401  winsorize/corr-OLS/transitions/basket/fuzzy
from . import feature_ops  # noqa: E402,F401  z-score/chi-square/containment
from . import timeseries_ops  # noqa: E402,F401  densify/cumulative/split/scan-metadata
from . import retail_analytics  # noqa: E402,F401  RFM/basket/MAD/BM25/decay
from . import graph_metrics  # noqa: E402,F401  triangles/clustering coefficient
from . import business_audits  # noqa: E402,F401  LTV/Benford/Pareto/seasonality/skyline
from . import tpch_classics  # noqa: E402,F401  Q1/Q5/Q18 OLAP shapes
from . import clustering  # noqa: E402,F401  k-means assignment step
from . import product_analytics  # noqa: E402,F401  stickiness/new-returning/attribution/ABC
from . import charlm  # noqa: E402,F401  char-bigram LM quality scoring
from . import period_comparisons  # noqa: E402,F401  YoY growth + Hamilton allocation
from . import journey_analytics  # noqa: E402,F401  time-to-convert/top-paths/Gini
from . import llm_curation  # noqa: E402,F401  mixture rebalance + decontamination
from . import decomposition  # noqa: E402,F401  seasonal decompose + basket sizes
from . import association_metrics  # noqa: E402,F401  PMI + Spearman rank stability
from . import market_structure  # noqa: E402,F401  purchase cadence + supplier HHI
from . import diagnostics  # noqa: E402,F401  skew audit + forecast backtest
from . import ml_features  # noqa: E402,F401  feature hashing / target encoding / labels
from . import data_quality_rules  # noqa: E402,F401  DQ rule suite + forward fill
from . import composition_metrics  # noqa: E402,F401  share-of-total + entropy
from . import nullsafe_join  # noqa: E402,F401  NULL-keyed dimension lookup
from . import monitoring_ops  # noqa: E402,F401  peak detection + CUSUM drift
from . import collocations  # noqa: E402,F401  token bigrams + rolling corr
from . import weighted_stats  # noqa: E402,F401  weighted median + activity bitmap
from . import tpch_extended  # noqa: E402,F401  Q4/Q6/Q8/Q9/Q11-Q17/Q19-Q22 shapes
from . import semantic_curation  # noqa: E402,F401  SemDeDup + DSIR weighting
from . import hybrid_retrieval  # noqa: E402,F401  RRF lexical+semantic fusion
from . import substring_dedup  # noqa: E402,F401  ExactSubstr span removal
from . import corpus_signals  # noqa: E402,F401  compression ratio + n-gram diversity
from . import repetition_signals  # noqa: E402,F401  Gopher repetition-signal vector
from . import blocklist  # noqa: E402,F401  parameterized blocklist page gate
from . import shard_layout  # noqa: E402,F401  deterministic training-shard layout
from . import corpus_chunking  # noqa: E402,F401  boilerplate lines + CDC chunk dedup
from . import source_overlap  # noqa: E402,F401  cross-source shingle-overlap matrix

__all__ = ["EngineQuery", "register", "get", "all_queries", "all_oracles"]
