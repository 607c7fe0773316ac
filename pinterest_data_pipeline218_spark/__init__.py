"""pinterest_data_pipeline218_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (loudingspace/pinterest-data-pipeline218):
three correlated record streams (pin / geo / user) cleaned by a shared
combinator library and analyzed by eight declared queries (T4..T11), plus the
operators a large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

Everything is the DataFrame / Spark SQL / Structured Streaming API: logical
plans are declared, Catalyst + Tungsten choose the physical strategy. Python
UDFs never appear on a hot path; where Python is unavoidable (multimodal
decode) it's Arrow-batched `mapInPandas`.

Layout:
  session.py    SparkSession factory tuned for the target (AQE, shuffle sizing)
  data.py       testdata loaders + temp-view registration
  schemas.py    explicit StructTypes for the pin/geo/user contract
  sources/      batch readers (json/csv/parquet/jdbc) + seeded synthetic generator
  functions/    column-level function libraries (cleaning, text, vectors)
  operators/    DataFrame->DataFrame operators (analytics, dedup, similarity, ...)
  plans/        end-to-end declared queries over the TPC-H-ish testdata
  streaming/    Structured Streaming: blob source, cleaning pipeline, sinks
"""

__version__ = "0.1.0"
