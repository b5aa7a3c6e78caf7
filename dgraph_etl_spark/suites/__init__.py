"""Named-query suites: each module registers (spark fn, DuckDB oracle)
pairs into dgraph_etl_spark.registry. Import order is irrelevant;
registry._load_suites imports them all."""
