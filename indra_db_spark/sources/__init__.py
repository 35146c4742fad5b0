from indra_db_spark.sources.lake import load_table, load_tables, TABLES  # noqa: F401
