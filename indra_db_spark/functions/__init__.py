from indra_db_spark.functions.decimals import dec, dsum, davg, drevenue  # noqa: F401
