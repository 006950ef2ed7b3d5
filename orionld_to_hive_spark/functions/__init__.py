from orionld_to_hive_spark.functions.numeric import davg, dsum  # noqa: F401
