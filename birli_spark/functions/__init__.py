from birli_spark.functions import complex  # noqa: F401
