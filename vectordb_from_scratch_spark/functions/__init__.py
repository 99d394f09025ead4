from vectordb_from_scratch_spark.functions import linalg, texthash  # noqa: F401
