"""The UDTF chunker (row-at-a-time extension surface) must emit exactly the
rows of the declarative chunk_documents operator (JVM sequence/slice)."""

from vectordb_from_scratch_spark.operators.textstats import (
    chunk_documents,
    chunker_udtf,
)
from vectordb_from_scratch_spark.session import load_table


def test_udtf_chunker_matches_declarative(spark, sf_small):
    spark.udtf.register("chunker", chunker_udtf())
    load_table(spark, sf_small, "documents").createOrReplaceTempView("docs_v")
    via_udtf = spark.sql(
        "SELECT doc_id, c.chunk_seq, c.chunk_text, c.n_tokens "
        "FROM docs_v, LATERAL chunker(text) AS c"
    )
    declarative = chunk_documents(spark, sf_small)
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, declarative.collect())
    )
