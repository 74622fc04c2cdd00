"""Reusable column expressions (JVM-side wherever possible).

Everything here returns pyspark Column objects built from
pyspark.sql.functions — no Python UDFs — so expressions inline into
WholeStageCodegen and vectorize. The pandas-UDF fallbacks live with their
operators, not here.
"""

from spark_ibm_mq_spark.functions.text import (
    STOPWORDS_EN,
    bpe_ish_tokens,
    quality_score,
    tokens,
)
from spark_ibm_mq_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = [
    "STOPWORDS_EN",
    "bpe_ish_tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "quality_score",
    "tokens",
]
