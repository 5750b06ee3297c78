"""Column-expression library: pure pyspark.sql.functions compositions.

Everything here stays JVM-side (whole-stage codegen); no Python UDFs.
Each helper has an exact ANSI-SQL twin runnable by DuckDB so operators built
from them are oracle-checkable (see yaml_pipe_spark.entrypoints).
"""

from yaml_pipe_spark.functions.hashing import (
    hash_embedding,
    hex_pair_to_int,
    md5_seeded,
    sha256_text,
)
from yaml_pipe_spark.functions.text import (
    non_empty,
    normalize_lines,
    token_count,
    tokens,
)
from yaml_pipe_spark.functions.vectors import cosine, dot, l2_norm_sq

__all__ = [
    "hash_embedding",
    "hex_pair_to_int",
    "md5_seeded",
    "sha256_text",
    "non_empty",
    "normalize_lines",
    "token_count",
    "tokens",
    "cosine",
    "dot",
    "l2_norm_sq",
]
