"""Column-expression and UDF library.

Everything here prefers built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd); pandas UDFs appear only for genuinely non-relational
kernels (dense-vector cosine, Jaro-Winkler, dependency-path walks).
"""
