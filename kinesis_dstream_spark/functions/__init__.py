"""Column-level function library (JVM-side expressions preferred).

- ``vectors`` — dot/norm/cosine over ``array<float|double>`` columns built
  from higher-order functions (zip_with/aggregate), plus an Arrow-batched
  pandas-UDF fast path for hot loops.
- ``textfns`` — tokenization, shingling, hashing helpers shared by the
  dedup/text operators.
"""
