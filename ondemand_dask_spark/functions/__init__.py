"""Reusable column-expression builders (§2.H/§2.K building blocks).

Everything here returns / composes `pyspark.sql.Column` expressions —
pure JVM-side, codegen-friendly, no Python UDFs.  The query modules
compose these; they are equally the public helpers an application
would import.
"""

from ondemand_dask_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from ondemand_dask_spark.functions.texthash import (  # noqa: F401
    MH_A,
    MH_B,
    MH_PRIME,
    portable_hash64,
    rolling_fingerprint,
    shingles,
)
