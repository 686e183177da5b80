"""Extraction rule failure paths + pages determinism (byte-identity is the
north-star per-row invariant; the happy path is covered by the oracle query
`extraction_identity` — here we prove the rule actually FIRES on corruption)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck import build_validator
from sparkcheck.functions.extraction import extract_text, extraction_check
from sparkcheck.model import CustomPandasRule
from sparkcheck.sources.pages import load_pages

from .conftest import SF_SMALL


def test_extraction_rule_fires_on_corrupted_html(spark):
    df = spark.createDataFrame(
        [("u1", "hello world text", bytearray(b"<html><body><p>hello world text</p></body></html>")),
         ("u2", "intact text here", bytearray(b"<html><body><p>TAMPERED</p></body></html>")),
         ("u3", "no paragraph tag", bytearray(b"<html><body>missing</body></html>")),
         ("u4", None, None)],
        "url string, text string, html binary")
    v = (build_validator().input(constraints=[], key_col="url")
         .rule(CustomPandasRule(id="extract-byte-identity",
                                make_check=extraction_check()))
         .provide())
    res = v.validate(df, persist=False)
    verd = {r["url"]: r["success"] for r in res.verdicts.collect()}
    assert verd == {"u1": True, "u2": False, "u3": False, "u4": True}
    msgs = {r["url"]: r["message"] for r in res.violations.collect()}
    assert msgs["u2"] == "extracted text is not byte-identical to source text"


def test_extract_text_handles_edge_bytes(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"<p></p>")),                      # empty text
         (2, bytearray(b"<p>a</p><p>b</p>")),             # first <p>, last </p>
         (3, bytearray("<p>café ∅</p>".encode()))],  # multibyte utf-8
        "id int, html binary")
    got = {r["id"]: r["t"] for r in
           df.select("id", extract_text(F.col("html")).alias("t")).collect()}
    assert got[1] == ""
    assert got[2] == "a</p><p>b"  # greedy: first open, LAST close
    assert got[3] == "café ∅"


def test_pages_derivation_deterministic(spark):
    a = load_pages(spark, SF_SMALL, replicas=3)
    b = load_pages(spark, SF_SMALL, replicas=3)
    ha = a.select(F.sha2(F.concat_ws("|", "url", "lang",
                                     F.col("warc_epoch").cast("string")), 256)
                  .alias("h"))
    hb = b.select(F.sha2(F.concat_ws("|", "url", "lang",
                                     F.col("warc_epoch").cast("string")), 256)
                  .alias("h"))
    assert sorted(r["h"] for r in ha.collect()) == \
        sorted(r["h"] for r in hb.collect())
