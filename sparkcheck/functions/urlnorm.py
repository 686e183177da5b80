"""URL normalization — the canonicalization step every crawl pipeline runs
before url-keyed dedup/uniqueness (a case-variant or utm-tagged duplicate
must collide on the SAME key or the salted unique count misses it).

One shared regex formulation rendered for both engines (Spark SQL here,
DuckDB in oracle.url_normalize_sql) so the driver oracle reproduces the
normalization byte-for-byte. All patterns are RE2-safe (no lookaround):

1. strip the fragment            (#.*$)
2. drop utm_* query params       (tracking noise; two passes: mid-list
                                  `utm_x=..&` then trailing `[?&]utm_x=..$`)
3. drop a now-empty '?'          (\\?$)
4. lowercase scheme://host       (authority extracted by regex; the rest of
                                  the url keeps its case — paths are
                                  case-sensitive per RFC 3986, host is not)

Non-URL strings (no scheme://authority prefix) pass through unchanged by
construction: the authority extract is '' and the tail replace removes
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority = scheme://host[:port] — everything before the first /?#
AUTH_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
FRAG_RE = r"#.*$"
UTM_MID_RE = r"utm_[^&#]*&"
UTM_END_RE = r"[?&]utm_[^&#]*$"
EMPTY_Q_RE = r"\?$"


def normalize_url(col) -> Column:
    """The normalization as a pure Spark SQL expression (codegen)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, FRAG_RE, "")
    u = F.regexp_replace(u, UTM_MID_RE, "")
    u = F.regexp_replace(u, UTM_END_RE, "")
    u = F.regexp_replace(u, EMPTY_Q_RE, "")
    auth = F.regexp_extract(u, AUTH_RE, 1)
    rest = F.regexp_replace(u, AUTH_RE, "")
    return F.concat(F.lower(auth), rest)


def normalize_url_sql(expr: str) -> str:
    """The identical normalization in DuckDB SQL (RE2) — shared pattern
    constants, same replace order. DuckDB regexp_replace is FIRST-match by
    default (Spark's replaces all) — the 'g' flag restores parity for the
    multi-param utm pass."""
    u = f"regexp_replace({expr}, '{FRAG_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{UTM_MID_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{UTM_END_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{EMPTY_Q_RE}', '', 'g')"
    return (f"(lower(regexp_extract({u}, '{AUTH_RE}', 1)) || "
            f"regexp_replace({u}, '{AUTH_RE}', '', 'g'))")
