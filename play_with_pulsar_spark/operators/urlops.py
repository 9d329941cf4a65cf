"""URL feature extraction and the domain/TLD blocklist screen — the
crawl-METADATA filter every web pipeline runs before it ever reads a
byte of page content (CCNet/RefinedWeb discard by domain reputation,
TLD class, IP-literal hosts and crawler-trap path shapes).

Parsing is REGEX-based on the engine-portable subset (no
backreferences, no lookaround — Java regex and RE2 agree expression
for expression), not a full RFC 3986 parser: crawl URLs are dirty,
and the features screens act on (host, registrable domain, TLD, path
depth, query arity) are exactly the ones a regex subset extracts
deterministically. Everything is whole-stage-codegen column
expressions riding the scan — no shuffle, no Python — and every
expression has a DuckDB twin generated from the same patterns
(``oracle_url_features_sql``), so the whole screen is value-hash
checkable.

Scale shape: the blocklists are literal IN-lists (broadcast-free —
they compile into the row predicate); a million-entry production
blocklist would swap the IN-list for one broadcast join on
``registered_domain`` without touching the feature extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, group) per feature — the single source both engines'
# expressions are generated from. Extraction runs on the LOWERCASED
# url (round 9 — r8 advice: 'HTTP://BLOCKED.COM/' used to parse as
# schemeless with empty host/domain and sail past the blocklist);
# the host additionally strips a userinfo prefix and a :port suffix
# ('http://u:p@blocked.xyz:8080/' screens as blocked.xyz, not as
# 'u' or 'u@blocked.xyz').
_SCHEME_PAT = r"^([a-z][a-z0-9+.-]*)://"
_AUTHORITY_PAT = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
# Greedy to the LAST '@' — URL parsers treat the last '@' in the
# authority as the userinfo delimiter, so 'http://a@b@blocked.com/'
# must resolve host=blocked.com, not 'b@blocked.com' (round-10
# ADVICE: the first-'@' form was exactly the bypass class the
# blocklist screen exists to close). The authority group already
# excludes /?#, so the greedy [^/?#]* backtracks to the final '@'.
_USERINFO_PAT = r"^[^/?#]*@"
_PORT_PAT = r":[0-9]*$"
_PATH_PAT = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_PAT = r"\?([^#]*)"
_DOMAIN_PAT = r"([^.]+\.[^.]+)$"
_TLD_PAT = r"\.([^.]+)$"
_IP_PAT = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (scheme, host, registered_domain, tld, path_depth,
    n_query_params, is_ip_host) columns — pure codegen projections."""
    u = F.lower(F.col(url_col))
    scheme = F.regexp_extract(u, _SCHEME_PAT, 1)
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(u, _AUTHORITY_PAT, 1), _USERINFO_PAT, ""
        ),
        _PORT_PAT,
        "",
    )
    path = F.regexp_extract(u, _PATH_PAT, 1)
    query = F.regexp_extract(u, _QUERY_PAT, 1)
    out = (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn(
            "registered_domain", F.regexp_extract(F.col("host"), _DOMAIN_PAT, 1)
        )
        .withColumn("tld", F.regexp_extract(F.col("host"), _TLD_PAT, 1))
        .withColumn(
            "path_depth",
            F.size(
                F.filter(F.split(path, "/"), lambda x: x != "")
            ).cast("int"),
        )
        .withColumn(
            "n_query_params",
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("int"),
        )
        .withColumn("is_ip_host", F.col("host").rlike(_IP_PAT))
    )
    return out


def url_screen(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: tuple[str, ...] = (),
    blocked_tlds: tuple[str, ...] = ("xyz", "click", "top"),
    max_path_depth: int = 8,
) -> DataFrame:
    """Verdict columns (reject_reason, keep) on top of
    :func:`url_features`. Reason precedence (first match wins, the
    triage-taxonomy discipline): ``ip-host`` (no reputation to check)
    → ``blocked-domain`` → ``blocked-tld`` → ``deep-path`` (crawler
    traps: calendars, faceted search). NULL reason = keep."""
    feats = url_features(df, url_col)
    reason = F.when(F.col("is_ip_host"), F.lit("ip-host"))
    if blocked_domains:
        reason = reason.when(
            F.col("registered_domain").isin(*blocked_domains),
            F.lit("blocked-domain"),
        )
    if blocked_tlds:
        reason = reason.when(
            F.col("tld").isin(*blocked_tlds), F.lit("blocked-tld")
        )
    reason = reason.when(
        F.col("path_depth") > max_path_depth, F.lit("deep-path")
    )
    return feats.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason").isNull()
    )


def oracle_url_features_sql(url: str) -> dict[str, str]:
    """DuckDB expressions per feature, generated from the same
    patterns (regexp_extract group semantics match Java's here — all
    patterns are anchored, single-group, backreference-free)."""
    low = f"lower({url})"
    host = (
        f"regexp_replace(regexp_replace(regexp_extract({low}, "
        f"'{_AUTHORITY_PAT}', 1), '{_USERINFO_PAT}', ''), "
        f"'{_PORT_PAT}', '')"
    )
    path = f"regexp_extract({low}, '{_PATH_PAT}', 1)"
    query = f"regexp_extract({low}, '{_QUERY_PAT}', 1)"
    return {
        "scheme": f"regexp_extract({low}, '{_SCHEME_PAT}', 1)",
        "host": host,
        "registered_domain": f"regexp_extract({host}, '{_DOMAIN_PAT}', 1)",
        "tld": f"regexp_extract({host}, '{_TLD_PAT}', 1)",
        "path_depth": (
            f"CAST(len(list_filter(string_split({path}, '/'), x -> x <> ''))"
            " AS INT)"
        ),
        "n_query_params": (
            f"CAST(CASE WHEN {query} = '' THEN 0 "
            f"ELSE len(string_split({query}, '&')) END AS INT)"
        ),
        "is_ip_host": f"regexp_matches({host}, '{_IP_PAT}')",
    }


def oracle_url_screen_sql(
    url: str,
    blocked_domains: tuple[str, ...] = (),
    blocked_tlds: tuple[str, ...] = ("xyz", "click", "top"),
    max_path_depth: int = 8,
) -> dict[str, str]:
    """DuckDB twin of :func:`url_screen`'s verdict columns."""
    f = oracle_url_features_sql(url)
    clauses = [f"WHEN {f['is_ip_host']} THEN 'ip-host'"]
    if blocked_domains:
        lst = ", ".join(f"'{d}'" for d in blocked_domains)
        clauses.append(
            f"WHEN {f['registered_domain']} IN ({lst}) THEN 'blocked-domain'"
        )
    if blocked_tlds:
        lst = ", ".join(f"'{t}'" for t in blocked_tlds)
        clauses.append(f"WHEN {f['tld']} IN ({lst}) THEN 'blocked-tld'")
    clauses.append(f"WHEN {f['path_depth']} > {max_path_depth} THEN 'deep-path'")
    reason = "CASE " + " ".join(clauses) + " END"
    out = dict(f)
    out["reject_reason"] = reason
    out["keep"] = f"({reason}) IS NULL"
    return out
