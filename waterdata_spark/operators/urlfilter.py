"""Domain-blocklist filtering of a crawl corpus — the FIRST stage of the
published curation cascades (RefinedWeb §3.1 drops documents by URL
against blocklists before any content scoring; the public UT1 lists the
paper uses are keyed by registered domain). The reference engine has no
counterpart (its surface is tabular water-data prep,
`down/down_water_prep.py`); X9 corpus-hygiene extension surface.

Matching semantics: a URL is blocked when ANY dot-boundary suffix of its
host equals a blocklist entry — blocklisting ``example.com`` blocks
``a.b.example.com`` but NOT ``notexample.com`` (suffix-CHAIN equality,
not string ``endswith``: the dot-boundary trap every naive
implementation hits).

100 TB shape — the suffix explosion never touches corpus rows:

1. reduce the corpus to DISTINCT HOSTS (one shuffle on the short host
   string; a billion-URL crawl has orders of magnitude fewer hosts);
2. explode each host's suffix chain (fan-out = label count, ~3-5) and
   join the blocklist — the blocklist side BROADCASTS when small
   (counted-and-bounded, shuffle fallback — the lm_perplexity
   contract);
3. join the ≤hosts-sized blocked-host set back to the corpus on the
   host key (broadcast under the same bound, else shuffle).

Text never rides any of these shuffles; everything is JVM expressions
(no UDF). The x27 oracle leg reproduces the suffix-chain match and the
registered-domain rule in DuckDB value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.functions.urls import host_suffixes, url_host
from waterdata_spark.plans import cachereg


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    mode: str = "remove",
    flag_col: str = "url_blocked",
    max_broadcast_rows: int = 10_000_000,
) -> DataFrame:
    """Filter (``mode='remove'``) or audit-flag (``mode='flag'``) corpus
    rows whose URL host falls under any blocklisted domain.

    ``blocklist`` is a one-column frame of lowercase domains
    (``domain_col``) — registered domains in the public lists, but any
    dot-boundary host suffix works. Null/non-URL rows never match (their
    host is null/''). ``mode='flag'`` appends a boolean ``flag_col``
    instead of dropping, the audit form every gate in this engine
    offers."""
    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be 'remove' or 'flag', got {mode!r}")
    host = url_host(F.col(url_col))
    with_host = df.withColumn("__h", host)
    hosts = with_host.select("__h").filter(F.col("__h") != "").distinct()

    bl = blocklist.select(F.col(domain_col).alias("__bd")).distinct()
    bl = cachereg.register("urlfilter.blocklist", bl.persist())
    bl_small = bl.count() <= max_broadcast_rows

    blocked_hosts = (
        hosts.select("__h", F.explode(host_suffixes(F.col("__h"))).alias("__s"))
        .join(F.broadcast(bl) if bl_small else bl, F.col("__s") == F.col("__bd"), "leftsemi")
        .select("__h")
        .distinct()
    )
    blocked_hosts = cachereg.register(
        "urlfilter.blocked_hosts", blocked_hosts.persist()
    )
    bh_small = blocked_hosts.count() <= max_broadcast_rows
    bh = F.broadcast(blocked_hosts) if bh_small else blocked_hosts

    if mode == "remove":
        return with_host.join(bh, "__h", "left_anti").drop("__h")
    flagged = with_host.join(
        bh.withColumn("__blocked", F.lit(True)), "__h", "left"
    )
    return flagged.withColumn(
        flag_col, F.coalesce(F.col("__blocked"), F.lit(False))
    ).drop("__h", "__blocked")
