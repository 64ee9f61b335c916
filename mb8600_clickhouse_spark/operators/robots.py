"""robots.txt parsing + URL policy filtering — the crawl-policy step a
responsible web-corpus pipeline runs between WARC ingestion (q149) and
URL curation (q131): drop documents whose URL the host's robots.txt
disallows for the harvesting agent.

Pure Catalyst throughout (split → posexplode → last-seen-group window →
broadcast rule join → longest-match verdict): robots files are small
per host and the rule table is dimension-sized, so the join side
broadcasts and the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots",
    agent: str = "*",
) -> DataFrame:
    """(host, allow, prefix): the Allow/Disallow rules applying to
    ``agent`` with RFC 9309 group precedence — a crawler obeys ONLY the
    most specific matching group, so when a host's robots.txt has a
    group naming ``agent``, its ``*`` group is IGNORED (not merged);
    ``*`` applies only as the fallback. A rule belongs to the most
    recent ``User-agent:`` line above it; rule values take everything
    after the FIRST colon (paths legally contain colons — query
    strings, ports). Empty-path ``Disallow:`` lines (allow-everything)
    are dropped. One window over the exploded LINES of the robots
    files — robots.txt is KB-sized per host, dimension-table work."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "line"),
    ).select("host", "pos", F.trim(F.col("line")).alias("line"))
    low = F.lower(F.col("line"))
    # everything after the FIRST colon (substring_index with -1 would
    # take the text after the LAST colon and truncate '/a:b' to 'b')
    val = F.trim(F.expr("substr(line, instr(line, ':') + 1)"))
    marked = lines.select(
        "host",
        "pos",
        F.when(low.startswith("user-agent:"), F.lower(val)).alias("ua"),
        F.when(low.startswith("disallow:"), F.lit(False))
        .when(low.startswith("allow:"), F.lit(True))
        .alias("allow"),
        val.alias("path"),
    )
    w = W.partitionBy("host").orderBy("pos").rowsBetween(
        W.unboundedPreceding, 0
    )
    grouped = marked.withColumn(
        "group_ua", F.last("ua", ignorenulls=True).over(w)
    )
    rules = grouped.filter(
        F.col("allow").isNotNull()
        & F.col("group_ua").isin(agent.lower(), "*")
    )
    # group presence is decided BEFORE dropping empty-path rules: a
    # named group containing only 'Disallow:' (allow everything) is
    # still the group the crawler must obey — RFC 9309 precedence, the
    # '*' group must NOT leak in just because every named rule was a
    # no-op.
    named = F.max((F.col("group_ua") == agent.lower()).cast("int")).over(
        W.partitionBy("host")
    )
    return (
        rules.withColumn("__has_named", named)
        .filter(
            (F.col("group_ua") == agent.lower())
            | (F.col("__has_named") == 0)
        )
        .filter(F.length("path") > 0)
        .select("host", "allow", F.col("path").alias("prefix"))
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``crawl_allowed``: Google-documented longest-match
    semantics — among the host's rules matching the URL path, the
    LONGEST (raw rule-path length, the spec's specificity measure)
    wins; Allow beats Disallow at equal length; no matching rule means
    allowed. Wildcards per the Google/RFC 9309 spec: ``*`` in a rule
    path matches any character sequence and a TRAILING ``$`` anchors
    the rule to the end of the path (a mid-rule ``$`` is literal);
    rules without either stay on the plain-prefix fast path. The rules
    collapse to ONE broadcast row per host carrying its rule array
    (match regexes precompiled on the dimension-sized rule table), so
    the verdict is a broadcast left join + a per-row higher-order
    fold — the URL corpus never shuffles and never multiplies (no
    per-rule join fan-out, no group-back)."""
    esc = F.regexp_replace("prefix", r"([.\[\]{}()+?^$|\\])", r"\\$1")
    pat = F.regexp_replace(
        F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*")),
        r"\\\$$",
        r"\$",
    )
    wild = F.col("prefix").contains("*") | F.col("prefix").endswith("$")
    per_host = (
        rules.withColumn("pat", pat)
        .withColumn("wild", wild)
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct("prefix", "allow", "pat", "wild")
            ).alias("__rules")
        )
    )
    joined = urls.join(
        F.broadcast(per_host.withColumnRenamed("host", "__r_host")),
        F.col(host_col) == F.col("__r_host"),
        "left",
    )
    matches = F.filter(
        F.col("__rules"),
        lambda r: F.when(
            r["wild"], F.regexp_like(F.col(path_col), r["pat"])
        ).otherwise(F.col(path_col).startswith(r["prefix"])),
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return (
        joined.withColumn(
            "crawl_allowed", F.coalesce(best["a"] == 1, F.lit(True))
        )
        .drop("__r_host", "__rules")
    )
