"""robots.txt parsing and URL admission — crawl etiquette at corpus scale.

A Common-Crawl-style corpus builder must be able to re-apply robots rules
to an already-fetched corpus (rules change; takedown sweeps re-run against
the CURRENT robots state). This module parses per-host robots.txt payloads
into a rule table and filters a URL corpus against it with the documented
Google/RFC 9309 semantics for the parts it implements:

* only ``User-agent: *`` groups are honored (corpus builders identify as
  generic crawlers; per-agent targeting is out of scope and documented);
* ``Disallow:`` / ``Allow:`` values are PATH PREFIXES; an empty
  ``Disallow:`` allows everything;
* the LONGEST matching prefix wins; on a length tie, Allow wins
  (least-restrictive tie-break — RFC 9309 §2.2.2);
* a host with no robots.txt (or one that parses to no rules) allows all.

No wildcard (*, $) support — documented simplification: wildcard rules
are skipped rather than misapplied, which can only under-block, and the
skip is visible in the rule table (`skipped_wildcards` in parse stats
would be the production extension).

Reference basis: CloudDQ has no crawl layer; north-star scope from the
webtext brief (same family as hosts.drop_blocklisted / html_meta's
robots_noindex — this is the fetch-time contract, those are content-time).

Scale shape: robots.txt tables are HOST-cardinality (~10^8 at crawl
scale), orders smaller than the corpus. Parsing is one narrow Arrow pass
over that small table; admission is one equi-join of the corpus against
the rule table on host (AQE promotes the rule side to broadcast when it
fits — never forced) followed by a bounded-key window over MATCHED
(url, rule) candidates only — urls on hosts without rules never enter
the window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, StringType, StructField,
                               StructType)

from cloud_data_quality_spark.functions.hosts import url_host

RULES_SCHEMA = StructType([
    StructField("host", StringType(), False),
    StructField("allow", BooleanType(), False),
    StructField("path_prefix", StringType(), False),
])


def parse_robots_txt(txt: str) -> list[tuple[bool, str]]:
    """(allow, path_prefix) rules from the ``User-agent: *`` groups of one
    robots.txt body. Comments (#) stripped, group structure per RFC 9309
    (consecutive User-agent lines share the following rule block),
    wildcard rules skipped, empty Disallow ignored (it means allow-all)."""
    rules: list[tuple[bool, str]] = []
    active = False          # current group applies to *
    in_agent_run = False    # inside a run of consecutive User-agent lines
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                active = False
                in_agent_run = True
            if value == "*":
                active = True
            continue
        in_agent_run = False
        if not active or field not in ("allow", "disallow"):
            continue
        if not value:
            continue            # empty Disallow == allow everything
        if "*" in value or "$" in value:
            continue            # documented wildcard skip
        rules.append((field == "allow", value))
    return rules


def robots_rules(
    robots_df: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Parse a (host, robots_txt) table into (host, allow, path_prefix)
    rows — one narrow Arrow pass over the host-cardinality table."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, allows, prefixes = [], [], []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                if host is None:
                    continue
                for allow, prefix in parse_robots_txt(txt):
                    hosts.append(host)
                    allows.append(allow)
                    prefixes.append(prefix)
            yield pd.DataFrame({"host": hosts, "allow": allows,
                                "path_prefix": prefixes})

    return robots_df.select(host_col, txt_col).mapInPandas(
        stage, RULES_SCHEMA)


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rows of ``df`` whose URL the rule table admits. Longest-prefix-
    match, Allow wins length ties, unmatched/ruleless hosts pass.

    One host equi-join (rule side host-cardinality, AQE-broadcastable) +
    one bounded-key window over matched candidates only."""
    from pyspark.sql.window import Window
    host = url_host(F.col(url_col))
    rest = F.regexp_replace(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    path = F.when(F.length(rest) == 0, F.lit("/")) \
        .otherwise(F.substring_index(rest, "?", 1))
    keyed = df.withColumn("__host", host).withColumn("__path", path)
    cand = (keyed.select(url_col, "__host", "__path")
            .join(rules.withColumnRenamed("host", "__host"), "__host")
            .where(F.col("__path").startswith(F.col("path_prefix"))))
    w = Window.partitionBy(url_col).orderBy(
        F.length("path_prefix").desc(), F.col("allow").desc())
    blocked = (cand.withColumn("__r", F.row_number().over(w))
               .where((F.col("__r") == 1) & (~F.col("allow")))
               .select(url_col))
    return (keyed.join(blocked, url_col, "left_anti")
            .drop("__host", "__path"))
