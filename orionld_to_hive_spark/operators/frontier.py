"""Crawl-frontier scheduling — discovery → robots gate → politeness slots.

Beyond-reference capability: the third stage of the crawl-planning
story this repo now tells end-to-end — `sitemap.py` discovers URLs
(JVM XPath), `robots.py` evaluates exclusion rules (LIKE-translated
longest-match), and this operator turns the surviving URLs into a
fetch schedule: per-HOST politeness slots (one fetch per host per
delay window — the invariant every polite crawler enforces) assigned
by rank over crawl priority.

Spark-first design: the whole pipeline is one relational plan —
the sitemap XML parse (built-in XPath), path extraction
(regexp_extract), the robots gate as an anti-join against a
closed-form per-doc rule frame matched with the SAME LIKE translation
`robots.py` uses, and the politeness assignment as a row_number
window PARTITIONED BY HOST. The host partition is the real scale
story: a frontier shards by host so each host's queue is one
partition's sequential scan, and skewed hosts are exactly the skewed
keys AQE's skew-join/salting machinery exists for.

Oracle strategy: DuckDB rebuilds the URL grid and rule outcomes as
closed forms (the blocked i-slots fall out of the fixture arithmetic)
and runs an independent row_number over the same (host, priority,
loc) order — so the XPath parse, LIKE gate, and window rank must all
agree with an engine that derives the schedule from arithmetic alone.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.sitemap import _sitemap_xml
from orionld_to_hive_spark.sources.warehouse import load_docs_spread, load_table

_POLITENESS_MS = 500  # one fetch per host per half-second


def discovered_allowed_urls(docs: DataFrame) -> DataFrame:
    """The discovery + gate lineage over a (doc_id) frame: sitemap
    XPath extraction → host/path split → robots anti-join. Shared by
    the batch query and `streaming/frontier.py` (ONE lineage — stream
    and batch cannot drift). Columns: asset_id, loc, priority, host,
    path."""
    xml = docs.select(
        F.col("doc_id").alias("asset_id"),
        _sitemap_xml().alias("xml"),
    )
    # one xpath call = one XML parse (the sitemap.py optimization):
    # '/urlset/url/*' text nodes are (loc, lastmod, priority) triples
    urls = (
        xml.select(
            "asset_id",
            F.expr("xpath(xml, '/urlset/url/*/text()')").alias("vals"),
        )
        .select(
            "asset_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(vals) div 3 - 1), i -> "
                    "struct(vals[i*3] AS loc, vals[i*3+2] AS priority))"
                )
            ).alias("u"),
        )
        .select(
            "asset_id",
            F.col("u.loc").alias("loc"),
            F.col("u.priority").alias("priority"),
        )
        # guard the sequence(0, -1) empty-vals artifact (ADVICE r12;
        # see sitemap.py — real rows always carry a loc)
        .filter(F.col("loc").isNotNull())
        .withColumn("host", F.regexp_extract("loc", r"^https://([^/]+)/", 1))
        .withColumn("path", F.regexp_extract("loc", r"^https://[^/]+(/.*)$", 1))
    )

    # robots gate: per-doc closed-form rules (a literal-prefix disallow
    # on the i=2 slot and a $-anchored one on i=4), matched by the SAME
    # LIKE translation robots.py uses, removed via anti-join.
    d = F.col("doc_id")
    rules = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.explode(
            F.array(
                F.concat(F.lit("/p/"), d.cast("string"), F.lit("/2")),
                F.concat(F.lit("/p/"), d.cast("string"), F.lit("/4$")),
            )
        ).alias("pattern"),
    )
    return urls.join(
        rules,
        (urls.asset_id == rules.asset_id)
        & F.expr(
            "path LIKE (CASE WHEN pattern LIKE '%$' "
            "THEN translate(substring(pattern, 1, length(pattern) - 1), '*', '%') "
            "ELSE translate(pattern, '*', '%') || '%' END)"
        ),
        "left_anti",
    )


def rank_schedule(allowed: DataFrame) -> DataFrame:
    """The politeness ranking over an allowed-URL frame: per-host
    row_number, fixed slot width. Shared with the streaming twin."""
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("loc").asc()
    )
    return (
        allowed.withColumn("slot", F.row_number().over(w))
        .withColumn(
            "fetch_offset_ms",
            ((F.col("slot") - 1) * _POLITENESS_MS).cast("long"),
        )
        .select("host", "loc", "priority", "slot", "fetch_offset_ms")
    )


def crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap URLs → robots gate → per-host politeness schedule.
    Columns: host, loc, priority, slot (1-based rank in the host's
    queue), fetch_offset_ms ((slot-1) × 500). doc_id-only
    core-spread for the narrow XPath/synthesis chain feeding the
    host-window shuffle (r13; see sitemap.sitemap_url_extract)."""
    docs = load_docs_spread(spark, sf_dir, "doc_id")
    return rank_schedule(discovered_allowed_urls(docs))


# closed forms: the grid minus i=2 and i=4 (the two rule outcomes);
# rank over the identical (host, priority desc, loc) order.
FRONTIER_SQL = """
WITH urls AS (
    SELECT 'ex-' || (doc_id % 10) || '.example.com' AS host,
           'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
               || '/' || i AS loc,
           '0.' || ((doc_id + i) % 10) AS priority
    FROM documents, unnest(range(0, doc_id % 5 + 1)) AS t(i)
    WHERE i <> 2 AND i <> 4
),
ranked AS (
    SELECT host, loc, priority,
           CAST(row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, loc ASC
           ) AS INTEGER) AS slot
    FROM urls
)
SELECT host, loc, priority, slot,
       CAST((slot - 1) * 500 AS BIGINT) AS fetch_offset_ms
FROM ranked
ORDER BY host, slot
"""


def frontier_from_sitemap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier fed by TWO-LEVEL discovery (sitemap.org
    `<sitemapindex>` → child sitemaps, `sitemap._nested_urls`) — the
    format real sites actually publish. The robots gate here is
    host-keyed (as real robots.txt is): every host disallows
    `/p/*/1$`, matched with the same LIKE translation `robots.py`
    uses, anti-joined against a 10-row broadcastable rule frame.
    Columns: host, loc, priority, slot, fetch_offset_ms."""
    from orionld_to_hive_spark.operators.sitemap import _nested_urls

    urls = (
        _nested_urls(spark, sf_dir)
        .withColumn("host", F.regexp_extract("loc", r"^https://([^/]+)/", 1))
        .withColumn("path", F.regexp_extract("loc", r"^https://[^/]+(/.*)$", 1))
    )
    # the per-host rule frame comes from the host universe, not from a
    # second run of the two-level XML discovery lineage
    rules = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("ex-"), (F.col("doc_id") % 10).cast("string"),
                F.lit(".example.com"),
            ).alias("host")
        )
        .distinct()
        .select("host", F.lit("/p/*/1$").alias("pattern"))
    )
    allowed = urls.join(
        F.broadcast(rules),
        (urls.host == rules.host)
        & F.expr(
            "path LIKE (CASE WHEN pattern LIKE '%$' "
            "THEN translate(substring(pattern, 1, length(pattern) - 1), '*', '%') "
            "ELSE translate(pattern, '*', '%') || '%' END)"
        ),
        "left_anti",
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("loc").asc()
    )
    return (
        allowed.withColumn("slot", F.row_number().over(w))
        .withColumn(
            "fetch_offset_ms",
            ((F.col("slot") - 1) * _POLITENESS_MS).cast("long"),
        )
        .select("host", "loc", "priority", "slot", "fetch_offset_ms")
    )


# closed forms: the two-level grid minus u=1 (the host rule's only
# match — u is the path's last segment); identical rank order.
FRONTIER_NESTED_SQL = """
WITH urls AS (
    SELECT 'ex-' || (doc_id % 10) || '.example.com' AS host,
           'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
               || '/' || s || '/' || u AS loc,
           '0.' || ((doc_id + s + u) % 10) AS priority
    FROM documents,
         unnest(range(0, doc_id % 3 + 1)) AS ts(s),
         unnest(range(0, (doc_id + s) % 4 + 1)) AS tu(u)
    WHERE u <> 1
),
ranked AS (
    SELECT host, loc, priority,
           CAST(row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, loc ASC
           ) AS INTEGER) AS slot
    FROM urls
)
SELECT host, loc, priority, slot,
       CAST((slot - 1) * 500 AS BIGINT) AS fetch_offset_ms
FROM ranked
ORDER BY host, slot
"""


def frontier_crawl_delay_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The politeness schedule honoring each host's `Crawl-delay`
    directive (the de-facto extension Bing/Yandex honor) instead of a
    fixed slot width: the delay is regexp-extracted from the host's
    robots text, aggregated per host, and the fetch offset becomes
    (slot-1) × delay × 1000 ms. Columns: host, loc, priority, slot,
    crawl_delay_s, fetch_offset_ms. doc_id-only core-spread (r13;
    see sitemap.sitemap_url_extract)."""
    docs = load_docs_spread(spark, sf_dir, "doc_id")
    d = F.col("doc_id")
    robots = docs.select(
        d.alias("asset_id"),
        F.concat_ws(
            "\n",
            F.lit("User-agent: *"),
            F.concat(F.lit("Crawl-delay: "),
                     (1 + (d % 10) % 4).cast("string")),
            F.concat(F.lit("Disallow: /p/"), d.cast("string"), F.lit("/2")),
        ).alias("robots_txt"),
        F.concat(F.lit("ex-"), (d % 10).cast("string"),
                 F.lit(".example.com")).alias("host"),
    )
    delays = (
        robots.select(
            "host",
            F.regexp_extract(
                "robots_txt", r"(?i)crawl-delay\s*:\s*(\d+)", 1
            ).cast("int").alias("crawl_delay_s"),
        )
        .groupBy("host")
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
    )

    xml = docs.select(
        F.col("doc_id").alias("asset_id"), _sitemap_xml().alias("xml")
    )
    urls = (
        xml.select(
            "asset_id",
            F.expr("xpath(xml, '/urlset/url/*/text()')").alias("vals"),
        )
        .select(
            "asset_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(vals) div 3 - 1), i -> "
                    "struct(vals[i*3] AS loc, vals[i*3+2] AS priority))"
                )
            ).alias("u"),
        )
        .select("asset_id", F.col("u.loc").alias("loc"),
                F.col("u.priority").alias("priority"))
        .filter(F.col("loc").isNotNull())
        .withColumn("host", F.regexp_extract("loc", r"^https://([^/]+)/", 1))
        .withColumn("path", F.regexp_extract("loc", r"^https://[^/]+(/.*)$", 1))
    )
    rules = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(F.lit("/p/"), d.cast("string"), F.lit("/2")).alias("pattern"),
    )
    allowed = urls.join(
        rules,
        (urls.asset_id == rules.asset_id)
        & F.expr("path LIKE translate(pattern, '*', '%') || '%'"),
        "left_anti",
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("loc").asc()
    )
    return (
        allowed.withColumn("slot", F.row_number().over(w))
        .join(F.broadcast(delays), "host")
        .withColumn(
            "fetch_offset_ms",
            ((F.col("slot") - 1) * F.col("crawl_delay_s") * 1000).cast("long"),
        )
        .select("host", "loc", "priority", "slot", "crawl_delay_s",
                "fetch_offset_ms")
    )


# closed forms: grid minus i=2; per-host delay = 1 + (host digit)%4
# (every doc on a host agrees, so the max-aggregate is the constant).
FRONTIER_DELAY_SQL = """
WITH urls AS (
    SELECT 'ex-' || (doc_id % 10) || '.example.com' AS host,
           'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
               || '/' || i AS loc,
           '0.' || ((doc_id + i) % 10) AS priority,
           CAST(1 + (doc_id % 10) % 4 AS INTEGER) AS crawl_delay_s
    FROM documents, unnest(range(0, doc_id % 5 + 1)) AS t(i)
    WHERE i <> 2
),
ranked AS (
    SELECT host, loc, priority, crawl_delay_s,
           CAST(row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, loc ASC
           ) AS INTEGER) AS slot
    FROM urls
)
SELECT host, loc, priority, slot, crawl_delay_s,
       CAST((slot - 1) * crawl_delay_s * 1000 AS BIGINT) AS fetch_offset_ms
FROM ranked
ORDER BY host, slot
"""


QUERIES = {
    "crawl_frontier_schedule": crawl_frontier_schedule,
    "frontier_from_sitemap_index": frontier_from_sitemap_index,
    "frontier_crawl_delay_schedule": frontier_crawl_delay_schedule,
}

ORACLES = {
    "crawl_frontier_schedule": FRONTIER_SQL,
    "frontier_from_sitemap_index": FRONTIER_NESTED_SQL,
    "frontier_crawl_delay_schedule": FRONTIER_DELAY_SQL,
}
