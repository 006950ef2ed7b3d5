"""Sitemap XML extraction — Spark's built-in XPath surface, JVM-side.

Beyond-reference capability (the reference ships no crawl logic):
after robots.txt (`robots.py`), the second discovery input of a crawl
pipeline is the XML sitemap — `<urlset>` documents listing `<url>`
entries with `<loc>`, `<lastmod>`, `<changefreq>`, `<priority>`.
Extraction is relational: one row per URL with its metadata, ready to
join against the frontier.

Spark-first design: the sitemap TEXT is synthesized per document with
JVM built-ins (transform over a sequence + array_join — interpreted
higher-order functions, but once per DOCUMENT, not per URL), and the
extraction uses Spark's BUILT-IN XPath expression family
(`xpath(xml, '/urlset/url/loc/text()')` → array<string>), zipped and
exploded into rows. No Python executes anywhere in this query — the
XML parse runs inside the JVM via the Hive-compatible XPath
expressions that ship with Spark SQL, a surface no other query in
this repo exercises yet.

Profile notes (documented, matching the public sitemap.org schema):
the fixture omits the `xmlns` declaration — XPath 1.0 default-
namespace handling varies across engines and the Hive-compatible
expressions match local names against the literal path; real-world
extraction over namespaced sitemaps would strip the declaration
first (one regexp_replace), which is the documented production recipe.

Oracle strategy: DuckDB rebuilds the same (doc, i) grid with
`unnest(range(...))` and computes every column as a closed form —
so the XPath extraction must agree row-for-row, value-for-value with
an engine that never parses XML at all.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_docs_spread, load_table


def _sitemap_xml() -> F.Column:
    """1 + doc_id%5 `<url>` entries, every field a closed form."""
    return F.expr(
        """
        concat(
          '<urlset>',
          array_join(
            transform(sequence(0, doc_id % 5), i -> concat(
              '<url>',
              '<loc>https://ex-', CAST(doc_id % 10 AS STRING),
                '.example.com/p/', CAST(doc_id AS STRING), '/',
                CAST(i AS STRING), '</loc>',
              '<lastmod>2026-0', CAST(1 + (doc_id + i) % 9 AS STRING),
                '-15</lastmod>',
              '<priority>0.', CAST((doc_id + i) % 10 AS STRING),
                '</priority>',
              '</url>'
            )), ''
          ),
          '</urlset>'
        )
        """
    )


def sitemap_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → synthesized sitemap XML → built-in XPath extraction
    → one row per (document, url). Columns: asset_id, loc, lastmod,
    priority.

    The synthesis transforms and the per-document JVM XPath parse are
    the expensive narrow work here; the doc_id-only core-spread (r13,
    guide §2.5 input-skew fix — the local corpus is ONE parquet
    split, which pins the whole parse chain to a single task) is the
    same treatment every Python walker input gets."""
    docs = load_docs_spread(spark, sf_dir, "doc_id")
    xml = docs.select(
        F.col("doc_id").alias("asset_id"),
        _sitemap_xml().alias("xml"),
    )
    # ONE xpath call = ONE XML parse per document: '/urlset/url/*' text
    # nodes arrive in document order as a flat (loc, lastmod, priority)
    # triple per url — three separate xpath calls would re-parse the
    # same XML three times (measured ~3× the parse cost).
    cols = xml.select(
        "asset_id",
        F.expr("xpath(xml, '/urlset/url/*/text()')").alias("vals"),
    )
    return (
        cols.select(
            "asset_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(vals) div 3 - 1), i -> "
                    "struct(vals[i*3] AS loc, vals[i*3+1] AS lastmod, "
                    "vals[i*3+2] AS priority))"
                )
            ).alias("u"),
        )
        .select(
            "asset_id",
            F.col("u.loc").alias("loc"),
            F.col("u.lastmod").alias("lastmod"),
            F.col("u.priority").alias("priority"),
        )
        # sequence(0, -1) DESCENDS ([0, -1]) — an empty urlset would
        # otherwise emit two all-null rows (ADVICE r12); real rows
        # always carry a loc, so null-loc ⇔ the empty-vals artifact.
        .filter(F.col("loc").isNotNull())
    )


SITEMAP_SQL = """
SELECT doc_id AS asset_id,
       'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
           || '/' || i AS loc,
       '2026-0' || (1 + (doc_id + i) % 9) || '-15' AS lastmod,
       '0.' || ((doc_id + i) % 10) AS priority
FROM documents, unnest(range(0, doc_id % 5 + 1)) AS t(i)
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Two-level discovery: <sitemapindex> → child sitemaps (sitemap.org).
# Real sites publish an INDEX whose <sitemap><loc> entries point at
# child urlset files; discovery is index parse → child fetch → child
# parse. Both parses here are real JVM XPath; the child "fetch" is a
# closed-form synthesis from the child URL's own identity (the only
# information a real crawler has at that point is the loc it just
# extracted — everything downstream derives from it, not from doc_id
# smuggled around the parse).


def _sitemap_index_xml() -> F.Column:
    """1 + doc_id%3 `<sitemap>` children, every field a closed form."""
    return F.expr(
        """
        concat(
          '<sitemapindex>',
          array_join(
            transform(sequence(0, doc_id % 3), s -> concat(
              '<sitemap>',
              '<loc>https://ex-', CAST(doc_id % 10 AS STRING),
                '.example.com/sm/', CAST(doc_id AS STRING), '/',
                CAST(s AS STRING), '.xml</loc>',
              '<lastmod>2026-0', CAST(1 + (doc_id + s) % 9 AS STRING),
                '-01</lastmod>',
              '</sitemap>'
            )), ''
          ),
          '</sitemapindex>'
        )
        """
    )


def _nested_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level discovery frame: index parse → child identity
    from the extracted loc alone → child urlset parse. Columns:
    asset_id, sitemap_loc, loc, priority. doc_id-only core-spread:
    both XPath layers are narrow per-row JVM work (see
    sitemap_url_extract)."""
    docs = load_docs_spread(spark, sf_dir, "doc_id")
    idx = docs.select(
        F.col("doc_id").alias("asset_id"),
        _sitemap_index_xml().alias("xml"),
    )
    children = (
        idx.select(
            "asset_id",
            F.explode(
                F.expr("xpath(xml, '/sitemapindex/sitemap/loc/text()')")
            ).alias("sitemap_loc"),
        )
        # a real crawler knows only the child URL it just extracted —
        # re-derive the child's identity from the loc, not from doc_id
        .withColumn(
            "sm_doc",
            F.regexp_extract("sitemap_loc", r"/sm/(\d+)/", 1).cast("long"),
        )
        .withColumn(
            "s",
            F.regexp_extract("sitemap_loc", r"/(\d+)\.xml$", 1).cast("int"),
        )
    )
    child_xml = F.expr(
        """
        concat(
          '<urlset>',
          array_join(
            transform(sequence(0, (sm_doc + s) % 4), u -> concat(
              '<url>',
              '<loc>https://ex-', CAST(sm_doc % 10 AS STRING),
                '.example.com/p/', CAST(sm_doc AS STRING), '/',
                CAST(s AS STRING), '/', CAST(u AS STRING), '</loc>',
              '<priority>0.', CAST((sm_doc + s + u) % 10 AS STRING),
                '</priority>',
              '</url>'
            )), ''
          ),
          '</urlset>'
        )
        """
    )
    return (
        children.withColumn("cxml", child_xml)
        .select(
            "asset_id",
            "sitemap_loc",
            F.expr("xpath(cxml, '/urlset/url/*/text()')").alias("vals"),
        )
        .select(
            "asset_id",
            "sitemap_loc",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(vals) div 2 - 1), i -> "
                    "struct(vals[i*2] AS loc, vals[i*2+1] AS priority))"
                )
            ).alias("u"),
        )
        .select(
            "asset_id",
            "sitemap_loc",
            F.col("u.loc").alias("loc"),
            F.col("u.priority").alias("priority"),
        )
        # sequence(0, -1) empty-vals guard (ADVICE r12)
        .filter(F.col("loc").isNotNull())
    )


def sitemap_index_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<sitemapindex> two-level discovery: one row per (document,
    child sitemap, url). Both XML layers are parsed with the built-in
    JVM XPath — no Python anywhere in the plan."""
    return _nested_urls(spark, sf_dir)


def robots_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL discovery chain as real crawlers run it — entry point
    robots.txt: `Sitemap:` directives (RFC 9309 §2.3 non-group lines)
    are regexp-extracted from each host's robots text, each points at
    the host's `<sitemapindex>`, whose children are the per-section
    urlsets — three layers (robots parse → index XPath → urlset
    XPath), all JVM built-ins. One row per (document, sitemap index,
    child sitemap, url). doc_id-only core-spread: three narrow parse
    layers (see sitemap_url_extract)."""
    docs = load_docs_spread(spark, sf_dir, "doc_id")
    d = F.col("doc_id")
    # robots.txt with a group (ignored here) and the Sitemap directive
    robots = docs.select(
        d.alias("asset_id"),
        F.concat_ws(
            "\n",
            F.lit("User-agent: *"),
            F.concat(F.lit("Disallow: /tmp-"), (d % 7).cast("string")),
            F.concat(
                F.lit("Sitemap: https://ex-"), (d % 10).cast("string"),
                F.lit(".example.com/sm/"), d.cast("string"),
                F.lit("/index.xml"),
            ),
        ).alias("robots_txt"),
    )
    # Sitemap: lines live OUTSIDE groups — a line-wise regexp extract,
    # case-insensitive key per the RFC's record grammar
    idx_locs = (
        robots.select(
            "asset_id",
            F.explode(F.split("robots_txt", "\n")).alias("line"),
        )
        .select(
            "asset_id",
            F.regexp_extract(
                "line", r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1
            ).alias("index_loc"),
        )
        .where(F.col("index_loc") != "")
        # the crawler only has the URL it extracted: identity from loc
        .withColumn(
            "sm_doc",
            F.regexp_extract("index_loc", r"/sm/(\d+)/", 1).cast("long"),
        )
    )
    # fetch+parse the index this loc names (closed-form synthesis of
    # the SAME _sitemap_index_xml document, from sm_doc)
    idx_xml = F.expr(
        """
        concat(
          '<sitemapindex>',
          array_join(
            transform(sequence(0, sm_doc % 3), s -> concat(
              '<sitemap>',
              '<loc>https://ex-', CAST(sm_doc % 10 AS STRING),
                '.example.com/sm/', CAST(sm_doc AS STRING), '/',
                CAST(s AS STRING), '.xml</loc>',
              '<lastmod>2026-0', CAST(1 + (sm_doc + s) % 9 AS STRING),
                '-01</lastmod>',
              '</sitemap>'
            )), ''
          ),
          '</sitemapindex>'
        )
        """
    )
    children = (
        idx_locs.withColumn("ixml", idx_xml)
        .select(
            "asset_id",
            "index_loc",
            F.explode(
                F.expr("xpath(ixml, '/sitemapindex/sitemap/loc/text()')")
            ).alias("sitemap_loc"),
        )
        .withColumn(
            "sm_doc",
            F.regexp_extract("sitemap_loc", r"/sm/(\d+)/", 1).cast("long"),
        )
        .withColumn(
            "s",
            F.regexp_extract("sitemap_loc", r"/(\d+)\.xml$", 1).cast("int"),
        )
    )
    child_xml = F.expr(
        """
        concat(
          '<urlset>',
          array_join(
            transform(sequence(0, (sm_doc + s) % 4), u -> concat(
              '<url>',
              '<loc>https://ex-', CAST(sm_doc % 10 AS STRING),
                '.example.com/p/', CAST(sm_doc AS STRING), '/',
                CAST(s AS STRING), '/', CAST(u AS STRING), '</loc>',
              '<priority>0.', CAST((sm_doc + s + u) % 10 AS STRING),
                '</priority>',
              '</url>'
            )), ''
          ),
          '</urlset>'
        )
        """
    )
    return (
        children.withColumn("cxml", child_xml)
        .select(
            "asset_id",
            "index_loc",
            "sitemap_loc",
            F.expr("xpath(cxml, '/urlset/url/loc/text()')").alias("vals"),
        )
        .select(
            "asset_id",
            "index_loc",
            "sitemap_loc",
            F.explode("vals").alias("loc"),
        )
    )


# closed forms over the two-level grid: 1 + doc%3 children, each with
# 1 + (doc+s)%4 urls; lateral unnests rebuild the same grid.
SITEMAP_INDEX_SQL = """
SELECT doc_id AS asset_id,
       'https://ex-' || (doc_id % 10) || '.example.com/sm/' || doc_id
           || '/' || s || '.xml' AS sitemap_loc,
       'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
           || '/' || s || '/' || u AS loc,
       '0.' || ((doc_id + s + u) % 10) AS priority
FROM documents,
     unnest(range(0, doc_id % 3 + 1)) AS ts(s),
     unnest(range(0, (doc_id + s) % 4 + 1)) AS tu(u)
ORDER BY 1, 2, 3
"""


# same two-level grid, entered via the robots.txt Sitemap directive
ROBOTS_SITEMAP_SQL = """
SELECT doc_id AS asset_id,
       'https://ex-' || (doc_id % 10) || '.example.com/sm/' || doc_id
           || '/index.xml' AS index_loc,
       'https://ex-' || (doc_id % 10) || '.example.com/sm/' || doc_id
           || '/' || s || '.xml' AS sitemap_loc,
       'https://ex-' || (doc_id % 10) || '.example.com/p/' || doc_id
           || '/' || s || '/' || u AS loc
FROM documents,
     unnest(range(0, doc_id % 3 + 1)) AS ts(s),
     unnest(range(0, (doc_id + s) % 4 + 1)) AS tu(u)
ORDER BY 1, 3, 4
"""


QUERIES = {
    "sitemap_url_extract": sitemap_url_extract,
    "sitemap_index_discovery": sitemap_index_discovery,
    "robots_sitemap_discovery": robots_sitemap_discovery,
}

ORACLES = {
    "sitemap_url_extract": SITEMAP_SQL,
    "sitemap_index_discovery": SITEMAP_INDEX_SQL,
    "robots_sitemap_discovery": ROBOTS_SITEMAP_SQL,
}
