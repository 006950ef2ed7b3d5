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

from orionld_to_hive_spark.sources.warehouse import load_table


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
    priority."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
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
        .orderBy("asset_id", "loc")
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


QUERIES = {"sitemap_url_extract": sitemap_url_extract}

ORACLES = {"sitemap_url_extract": SITEMAP_SQL}
