"""Sitemap extraction units: the JVM XPath result pinned against
stdlib ElementTree as an independent XML implementation, and the
closed-form grid."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.sitemap import (
    _sitemap_xml,
    sitemap_url_extract,
)
from orionld_to_hive_spark.sources.warehouse import load_table

SF = "/root/testdata/sf0.001"


def test_xpath_matches_elementtree(spark):
    xmls = (
        load_table(spark, SF, "documents")
        .select(F.col("doc_id"), _sitemap_xml().alias("xml"))
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    rows = sitemap_url_extract(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.asset_id, []).append(r)
    for x in xmls:
        root = ET.fromstring(x.xml)
        assert root.tag == "urlset"
        expected = sorted(
            (
                u.findtext("loc"),
                u.findtext("lastmod"),
                u.findtext("priority"),
            )
            for u in root.findall("url")
        )
        actual = sorted(
            (r.loc, r.lastmod, r.priority) for r in by_doc[x.doc_id]
        )
        assert actual == expected, x.doc_id


def test_grid_shape(spark):
    rows = sitemap_url_extract(spark, SF).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r.asset_id] = per_doc.get(r.asset_id, 0) + 1
        assert r.loc.startswith(f"https://ex-{r.asset_id % 10}.example.com/p/")
    for d, n in per_doc.items():
        assert n == 1 + d % 5


def test_index_discovery_two_level_grid(spark):
    """sitemapindex → child sitemaps → urls: the (s, u) fan-out and
    every loc's identity derive from the child URL alone."""
    from orionld_to_hive_spark.operators.sitemap import (
        sitemap_index_discovery,
    )

    rows = sitemap_index_discovery(spark, SF).collect()
    assert rows
    per_doc: dict[int, set] = {}
    for r in rows:
        d = r.asset_id
        per_doc.setdefault(d, set()).add(r.sitemap_loc)
        assert r.sitemap_loc.startswith(
            f"https://ex-{d % 10}.example.com/sm/{d}/"
        )
        assert r.loc.startswith(f"https://ex-{d % 10}.example.com/p/{d}/")
    for d, sms in per_doc.items():
        assert len(sms) == 1 + d % 3, d  # children per index
    # per (doc, s): 1 + (d+s)%4 urls
    cnt: dict[tuple, int] = {}
    for r in rows:
        s = int(r.sitemap_loc.rsplit("/", 1)[1].split(".")[0])
        cnt[(r.asset_id, s)] = cnt.get((r.asset_id, s), 0) + 1
    for (d, s), n in cnt.items():
        assert n == 1 + (d + s) % 4, (d, s)


def test_robots_sitemap_discovery_matches_index_discovery(spark):
    """Entering via the robots.txt Sitemap directive discovers exactly
    the URL set the direct index walk discovers."""
    from orionld_to_hive_spark.operators.sitemap import (
        robots_sitemap_discovery,
        sitemap_index_discovery,
    )

    via_robots = {
        (r.asset_id, r.sitemap_loc, r.loc)
        for r in robots_sitemap_discovery(spark, SF).collect()
    }
    direct = {
        (r.asset_id, r.sitemap_loc, r.loc)
        for r in sitemap_index_discovery(spark, SF).collect()
    }
    assert via_robots == direct


def test_empty_urlset_emits_no_rows(spark):
    """ADVICE r12: sequence(0, -1) DESCENDS — an empty <urlset> must
    not leak two all-null rows through the stride-3 transform."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "<urlset></urlset>"),
         (2, "<urlset><url><loc>https://h/x</loc><lastmod>l</lastmod>"
             "<priority>0.5</priority></url></urlset>")],
        "asset_id LONG, xml STRING",
    )
    out = (
        df.select(
            "asset_id",
            F.expr("xpath(xml, '/urlset/url/*/text()')").alias("vals"),
        )
        .select(
            "asset_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(vals) div 3 - 1), i -> "
                    "struct(vals[i*3] AS loc, vals[i*3+1] AS lastmod, "
                    "vals[i*3+2] AS priority))"
                )
            ).alias("u"),
        )
        .select("asset_id", "u.loc", "u.lastmod", "u.priority")
        .filter(F.col("loc").isNotNull())
        .collect()
    )
    assert [(r.asset_id, r.loc) for r in out] == [(2, "https://h/x")]
