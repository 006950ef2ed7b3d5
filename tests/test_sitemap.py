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
