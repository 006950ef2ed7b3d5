"""robots.txt parsing + allow/deny evaluation — RFC 9309, JVM-side.

Beyond-reference capability (the reference ships no crawl logic): the
FIRST gate of every production crawl/training-data pipeline is the
robots exclusion protocol — parse each host's robots.txt, select the
group whose user-agent token matches the crawler, and evaluate every
candidate URL path against the group's Allow/Disallow rules with the
RFC's longest-match-wins, allow-breaks-ties precedence.

Two implementations, pinning each other:

  - `parse_robots` / `select_rules` / `robots_allowed`: a
    spec-complete single-node reference (wildcard `*`, end-anchor
    `$`, most-specific user-agent selection, longest-octet-match
    precedence) used by the units, including the RFC 9309 §2.2.2 /
    §5 style examples.
  - `robots_gate_report`: the DISTRIBUTED evaluator. The robots.txt
    TEXT is synthesized per document with pure JVM built-ins, then
    parsed with built-ins only — split/posexplode into lines,
    regexp_extract key/value, a lag-window group segmentation
    (consecutive User-agent lines open one group), group selection
    by agent token, LIKE-translated pattern matching, and a
    row_number window for the longest-match/allow-ties precedence.
    No Python runs per row: the whole evaluation is Catalyst-visible
    and shuffles only on the (doc, path) precedence window.

100 TB posture: robots evaluation is a broadcast-shaped problem —
rules-per-host is tiny while URLs-per-host is huge; expressing the
match as relational joins + windows (instead of a per-row UDF that
re-parses the file) lets AQE pick broadcast or shuffle per skew, and
the parse itself is amortized once per host row, not once per URL.

Oracle strategy: DuckDB rebuilds the same closed-form rule and path
sets from `documents` and runs an INDEPENDENT longest-match
implementation (correlated UNION/LIKE/row_number SQL) — a genuine
differential test of the precedence semantics, while the Spark side
additionally round-trips through real robots.txt text parsing.
"""
from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table


class RobotsGroup(NamedTuple):
    agents: list[str]  # lowercased user-agent product tokens
    rules: list[tuple[str, str]]  # (kind 'allow'|'disallow', pattern)


def parse_robots(text: str) -> list[RobotsGroup]:
    """Line-oriented parse per RFC 9309 §2.2: `key: value` records,
    `#` comments, keys case-insensitive; consecutive User-agent lines
    open ONE group; Allow/Disallow before any User-agent line are
    ignored (no group to attach to); empty patterns are no-ops."""
    groups: list[RobotsGroup] = []
    open_agents: list[str] | None = None  # collecting consecutive UA lines
    current: RobotsGroup | None = None
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if open_agents is None:
                open_agents = []
                current = None
            open_agents.append(value.lower())
            continue
        if key in ("allow", "disallow"):
            if open_agents is not None:
                current = RobotsGroup(open_agents, [])
                groups.append(current)
                open_agents = None
            if current is not None and value:
                current.rules.append((key, value))
        # sitemap / crawl-delay / unknown keys: ignored (they do not
        # close a group per the RFC's record grammar)
    if open_agents is not None:  # trailing agent-only group, no rules
        groups.append(RobotsGroup(open_agents, []))
    return groups


def select_rules(groups: list[RobotsGroup], ua: str) -> list[tuple[str, str]]:
    """Most-specific user-agent selection: the group whose agent token
    is the LONGEST case-insensitive prefix of the product token wins;
    `*` groups apply only when no named group matches. All groups
    sharing the winning token are merged (RFC 9309 §2.2.1)."""
    ua = ua.lower()
    best_len = -1
    for g in groups:
        for a in g.agents:
            if a != "*" and ua.startswith(a) and len(a) > best_len:
                best_len = len(a)
    rules: list[tuple[str, str]] = []
    if best_len >= 0:
        winners = {
            a for g in groups for a in g.agents
            if a != "*" and ua.startswith(a) and len(a) == best_len
        }
        for g in groups:
            if winners & set(g.agents):
                rules.extend(g.rules)
    else:
        for g in groups:
            if "*" in g.agents:
                rules.extend(g.rules)
    return rules


def _match(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3 path matching: the pattern must match a prefix
    of the path; `*` matches any run of octets; a trailing `$` anchors
    the pattern at the end of the path."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(seg) for seg in pattern.split("*"))
    return re.match(rx + ("$" if anchored else ""), path) is not None


def robots_allowed(rules: list[tuple[str, str]], path: str) -> tuple[bool, str | None]:
    """Longest-octet match wins; allow breaks ties (then pattern order,
    for determinism); no match → allowed. Returns (allowed, pattern)."""
    best: tuple[int, str, str] | None = None  # (-len, kind, pattern)
    for kind, pattern in rules:
        if _match(pattern, path):
            key = (-len(pattern), kind, pattern)  # 'allow' < 'disallow'
            if best is None or key < best:
                best = key
    if best is None:
        return True, None
    return best[1] == "allow", best[2]


# --------------------------------------------------------------------------
# Distributed evaluator

_UA = "gptbot"


def _robots_text() -> F.Column:
    """Synthesize the per-document robots.txt with JVM built-ins:
    even doc_ids get a gptbot-specific group ABOVE the `*` group (the
    selected group must then exclude the `*` rules); concat_ws skips
    the NULL lines of the odd-id branch."""
    d = F.col("doc_id")
    a = (d % 5).cast("string")
    b = (d % 7).cast("string")
    c = (d % 3).cast("string")
    even = (d % 2) == 0
    return F.concat_ws(
        "\n",
        F.concat(F.lit("# synthetic robots for doc "), d.cast("string")),
        F.when(even, F.lit("User-agent: gptbot")),
        F.when(even, F.concat(F.lit("Disallow: /private-"), a, F.lit("/"))),
        F.when(even, F.concat(F.lit("Allow: /private-"), a, F.lit("/pub"))),
        F.lit("User-agent: *"),
        F.concat(F.lit("Disallow: /tmp-"), b),
        F.concat(F.lit("Allow: /tmp-"), b, F.lit("/keep")),
        F.lit("Disallow: /data/*.bin"),
        F.concat(F.lit("Disallow: /exact-"), c, F.lit("$")),
    )


def _paths() -> F.Column:
    d = F.col("doc_id")
    a = (d % 5).cast("string")
    b = (d % 7).cast("string")
    c = (d % 3).cast("string")
    return F.array(
        F.concat(F.lit("/tmp-"), b, F.lit("/keep/x")),
        F.concat(F.lit("/tmp-"), b, F.lit("/old")),
        F.concat(F.lit("/data/f"), (d % 4).cast("string"), F.lit(".bin")),
        F.concat(F.lit("/private-"), a, F.lit("/pub/x")),
        F.concat(F.lit("/private-"), a, F.lit("/secret")),
        F.concat(F.lit("/exact-"), c),
    )


def robots_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → per-doc robots.txt text → built-in-only parse →
    group selection for UA 'gptbot' → longest-match evaluation of six
    candidate paths. Columns: asset_id, path, allowed, rule (the
    matched pattern, NULL when no rule matched)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        F.col("doc_id").alias("asset_id"),
        _robots_text().alias("robots_txt"),
        _paths().alias("cand"),
    )
    return _distributed_gate(base, _UA)


def _distributed_gate(base: DataFrame, ua: str) -> DataFrame:
    """The distributed evaluator: `base` carries (asset_id,
    robots_txt, cand array<string>); output is one verdict row per
    (asset_id, path). Group selection is RFC 9309 §2.2.1 complete
    (ADVICE r12): the winning user-agent token is the LONGEST
    case-insensitive prefix of the product token, ALL groups sharing
    that token merge, and `*` groups apply only when no named token
    matches — the same semantics `select_rules` implements
    single-node.

    Shuffle-free form (r14 second pass, guide §2.4 "remove shuffles
    outright"): every step — parse, group segmentation, group
    selection, longest-match precedence — is keyed by asset_id alone,
    so the whole verdict is computable inside ONE projection with
    array higher-order functions; the only Generate is the final
    per-path explode the output shape declares. The r13 join/window
    form (kept verbatim below as `_distributed_gate_joins`, the
    equivalence twin) hash-partitioned the rules-per-host metadata
    ~10× (2 window sorts + 6 joins + 2 aggregations); this form is
    scan → project → explode with zero Exchange nodes at any scale.
    Semantics pinned three ways in tests/test_robots.py: against the
    twin on the corpus, against the twin on adversarial grammars, and
    (via the twin's own pin) against the single-node reference
    `select_rules`."""
    ua = ua.lower()

    # ---- parse: lines → ordered (key, value) records (same regexes
    # as the twin, applied per array element instead of per exploded
    # row)
    stripped = F.transform(
        F.split(F.col("robots_txt"), "\n"),
        lambda l: F.trim(F.regexp_replace(l, "#.*$", "")),
    )
    recs = F.filter(
        F.transform(
            stripped,
            lambda l: F.struct(
                F.lower(
                    F.trim(F.regexp_extract(l, r"^([^:]+):", 1))
                ).alias("key"),
                F.trim(F.regexp_extract(l, r"^[^:]+:(.*)$", 1)).alias(
                    "value"
                ),
                l.contains(":").alias("rec"),
            ),
        ),
        lambda s: s["rec"]
        & s["key"].isin("user-agent", "allow", "disallow"),
    )

    # ---- group segmentation: consecutive user-agent lines open ONE
    # group (gid 0 = "before any group": never selectable, exactly
    # the twin's sum-of-group-starts semantics)
    def _step(acc, s):
        gid = F.when(
            (s["key"] == "user-agent") & (acc["prev"] != "user-agent"),
            acc["gid"] + 1,
        ).otherwise(acc["gid"])
        return F.struct(
            gid.alias("gid"),
            s["key"].alias("prev"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        s["key"].alias("key"),
                        s["value"].alias("value"),
                        gid.alias("gid"),
                    )
                ),
            ).alias("out"),
        )

    segs = F.aggregate(
        recs,
        F.struct(
            F.lit(0).alias("gid"),
            F.lit("").alias("prev"),
            F.array()
            .cast("array<struct<key:string,value:string,gid:int>>")
            .alias("out"),
        ),
        _step,
        lambda acc: acc["out"],
    )

    df = (
        base.select("asset_id", "cand", segs.alias("segs"))
        .withColumn(
            "agents",
            F.filter("segs", lambda s: s["key"] == "user-agent"),
        )
        .withColumn(
            "named",
            F.filter(
                "agents",
                lambda s: (F.lower(s["value"]) != "*")
                & F.lit(ua).startswith(F.lower(s["value"])),
            ),
        )
        .withColumn(
            "best_len",
            F.array_max(
                F.transform("named", lambda s: F.length(s["value"]))
            ),
        )
        .withColumn(
            "chosen",
            F.when(
                F.col("best_len").isNotNull(),
                F.transform(
                    F.filter(
                        "named",
                        lambda s: F.length(s["value"])
                        == F.col("best_len"),
                    ),
                    lambda s: s["gid"],
                ),
            ).otherwise(
                F.transform(
                    F.filter(
                        "agents", lambda s: F.lower(s["value"]) == "*"
                    ),
                    lambda s: s["gid"],
                )
            ),
        )
        # active rules with their LIKE translation resolved once per
        # rule (same CASE the twin applies per joined row)
        .withColumn(
            "rules",
            F.transform(
                F.filter(
                    "segs",
                    lambda s: (s["key"] != "user-agent")
                    & (s["value"] != "")
                    & F.array_contains(F.col("chosen"), s["gid"]),
                ),
                lambda s: F.struct(
                    s["key"].alias("kind"),
                    s["value"].alias("pattern"),
                    F.when(
                        s["value"].endswith("$"),
                        F.translate(
                            s["value"].substr(
                                F.lit(1), F.length(s["value"]) - 1
                            ),
                            "*",
                            "%",
                        ),
                    )
                    .otherwise(
                        F.concat(
                            F.translate(s["value"], "*", "%"), F.lit("%")
                        )
                    )
                    .alias("lpat"),
                ),
            ),
        )
    )

    # ---- per path: longest pattern wins, allow breaks ties, then
    # pattern asc — the twin's row_number(rn=1) as an array argmin
    nullrule = F.lit(None).cast(
        "struct<kind:string,pattern:string,lpat:string>"
    )
    best = F.aggregate(
        F.filter("rules", lambda r: F.like(F.col("path"), r["lpat"])),
        nullrule,
        lambda b, r: F.when(b.isNull(), r)
        .when(F.length(r["pattern"]) > F.length(b["pattern"]), r)
        .when(
            (F.length(r["pattern"]) == F.length(b["pattern"]))
            & (r["kind"] < b["kind"]),
            r,
        )
        .when(
            (F.length(r["pattern"]) == F.length(b["pattern"]))
            & (r["kind"] == b["kind"])
            & (r["pattern"] < b["pattern"]),
            r,
        )
        .otherwise(b),
    )
    return df.select(
        "asset_id", "rules", F.explode("cand").alias("path")
    ).select(
        "asset_id",
        "path",
        F.coalesce(best["kind"] == F.lit("allow"), F.lit(True)).alias(
            "allowed"
        ),
        best["pattern"].alias("rule"),
    )


def _distributed_gate_joins(base: DataFrame, ua: str) -> DataFrame:
    """The r13 join/window evaluator — RETAINED as the equivalence
    twin of the HOF form above (it is the shape the oracle SQL
    mirrors and the one `test_distributed_matches_reference` was
    originally written against); no query path consumes it."""
    ua = ua.lower()

    # ---- parse: lines → (key, value) records with positions
    lines = base.select(
        "asset_id",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias("pos", "line"),
    ).select(
        "asset_id",
        "pos",
        F.trim(F.regexp_replace(F.col("line"), "#.*$", "")).alias("line"),
    ).where(F.col("line").contains(":")).select(
        "asset_id",
        "pos",
        F.lower(F.trim(F.regexp_extract(F.col("line"), r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract(F.col("line"), r"^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))

    # ---- group segmentation: consecutive user-agent lines open ONE group
    w = Window.partitionBy("asset_id").orderBy("pos")
    seg = lines.withColumn(
        "group_start",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("group_id", F.sum("group_start").over(w))
    # four downstream consumers (agents → named/best_len/star, rules)
    # re-executed the parse + window lineage each; the segmented-line
    # frame is rules-per-host-sized (metadata, not corpus), so cache
    # it once per query evaluation (r13)
    seg = seg.persist()

    agents = (
        seg.where(F.col("key") == "user-agent")
        .select("asset_id", "group_id", F.lower(F.col("value")).alias("agent"))
    )
    rules = (
        seg.where(F.col("key") != "user-agent")
        .where(F.col("value") != "")
        .select("asset_id", "group_id", F.col("key").alias("kind"),
                F.col("value").alias("pattern"))
    )

    # ---- group selection: longest-prefix token wins, ALL groups
    # sharing it merge; '*' only when no named token matches
    named = agents.where(
        (F.col("agent") != "*") & F.lit(ua).startswith(F.col("agent"))
    )
    best_len = named.groupBy("asset_id").agg(
        F.max(F.length("agent")).alias("best_len")
    )
    named_groups = (
        named.join(best_len, "asset_id")
        .where(F.length("agent") == F.col("best_len"))
        .select("asset_id", "group_id")
        .distinct()
    )
    star_groups = (
        agents.where(F.col("agent") == "*")
        .select("asset_id", "group_id")
        .distinct()
        .join(named_groups.select("asset_id").distinct(), "asset_id", "left_anti")
    )
    chosen = named_groups.unionByName(star_groups)
    active = rules.join(chosen, ["asset_id", "group_id"])

    # ---- candidate paths
    paths = base.select("asset_id", F.explode("cand").alias("path"))

    # ---- LIKE-translated RFC matching: '*' → '%', trailing '$' anchors
    hits = paths.join(active, "asset_id").where(
        F.expr(
            "path LIKE (CASE WHEN pattern LIKE '%$' "
            "THEN translate(substring(pattern, 1, length(pattern) - 1), '*', '%') "
            "ELSE translate(pattern, '*', '%') || '%' END)"
        )
    )

    # ---- precedence: longest pattern, allow breaks ties, then pattern
    prec = Window.partitionBy("asset_id", "path").orderBy(
        F.length("pattern").desc(), F.col("kind").asc(), F.col("pattern").asc()
    )
    best = (
        hits.withColumn("rn", F.row_number().over(prec))
        .where(F.col("rn") == 1)
        .select("asset_id", "path", "kind", F.col("pattern").alias("rule"))
    )
    out = (
        paths.join(best, ["asset_id", "path"], "left")
        .select(
            "asset_id",
            "path",
            F.coalesce(F.col("kind") == "allow", F.lit(True)).alias("allowed"),
            "rule",
        )
    )
    return out


# The oracle rebuilds rules + paths from the same closed forms and
# runs an independent longest-match (LIKE + row_number). Rule sets:
# even ids → the gptbot group ONLY; odd ids → the '*' group ONLY.
ROBOTS_SQL = """
WITH rules AS (
    SELECT doc_id, 'disallow' AS kind,
           '/private-' || (doc_id % 5) || '/' AS pattern
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'allow', '/private-' || (doc_id % 5) || '/pub'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'disallow', '/tmp-' || (doc_id % 7)
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id, 'allow', '/tmp-' || (doc_id % 7) || '/keep'
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id, 'disallow', '/data/*.bin'
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id, 'disallow', '/exact-' || (doc_id % 3) || '$'
    FROM documents WHERE doc_id % 2 = 1
),
paths AS (
    SELECT doc_id, unnest([
        '/tmp-' || (doc_id % 7) || '/keep/x',
        '/tmp-' || (doc_id % 7) || '/old',
        '/data/f' || (doc_id % 4) || '.bin',
        '/private-' || (doc_id % 5) || '/pub/x',
        '/private-' || (doc_id % 5) || '/secret',
        '/exact-' || (doc_id % 3)
    ]) AS path
    FROM documents
),
hits AS (
    SELECT p.doc_id, p.path, r.kind, r.pattern,
           row_number() OVER (
               PARTITION BY p.doc_id, p.path
               ORDER BY length(r.pattern) DESC, r.kind ASC, r.pattern ASC
           ) AS rn
    FROM paths p
    JOIN rules r ON r.doc_id = p.doc_id
     AND p.path LIKE (CASE WHEN r.pattern LIKE '%$'
                           THEN replace(rtrim(r.pattern, '$'), '*', '%')
                           ELSE replace(r.pattern, '*', '%') || '%' END)
)
SELECT p.doc_id AS asset_id,
       p.path AS path,
       COALESCE(h.kind = 'allow', TRUE) AS allowed,
       h.pattern AS rule
FROM paths p
LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h
  ON h.doc_id = p.doc_id AND h.path = p.path
ORDER BY 1, 2
"""


QUERIES = {"robots_gate_report": robots_gate_report}

ORACLES = {"robots_gate_report": ROBOTS_SQL}
