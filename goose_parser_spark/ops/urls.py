"""URL operators for crawl pipelines: host extraction, normalization,
registered-domain grouping.

All pure Catalyst expressions (regexp_extract / lower / rtrim —
whole-stage codegen), reproducible in the DuckDB oracle. These are the
keys every crawl-side groupBy/join uses (per-host budgets, domain-level
dedup, politeness partitioning), so they must be cheap and exactly
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(col: str | Column) -> Column:
    """Lower-cased hostname (no scheme/userinfo/port/path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def url_path(col: str | Column) -> Column:
    """Path component (leading '/', no query/fragment); '' if none."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)


def url_normalize(col: str | Column) -> Column:
    """Canonical form for dedup keys: lower-cased scheme+host, default
    ports dropped, trailing slash trimmed from the path, fragment
    dropped, query kept (it is content-addressing for many sites)."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(c)
    port = F.regexp_extract(c, _HOST_RE + r":(\d+)", 2)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(url_path(c), "/+$", "")
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


# Tracking parameters stripped by url_canonicalize: the widely-known
# analytics/click-id query keys (public knowledge; any crawl dedup
# pipeline drops these — they vary per visitor, not per content).
# Anchored regex over a single `key=` prefix; RE2-compatible so the
# DuckDB oracle runs the identical pattern.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|gclid|dclid|fbclid|msclkid|mc_eid|igshid|twclid|"
    r"yclid|ref|ref_src)=")


def strip_tracking_params(col: str | Column,
                          pattern: str = TRACKING_PARAM_RE) -> Column:
    """Drop tracking query parameters and SORT the survivors so that
    param order never distinguishes two URLs. Pure Catalyst: split the
    query on '&', filter on the anchored key regex, array_sort,
    re-join. Keeps everything before '?' byte-identical; a URL whose
    query empties out loses its '?'. Fragments should already be gone
    (apply after :func:`url_normalize`)."""
    c = F.col(col) if isinstance(col, str) else col
    pre = F.regexp_extract(c, r"^([^?#]*)", 1)
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(pattern)))
    newq = F.array_join(kept, "&")
    return F.when(newq != "", F.concat(pre, F.lit("?"), newq)).otherwise(pre)


def url_canonicalize(col: str | Column) -> Column:
    """Full canonical URL for crawl-frontier / dedup keys:
    :func:`url_normalize` (case, default ports, trailing slash,
    fragment) then :func:`strip_tracking_params` (tracking keys out,
    survivors sorted). One codegen'd projection — a scan-level rewrite
    at any corpus size."""
    return strip_tracking_params(url_normalize(col))


# Frozen two-label public-suffix table: the widely-known ccTLD
# second-level registries (public knowledge of the Mozilla PSL's ICANN
# section). ~250 entries cover the overwhelming bulk of multi-label
# registrations in a web crawl; the full PSL additionally has wildcard
# (*.ck) and exception (!www.ck) rules plus deep geographic entries —
# at deployment those ship as a broadcast map joined on the host's
# last-k labels, same plan shape as this literal IN (VERDICT r01 #8).
# A ~250-literal IN stays a single codegen'd hash-set probe.
_TWO_LABEL_SUFFIXES = (
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk", "mod.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz", "mil.nz", "health.nz",
    # Japan / Korea / China / Taiwan / Hong Kong
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "game.tw", "club.tw", "ebiz.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # South / Southeast Asia
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "gov.in", "ac.in", "edu.in", "res.in", "mil.in", "nic.in",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "mi.th", "net.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id", "mil.id",
    "biz.id", "net.id", "my.id",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.pk", "net.pk", "edu.pk", "org.pk", "gov.pk", "fam.pk",
    "biz.pk", "web.pk",
    "com.bd", "edu.bd", "ac.bd", "net.bd", "gov.bd", "org.bd", "mil.bd",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk",
    "ltd.lk", "gov.lk", "sch.lk", "net.lk", "int.lk", "ac.lk",
    "com.np", "edu.np", "gov.np", "net.np", "org.np", "mil.np",
    "co.ir", "net.ir", "org.ir", "ac.ir", "gov.ir", "id.ir", "sch.ir",
    # Middle East / Africa
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "k12.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr", "bel.tr",
    "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr", "mil.tr",
    "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg", "sci.eg",
    "mil.eg", "name.eg", "info.eg",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "mil.za",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng", "name.ng",
    "sch.ng", "mobi.ng", "mil.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "go.tz", "ac.tz", "or.tz",
    "co.ug", "or.ug", "go.ug", "ac.ug",
    "co.zm", "co.zw", "org.zw", "gov.zw", "ac.zw",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co", "firm.co", "info.co", "int.co", "rec.co", "web.co",
    "com.pe", "org.pe", "net.pe", "edu.pe", "mil.pe", "gob.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve",
    "mil.ve", "web.ve", "info.ve",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "mil.uy", "org.uy",
    "com.ec", "info.ec", "net.ec", "fin.ec", "med.ec", "pro.ec",
    "org.ec", "edu.ec", "gov.ec", "gob.ec", "mil.ec",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "org.bo", "net.bo",
    "mil.bo", "tv.bo", "web.bo",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py",
    "org.py",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt",
    "org.gt",
    "com.do", "edu.do", "org.do", "net.do", "gov.do", "gob.do",
    "mil.do", "sld.do", "art.do", "web.do",
    "on.ca", "qc.ca", "bc.ca", "ab.ca", "mb.ca", "nb.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "pe.ca", "sk.ca", "yk.ca", "gc.ca",
    # Europe
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "gov.ie",
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt", "publ.pt",
    "int.pt", "nome.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gouv.fr", "asso.fr", "com.fr", "nom.fr", "tm.fr", "avocat.fr",
    "gov.it", "edu.it",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "biz.pl", "waw.pl",
    "co.hu", "org.hu", "info.hu", "sport.hu", "tm.hu", "2000.hu",
    "com.ro", "org.ro", "info.ro", "store.ro", "firm.ro", "nom.ro",
    "com.hr", "from.hr", "iz.hr", "name.hr",
    "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
    "com.se", "org.se", "pp.se", "tm.se", "parti.se", "press.se",
    "priv.no", "mil.no",
    "com.ee", "org.ee", "edu.ee", "gov.ee", "riik.ee", "lib.ee",
    "med.ee", "pri.ee", "fie.ee",
    "gov.lv", "com.lv", "edu.lv", "org.lv", "mil.lv", "net.lv",
    "asn.lv", "conf.lv", "id.lv",
    "gov.lt", "mil.lt",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz",
    "com.ge", "edu.ge", "gov.ge", "mil.ge", "net.ge", "org.ge",
    "pvt.ge",
    "com.az", "net.az", "int.az", "gov.az", "org.az", "edu.az",
    "info.az", "pp.az", "mil.az", "name.az", "pro.az", "biz.az",
)


def registered_domain(col: str | Column) -> Column:
    """eTLD+1-style registered domain from a url (frozen two-label
    suffix table; the grouping key for domain-level dedup and
    politeness). LITERAL fast path: covers normal two-label registries
    only — wildcard (``*.ck``), exception (``!www.ck``) and deep
    geographic rules need :func:`registered_domain_psl` (broadcast-join
    path, full rule semantics)."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    is_two_label = last2.isin(*_TWO_LABEL_SUFFIXES)
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    return (F.when(n <= 2, host)
             .when(is_two_label & (n >= 3), last3)
             .otherwise(last2))


# PSL rules beyond the two-label normal table (public knowledge of the
# Mozilla PSL ICANN section): wildcard rules (`*.X` — every direct
# child of X is a public suffix), exception rules (`!Y` — Y is
# registrable despite a covering wildcard), and the Japanese
# geographic set (47 prefecture two-label suffixes are in
# _TWO_LABEL_SUFFIXES-style normal rules below; the 7 designated-city
# wildcards each carry a `!city.<city>.jp` exception).
_PSL_WILDCARD_BASES = (
    # `*.ck` etc: ccTLDs where EVERY second level is a registry
    "ck", "er", "fj", "gu", "mm", "np", "pg",
    # Japanese designated-city geographic wildcards (*.kawasaki.jp ...)
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)
_PSL_EXCEPTIONS = (
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)
_JP_PREFECTURES = (
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki",
    "nagano", "nagasaki", "nara", "niigata", "oita", "okayama",
    "okinawa", "osaka", "saga", "saitama", "shiga", "shimane",
    "shizuoka", "tochigi", "tokushima", "tokyo", "tottori", "toyama",
    "wakayama", "yamagata", "yamaguchi", "yamanashi",
)


def psl_rules() -> list[tuple[str, str]]:
    """(suffix_key, rule_type) rows for the broadcast rules table:
    ``normal`` (key IS a public suffix), ``wildcard`` (every direct
    child of key is a public suffix), ``exception`` (key is registrable
    despite a covering wildcard). At deployment this list is replaced
    by the full parsed PSL (~10k rows) — the PLAN SHAPE (broadcast hash
    joins on last-k-label keys) is what matters; a 10k-entry literal
    IN/map would be the same codegen blow-up as inlined IVF centroids.
    """
    rules = [(s, "normal") for s in _TWO_LABEL_SUFFIXES]
    rules += [(f"{p}.jp", "normal") for p in _JP_PREFECTURES]
    rules += [(b, "wildcard") for b in _PSL_WILDCARD_BASES]
    rules += [(e, "exception") for e in _PSL_EXCEPTIONS]
    return rules


def _last_labels(parts: Column, m: int) -> Column:
    return F.array_join(F.slice(parts, -m, m), ".")


def registered_domain_psl(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    rules: list[tuple[str, str]] | None = None,
    max_rule_labels: int = 4,
) -> DataFrame:
    """Full-PSL registered domain via broadcast-joined rules (VERDICT
    r01 #8 / r02 #5): handles wildcard (``*.ck``), exception
    (``!www.ck``) and deep geographic rules the literal
    :func:`registered_domain` column cannot.

    Plan shape at 100 TB: the host's last-k label keys (k=1..4) are
    pure projections; each joins the ≤10k-row rules table as a
    BROADCAST hash join (the rules table is bounded by the PSL itself,
    never by the corpus) — map-only, no shuffle of the pages side, no
    giant literal in codegen.

    PSL match semantics: the prevailing rule is the exception if any
    matches, else the matching rule with the most labels (a wildcard
    ``*.X`` counts as len(X)+1). Registered domain = public suffix plus
    one label; a host that IS a public suffix maps to itself (keeps the
    literal path's convention for bare/short hosts).
    """
    spark = df.sparkSession
    rules = rules if rules is not None else psl_rules()
    rules_rows = [(k, t) for k, t in rules]
    rdf = spark.createDataFrame(rules_rows, "psl_key string, psl_type string")

    host = url_host(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    out = df.withColumn("_h", host).withColumn("_p", parts)
    for k in range(1, max_rule_labels + 1):
        key = F.when(F.size(F.col("_p")) >= k,
                     _last_labels(F.col("_p"), k))
        out = out.withColumn(f"_k{k}", key)
        rk = rdf.select(F.col("psl_key").alias(f"_k{k}"),
                        F.col("psl_type").alias(f"_t{k}"))
        out = out.join(F.broadcast(rk), on=f"_k{k}", how="left")

    n = F.size(F.col("_p"))

    def reg_for(m: int) -> Column:
        # registered domain = last m labels, or the whole host when it
        # is itself (shorter than) a public suffix
        return F.when(n >= m, _last_labels(F.col("_p"), m)) \
                .otherwise(F.col("_h"))

    expr = None
    # exceptions first (PSL: "If the hostname matches an exception
    # rule, modify it by removing the leftmost label" → the exception
    # key itself is the registered domain)
    for k in range(max_rule_labels, 0, -1):
        cond = F.col(f"_t{k}") == "exception"
        branch = F.col(f"_k{k}")
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    # then by effective label count, descending: wildcard@k has k+1
    # effective labels, normal@k has k → wildcard@max first (eff max+1),
    # then interleave normal@k, wildcard@k-1 (both eff k)
    expr = expr.when(F.col(f"_t{max_rule_labels}") == "wildcard",
                     reg_for(max_rule_labels + 2))
    for k in range(max_rule_labels, 0, -1):
        expr = expr.when(F.col(f"_t{k}") == "normal", reg_for(k + 1))
        if k >= 2:
            expr = expr.when(F.col(f"_t{k-1}") == "wildcard", reg_for(k + 1))
    # default rule "*": unknown TLD is a public suffix → last 2 labels
    expr = expr.otherwise(
        F.when(n <= 2, F.col("_h")).otherwise(_last_labels(F.col("_p"), 2)))

    drop = (["_h", "_p"]
            + [f"_k{k}" for k in range(1, max_rule_labels + 1)]
            + [f"_t{k}" for k in range(1, max_rule_labels + 1)])
    return out.withColumn(out_col, expr).drop(*drop)


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per host — the skew profile the salted bucketing defeats."""
    return (df.select(url_host(url_col).alias("host"))
            .groupBy("host").count()
            .orderBy(F.desc("count"), "host"))


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve an anchor href against its page URL — the link-graph /
    crawl-frontier building step. Handles absolute URLs,
    protocol-relative ``//host/p``, root-relative ``/p``,
    fragment-only ``#x`` / query-only ``?q`` refs (RFC 3986 §5.3:
    against the base minus its own fragment/query), and path-relative
    ``p`` (against the base's directory). Non-hierarchical scheme refs
    (``mailto:``, ``javascript:``, ``tel:``, ``data:`` … — any
    ``scheme:`` without ``//``) resolve to NULL: they are not
    fetchable frontier targets, and the old path-relative fallback
    produced garbage like ``https://site/dir/mailto:a@b`` (ADVICE r03
    low). Deliberately skips ``.``/``..`` segment normalization (a
    documented subset — dot-segments are rare in href attributes and a
    pure-regex normalizer would not be; canonicalize output before
    keying)."""
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    base_no_frag = F.regexp_extract(base, r"^([^#]*)", 1)
    base_no_query = F.regexp_extract(base, r"^([^?#]*)", 1)
    base_dir = F.regexp_replace(base_no_query, r"[^/]*$", "")
    return (F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
            .when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"),
                  F.lit(None).cast("string"))
            .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
            .when(href.startswith("/"), F.concat(origin, href))
            .when(href.startswith("#"), F.concat(base_no_frag, href))
            .when(href.startswith("?"), F.concat(base_no_query, href))
            .when(href == "", base_no_frag)
            .otherwise(F.concat(base_dir, href)))
