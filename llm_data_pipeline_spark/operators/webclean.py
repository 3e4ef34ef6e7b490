"""Web-corpus cleaning operators: C4 line filtering, cross-corpus
boilerplate-line removal, and URL/domain governance.

Engine-native extension set (no reference counterpart — the reference
pipeline starts from already-extracted WET text; these are the published
web-cleaning stages a 100-TB pretraining pipeline runs before it):

- ``c4_line_stats``: the C4 heuristics (Raffel et al. 2020, §2.2) —
  keep lines ending in terminal punctuation with >= N words and no policy
  term; drop documents with < M surviving lines or a banned term anywhere.
  Pure narrow map: zero shuffles, the whole cascade runs inside the scan
  stage under whole-stage codegen. At 100 TB this is the cheapest stage in
  the pipeline — cost is exactly one pass over the text bytes.

- ``remove_boilerplate_lines``: CCNet-style (Wenzek et al. 2020) corpus-
  level boilerplate strip — a line occurring in >= ``min_docs`` DISTINCT
  documents is navigation/footer boilerplate and removed everywhere.
  Shape: posexplode (narrow) -> one shuffle keyed by the line value for
  the distinct-doc count (partial aggregation combines per-partition
  duplicates map-side) -> the frequent-line set is tiny by definition
  (boilerplate concentrates), so it broadcasts back -> one shuffle by
  doc key for the positional rebuild. Two bounded shuffles total; no
  driver collection anywhere.

- ``add_registered_domain`` / ``domain_quota_filter``: URL -> registered
  domain (authority parse + last-two-labels; the documented simplification
  of a Public Suffix List lookup — a real deployment swaps in a broadcast
  PSL map at this exact column boundary), then blocklist + per-domain
  quota via a window ranked by a deterministic hash (uniform "random"
  sample that every engine replays bit-identically). The window shuffles
  once on the domain key; quota output is bounded by cap x n_domains.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.hashing import portable_hash60

#: C4 keeps lines ending in ``.``, ``!``, ``?`` or a closing quote.
TERMINAL_PUNCT_RE = r'[.!?"]$'


def c4_line_stats(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    policy_line_re: str = r"(?i)\bjavascript\b|\bcookies\b",
    banned_doc_re: str = r"(?i)lorem ipsum|\{",
) -> DataFrame:
    """Append C4 line-filter columns; never drops rows (callers filter).

    Added columns: ``c4_n_lines``, ``c4_kept_lines``, ``c4_clean_text``
    (surviving lines re-joined with newlines), ``c4_keep`` (int 0/1).
    A document is kept iff >= ``min_lines`` lines survive the line rules
    AND the raw text has no ``banned_doc_re`` match (C4's page-level
    "lorem ipsum"/curly-brace rule).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    # Stage the line array behind a real column boundary so the lambda
    # below doesn't re-inline the split per element (measured trap:
    # higher-order lambdas re-evaluate free expressions per element).
    df = df.withColumn("_c4_lines", F.split(text, "\n"))
    kept = F.filter(
        F.col("_c4_lines"),
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(l, " ")) >= min_words_per_line)
        & ~l.rlike(policy_line_re),
    )
    df = df.withColumn("_c4_kept", kept)
    return (
        df.withColumn("c4_n_lines", F.size("_c4_lines"))
        .withColumn("c4_kept_lines", F.size("_c4_kept"))
        .withColumn("c4_clean_text", F.array_join("_c4_kept", "\n"))
        .withColumn(
            "c4_keep",
            (
                (F.size("_c4_kept") >= min_lines) & ~text.rlike(banned_doc_re)
            ).cast("int"),
        )
        .drop("_c4_lines", "_c4_kept")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Strip every line that occurs in >= ``min_docs`` distinct documents.

    Returns one row per input document: ``key_col``, ``n_lines`` (before),
    ``removed_lines``, ``clean_text`` (survivors re-joined in original
    order). All copies of a boilerplate line are removed, including
    repeats inside one document (CCNet semantics).
    """
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    frequent = (
        lines.groupBy("line")
        .agg(F.count_distinct(key_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line")
    )
    # Boilerplate is a tiny set by construction (it must repeat across
    # documents to qualify) — broadcast it and rebuild with ONE shuffle
    # keyed by the document.
    flagged = lines.join(
        F.broadcast(frequent.withColumn("_bp", F.lit(1))), "line", "left"
    )
    rebuilt = flagged.groupBy(key_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.coalesce(F.col("_bp"), F.lit(0))).alias("removed_lines"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
            )
        ).alias("_kept"),
    )
    return rebuilt.select(
        key_col,
        "n_lines",
        F.col("removed_lines").cast("long").alias("removed_lines"),
        F.array_join(
            F.transform(F.col("_kept"), lambda s: s.getField("line")), "\n"
        ).alias("clean_text"),
    )


def add_registered_domain(
    df: DataFrame, url_col: str = "url", out_col: str = "domain"
) -> DataFrame:
    """URL -> lowercased registered domain (last two host labels).

    Host = URL authority (scheme stripped; path/query/fragment/port
    dropped; userinfo not handled — corpus URLs carry none). Last-two-
    labels is the documented PSL simplification; a production deployment
    joins a broadcast public-suffix map at this column boundary instead.
    Rows whose URL has no parseable host get an empty-string domain.
    """
    host = F.lower(
        F.regexp_extract(
            F.coalesce(F.col(url_col), F.lit("")),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)",
            1,
        )
    )
    df = df.withColumn("_host_labels", F.split(host, r"\."))
    dom = F.when(
        F.size("_host_labels") >= 2,
        F.concat_ws(
            ".",
            F.element_at("_host_labels", -2),
            F.element_at("_host_labels", -1),
        ),
    ).otherwise(F.array_join("_host_labels", "."))
    return df.withColumn(out_col, dom).drop("_host_labels")


def domain_quota_filter(
    df: DataFrame,
    domain_col: str = "domain",
    key_col: str = "doc_id",
    blocklist: Sequence[str] = (),
    cap: int = 100,
) -> DataFrame:
    """Blocklist + per-domain quota governance.

    Appends ``blocked`` (int 0/1) and ``quota_keep`` (int 0/1): a row is
    quota-kept iff its domain is not blocked AND it ranks within ``cap``
    inside its domain under a deterministic uniform order —
    ``(portable_hash60(key), key)`` — i.e. a seeded per-domain sample that
    any engine replays. One shuffle on the domain key; at 100 TB skewed
    mega-domains are exactly the rows the cap discards, and the rank
    window streams (no buffering beyond the frame row).
    """
    blocked = (
        F.col(domain_col).isin(list(blocklist)) if blocklist else F.lit(False)
    )
    order_key = portable_hash60(F.col(key_col).cast("string"))
    w = Window.partitionBy(domain_col).orderBy(
        order_key.asc(), F.col(key_col).asc()
    )
    return df.withColumn("blocked", blocked.cast("int")).withColumn(
        "quota_keep",
        ((F.row_number().over(w) <= cap) & (F.col("blocked") == 0)).cast("int"),
    )


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for URL-level dedup (the first dedup key a web
    pipeline applies, before any content hashing): lowercase scheme+host,
    strip a leading ``www.``, drop default ports (http:80 / https:443),
    drop the fragment, strip tracking params (utm_*, fbclid, gclid), sort
    the surviving query params, and trim trailing slashes from the path
    (empty path -> '/'). Pure native string expressions (no UDF), with a
    DuckDB twin in queries_webclean.py — at 100 TB this is a narrow map
    feeding a groupBy(canonical) whose shuffle carries only the key.

    Parsing is regex-lite by design (scheme://host[:port][path][?q][#f]);
    it is a dedup NORMALIZER, not a general URL validator.
    """
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = rest.substr(F.length(hostport) + F.lit(1), F.length(rest))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path_stripped = F.regexp_replace(
        F.regexp_extract(tail, r"^([^?#]*)", 1), r"/+$", ""
    )
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    qstr = F.regexp_extract(tail, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qstr, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


# HTML entity map shared by the Spark extractor and (name/value literals)
# the SQL oracle — plain string replaces, never regex, so ordering is the
# only semantic (amp LAST so '&amp;lt;' decodes to '&lt;' not '<').
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_title(html: Column) -> Column:
    """<title> contents (first match, '' when absent) — native
    regexp_extract, case-insensitive, dot-matches-newline."""
    return F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)


def html_text_extract(html: Column) -> Column:
    """Visible text from raw HTML as a pure native-regex chain — the
    WARC-side ingest step the reference never needed (it consumes WET,
    Common Crawl's PRE-extracted text; this closes the raw-HTML half):

    1. drop <script>/<style>/<!-- --> blocks (non-greedy, dotall),
    2. turn block-level closers/breaks into newlines (so paragraphs
       survive as whitespace),
    3. strip every remaining tag,
    4. decode the six ubiquitous entities (plain string replaces),
    5. collapse whitespace.

    Every step is `regexp_replace`/`replace` with the 'g'-equivalent
    all-occurrence semantics on both engines, no lookaround (RE2-safe),
    so the whole extractor replays in the DuckDB oracle. Zero-shuffle
    narrow map; at 100 TB this runs inside the ingest scan exactly like
    basic_clean.
    """
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|tr|h[1-6]|ul|ol|table|blockquote)>|<br[^>]*>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# The name attribute accepts quoted OR unquoted "robots", with the value
# ANCHORED: quoted forms match the closing quote, the unquoted form
# requires a delimiter after "robots" (whitespace or /; plus > in the
# content-first patterns where the name can legally end the tag). The
# round-8 ["']?robots["']? form was a PREFIX match — name="robotstxt" or
# name=robots-custom wrongly extracted a directive and could drop the
# page (advisor finding). Non-capturing groups keep the content capture
# at group 1 and stay RE2-safe (no lookaround) so the oracle replays the
# identical pattern. In the name-first patterns the unquoted delimiter
# class deliberately EXCLUDES > : if name=robots ends the tag there is no
# content attribute in that tag, and letting the match consume > would
# allow [^>]*content to walk into the NEXT tag's content attribute.
_ROBOTS_NAME_FIRST = (
    "(?i)<meta[^>]*name\\s*=\\s*(?:\"robots\"|'robots'|robots[\\s/])"
    "[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']"
)
_ROBOTS_NAME_FIRST_UNQ = (
    "(?i)<meta[^>]*name\\s*=\\s*(?:\"robots\"|'robots'|robots[\\s/])"
    "[^>]*content\\s*=\\s*([^\\s\"'>]+)"
)
_ROBOTS_CONTENT_FIRST = (
    "(?i)<meta[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']"
    "[^>]*name\\s*=\\s*(?:\"robots\"|'robots'|robots[\\s/>])"
)
_ROBOTS_CONTENT_FIRST_UNQ = (
    "(?i)<meta[^>]*content\\s*=\\s*([^\\s\"'>]+)"
    "[^>]*name\\s*=\\s*(?:\"robots\"|'robots'|robots[\\s/>])"
)


def html_meta_robots(html: Column) -> Column:
    """Contents of ``<meta name="robots" content="...">`` lowercased
    ('' when absent). RE2-safe (no lookaround, so the oracle replays it):
    attribute order is handled by alternative patterns — name-first and
    content-first — instead of a lookahead, and each order has a quoted
    and an unquoted content-value variant (valid HTML allows
    ``<meta name=robots content=noindex>``). Known conflation, by
    design: an explicitly EMPTY content attribute (content="") returns
    '' just like an absent tag — both mean "no restriction", so the
    downstream filter keeps the page either way."""
    parts = [
        F.nullif(F.regexp_extract(html, pat, 1), F.lit(""))
        for pat in (
            _ROBOTS_NAME_FIRST,
            _ROBOTS_NAME_FIRST_UNQ,
            _ROBOTS_CONTENT_FIRST,
            _ROBOTS_CONTENT_FIRST_UNQ,
        )
    ]
    return F.lower(F.coalesce(*parts, F.lit("")))
