"""Web-cleaning operators: C4 line rules, boilerplate strip, domain governance."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.webclean import (
    add_registered_domain,
    c4_line_stats,
    domain_quota_filter,
    remove_boilerplate_lines,
)
from llm_data_pipeline_spark.plans import inspect as I
from llm_data_pipeline_spark.queries import REGISTRY, load_all

load_all()


def _c4(spark, text, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=text)], schema="doc_id int, text string"
    )
    return c4_line_stats(df, **kw).collect()[0]


def test_c4_terminal_punct_rule(spark):
    r = _c4(
        spark,
        "one two three four five.\nno terminal punct here six\n"
        'quoted line with five words?"\nshort one.',
        min_lines=1,
    )
    # line 2 (no punct) and line 4 (2 words) drop; 1 and 3 survive
    assert r.c4_n_lines == 4
    assert r.c4_kept_lines == 2
    assert r.c4_clean_text.splitlines() == [
        "one two three four five.",
        'quoted line with five words?"',
    ]
    assert r.c4_keep == 1


def test_c4_policy_and_banned_rules(spark):
    r = _c4(
        spark,
        "enable javascript in your browser now.\ngood long line stays here fine.",
        min_lines=1,
    )
    assert r.c4_kept_lines == 1  # javascript line dropped by policy regex
    r2 = _c4(
        spark,
        "good long line stays here fine.\nlorem ipsum dolor sit amet today.",
        min_lines=1,
    )
    assert r2.c4_kept_lines == 2  # line rules keep both...
    assert r2.c4_keep == 0  # ...but the page-level ban rejects the doc


def test_c4_min_lines_and_empty_text(spark):
    r = _c4(spark, "only one good line survives here.", min_lines=3)
    assert r.c4_kept_lines == 1 and r.c4_keep == 0
    r2 = _c4(spark, None, min_lines=1)
    assert r2.c4_kept_lines == 0 and r2.c4_keep == 0 and r2.c4_clean_text == ""


def test_boilerplate_removes_all_copies_in_original_order(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="footer\nalpha\nfooter\nbeta"),
            Row(doc_id=2, text="gamma\nfooter"),
            Row(doc_id=3, text="delta\nonly here\ndelta"),
        ]
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    # 'footer' is in 2 distinct docs -> removed everywhere, incl. the repeat
    # inside doc 1; 'delta' repeats only within doc 3 -> distinct-doc count 1.
    assert out[1].clean_text == "alpha\nbeta"
    assert out[1].n_lines == 4 and out[1].removed_lines == 2
    assert out[2].clean_text == "gamma" and out[2].removed_lines == 1
    assert out[3].clean_text == "delta\nonly here\ndelta"
    assert out[3].removed_lines == 0


def test_registered_domain_extraction(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://cdn.news.example.com/a/b?x=1"),
            Row(doc_id=2, url="http://EXAMPLE.org:8080/path"),
            Row(doc_id=3, url="https://localhost/x"),
            Row(doc_id=4, url="not a url"),
            Row(doc_id=5, url=None),
        ]
    )
    out = {r.doc_id: r.domain for r in add_registered_domain(df).collect()}
    assert out[1] == "example.com"  # subdomains stripped
    assert out[2] == "example.org"  # port stripped, lowercased
    assert out[3] == "localhost"  # single label kept as-is
    assert out[4] == "" and out[5] == ""  # unparseable -> empty


def test_domain_quota_cap_and_blocklist(spark):
    rows = [Row(doc_id=i, domain="big.com") for i in range(10)]
    rows += [Row(doc_id=100 + i, domain="evil.com") for i in range(3)]
    rows += [Row(doc_id=200, domain="small.org")]
    df = spark.createDataFrame(rows)
    out = domain_quota_filter(
        df, blocklist=("evil.com",), cap=4
    ).collect()
    kept = [r.doc_id for r in out if r.quota_keep == 1]
    assert sum(1 for d in kept if d < 100) == 4  # big.com capped at 4
    assert all(not (100 <= d < 200) for d in kept)  # evil.com blocked
    assert 200 in kept
    assert all(r.blocked == 1 for r in out if 100 <= r.doc_id < 200)
    # deterministic: same input -> same kept set
    out2 = domain_quota_filter(df, blocklist=("evil.com",), cap=4).collect()
    assert kept == [r.doc_id for r in out2 if r.quota_keep == 1]


# --- plan guards: the 100-TB shapes asserted so they can't regress ---------


def test_plan_c4_is_pure_narrow_map(spark, sf_dir):
    df = REGISTRY["c4_line_filter_rewrite"].fn(spark, sf_dir)
    # scatter repartition + final orderBy are the only exchanges allowed;
    # the cleaning cascade itself must add none.
    assert I.shuffle_count(df) <= 2
    I.assert_no_cartesian(df)
    schemas = I.scan_read_schemas(df)
    assert all("lang" not in s and "source" not in s for s in schemas)


def test_plan_boilerplate_broadcasts_frequent_set(spark, sf_dir):
    df = REGISTRY["boilerplate_line_strip"].fn(spark, sf_dir)
    assert I.broadcast_join_count(df) >= 1  # frequent-line set broadcast back
    I.assert_no_cartesian(df)


def test_plan_domain_quota_single_domain_shuffle(spark, sf_dir):
    df = REGISTRY["domain_quota_curation"].fn(spark, sf_dir)
    I.assert_no_cartesian(df)
    schemas = I.scan_read_schemas(df)
    assert all("text" not in s for s in schemas)  # only doc_id + source read


def test_canonical_url_rules(spark):
    from llm_data_pipeline_spark.operators.webclean import canonical_url

    cases = [
        # (raw, expected canonical)
        ("https://Example.COM/a/b", "https://example.com/a/b"),
        ("HTTPS://WWW.example.com/a/b/", "https://example.com/a/b"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/?b=2&a=1#frag", "https://example.com/?a=1&b=2"),
        (
            "https://example.com/p?utm_source=x&id=7&utm_campaign=y",
            "https://example.com/p?id=7",
        ),
        ("https://example.com/p?fbclid=z&gclid=q", "https://example.com/p"),
        ("https://example.com//a//", "https://example.com//a"),
        ("https://www.example.com/#x", "https://example.com/"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i int, raw string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("raw")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw}: {got[i]} != {want}"


def test_html_meta_robots_quoted_and_unquoted(spark):
    """Extractor must handle attribute order, case, quoted AND unquoted
    attribute values (valid HTML: <meta name=robots content=noindex>),
    and return '' for absent tags or empty content (both mean 'no
    restriction' — documented conflation)."""
    from llm_data_pipeline_spark.operators.webclean import html_meta_robots

    cases = [
        ('<meta name="robots" content="noindex, nofollow">', "noindex, nofollow"),
        ("<meta content='NOFOLLOW' name='robots'>", "nofollow"),
        ("<meta name=robots content=noindex>", "noindex"),
        ("<meta name=robots content='noindex, nofollow'>", "noindex, nofollow"),
        ('<meta name="robots" content=nofollow>', "nofollow"),
        ("<meta content=NOINDEX name=robots>", "noindex"),
        ('<meta name="robots" content="">', ""),
        ("<p>no meta at all</p>", ""),
        ('<meta name="keywords" content="noindex">', ""),
        # anchored name value (advisor round-8): robots-PREFIXED non-robots
        # names must NOT extract — the old ["']?robots["']? prefix match
        # wrongly dropped these pages
        ('<meta name="robotstxt" content="noindex">', ""),
        ("<meta name=robots-custom content=noindex>", ""),
        ("<meta content='noindex' name='robotstxt'>", ""),
        ("<meta content=noindex name=robotscan>", ""),
        # ...while a googlebot-style trailing attr after unquoted robots
        # still matches (the [\s/] delimiter is load-bearing, not greedy)
        ("<meta name=robots data-x=1 content=none>", "none"),
    ]
    rows = [(i, f"<html><head>{h}</head></html>") for i, (h, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, html string")
    got = {
        r["i"]: r["d"]
        for r in df.select("i", html_meta_robots(F.col("html")).alias("d")).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, f"{h}: {got[i]!r} != {want!r}"
