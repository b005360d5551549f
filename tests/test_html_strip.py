"""HTML strip + URL canonicalization (functions/text.py): stage-by-stage
expectations on crafted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_drone_sense_spark.functions import text as TXT


def _one(spark, expr, value: str) -> str | list:
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr(F.col("v")).alias("r")).collect()[0].r


def test_strip_html_stages(spark):
    html = (
        "<p>a &amp; b</p><script>if (1<2) alert('x')</script>"
        "<!-- note --><b>end</b>"
    )
    assert _one(spark, TXT.strip_html, html) == "a & b end"


def test_strip_html_double_escaped_entity(spark):
    # '&amp;lt;' must decode to '&lt;', never all the way to '<'.
    assert _one(spark, TXT.strip_html, "x &amp;lt; y") == "x &lt; y"


def test_canonicalize_url(spark):
    cases = {
        "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag":
            "https://example.com/Path/?q=1",
        "http://Test.org:80/a/": "http://test.org/a",
        "https://a.io/p?utm_a=1&utm_b=2": "https://a.io/p",
        "https://a.io/": "https://a.io",
        "https://a.io:8080/x?q=2": "https://a.io:8080/x?q=2",  # non-default port kept
        # utm strip is anchored: a param NAME containing 'utm_' survives.
        "http://a.io/p?xutm_a=1&b=2": "http://a.io/p?xutm_a=1&b=2",
        # First param stripped -> the follower's '&' is repaired to '?'.
        "http://a.io/p?utm_a=1&b=2": "http://a.io/p?b=2",
        # Default-port strip is scheme-aware: :80 on https is a REAL port.
        "https://a.io:80/x": "https://a.io:80/x",
        "http://a.io:443/x": "http://a.io:443/x",
        # Literal '&' in the PATH (RFC 3986 sub-delims) must never be
        # rewritten into '?': the utm repair only fires on '?utm_...'.
        "http://a.io/p&x": "http://a.io/p&x",
        "http://a.io/a&b?c=1": "http://a.io/a&b?c=1",
        "http://a.io/a&b?utm_a=1&c=1": "http://a.io/a&b?c=1",
        # Leading run of several utm params all collapse.
        "http://a.io/p?utm_a=1&utm_b=2&c=3": "http://a.io/p?c=3",
        "http://a.io/p?utm_a=1&b=2&utm_c=3": "http://a.io/p?b=2",
    }
    for raw, want in cases.items():
        assert _one(spark, TXT.canonicalize_url, raw) == want, raw


def test_canonicalize_url_sql_parity(spark):
    """Both renderers of _canon_url must agree case-by-case — a shared
    staging bug (like the unconditional '&'->'?' repair fixed in r5) is
    invisible to the driver's oracle compare, so pin parity AND values here."""
    import duckdb

    cases = [
        "http://a.io/p&x",
        "http://a.io/a&b?c=1",
        "http://a.io/a&b?utm_a=1&c=1",
        "http://a.io/p?utm_a=1&utm_b=2&c=3",
        "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
        "http://a.io/p?utm_a=1&b=2",
        "https://a.io/p?utm_a=1&utm_b=2",
    ]
    expr = TXT.canonicalize_url_sql("u")
    con = duckdb.connect()
    for raw in cases:
        spark_val = _one(spark, TXT.canonicalize_url, raw)
        duck_val = con.execute(
            f"select {expr} from (select ? as u)", [raw]
        ).fetchone()[0]
        assert spark_val == duck_val, raw


def test_extract_urls_document_order(spark):
    text = 'see http://a.io/1 then <a href="https://b.io/2">x</a>'
    assert _one(spark, TXT.extract_urls, text) == [
        "http://a.io/1",
        'https://b.io/2',
    ]


def test_canonicalize_url_combinatorial_parity(spark):
    """Exhaustive structural sweep: every combination of scheme/port/path/
    query/fragment shape through BOTH renderers in one batch — the class
    of bug this guards (a shared-staging regex misfiring on a rare shape)
    was found twice by round reviews; enumerate the space instead."""
    import itertools

    import duckdb

    schemes = ["http://", "HTTPS://"]
    hosts = ["a.io", "A.io:443", "a.io:8080"]
    paths = ["", "/", "/p", "/p&q", "/p/"]
    queries = [
        "",
        "?a=1",
        "?utm_s=1",
        "?utm_s=1&b=2",
        "?a=1&utm_s=2",
        "?utm_a=1&utm_b=2&c=3",
        "?xutm_a=1",
        "?a=1&b=2&utm_c=3",
    ]
    frags = ["", "#f", "#f?g=1"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    sdf = spark.createDataFrame([(u,) for u in urls], "u string")
    spark_vals = [
        r.c for r in sdf.select(TXT.canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    expr = TXT.canonicalize_url_sql("u")
    con = duckdb.connect()
    duck_vals = [
        con.execute(f"select {expr} from (select ? as u)", [u]).fetchone()[0]
        for u in urls
    ]
    mismatches = [
        (u, s, d) for u, s, d in zip(urls, spark_vals, duck_vals) if s != d
    ]
    assert not mismatches, mismatches[:5]
