"""URL canonicalization + canonical-URL dedup (the crawl pre-stage):
semantics pinned on hand URLs, full-rule collapse pinned on the
synthetic injection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import urls


def _canon(spark, url: str) -> tuple[str, str]:
    df = spark.createDataFrame([(1, url)], "doc_id bigint, url string")
    r = urls.url_canonicalize(df).collect()[0]
    return r["canonical_url"], r["registered_domain"]


class TestCanonicalRules:
    @pytest.mark.parametrize(
        "raw,canonical,domain",
        [
            # case folding + www + default port + fragment
            (
                "HTTPS://WWW.News.Example.COM:443/a#frag",
                "https://news.example.com/a",
                "example.com",
            ),
            # non-default port survives
            (
                "https://news.example.com:8080/a",
                "https://news.example.com:8080/a",
                "example.com",
            ),
            # trailing slash + tracking params dropped + params sorted
            (
                "https://x.example.com/p/?utm_source=f&b=2&a=1&ref=tw",
                "https://x.example.com/p?a=1&b=2",
                "example.com",
            ),
            # all params tracking -> no query at all
            (
                "https://x.example.com/p?utm_a=1&gclid=2&fbclid=3",
                "https://x.example.com/p",
                "example.com",
            ),
            # multi-label public suffix takes three labels
            (
                "https://www.shop.acme.co.uk/",
                "https://shop.acme.co.uk",
                "acme.co.uk",
            ),
            # bare host, http default port
            ("http://Example.com:80", "http://example.com", "example.com"),
            # r12 ADVICE: LIKE's "_" wildcard made 'utm_%' also match
            # utmX... params — the substr-prefix rule keeps them
            (
                "https://x.example.com/p?utmX=1&utma=2&utm_b=3",
                "https://x.example.com/p?utmX=1&utma=2",
                "example.com",
            ),
            # r13 ADVICE: multi-colon authority — the port strip is
            # LAST-colon ([::1]:8080 keeps [::1], not '[')
            (
                "https://[::1]:8080/a?b=2&a=1",
                "https://[::1]:8080/a?a=1&b=2",
                "[::1]",
            ),
            # r13 ADVICE: scheme grammar is anchored [A-Za-z][A-Za-z0-9+.-]*
            # — a digit-led or space-bearing prefix is NOT a scheme
            ("1http://x.example.com/a", "://", ""),
            ("foo bar://x.example.com/a", "://", ""),
            # valid multi-char scheme charset survives
            (
                "svn+ssh://Host.Example.com/repo",
                "svn+ssh://host.example.com/repo",
                "example.com",
            ),
        ],
    )
    def test_hand_urls(self, spark, raw, canonical, domain):
        got_c, got_d = _canon(spark, raw)
        assert got_c == canonical
        assert got_d == domain

    def test_adversarial_parity_with_oracle(self, spark):
        """Spark parse vs the DuckDB oracle CTEs on a corpus the
        fixture injection never produces: multi-colon authorities,
        malformed schemes, Unicode paths (lower() is not
        length-preserving for 'İ'), fragments before the scheme. The
        hash gate can't see these — this test is the pin (r13 ADVICE)."""
        import duckdb
        import pandas as pd

        from mmw_geoprocessing_spark.operators.urls import _canonical_sql_ctes

        corpus = [
            "https://[::1]:8080/a?b=2&a=1",
            "1http://x.example.com/a",
            "foo bar://x.example.com/a",
            "not-a-url",
            "http://EXAMPLE.com:80/Path/?utm_x=1",
            "https://x.example.com/İstanbul?a=1",
            "svn+ssh://Host.Example.com/repo",
            "https://shop.acme.co.uk:8443/a",
            "http://a#b://c",
            "https://WWW.x.example.com:443/p/?ref=tw&z=1",
            "HTTP://h:1:2:3/p",
        ]
        rows = [(i, u) for i, u in enumerate(corpus)]
        df = spark.createDataFrame(rows, "doc_id bigint, url string")
        got = {
            r["doc_id"]: (r["canonical_url"], r["registered_domain"])
            for r in urls.url_canonicalize(df).collect()
        }
        con = duckdb.connect()
        adversarial = pd.DataFrame(rows, columns=["doc_id", "url"])
        con.register("adversarial", adversarial)
        ctes = _canonical_sql_ctes(
            raw_select="SELECT doc_id, url FROM adversarial"
        )
        want = {
            int(doc_id): (c, d)
            for doc_id, c, d in con.execute(
                f"WITH {ctes} SELECT doc_id, canonical_url,"
                " registered_domain FROM canon"
            ).fetchall()
        }
        assert got == want

    def test_plan_is_projection(self, spark, tables):
        df = urls.url_canonicalize(urls.with_raw_url(tables["documents"]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1200]


class TestDedupUrlCanonical:
    def test_groups_collapse_exactly(self, spark, tables):
        docs = urls.with_raw_url(tables["documents"])
        out = urls.dedup_url_canonical(docs).collect()
        # every (source, doc_id % URL_GROUP_MOD) group collapses to ONE
        # canonical URL; keep_doc_id is the group minimum
        rows = docs.select("doc_id", "source").collect()
        groups: dict[tuple, list[int]] = {}
        for r in rows:
            groups.setdefault(
                (r["source"], r["doc_id"] % urls.URL_GROUP_MOD), []
            ).append(r["doc_id"])
        assert len(out) == len(groups)
        by_keep = {r["keep_doc_id"]: r["n_dups"] for r in out}
        for ids in groups.values():
            assert by_keep[min(ids)] == len(ids)

    def test_registered_domains_follow_the_suffix_rule(self, spark, tables):
        """Sources under .example.com are SUBDOMAINS, so their eTLD+1
        collapses to example.com; sources under the multi-label suffix
        .co.uk keep three labels and stay per-source."""
        from mmw_geoprocessing_spark.functions.text import h28

        docs = urls.with_raw_url(tables["documents"])
        srcs = [r["source"] for r in docs.select("source").distinct().collect()]
        co_uk = {
            r["source"]
            for r in docs.select("source")
            .distinct()
            .filter(h28(F.col("source")) % 5 == 0)
            .collect()
        }
        want = {f"{s}.co.uk" for s in co_uk}
        if len(co_uk) < len(srcs):
            want.add("example.com")
        got = {
            r["registered_domain"]
            for r in urls.url_canonicalize(docs)
            .select("registered_domain")
            .distinct()
            .collect()
        }
        assert got == want
