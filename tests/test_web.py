"""Web-corpus operators: HTML extraction, URL canonicalization, domain caps."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators.web import (
    domain_frequency_cap,
    extract_html_text,
    url_domain,
    url_normalize,
)

_PAGE = """<!DOCTYPE html>
<html><head><title>The &amp; Title</title>
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script>
</head>
<body>
<!-- a comment with <p>markup</p> inside -->
<nav><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">More</a></nav>
<h1>Heading</h1>
<p>First paragraph with <b>bold</b> and an <a href="x">inline link</a> inside
a longer run of ordinary prose text.</p>
<div>Second block of plain prose, no links at all, long enough to keep.</div>
<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
</body></html>"""


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [Row(pid=1, html=_PAGE), Row(pid=2, html="plain text, no markup at all")]
    )


class TestExtractHtmlText:
    def test_structure_and_boilerplate(self, spark, pages):
        out = {
            r["id"]: r
            for r in extract_html_text(pages, "html", "pid").collect()
        }
        r = out[1]
        assert r["title"] == "The & Title"
        txt = r["text"]
        # script/style/comment content never leaks
        assert "color: red" not in txt and "not text" not in txt
        assert "markup" not in txt
        # link-dominated nav and footer blocks dropped
        assert "Home" not in txt and "Privacy" not in txt
        # prose blocks kept, block boundaries preserved as newlines
        lines = txt.split("\n")
        assert lines[0] == "Heading"
        assert lines[1].startswith("First paragraph with bold and an inline link")
        assert "Second block of plain prose" in lines[2]
        assert r["n_blocks_dropped"] >= 2
        assert r["n_blocks"] == r["n_blocks_dropped"] + len(lines)

    def test_plain_text_passthrough(self, pages):
        r = extract_html_text(pages, "html", "pid").filter(F.col("id") == 2).first()
        assert r["text"] == "plain text, no markup at all"
        assert r["title"] == ""
        assert r["n_blocks"] == 1 and r["n_blocks_dropped"] == 0

    def test_link_density_threshold(self, spark):
        # 50% link text at threshold 0.5 is kept; above is dropped
        half = "<p><a href='x'>four char</a> non-link!</p>"  # 9/19 visible linked
        mostly = "<p><a href='x'>almost all of this block is link</a> x</p>"
        df = spark.createDataFrame([Row(pid=1, html=half + mostly)])
        r = extract_html_text(df, "html", "pid").first()
        assert "four char non-link!" in r["text"]
        assert "almost all" not in r["text"]
        assert r["n_blocks_dropped"] == 1

    def test_min_block_chars(self, spark):
        df = spark.createDataFrame([Row(pid=1, html="<p>ab</p><p>x</p>")])
        r = extract_html_text(df, "html", "pid", min_block_chars=2).first()
        assert r["text"] == "ab" and r["n_blocks_dropped"] == 1

    def test_full_unescape(self, spark):
        df = spark.createDataFrame(
            [Row(pid=1, html="<p>caf&#233; &euro;5 &amp; more</p>")]
        )
        fast = extract_html_text(df, "html", "pid").first()["text"]
        assert fast == "caf&#233; &euro;5 & more"  # common set only
        full = extract_html_text(df, "html", "pid", full_unescape=True).first()["text"]
        assert full == "café €5 & more"

    def test_double_encoded_decodes_one_level(self, spark):
        df = spark.createDataFrame([Row(pid=1, html="<p>&amp;lt;tag&amp;gt;</p>")])
        assert extract_html_text(df, "html", "pid").first()["text"] == "&lt;tag&gt;"


class TestUrlNormalize:
    def _one(self, spark, url):
        return spark.createDataFrame([Row(u=url)]).select(
            url_normalize("u").alias("n")
        ).first()["n"]

    def test_canonical_form(self, spark):
        assert (
            self._one(spark, "HTTPS://Example.COM:443/Path/?b=2&utm_source=x&a=1#frag")
            == "https://example.com/Path?a=1&b=2"
        )

    def test_root_and_ports(self, spark):
        assert self._one(spark, "http://a.com:80") == "http://a.com/"
        assert self._one(spark, "http://a.com:8080/x/") == "http://a.com:8080/x"

    def test_all_params_dropped(self, spark):
        assert self._one(spark, "http://a.com/x?utm_a=1&ref=z") == "http://a.com/x"

    def test_invalid_is_null(self, spark):
        assert self._one(spark, "not a url") is None


class TestUrlDomain:
    def _one(self, spark, url, **kw):
        return spark.createDataFrame([Row(u=url)]).select(
            url_domain("u", **kw).alias("d")
        ).first()["d"]

    def test_registrable(self, spark):
        assert self._one(spark, "https://www.News.Example.com/a") == "example.com"
        assert self._one(spark, "http://deep.sub.bbc.co.uk/x") == "bbc.co.uk"
        assert self._one(spark, "bare-host.org") == "bare-host.org"

    def test_full_host(self, spark):
        assert (
            self._one(spark, "https://www.news.example.com/a", registrable=False)
            == "news.example.com"
        )


class TestDomainFrequencyCap:
    def test_salted_equals_unsalted_and_oracle(self, spark, sf_dir):
        from rtstore_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = domain_frequency_cap(docs, "source", "doc_id", 3, salt_partitions=16)
        b = domain_frequency_cap(docs, "source", "doc_id", 3, salt_partitions=1)
        got_a = sorted((r["source"], r["doc_id"], r["domain_rank"]) for r in a.collect())
        got_b = sorted((r["source"], r["doc_id"], r["domain_rank"]) for r in b.collect())
        assert got_a == got_b
        want = sorted(
            duckdb.sql(
                f"""SELECT source, doc_id, rn FROM (
                      SELECT source, doc_id, row_number() OVER (
                        PARTITION BY source
                        ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id
                      ) AS rn
                      FROM '{sf_dir}/documents.parquet') WHERE rn <= 3"""
            ).fetchall()
        )
        assert got_a == want

    def test_cap_zero_and_schema(self, spark, sf_dir):
        from rtstore_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = domain_frequency_cap(docs, "source", "doc_id", 0)
        assert out.count() == 0
        assert out.columns == docs.columns + ["domain_rank"]
        capped = domain_frequency_cap(docs, "source", "doc_id", 2)
        assert capped.columns == docs.columns + ["domain_rank"]
        assert capped.groupBy("source").count().agg(F.max("count")).first()[0] <= 2


class TestPublicSuffixList:
    """with_registrable_domain: exact PSL semantics (normal / wildcard /
    exception rules) from a broadcast rule table, heuristic fallback
    without one."""

    PSL = """\
// ===BEGIN ICANN DOMAINS===
com
uk
co.uk
il
co.il
org.il
jp
ck
*.ck
!www.ck
// comment line
kawasaki.jp  a-trailing-token-is-ignored
"""

    @pytest.fixture()
    def rules(self, spark, tmp_path):
        from rtstore_spark.operators.web import load_psl_rules

        p = tmp_path / "psl.dat"
        p.write_text(self.PSL)
        return load_psl_rules(spark, str(p))

    def test_rule_parse(self, rules):
        got = {r["suffix"]: (r["ps_labels"], r["is_exception"])
               for r in rules.collect()}
        assert got["com"] == (1, False)
        assert got["co.uk"] == (2, False)
        assert got["ck"] == (2, False)        # wildcard *.ck
        assert got["www.ck"] == (1, True)     # exception
        assert got["kawasaki.jp"] == (2, False)  # trailing token dropped

    def test_psl_grouping(self, spark, rules):
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame(
            [
                ("https://www.example.co.il/x",),   # ccTLD 2-level
                ("http://sub.deep.example.co.il",),  # deep subdomain
                ("https://news.bbc.co.uk/",),
                ("https://example.com/page",),
                ("http://bar.foo.ck/",),             # wildcard: foo.ck is PS
                ("http://www.ck/",),                 # exception: registrable
                ("https://co.il/",),                 # IS a public suffix
                ("not a url",),
            ],
            "url string",
        )
        out = {
            r["url"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules=rules).collect()
        }
        assert out["https://www.example.co.il/x"] == "example.co.il"
        assert out["http://sub.deep.example.co.il"] == "example.co.il"
        assert out["https://news.bbc.co.uk/"] == "bbc.co.uk"
        assert out["https://example.com/page"] == "example.com"
        assert out["http://bar.foo.ck/"] == "bar.foo.ck"
        assert out["http://www.ck/"] == "www.ck"
        assert out["https://co.il/"] is None
        assert out["not a url"] is None

    def test_unknown_tld_default_rule(self, spark, rules):
        """No matching rule → the PSL default rule '*' (TLD itself is the
        public suffix)."""
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame([("https://a.b.example.zz/",)], "url string")
        assert (
            with_registrable_domain(df, "url", rules=rules).first()["domain"]
            == "example.zz"
        )

    def test_heuristic_fallback_without_rules(self, spark):
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame([("https://news.bbc.co.uk/",)], "url string")
        assert (
            with_registrable_domain(df, "url").first()["domain"] == "bbc.co.uk"
        )

    def test_rules_are_broadcast(self, spark, rules):
        """The rule join must be a broadcast, never a shuffle of hosts
        against a 9.5k-row table."""
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame([("https://x.co.uk/",)], "url string")
        plan = (
            with_registrable_domain(df, "url", rules=rules)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestPslIdnRules:
    def test_unicode_rule_matches_punycode_host(self, spark, tmp_path):
        """The real list publishes IDN rules as U-labels; crawled hosts
        are A-labels (punycode) — both renderings must match."""
        from rtstore_spark.operators.web import (
            load_psl_rules,
            with_registrable_domain,
        )

        p = str(tmp_path / "psl_idn.dat")
        with open(p, "w", encoding="utf-8") as f:
            f.write("// idn\ncom\n公司.cn\ncn\n")
        rules = load_psl_rules(spark, p)
        # the unicode rule yields a punycode twin with the same label math
        stored = {r["suffix"]: r["ps_labels"] for r in rules.collect()}
        assert stored.get("xn--55qx5d.cn") == 2
        assert stored.get("公司.cn") == 2
        df = spark.createDataFrame(
            [
                (1, "http://shop.xn--55qx5d.cn/x"),     # punycode host
                (2, "http://shop.公司.cn/x"),    # unicode host
            ],
            "id long, url string",
        )
        got = {
            r["id"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules).collect()
        }
        assert got[1] == "shop.xn--55qx5d.cn"
        assert got[2] == "shop.公司.cn"


class TestHostFallbackScope:
    def test_ascii_malformed_urls_stay_null(self, spark, tmp_path):
        """The IDN fallback must not resurrect hosts java.net.URI rightly
        rejects — ASCII-garbage authorities stay out of domain grouping."""
        from rtstore_spark.operators.web import (
            load_psl_rules,
            with_registrable_domain,
        )

        p = str(tmp_path / "psl_small.dat")
        with open(p, "w") as f:
            f.write("com\n")
        rules = load_psl_rules(spark, p)
        df = spark.createDataFrame(
            [
                (1, "http://exa mple.com,junk/x"),   # space+comma authority
                (2, "http://good.example.com/x"),
            ],
            "id long, url string",
        )
        got = {
            r["id"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules).collect()
        }
        assert got[1] is None
        assert got[2] == "example.com"


class TestBuiltinPslSnapshot:
    """The embedded curated snapshot (operators/psl_snapshot.py) runs the
    EXACT PSL algorithm with no external file — rules='builtin'."""

    def test_builtin_covers_and_exceeds_the_heuristic(self, spark):
        from rtstore_spark.operators.psl_snapshot import SNAPSHOT
        from rtstore_spark.operators.web import _TWO_LEVEL_SUFFIXES

        lines = {
            ln.split()[0] for ln in SNAPSHOT.splitlines()
            if ln.strip() and not ln.startswith(("//", "*", "!"))
        }
        missing = set(_TWO_LEVEL_SUFFIXES) - lines
        assert not missing, f"snapshot lost heuristic coverage: {missing}"
        assert len(lines) > 3 * len(_TWO_LEVEL_SUFFIXES)

    def test_builtin_grouping(self, spark):
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame(
            [
                ("https://news.example.co.uk/a",),
                ("https://blog.shop.com.br/x",),
                ("https://a.b.k12.tr/y",),      # snapshot-only rule
                ("https://any.example.ck/z",),   # wildcard *.ck
                ("https://www.ck/z",),           # exception !www.ck
                ("https://deep.sub.example.io/q",),  # default rule (1 label)
            ],
            "url string",
        )
        out = {
            r["url"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules="builtin").collect()
        }
        assert out["https://news.example.co.uk/a"] == "example.co.uk"
        assert out["https://blog.shop.com.br/x"] == "shop.com.br"
        assert out["https://a.b.k12.tr/y"] == "b.k12.tr"
        assert out["https://any.example.ck/z"] == "any.example.ck"
        assert out["https://www.ck/z"] == "www.ck"
        assert out["https://deep.sub.example.io/q"] == "example.io"

    def test_private_section_and_geographic_families(self, spark):
        # round-7 snapshot extension: hosting/CDN suffixes group by SITE
        # (user subdomain), and the largest geographic second-level
        # families (JP prefectures, US states + k12) are exact
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame(
            [
                ("https://alice.github.io/p",),
                ("https://bob.github.io/q",),
                ("https://me.blogspot.co.uk/x",),
                ("https://ec2-1-2-3-4.us-east-1.compute.amazonaws.com/",),
                ("https://mybucket.s3.amazonaws.com/k",),
                ("https://shinjuku.metro.tokyo.jp/a",),
                ("https://www.pref.osaka.jp/b",),
                ("https://school.district.k12.ca.us/c",),
                ("https://city.sacramento.ca.us/d",),
                ("https://app.herokuapp.com/e",),
            ],
            "url string",
        )
        out = {
            r["url"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules="builtin").collect()
        }
        # two github.io users are two SITES, not one provider domain
        assert out["https://alice.github.io/p"] == "alice.github.io"
        assert out["https://bob.github.io/q"] == "bob.github.io"
        assert out["https://me.blogspot.co.uk/x"] == "me.blogspot.co.uk"
        # *.compute.amazonaws.com wildcard: region label is the suffix
        assert out[
            "https://ec2-1-2-3-4.us-east-1.compute.amazonaws.com/"
        ] == "ec2-1-2-3-4.us-east-1.compute.amazonaws.com"
        assert out["https://mybucket.s3.amazonaws.com/k"] == "mybucket.s3.amazonaws.com"
        assert out["https://shinjuku.metro.tokyo.jp/a"] == "metro.tokyo.jp"
        assert out["https://www.pref.osaka.jp/b"] == "pref.osaka.jp"
        assert out["https://school.district.k12.ca.us/c"] == "district.k12.ca.us"
        assert out["https://city.sacramento.ca.us/d"] == "sacramento.ca.us"
        assert out["https://app.herokuapp.com/e"] == "app.herokuapp.com"

    def test_bad_rules_string_rejected(self, spark):
        import pytest as _pytest

        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame([("https://a.io/x",)], "url string")
        with _pytest.raises(ValueError, match="builtin"):
            with_registrable_domain(df, "url", rules="latest")


class TestSystemPsl:
    """rules='system': the COMPLETE publicsuffix.org list the OS already
    vendors (Debian `publicsuffix` package / OpenJDK) — the full ~9.5k
    rule file, not the curated builtin subset. Closes the long-standing
    'full vendored PSL needs network' gap: no network, the file is on
    disk in this container (and on most hosts)."""

    @staticmethod
    def _system_list():
        """The vendored list's path, or SKIP — hosts without the Debian
        publicsuffix package must skip these tests, not fail them
        (round-10 advice; same stance as the JDK-zip probe test)."""
        from rtstore_spark.operators.web import system_psl_path

        p = system_psl_path()
        if p is None:
            pytest.skip("no vendored publicsuffix list on this host")
        return p

    def test_system_path_found_and_full_size(self, spark):
        from rtstore_spark.operators.web import load_psl_rules

        p = self._system_list()
        rules = load_psl_rules(spark, p)
        # the real list is ~9.5k rules (plus IDN punycode doublings);
        # the builtin subset is an order of magnitude smaller
        n = rules.select("suffix").distinct().count()
        assert n > 9000, n
        from rtstore_spark.operators.psl_snapshot import builtin_psl_rules

        n_builtin = builtin_psl_rules(spark).select("suffix").distinct().count()
        assert n > 3 * n_builtin

    def test_exact_psl_algorithm_outcomes_on_full_list(self, spark):
        """Canonical publicsuffix.org algorithm cases, including rules
        the builtin subset does not carry."""
        from rtstore_spark.operators.web import with_registrable_domain

        self._system_list()
        urls = [
            "https://www.example.com/x",
            "https://a.b.example.co.uk/x",
            "https://a.b.ck/x",             # wildcard *.ck
            "https://www.ck/x",             # exception !www.ck
            "https://foo.blogspot.com/x",   # private section
            "https://city.kawasaki.jp/x",   # exception !city.kawasaki.jp
            "https://x.other.kawasaki.jp/x",  # wildcard *.kawasaki.jp
            "https://example.ck/x",  # IS a public suffix under *.ck
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = {
            r["url"]: r["domain"]
            for r in with_registrable_domain(df, "url", rules="system")
            .collect()
        }
        assert out["https://www.example.com/x"] == "example.com"
        assert out["https://a.b.example.co.uk/x"] == "example.co.uk"
        assert out["https://a.b.ck/x"] == "a.b.ck"      # PS is b.ck
        assert out["https://www.ck/x"] == "www.ck"      # exception: PS is ck
        assert out["https://foo.blogspot.com/x"] == "foo.blogspot.com"
        assert out["https://city.kawasaki.jp/x"] == "city.kawasaki.jp"
        assert out["https://x.other.kawasaki.jp/x"] == "x.other.kawasaki.jp"
        # a host that IS a public suffix has no registrable domain
        assert out["https://example.ck/x"] is None

    def test_system_and_builtin_agree_on_major_suffixes(self, spark):
        from rtstore_spark.operators.web import with_registrable_domain

        self._system_list()
        urls = [
            "https://www.example.com/x",
            "https://a.example.co.uk/x",
            "https://u.github.io/x",
            "https://d.s3.amazonaws.com/x",
            "https://app.herokuapp.com/x",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")

        def run(rules):
            return {
                r["url"]: r["domain"]
                for r in with_registrable_domain(df, "url", rules=rules)
                .collect()
            }

        assert run("system") == run("builtin")

    def test_icann_only_drops_private_section(self, spark):
        """rules='system:icann' — the OWNERSHIP grouping: private
        suffixes (github.io, blogspot.com, ...) stop being public
        suffixes, so a hosting provider's subdomains group under ONE
        registrable domain; the ICANN section (co.uk, the *.ck
        wildcard, the !www.ck exception) is untouched."""
        from rtstore_spark.operators.web import with_registrable_domain

        self._system_list()
        urls = [
            "https://foo.blogspot.com/x",
            "https://u.github.io/x",
            "https://a.b.example.co.uk/x",
            "https://a.b.ck/x",
            "https://www.ck/x",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")

        def run(rules):
            return {
                r["url"]: r["domain"]
                for r in with_registrable_domain(df, "url", rules=rules)
                .collect()
            }

        icann = run("system:icann")
        # private suffixes fall back to their ICANN parent rule
        assert icann["https://foo.blogspot.com/x"] == "blogspot.com"
        assert icann["https://u.github.io/x"] == "github.io"
        # ICANN-section behavior identical to the full list
        assert icann["https://a.b.example.co.uk/x"] == "example.co.uk"
        assert icann["https://a.b.ck/x"] == "a.b.ck"
        assert icann["https://www.ck/x"] == "www.ck"
        # the builtin snapshot's canonical markers give the same modes
        assert run("builtin:icann") == icann
        # full-list mode still groups by SITE on private suffixes
        assert run("system")["https://foo.blogspot.com/x"] == (
            "foo.blogspot.com"
        )

    def test_icann_only_rule_tables(self, spark):
        from rtstore_spark.operators.psl_snapshot import builtin_psl_rules
        from rtstore_spark.operators.web import load_psl_rules

        full = builtin_psl_rules(spark)
        icann = builtin_psl_rules(spark, icann_only=True)
        full_sfx = {r["suffix"] for r in full.collect()}
        icann_sfx = {r["suffix"] for r in icann.collect()}
        assert icann_sfx < full_sfx
        assert "github.io" in full_sfx and "github.io" not in icann_sfx
        assert "co.uk" in icann_sfx  # ICANN rules intact
        p = self._system_list()
        sys_icann = {
            r["suffix"]
            for r in load_psl_rules(spark, p, icann_only=True).collect()
        }
        assert "blogspot.com" not in sys_icann and "co.uk" in sys_icann

    def test_invalid_rules_section_rejected(self, spark):
        from rtstore_spark.operators.web import with_registrable_domain

        df = spark.createDataFrame([("https://a.io/x",)], "url string")
        with pytest.raises(ValueError, match=":icann"):
            with_registrable_domain(df, "url", rules="system:private")

    def test_jdk_zip_candidate_rejected_by_probe(self, monkeypatch):
        """OpenJDK also installs a file NAMED public_suffix_list.dat —
        but it is a ZIP archive of per-TLD entries, not list text. The
        path probe must skip it (PK magic) rather than hand the parser
        a binary."""
        import os

        import rtstore_spark.operators.web as web

        jdk = "/etc/java-17-openjdk/security/public_suffix_list.dat"
        if not os.path.isfile(jdk):
            pytest.skip("no JDK psl file on this host")
        assert open(jdk, "rb").read(4) == b"PK\x03\x04"  # really a zip
        monkeypatch.setattr(web, "_SYSTEM_PSL_PATHS", (jdk,))
        monkeypatch.delenv("JAVA_HOME", raising=False)
        assert web.system_psl_path() is None

    def test_missing_system_list_raises_clearly(self, spark, monkeypatch):
        import rtstore_spark.operators.web as web

        monkeypatch.setattr(web, "system_psl_path", lambda: None)
        df = spark.createDataFrame([("https://a.io/x",)], "url string")
        with pytest.raises(FileNotFoundError, match="builtin"):
            web.with_registrable_domain(df, "url", rules="system")
