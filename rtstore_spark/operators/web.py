"""Web-corpus operators: HTML → text extraction, URL canonicalization,
registrable-domain extraction, per-domain frequency caps.

The stage a crawl-derived training corpus runs BEFORE everything in
``text``/``dedup``: raw HTML becomes boilerplate-free text
(jusText/trafilatura-style block filtering, Kohlschütter et al. 2010 /
Pomikálek 2011), URLs become canonical dedup keys, and over-represented
domains are capped (the C4/RefinedWeb "no domain dominates" rule).

Everything on the hot path is built-in Column expressions — regexp
structure removal and per-block higher-order functions run JVM-side
inside whole-stage codegen; no shuffle anywhere in extraction or
normalization (pure projections). Each regexp inside a ``transform``
lambda binds the lambda VARIABLE (one evaluation per block), not a
projected alias, so the O(tokens²) re-evaluation trap pinned in
``dedup.shingles`` does not apply.

Beyond-reference operators (the reference stores documents, it does not
crawl): no reference citation applies; published heuristics cited per
function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tags whose CONTENT is noise (drop element and body); head goes too —
# the title is extracted from the raw html before this strip
_CONTENT_STRIP_TAGS = ("script", "style", "noscript", "svg", "head", "template", "iframe", "object")

# tags that terminate a text block (HTML block-level elements + br/hr);
# replaced with newlines so block boundaries survive inline-tag stripping
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|table|thead|tbody|tfoot"
    r"|td|th|section|article|aside|header|footer|nav|blockquote|pre|figure"
    r"|figcaption|form|fieldset|main|address|details|summary)\b[^>]*>"
)

# named entities decodable without Python (the long tail needs
# html.unescape — see full_unescape); &amp; must decode LAST so
# double-encoded text ("&amp;lt;") resolves one level per pass, not two
_COMMON_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def _strip_tags(col: Column) -> Column:
    """Remove every remaining tag and collapse whitespace (inline form —
    used per block inside lambdas and for the title)."""
    return F.trim(F.regexp_replace(F.regexp_replace(col, r"(?s)<[^>]*>", " "), r"\s+", " "))


def _decode_entities(col: Column) -> Column:
    out = col
    for ent, rep in _COMMON_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def html_text_exprs(
    raw: Column,
    max_link_density: float = 0.5,
    min_block_chars: int = 2,
) -> tuple[Column, Column, Column, Column]:
    """The extraction kernel as pure Column expressions:
    (title, text, n_blocks, n_blocks_dropped) over a raw-HTML column.
    Shared by ``extract_html_text`` and the pipeline's html front door so
    the block rules live in exactly one place."""
    title = _decode_entities(
        _strip_tags(F.regexp_extract(raw, r"(?is)<title[^>]*>(.*?)</title\s*>", 1))
    )

    cleaned = F.regexp_replace(raw, r"(?s)<!--.*?-->", " ")
    for tag in _CONTENT_STRIP_TAGS:
        cleaned = F.regexp_replace(cleaned, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
    # source whitespace (incl. newlines inside a paragraph) is not
    # block-structural in HTML — collapse it BEFORE inserting block
    # boundaries, so only block-level tags split blocks
    cleaned = F.regexp_replace(cleaned, r"\s+", " ")
    blocks = F.split(F.regexp_replace(cleaned, _BLOCK_TAG_RE, "\n"), r"\n+")

    def _block_struct(b: Column) -> Column:
        anchors = F.regexp_extract_all(b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1))
        link_chars = F.aggregate(
            anchors, F.lit(0), lambda acc, s: acc + F.length(_strip_tags(s))
        )
        return F.struct(_strip_tags(b).alias("txt"), link_chars.alias("lc"))

    per = F.transform(blocks, _block_struct)
    visible = F.filter(per, lambda p: F.length(p["txt"]) > 0)

    def _keep(p: Column) -> Column:
        return (F.length(p["txt"]) >= min_block_chars) & (
            p["lc"] / F.length(p["txt"]) <= max_link_density
        )

    kept = F.filter(visible, _keep)
    text = _decode_entities(
        F.array_join(F.transform(kept, lambda p: p["txt"]), "\n")
    )
    return title, text, F.size(visible), F.size(visible) - F.size(kept)


def extract_html_text(
    df: DataFrame,
    html_col: str,
    id_col: str,
    max_link_density: float = 0.5,
    min_block_chars: int = 2,
    full_unescape: bool = False,
) -> DataFrame:
    """Boilerplate-removing HTML → text extraction: (id, title, text,
    n_blocks, n_blocks_dropped).

    Pipeline (all JVM-side projections, no shuffle):

    1. strip comments and content-noise elements (script/style/head/...);
       the ``<title>`` is extracted from the raw html first
    2. replace block-level tags with newlines, split into blocks
    3. per block (one ``transform`` lambda pass): visible text = inline
       tags stripped + whitespace collapsed; link_chars = total visible
       length of ``<a>…</a>`` inner text
    4. drop blocks that are empty/short (< ``min_block_chars`` visible
       chars) or link-dominated (link_chars / visible chars >
       ``max_link_density`` — the jusText/boilerpipe link-density rule
       that kills nav bars, footers and related-links boxes)
    5. join survivors with newlines; decode entities (common named set
       JVM-side; ``full_unescape=True`` adds an Arrow-batched
       ``html.unescape`` pass for numeric/exotic entities — the only
       Python on the path, off by default)

    Heuristic bounds (documented, not hidden): an unclosed ``<script>``
    swallows text to the next ``</script>`` or end-of-doc (the browser
    does the same); CDATA and conditional comments are treated as
    comments. ``n_blocks`` counts blocks with any visible text;
    ``n_blocks_dropped`` counts those removed by rule 4.

    The column kernel is ``html_text_exprs`` — callers that need the
    extracted text as a projection on an existing frame (prepare_corpus's
    html front door) use it directly instead of joining this function's
    output back.
    """
    title, text, n_blocks, n_dropped = html_text_exprs(
        F.col(html_col), max_link_density, min_block_chars
    )
    out = df.select(
        F.col(id_col).alias("id"),
        title.alias("title"),
        text.alias("text"),
        n_blocks.alias("n_blocks"),
        n_dropped.alias("n_blocks_dropped"),
    )
    if full_unescape:
        import html as _html

        def _unescape(batches):
            un = lambda v: _html.unescape(v) if v is not None else None  # noqa: E731
            for pdf in batches:
                pdf["title"] = pdf["title"].map(un)
                pdf["text"] = pdf["text"].map(un)
                yield pdf

        out = out.mapInPandas(_unescape, schema=out.schema)
    return out


# query-param keys stripped by url_normalize: click/campaign trackers that
# fragment otherwise-identical URLs (the standard canonicalization set)
_TRACKING_PARAM_RE = r"^(?:utm_|fbclid$|gclid$|msclkid$|mc_eid$|ref$|ref_src$)"


def url_normalize(col: Column | str, drop_param_re: str = _TRACKING_PARAM_RE) -> Column:
    """Canonical URL form for dedup keys — pure projection, NULL for
    unparseable input (no scheme/host), so invalid URLs filter out with
    ``isNotNull``.

    Rules (conservative, dedup-oriented): scheme and authority lowercase;
    default ports dropped (:80 http, :443 https); fragment dropped; query
    params matching ``drop_param_re`` (tracking keys) removed and the
    rest sorted byte-wise (param order is non-semantic in practice and
    sorting merges permuted duplicates); trailing slash trimmed from
    non-root paths; empty path becomes "/".
    """
    u = F.col(col) if isinstance(col, str) else col
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    auth = F.lower(F.try_parse_url(u, F.lit("AUTHORITY")))
    auth = F.when(proto == "http", F.regexp_replace(auth, ":80$", "")).when(
        proto == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    path = F.try_parse_url(u, F.lit("PATH"))
    path = F.when((path == "") | path.isNull(), F.lit("/")).otherwise(
        F.regexp_replace(path, "/+$", "")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~F.split(p, "=").getItem(0).rlike(drop_param_re),
        )
    )
    qs = F.when(
        query.isNotNull() & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        proto.isNotNull() & auth.isNotNull() & (F.length(auth) > 0),
        F.concat(proto, F.lit("://"), auth, path, qs),
    )


# two-level public suffixes under which the registrable domain is three
# labels deep (heuristic subset of the public-suffix list — the full PSL
# is external data a deployment would broadcast-join instead)
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.tr", "com.sg", "com.hk", "com.tw", "com.ar",
    "co.kr", "or.kr", "co.za", "org.za", "co.id", "or.id",
]


def url_domain(col: Column | str, registrable: bool = True) -> Column:
    """Host → domain grouping key: lowercase, leading ``www.`` dropped;
    with ``registrable=True``, reduced to eTLD+1 using a built-in
    two-level-suffix heuristic (``co.uk`` → three labels kept). NULL when
    the URL has no host. Accepts full URLs or bare hostnames (anything
    without ``://`` is treated as a host)."""
    u = F.col(col) if isinstance(col, str) else col
    host = F.when(u.contains("://"), F.try_parse_url(u, F.lit("HOST"))).otherwise(u)
    host = F.lower(F.regexp_replace(host, r"^www\.", ""))
    if not registrable:
        return host
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(parts, F.greatest(n - 2, F.lit(1)), 3), ".")
    return F.when(
        (n >= 3) & last2.isin(_TWO_LEVEL_SUFFIXES), last3
    ).otherwise(F.when(n >= 2, last2).otherwise(host))


# standard install locations of the full Mozilla public-suffix list —
# the Debian/Ubuntu `publicsuffix` package and OpenJDK both vendor it
_SYSTEM_PSL_PATHS = (
    "/usr/share/publicsuffix/public_suffix_list.dat",
    "/usr/share/publicsuffix/effective_tld_names.dat",
    "/etc/java-17-openjdk/security/public_suffix_list.dat",
)


def system_psl_path() -> "str | None":
    """The full public-suffix list the OS already ships, if any: the
    Debian ``publicsuffix`` package and OpenJDK both install a complete
    publicsuffix.org snapshot (~9.5k rules), so most hosts need no
    download at all. Checks the standard locations plus
    ``$JAVA_HOME/lib/security``; returns None when absent.

    Candidates are PROBED, not trusted by name: OpenJDK's
    ``public_suffix_list.dat`` is a ZIP archive of per-TLD entries
    (starts with ``PK\\x03\\x04``), not the list's text format — a
    JDK-only host must fall through to None (with a clear error from
    the caller), never hand the parser a binary it would choke on."""
    import os

    candidates = list(_SYSTEM_PSL_PATHS)
    java_home = os.environ.get("JAVA_HOME")
    if java_home:
        candidates.append(
            os.path.join(java_home, "lib", "security",
                         "public_suffix_list.dat")
        )
    for p in candidates:
        if not os.path.isfile(p):
            continue
        try:
            with open(p, "rb") as f:
                head = f.read(4096)
            if head.startswith(b"PK\x03\x04") or b"\x00" in head:
                continue  # JDK's zipped per-TLD form, not list text
        except OSError:
            continue
        return p
    return None


def load_psl_rules(spark, path: str, icann_only: bool = False) -> DataFrame:
    """Parse a public-suffix list file (publicsuffix.org/list format) into
    a broadcastable rule table: ``(suffix, ps_labels, is_exception)``.

    Rule encoding (the PSL algorithm's three rule kinds):
    - normal rule ``co.uk``      → (co.uk, 2, false): a host ending in the
      suffix has a public suffix of ``ps_labels`` labels;
    - wildcard ``*.ck``          → (ck, 2, false): any direct child of the
      base is itself a public suffix, so matching hosts get base+1 labels;
    - exception ``!www.ck``      → (www.ck, 1, true): overrides the
      wildcard — the public suffix is the rule minus its first label.

    The full list is ~9.5k rules / ~250 KB — a textbook broadcast table.
    The file is read driver-side (control-plane size), parsed here so the
    engine needs no third-party PSL library. With no file at hand,
    ``operators.psl_snapshot.builtin_psl_rules`` provides a curated
    built-in subset through the same parser.

    ``icann_only``: drop the PRIVATE section (the ``===BEGIN PRIVATE
    DOMAINS===`` block — hosting/CDN suffixes registrars don't delegate).
    Which mode is right depends on the QUESTION: for anti-domination
    caps the private section is correct (``github.io`` pages are
    independent sites — capping all of github.io as one "domain" would
    throttle millions of unrelated authors), while for OWNERSHIP
    analyses it is wrong (the same private suffixes split one hosting
    provider into millions of "domains"). Default False = full list,
    the publicsuffix.org recommendation."""
    with open(path, encoding="utf-8") as f:
        return parse_psl_text(spark, f.read(), icann_only=icann_only)


# the canonical section markers of the publicsuffix.org list format —
# the ICANN section holds registrar-delegated suffixes, the PRIVATE
# section holds operator-submitted ones (hosting/CDN/platform domains)
_PSL_PRIVATE_BEGIN = "// ===BEGIN PRIVATE DOMAINS==="
_PSL_PRIVATE_END = "// ===END PRIVATE DOMAINS==="


def parse_psl_text(spark, text: str, icann_only: bool = False) -> DataFrame:
    """publicsuffix.org list TEXT → the rule table (see load_psl_rules).
    ``icann_only`` drops every rule between the canonical PRIVATE
    section markers (tracked while scanning — the list is one ICANN
    block followed by one private block, but nothing here assumes
    that ordering)."""
    def forms(s: str) -> set[str]:
        # the list publishes IDN rules as Unicode (U-labels) while crawled
        # URL hosts are almost always punycode (A-labels) — emit BOTH
        # renderings of every rule so either host form matches
        out = {s}
        try:
            out.add(s.encode("idna").decode("ascii"))
        except UnicodeError:
            pass  # not IDNA-encodable (already ASCII with odd chars, etc.)
        return out

    rules = []
    in_private = False
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("//"):
            if line.startswith(_PSL_PRIVATE_BEGIN):
                in_private = True
            elif line.startswith(_PSL_PRIVATE_END):
                in_private = False
            continue
        if not line or (icann_only and in_private):
            continue
        line = line.split()[0].lower()  # spec: first token only
        if line.startswith("!"):
            s = line[1:]
            rules += [(v, s.count("."), True) for v in forms(s)]
        elif line.startswith("*."):
            s = line[2:]
            rules += [(v, s.count(".") + 2, False) for v in forms(s)]
        else:
            rules += [(v, line.count(".") + 1, False) for v in forms(line)]
    return spark.createDataFrame(
        rules, schema="suffix string, ps_labels int, is_exception boolean"
    )


# longest suffix candidate generated per host when matching PSL rules; the
# deepest real rules are 5 labels, +1 for the wildcard child slot
_PSL_MAX_LABELS = 6


def with_registrable_domain(
    df: DataFrame,
    url_col: str,
    rules: "DataFrame | str | None" = None,
    out_col: str = "domain",
) -> DataFrame:
    """Append the registrable (eTLD+1) domain of ``url_col`` as
    ``out_col`` — exact PSL semantics when a ``load_psl_rules`` table is
    given, the built-in two-level heuristic otherwise.
    ``rules="builtin"`` runs the exact algorithm over the embedded
    curated snapshot (operators/psl_snapshot.py) — no external file,
    strictly broader than the heuristic.

    Scale shape: rules broadcast (~9.5k rows); candidate suffixes explode
    per DISTINCT host (≤ 6 short rows each), never per document, so the
    PSL match costs one bounded shuffle on host — the corpus itself takes
    exactly one hash join against the resolved host→domain map. Hosts
    that ARE a public suffix ("co.il" itself) resolve to NULL, matching
    the PSL contract that they have no registrable domain.

    ``rules="system"`` loads the COMPLETE publicsuffix.org list the OS
    already vendors (``system_psl_path`` — the Debian ``publicsuffix``
    package / OpenJDK security dir), raising clearly when the host has
    none; ``rules="builtin"`` stays the dependency-free curated subset.
    Either takes an ``:icann`` suffix (``"system:icann"`` /
    ``"builtin:icann"``) to drop the list's PRIVATE section — the
    grouping for OWNERSHIP analyses, where private suffixes like
    ``github.io`` would split one hosting provider into millions of
    "domains"; the default (full list) is the grouping for
    anti-domination caps, where those millions of pages really are
    independent sites (see ``load_psl_rules``). The string forms exist
    so ``pipeline.PrepConfig.domain_psl`` can express every mode.
    """
    if rules is None:
        return df.withColumn(out_col, url_domain(url_col))
    if isinstance(rules, str):
        source, _, section = rules.partition(":")
        icann_only = section == "icann"
        if section and not icann_only:
            raise ValueError(
                f"rules section must be ':icann' when given, got {rules!r}"
            )
        if source == "system":
            p = system_psl_path()
            if p is None:
                raise FileNotFoundError(
                    "with_registrable_domain(rules='system'): no vendored "
                    "public-suffix list found on this host (checked the "
                    "Debian publicsuffix and OpenJDK locations) — pass "
                    "load_psl_rules(spark, path) or use rules='builtin'"
                )
            rules = load_psl_rules(df.sparkSession, p, icann_only=icann_only)
        elif source == "builtin":
            from rtstore_spark.operators.psl_snapshot import builtin_psl_rules

            rules = builtin_psl_rules(df.sparkSession, icann_only=icann_only)
        else:
            raise ValueError(
                "rules must be a DataFrame, 'system[:icann]' or "
                f"'builtin[:icann]', got {rules!r}"
            )
    # raw lowercase host — NOT url_domain(registrable=False), whose
    # www-strip would defeat PSL exception rules like !www.ck (the PSL
    # algorithm itself decides whether www is part of the registrable
    # domain). try_parse_url (java.net.URI) rejects non-ASCII authorities,
    # so raw-Unicode IDN urls fall back to a regex authority extraction
    # (strip userinfo@ and :port) — matching the Unicode rule forms
    # load_psl_rules also emits.
    u = F.col(url_col)
    auth = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]+)", 1)
    raw_host = F.regexp_replace(
        F.element_at(F.split(auth, "@"), -1), r":\d+$", ""
    )
    # the fallback exists ONLY for the IDN case (non-ASCII authorities
    # java.net.URI rejects even though they are well-formed hosts) — it
    # must NOT resurrect ASCII-malformed URLs (spaces, commas, ...)
    # try_parse_url correctly rejects; those stay NULL and out of every
    # domain grouping
    fallback_host = F.when(
        raw_host.rlike(r"[^\x00-\x7F]"), F.nullif(raw_host, F.lit(""))
    )
    host_expr = F.lower(
        F.when(
            u.contains("://"),
            F.coalesce(F.try_parse_url(u, F.lit("HOST")), fallback_host),
        ).otherwise(u)
    )
    hosts = df.select(host_expr.alias("_h")).filter(
        F.col("_h").isNotNull()
    ).distinct()
    parts = F.split(F.col("_h"), r"\.")
    n = F.size(parts)
    # candidate suffixes: the last k labels, k = 1..min(n, max)
    cand = hosts.select(
        "_h", n.alias("_n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(n, F.lit(_PSL_MAX_LABELS))),
                lambda k: F.array_join(F.slice(parts, n - k + 1, k), "."),
            )
        ).alias("_cand"),
    )
    matched = (
        cand.join(F.broadcast(rules), cand["_cand"] == rules["suffix"], "left")
        .groupBy("_h", "_n")
        .agg(
            F.min(F.when(F.col("is_exception"), F.col("ps_labels"))).alias("_exc"),
            F.max(F.when(~F.col("is_exception"), F.col("ps_labels"))).alias("_ps"),
        )
        # exception wins; else longest rule; else the default rule "*"
        .withColumn(
            "_eff", F.coalesce(F.col("_exc"), F.col("_ps"), F.lit(1))
        )
    )
    parts_m = F.split(F.col("_h"), r"\.")
    reg = F.when(
        F.col("_n") > F.col("_eff"),
        F.array_join(
            F.slice(parts_m, F.col("_n") - F.col("_eff"), F.col("_eff") + 1), "."
        ),
    )  # _n <= _eff: the host IS a public suffix → no registrable domain
    host_map = matched.select("_h", reg.alias(out_col))
    return df.withColumn("_h", host_expr).join(host_map, "_h", "left").drop("_h")


def domain_frequency_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt_partitions: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain — deterministic,
    order-independent (the RefinedWeb/C4 anti-domination rule).

    Selection key is the md5-derived 32-bit hash of the id (ties broken
    by id), NOT arrival order: the kept subset is a reproducible pseudo-
    random sample of the domain, independent of crawl order and of how
    the input was partitioned.

    Scale shape: a naive ``row_number() over (partition by domain)``
    puts a hot domain's ENTIRE row set in one task — exactly the skew
    this repo's own ``skew.py`` exists to avoid. Instead the cap runs
    two-level: a salted local top-``cap`` per (domain, hash % S) bounds
    any single task at ~rows/S, then the global top-``cap`` ranks the
    ≤ S·cap survivors per domain — provably a superset of the global
    winners, since every global winner is in its own salt's top-``cap``.
    ``salt_partitions=1`` degenerates to the single-window form (fine
    when domains are known small). Returns the input columns plus
    ``domain_rank`` (1-based within domain).
    """
    if cap <= 0:
        out = df.withColumn("domain_rank", F.lit(1))
        return out.filter(F.lit(False))
    key = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    ranked = df.withColumn("_ok", key)
    if salt_partitions > 1:
        lw = Window.partitionBy(
            F.col(domain_col), F.pmod(F.col("_ok"), F.lit(salt_partitions))
        ).orderBy(F.col("_ok"), F.col(id_col))
        ranked = ranked.withColumn("_lr", F.row_number().over(lw)).filter(
            F.col("_lr") <= cap
        ).drop("_lr")
    gw = Window.partitionBy(domain_col).orderBy(F.col("_ok"), F.col(id_col))
    return (
        ranked.withColumn("domain_rank", F.row_number().over(gw))
        .filter(F.col("domain_rank") <= cap)
        .drop("_ok")
    )
