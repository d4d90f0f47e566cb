"""Unit semantics for the session-6 curation ops: paragraph-level
dedup (first occurrence wins), CCNet perplexity terciles (broadcast
cutoffs, no global sort), and the cross-source overlap matrix."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_paragraph_dedup_first_occurrence_wins(spark):
    from gpd_lite_toolbox_spark.text.dedup import paragraph_dedup

    rows = [
        (1, "A\nB\nC"),
        (2, "B\nD"),
        (3, "A\nA"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in paragraph_dedup(df).collect()}
    assert out[1].text == "A\nB\nC" and out[1].n_dropped == 0
    assert out[2].text == "D" and out[2].n_dropped == 1
    assert out[3].text == "" and out[3].n_dropped == 2
    assert out[3].n_paragraphs == 2


def test_paragraph_dedup_keeps_exactly_one_copy_per_paragraph(spark):
    """Conservation: across the corpus every distinct paragraph
    survives exactly once, and kept + dropped == total occurrences."""
    from gpd_lite_toolbox_spark.text.dedup import paragraph_dedup

    rows = [(i, "\n".join(f"p{j % 5}" for j in range(i % 4 + 1)))
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = paragraph_dedup(df)
    kept = (
        out.filter(F.col("text") != "")
        .select(F.explode(F.split("text", "\n")).alias("p"))
    )
    # every distinct input paragraph appears exactly once among kept
    assert kept.groupBy("p").count().filter("count > 1").count() == 0
    n_in = df.select(
        F.sum(F.size(F.split("text", "\n"))).alias("n")
    ).collect()[0].n
    agg = out.agg(
        F.sum("n_paragraphs").alias("np"), F.sum("n_dropped").alias("nd")
    ).collect()[0]
    assert agg.np == n_in
    assert agg.np - agg.nd == kept.count()


def test_paragraph_dedup_null_text_keeps_contract_row(spark):
    from gpd_lite_toolbox_spark.text.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, None), (2, "x")], "id long, text string"
    )
    out = {r.id: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].text == "" and out[1].n_paragraphs == 1
    assert out[1].n_dropped == 0


def test_perplexity_buckets_are_ordered_terciles(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["perplexity_buckets"](spark, sf_dir).collect()
    by = {"head": [], "middle": [], "tail": []}
    for r in out:
        by[r.bucket].append(r.avg_neg_logprob)
    assert all(by.values()), "every tercile must be populated"
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])
    n = len(out)
    # cutoffs are exact percentiles: head holds >= floor(n/3) docs and
    # can exceed it only through score ties at the boundary
    assert len(by["head"]) >= n // 3
    assert len(by["head"]) + len(by["middle"]) >= 2 * n // 3


def test_source_overlap_planted_matrix(spark):
    from gpd_lite_toolbox_spark.text.pipeline import source_overlap

    rows = [
        (1, "x", "A"),
        (2, "x", "B"),
        (3, "y", "A"),
        (4, "y", "A"),
        (5, "z", "C"),
        (6, None, "A"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, source string")
    out = {(r.source_a, r.source_b): r.n_shared
           for r in source_overlap(df).collect()}
    assert out == {("A", "B"): 1, ("A", "A"): 1}


def test_extract_links_and_graph_edges(spark):
    from gpd_lite_toolbox_spark.text.web import extract_links, link_graph

    rows = [
        (1, '<a href="https://a.com/x">1</a><a HREF="https://b.com/">2</a>',
         "s1"),
        (2, "<a href='/rel/path'>r</a><a href='https://a.com/y'>3</a>",
         "s1"),
        (3, "no links here", "s2"),
    ]
    df = spark.createDataFrame(rows, "id long, html string, source string")
    links = {(r.id, r.link, r.domain) for r in extract_links(df).collect()}
    assert links == {
        (1, "https://a.com/x", "a.com"),
        (1, "https://b.com/", "b.com"),
        (2, "/rel/path", ""),
        (2, "https://a.com/y", "a.com"),
    }
    graph = {(r.source, r.target_domain): r.n_links
             for r in link_graph(df).collect()}
    assert graph == {
        ("s1", "a.com"): 2,
        ("s1", "b.com"): 1,
        ("s1", "(relative)"): 1,
    }


def test_canonical_url_variants_collapse(spark):
    from gpd_lite_toolbox_spark.text.web import url_dedup

    rows = [
        (1, "https://WWW.Example.COM/A/b"),
        (2, "https://www.example.com:443/A/b#frag"),
        (3, "https://www.example.com/A/b?"),
        (4, "http://host.net:80"),
        (5, "http://host.net/#top"),
        (6, "http://host.net:8080/"),      # NON-default port: distinct
        (7, "https://www.example.com/A/b?x=1"),  # real query: distinct
        (8, "ftp://Other.Org:21/f"),       # non-http scheme: port kept
        (9, "/relative/path"),             # no scheme: pass through
        (10, "//host.net/protocol-relative"),
        (11, "not a url at all"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.canonical_url: (r.keep_id, r.n_variants)
           for r in url_dedup(df).collect()}
    assert out == {
        "https://www.example.com/A/b": (1, 3),
        "http://host.net/": (4, 2),
        "http://host.net:8080/": (6, 1),
        "https://www.example.com/A/b?x=1": (7, 1),
        "ftp://other.org:21/f": (8, 1),
        # schemeless inputs pass through unchanged — NOT collapsed
        # onto one ':///' key
        "/relative/path": (9, 1),
        "//host.net/protocol-relative": (10, 1),
        "not a url at all": (11, 1),
    }


def test_paragraph_dedup_blank_lines_are_structure(spark):
    """Blank lines are exempt from the fingerprint group — global
    dedup of '' would strip every blank line after the corpus's
    first and destroy paragraph boundaries."""
    from gpd_lite_toolbox_spark.text.dedup import paragraph_dedup

    rows = [(1, "a\n\nb"), (2, "c\n\nd")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in paragraph_dedup(df).collect()}
    assert out[1].text == "a\n\nb" and out[1].n_dropped == 0
    assert out[2].text == "c\n\nd" and out[2].n_dropped == 0


def test_extract_links_embedded_absolute_and_upper_scheme(spark):
    """A relative link carrying an embedded absolute URL must stay
    relative (anchored domain extraction); uppercase schemes are
    absolute (case-insensitive test) with a lowercased host."""
    from gpd_lite_toolbox_spark.text.web import extract_links, link_graph

    rows = [
        (1, '<a href="/redirect?to=https://evil.com/x">r</a>'
            '<a href="HTTPS://A.COM/x">u</a>', "s1"),
    ]
    df = spark.createDataFrame(rows, "id long, html string, source string")
    links = {(r.link, r.domain) for r in extract_links(df).collect()}
    assert links == {
        ("/redirect?to=https://evil.com/x", ""),
        ("HTTPS://A.COM/x", "a.com"),
    }
    graph = {(r.target_domain): r.n_links for r in link_graph(df).collect()}
    assert graph == {"(relative)": 1, "a.com": 1}


def test_gopher_rules_null_text_fails_not_null(spark):
    """NULL-text docs must report passes=False (matching the oracle's
    CASE semantics), not NULL — a filter('passes = false') would
    silently skip NULL."""
    from gpd_lite_toolbox_spark.text.analysis import gopher_rules

    df = spark.createDataFrame(
        [(1, None), (2, "the be of " + "word " * 60)],
        "id long, text string",
    )
    out = {r.id: r.passes for r in gopher_rules(df).collect()}
    assert out[1] is False
    assert out[2] in (True, False)  # real text: definite verdict


def test_mixture_plan_zero_doc_stratum_keeps_row(spark):
    """A targeted stratum with no documents must appear in the plan
    (n_docs=0, epochs=0) instead of silently vanishing with its
    budget share."""
    from gpd_lite_toolbox_spark.text.corpus import mixture_plan

    docs = spark.createDataFrame(
        [(1, "five words of source a", "a")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in
           mixture_plan(docs, {"a": 1, "b": 1}, 1000).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"].n_docs == 0 and out["b"].n_tokens == 0
    assert out["b"].planned_tokens == 500
    assert out["b"].epochs == 0.0 and out["b"].oversampled is False
    assert out["a"].n_tokens == 5 and out["a"].oversampled


def test_bigram_pmi_finds_planted_collocation(spark):
    """'aa bb' always co-occur (every occurrence of aa precedes bb);
    filler tokens pair randomly — the planted collocation must rank
    first with the highest PMI."""
    from gpd_lite_toolbox_spark.text.corpus import bigram_pmi

    filler = ["x", "y", "z", "w"]
    rows = []
    for i in range(40):
        toks = [filler[(i + j) % 4] for j in range(6)]
        toks[2:2] = ["aa", "bb"]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "id long, text string")
    out = bigram_pmi(df, min_count=3, top_k=5).collect()
    assert (out[0].a, out[0].b) == ("aa", "bb")
    assert out[0].pmi == max(r.pmi for r in out)
    assert out[0].n_ab == 40


def test_token_spectrum_counts_types_per_frequency(spark):
    from gpd_lite_toolbox_spark.text.corpus import token_spectrum

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b d")], "id long, text string"
    )
    out = {r.freq: r.n_types for r in token_spectrum(df).collect()}
    # a:3, b:3, c:1, d:1
    assert out == {3: 2, 1: 2}
