"""Unit laws for octospark.webops: anchor-text census, table-field
extraction, per-host quota, per-language LM buckets."""

from __future__ import annotations

import octospark.webops as W


def test_anchor_text_pairs_match_templates(spark, sf_dir):
    """Every (href, anchor) pair must be one of the fixed template
    pairs, nav anchors must be linked from every nav-bearing page, and
    the deal anchors only from template-1 pages."""
    rows = W.QUERIES["link_anchor_text"](spark, sf_dir).collect()
    by_href = {(r.href, r.anchor): r for r in rows}
    template_pairs = {
        ("/", "Home"), ("/news", "News"), ("/about", "About us"),
        ("/contact", "Contact"), ("/login", "Log in"),
        ("/signup", "Sign up"), ("/topics", "topics"),
        ("/privacy", "Privacy"), ("/terms", "Terms"),
        ("/sitemap", "Sitemap"), ("/deal1", "Shop now"),
        ("/deal2", "Click here"), ("/deal3", "Learn more"),
        ("/r1", "Related story one"), ("/r2", "Related story two"),
        ("/r3", "Related story three"), ("/r4", "Related story four"),
        ("/r5", "Related story five"),
    }
    # EVERY output row must be one of the fixed template pairs — a
    # loosened tag regexp emitting a partial-capture row fails here
    assert set(by_href) == template_pairs
    # footer pairs appear on EVERY page
    from octospark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    for href, anchor in [
        ("/privacy", "Privacy"),
        ("/terms", "Terms"),
        ("/sitemap", "Sitemap"),
        ("/topics", "topics"),
    ]:
        r = by_href[(href, anchor)]
        assert r.n_links == n_docs and r.n_pages == n_docs
    # deal links only on t==1 pages
    docs = load_table(spark, sf_dir, "documents")
    n_t1 = docs.filter(docs.doc_id % 6 == 1).count()
    assert by_href[("/deal1", "Shop now")].n_pages == n_t1
    # one anchor string per target in the fixed templates
    assert len({h for (h, a) in by_href}) == len(by_href)


def test_table_fields_exact_values(spark, sf_dir):
    """Views/Shares must equal the htmlgen pure functions of doc_id,
    and only template-4 pages may emit a row."""
    rows = W.QUERIES["extract_table_fields"](spark, sf_dir).collect()
    assert rows, "no table rows extracted"
    for r in rows:
        doc_id = int(r.url.rsplit("/", 1)[1])
        assert doc_id % 6 == 4
        assert r.views == doc_id * 7 % 1000
        assert r.shares == doc_id * 3 % 100


def test_domain_quota_cap_and_ordering(spark, sf_dir):
    """Per host: exactly min(k, n_docs) keeps; kept docs are the
    longest-first prefix with doc_id tiebreak; one row per input doc."""
    out = W.QUERIES["corpus_domain_quota"](spark, sf_dir).collect()
    from collections import defaultdict

    from octospark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    hosts = defaultdict(list)
    for r in out:
        hosts[r.source].append(r)
    for src, rs in hosts.items():
        rs.sort(key=lambda r: (-r.n_chars, r.doc_id))
        for rank, r in enumerate(rs, start=1):
            assert r.host_rank == rank
            assert r.keep == (rank <= W._QUOTA_K)
        assert sum(r.keep for r in rs) == min(W._QUOTA_K, len(rs))


def test_lm_bucket_tertiles_are_balanced_and_monotone(spark, sf_dir):
    """Within each language: bucket is monotone in mean_commonness
    (every head doc scores >= every middle doc >= every tail doc), and
    the three buckets are tertile-sized within rounding."""
    from collections import defaultdict

    rows = W.QUERIES["text_lm_bucket"](spark, sf_dir).collect()
    langs = defaultdict(list)
    for r in rows:
        langs[r.lang].append(r)
    assert len(langs) >= 2
    for lang, rs in langs.items():
        lo = {"tail": 0, "middle": 1, "head": 2}
        rs.sort(key=lambda r: r.mean_commonness)
        order = [lo[r.bucket] for r in rs]
        assert order == sorted(order), f"bucket not monotone for {lang}"
        n = len(rs)
        for b in ("head", "middle", "tail"):
            cnt = sum(1 for r in rs if r.bucket == b)
            # quantile_cont cutoffs put ~n/3 per bucket; ties can shift
            # a couple of docs across a cutoff
            assert abs(cnt - n / 3) <= max(2, 0.1 * n), (lang, b, cnt, n)


def test_headings_outline_matches_templates(spark, sf_dir):
    """Every page yields h1 (site header) at pos 0 and h2 (doc title)
    at pos 1; h4 'Comments' appears exactly on template-3 pages at pos
    2; nothing else is emitted."""
    from collections import defaultdict

    from octospark.sources import load_table

    rows = W.QUERIES["extract_headings_outline"](spark, sf_dir).collect()
    pages = defaultdict(list)
    for r in rows:
        pages[r.url].append(r)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(pages) == n_docs
    for url, rs in pages.items():
        doc_id = int(url.rsplit("/", 1)[1])
        src = url.split("//")[1].split(".")[0]
        rs.sort(key=lambda r: r.pos)
        want = [(0, 1, f"Example Site {src}"), (1, 2, f"Document {doc_id}")]
        if doc_id % 6 == 3:
            want.append((2, 4, "Comments"))
        assert [(r.pos, r.level, r.heading) for r in rs] == want


def test_pack_sequences_tiles_the_token_stream(spark, sf_dir):
    """Within each shard, docs tile the concatenated token stream with
    no gaps or overlaps: doc i+1 starts exactly where doc i ended, pack
    ids re-derive from the running offset, and every window boundary a
    doc straddles is accounted for (end_pack - start_pack windows)."""
    from collections import defaultdict

    rows = W.QUERIES["corpus_pack_sequences"](spark, sf_dir).collect()
    B = W._PACK_BUDGET
    shards = defaultdict(list)
    for r in rows:
        shards[r.shard].append(r)
    assert len(shards) == W._PACK_SHARDS
    for shard, rs in shards.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.n_tok >= 1
            assert r.start_pack == cum // B
            assert r.start_off == cum % B
            cum += r.n_tok
            assert r.end_pack == (cum - 1) // B
            # straddle count = tokens past the first window boundary
            assert r.end_pack - r.start_pack == (r.start_off + r.n_tok - 1) // B


def test_url_pattern_census_covers_the_four_styles(spark, sf_dir):
    """Each source yields exactly the synthesized path templates, the
    per-source counts sum to its doc count, and the exemplar is a
    member of its own pattern group."""
    import re
    from collections import defaultdict

    from octospark.sources import load_table

    rows = W.QUERIES["crawl_url_pattern_census"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    ).collect()
    per_source = defaultdict(int)
    for d in docs:
        per_source[d.source] += 1
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    assert set(by_source) == set(per_source)
    fixed = {"/doc/N", "/article/N/N/N", "/p/N?page=N"}
    # all four styles appear corpus-wide (sources correlate with
    # doc_id % 20, so a single source sees only one style)
    all_pats = {r.pattern for r in rows}
    assert fixed <= all_pats
    assert any(re.fullmatch(r"/tag/\w+/item-N", p) for p in all_pats)
    for src, rs in by_source.items():
        pats = {r.pattern for r in rs}
        assert all(p in fixed or re.fullmatch(r"/tag/\w+/item-N", p)
                   for p in pats)
        assert sum(r.n_urls for r in rs) == per_source[src]
        for r in rs:
            # exemplar reduces to its own pattern
            path = r.sample_url.split(".example.org", 1)[1]
            assert re.sub(r"[0-9]+", "N", path) == r.pattern


def test_quality_tiers_compose_the_stage_verdicts(spark, sf_dir):
    """One row per input doc; tier agrees with the composed stage
    flags (duplicate beats rejected beats bucket), and every kept doc's
    tier is its LM bucket."""
    from octospark.sources import load_table

    rows = W.QUERIES["corpus_quality_tiers"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    seen = set()
    for r in rows:
        assert r.doc_id not in seen
        seen.add(r.doc_id)
        if not r.dedup_keep:
            assert r.tier == "duplicate"
        elif not r.quality_ok:
            assert r.tier == "rejected"
        else:
            assert r.tier == r.bucket in {"head", "middle", "tail"}
    tiers = {r.tier for r in rows}
    assert {"head", "middle", "tail"} <= tiers or "rejected" in tiers


def test_normalize_round_trips_noise(spark, sf_dir):
    """normalize(noisy(text)) must equal the original lowercase text
    for every noise style, and the sha must be the sha of that text."""
    from octospark.sources import load_table

    out = {r.doc_id: r for r in
           W.QUERIES["text_normalize"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(out) == len(docs)
    import hashlib

    for d in docs:
        r = out[d.doc_id]
        assert r.norm_text == d.text, d.doc_id
        assert r.norm_sha == hashlib.sha256(d.text.encode()).hexdigest()


def test_dedup_normalized_merges_what_raw_hashing_splits(spark, sf_dir):
    """Normalized groups must equal exact-text groups of the original
    corpus, and at least one multi-member group must span >1 raw
    variant (proving the merge is doing real work over the noise)."""
    from collections import Counter

    from octospark.sources import load_table

    rows = W.QUERIES["dedup_exact_normalized"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    text_groups = Counter(d.text for d in docs)
    assert sum(r.n_dups for r in rows) == len(docs)
    assert sorted(r.n_dups for r in rows) == sorted(text_groups.values())
    multi = [r for r in rows if r.n_dups > 1]
    if multi:  # sf0.001+ fixtures contain duplicate texts
        assert any(r.n_raw_variants > 1 for r in multi)
    for r in rows:
        assert 1 <= r.n_raw_variants <= min(r.n_dups, 3)


def test_mix_weights_equalize_languages(spark, sf_dir):
    """One row per input doc; per-language total weight must be N/k
    (every language contributes equally after weighting), and weight
    is constant within a language."""
    from collections import defaultdict

    rows = W.QUERIES["corpus_mix_weights"](spark, sf_dir).collect()
    langs = defaultdict(list)
    for r in rows:
        langs[r.lang].append(r)
    n = len(rows)
    k = len(langs)
    for lang, rs in langs.items():
        assert len({r.weight for r in rs}) == 1
        assert len(rs) == rs[0].lang_docs
        total = sum(r.weight for r in rs)
        assert abs(total - n / k) < 1e-6 * n, (lang, total, n / k)


def test_politeness_schedule_slots_dense_and_eta_linear(spark, sf_dir):
    """Per host: fetch slots are exactly 1..n_host (dense, no gaps),
    eta is (slot-1)*delay, and slot order follows (n_chars desc,
    doc_id asc) priority."""
    rows = W.QUERIES["crawl_politeness_schedule"](spark, sf_dir).collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
        assert r.eta_ms == (r.fetch_slot - 1) * W._POLITENESS_DELAY_MS
    from octospark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    chars = {
        f"https://{d.source}.example.org/doc/{d.doc_id}": (
            d.n_chars, d.doc_id
        )
        for d in docs
    }
    for host, hrows in by_host.items():
        slots = sorted(r.fetch_slot for r in hrows)
        assert slots == list(range(1, len(hrows) + 1))
        ordered = sorted(hrows, key=lambda r: r.fetch_slot)
        prios = [(-chars[r.url][0], chars[r.url][1]) for r in ordered]
        assert prios == sorted(prios)


def test_bloom_snapshot_no_false_negatives_and_fp_rate(spark, sf_dir):
    """The Bloom gate may only err one way: every exact duplicate of
    the old snapshot MUST be flagged maybe_seen (no false negatives);
    the false-positive side is bounded (filter is sized ~12k bits for
    the sf0.001 snapshot) and deterministic."""
    rows = W.QUERIES["dedup_bloom_snapshot"](spark, sf_dir).collect()
    assert rows, "probe batch is empty"
    for r in rows:
        if r.exact_seen:
            assert r.maybe_seen, f"false negative at doc {r.doc_id}"
    n = len(rows)
    n_maybe = sum(r.maybe_seen for r in rows)
    n_exact = sum(r.exact_seen for r in rows)
    assert n_maybe >= n_exact
    # false-positive share of the definitely-new rows stays well under
    # 50% — a degenerate hash (everything collides) fails here
    fps = n_maybe - n_exact
    assert fps <= max(1, (n - n_exact) // 2)
    # determinism: a second run produces the identical flag set
    again = W.QUERIES["dedup_bloom_snapshot"](spark, sf_dir).collect()
    assert {(r.doc_id, r.maybe_seen, r.exact_seen) for r in rows} == {
        (r.doc_id, r.maybe_seen, r.exact_seen) for r in again
    }


def test_bloom_bits_stay_in_segments_and_bigint_range():
    """Bit positions land in their own hash segment (blocked filter)
    and the multiply never leaves BIGINT for any fp < 1e9+7."""
    worst = 1000000006
    for j, c in enumerate(W._BLOOM_CS):
        assert worst * c < 2**63 - 1
        lo, hi = j * W._BLOOM_SEG, (j + 1) * W._BLOOM_SEG
        for fp in (0, 1, 12345, worst):
            bit = j * W._BLOOM_SEG + (fp * c) % W._BLOOM_SEG
            assert lo <= bit < hi


def test_readability_stats_match_python_recount(spark, sf_dir):
    """Counting columns and the three ratios agree with a direct
    Python recount on every doc (division = single IEEE op)."""
    import re

    from octospark.sources import load_table

    rows = W.QUERIES["text_readability_stats"](spark, sf_dir).collect()
    texts = {
        d.doc_id: d.text or ""
        for d in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(texts)
    for r in rows:
        t = texts[r.doc_id]
        n_words = len(t.split(" "))
        assert r.n_words == n_words >= 1
        assert r.n_word_chars == len(t.replace(" ", ""))
        assert r.n_syllables == len(re.findall("[aeiou]+", t))
        assert r.n_long_words == len(re.findall("[^ ]{7,}", t))
        assert r.mean_word_len == r.n_word_chars / n_words
        assert r.syllables_per_word == r.n_syllables / n_words
        assert r.long_word_ratio == r.n_long_words / n_words


def test_tokenizer_fertility_recounts_and_consistency(spark, sf_dir):
    """Per-lang sums equal a Python recount; ratios are the single
    divisions of those sums; every lang present exactly once."""
    import re

    from octospark.sources import load_table

    rows = W.QUERIES["text_tokenizer_fertility"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    want: dict = {}
    for d in docs:
        t = d.text or ""
        acc = want.setdefault(d.lang, [0, 0, 0, 0])
        acc[0] += 1
        acc[1] += len(t.split(" "))
        acc[2] += len(re.findall("[a-z]+|[0-9]+", t))
        acc[3] += len(t)
    assert {r.lang for r in rows} == set(want)
    for r in rows:
        n_docs, ws, re_, ch = want[r.lang]
        assert (r.n_docs, r.total_words, r.total_tokens, r.total_chars) == (
            n_docs, ws, re_, ch,
        )
        assert r.fertility == re_ / ws
        assert r.chars_per_token == ch / re_


def test_extract_regression_check_all_templates_byte_identical(
    spark, sf_dir
):
    """The promoted regression gate: every template bucket reports
    n_byte_identical == n_docs (the north-rule invariant), and all 6
    templates are present."""
    rows = W.QUERIES["extract_regression_check"](spark, sf_dir).collect()
    assert {r.template for r in rows} == set(range(6))
    total = 0
    for r in rows:
        assert r.n_byte_identical == r.n_docs, (
            f"template {r.template}: {r.n_docs - r.n_byte_identical} "
            f"doc(s) not byte-identical"
        )
        total += r.n_docs
    from octospark.sources import load_table

    assert total == load_table(spark, sf_dir, "documents").count()


def test_snapshot_retention_accounting_laws(spark, sf_dir):
    """Per url: version count matches the synthesis (doc_id%4+1),
    kept + reclaimable == total, and the reclaimable set is exactly
    the versions below max-K+1 recomputed in Python."""
    rows = W.QUERIES["table_snapshot_retention"](spark, sf_dir).collect()
    import re

    from octospark.sources import load_table

    chars = {
        d.doc_id: d.n_chars
        for d in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        doc_id = int(re.search(r"/doc/(\d+)$", r.url).group(1))
        n = doc_id % 4 + 1
        assert r.n_versions == n
        # byte basis from the SOURCE table, not from the query's own
        # output — a wrong bytes column cannot satisfy this
        n_chars = chars[doc_id]
        assert r.bytes_total == n * n_chars + sum(range(n))
        versions = [(v, n_chars + v) for v in range(n)]
        maxv = n - 1
        kept = sum(b for v, b in versions if v > maxv - W._RETAIN_K)
        assert r.bytes_kept == kept
        assert r.bytes_kept + r.bytes_reclaimable == r.bytes_total


def test_dsir_weights_bounded_and_target_lang_scores_higher(
    spark, sf_dir
):
    """importance is in (0, 1]; the target language's mean importance
    strictly exceeds every other language's mean (its words are, by
    construction, the target distribution); and a Python recount of
    one doc's fixed-point score matches exactly."""
    import math

    from octospark.sources import load_table

    out = {
        r.doc_id: r
        for r in W.QUERIES["corpus_dsir_weights"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    by_lang: dict = {}
    for d in docs:
        r = out[d.doc_id]
        assert 0.0 < r.importance <= 1.0
        by_lang.setdefault(d.lang, []).append(r.importance)
    means = {lg: sum(v) / len(v) for lg, v in by_lang.items()}
    tgt = means.pop(W._DSIR_TARGET_LANG)
    assert all(tgt > m for m in means.values()), means
    # exact fixed-point replay on one document
    raw: dict = {}
    tgt_cnt: dict = {}
    for d in docs:
        for w in (d.text or "").split(" "):
            bkt = (len(w) * 31 + ord(w[0]) if w else len(w) * 31) \
                % W._DSIR_BUCKETS
            raw[bkt] = raw.get(bkt, 0) + 1
            if d.lang == W._DSIR_TARGET_LANG:
                tgt_cnt[bkt] = tgt_cnt.get(bkt, 0) + 1
    d0 = docs[0]
    score = 0
    for w in (d0.text or "").split(" "):
        bkt = (len(w) * 31 + ord(w[0]) if w else len(w) * 31) \
            % W._DSIR_BUCKETS
        score += math.floor(
            float(tgt_cnt.get(bkt, 0) * W._DSIR_FP_SHIFT) / raw[bkt]
        )
    assert out[d0.doc_id].raw_score == score


def test_fertility_zero_token_lang_yields_null_not_error(spark):
    """A language slice whose docs contain no regex tokens must yield
    chars_per_token = NULL (matching DuckDB's x/0), not an ANSI
    DIVIDE_BY_ZERO task failure — pinned on an in-memory frame."""
    import duckdb

    df = spark.createDataFrame(
        [(0, "!!! ...", "xx"), (1, "???", "xx"), (2, "two words", "en")],
        "doc_id long, text string, lang string",
    )
    # the registered callable takes (spark, sf_dir); drive the same
    # expressions directly against the in-memory frame
    from pyspark.sql import functions as F

    t = F.coalesce(F.col("text"), F.lit(""))
    base = df.select(
        "lang",
        F.size(F.split(t, " ")).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all(t, F.lit("[a-z]+|[0-9]+"), 0))
        .cast("long").alias("n_re"),
        F.length(t).cast("long").alias("n_ch"),
    )
    agg = base.groupBy("lang").agg(
        F.sum("n_re").alias("total_tokens"),
        F.sum("n_ch").alias("total_chars"),
    )
    res = {
        r.lang: r
        for r in agg.select(
            "lang",
            (
                F.col("total_chars").cast("double")
                / F.nullif(F.col("total_tokens"), F.lit(0))
            ).alias("cpt"),
        ).collect()
    }
    assert res["xx"].cpt is None
    assert res["en"].cpt == 9 / 2
    # and DuckDB's replica of the same guard also yields NULL
    duck = duckdb.sql(
        "SELECT CAST(11 AS DOUBLE) / nullif(0, 0) AS cpt"
    ).fetchone()[0]
    assert duck is None


def test_mix_temperature_matches_sqrt_law(spark, sf_dir):
    """Scaled shares equal sqrt(share) exactly, probabilities sum to 1
    within an ulp, and low-resource languages gain share relative to
    their raw proportion while the head loses."""
    import math
    from collections import Counter

    from octospark.sources import load_table

    langs = Counter(
        d.lang for d in load_table(spark, sf_dir, "documents").collect()
    )
    n = sum(langs.values())
    rows = W.QUERIES["corpus_mix_temperature"](spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(langs)
    zsum = 0.0
    for lang, cnt in sorted(langs.items()):
        zsum = zsum + math.sqrt(float(cnt) / n)
    for r in rows:
        assert r.lang_docs == langs[r.lang]
        assert r.scaled == math.sqrt(float(langs[r.lang]) / n)
        assert r.sample_prob == r.scaled / zsum
        raw_share = langs[r.lang] / n
        if raw_share < 1.0 / len(langs):
            assert r.sample_prob > raw_share  # upsampled tail
    assert abs(sum(r.sample_prob for r in rows) - 1.0) < 1e-12


def test_zipf_histogram_buckets_recount(spark, sf_dir):
    """Bucket membership equals a Python recount with exact integer
    log2, and the bucket totals conserve both the vocabulary size and
    the corpus token count."""
    from collections import Counter, defaultdict

    from octospark.sources import load_table

    freq: Counter = Counter()
    total_tokens = 0
    for d in load_table(spark, sf_dir, "documents").collect():
        if d.text is None:
            continue
        ws = d.text.split(" ")
        total_tokens += len(ws)
        freq.update(ws)
    want_n: dict = defaultdict(int)
    want_occ: dict = defaultdict(int)
    for w, f in freq.items():
        b = f.bit_length() - 1
        want_n[b] += 1
        want_occ[b] += f
    rows = W.QUERIES["text_zipf_histogram"](spark, sf_dir).collect()
    assert {r.log2_freq: r.n_words for r in rows} == dict(want_n)
    assert {r.log2_freq: r.total_occurrences for r in rows} == dict(
        want_occ
    )
    assert sum(r.n_words for r in rows) == len(freq)
    assert sum(r.total_occurrences for r in rows) == total_tokens


def test_spans_consistency_gate_all_templates(spark, sf_dir):
    """Every template reports n_consistent == n_docs: spans tile the
    extracted text exactly (start 0, one-char separators, non-empty,
    last end == len)."""
    rows = W.QUERIES["extract_spans_consistency_check"](
        spark, sf_dir
    ).collect()
    assert {r.template for r in rows} == set(range(6))
    for r in rows:
        assert r.n_consistent == r.n_docs, r
