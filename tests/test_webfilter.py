"""registrable_domain + repetition_stats (operators/text.py, r7):
hand-case pins for the URL canonicalisation slice arithmetic and the
Gopher/C4 repetition signals. The SQL-twin equivalence is gated by
check_oracles (`domain_extract`, `gopher_repetition`).
"""

import pytest

from pyrate_spark.operators.text import registrable_domain, repetition_stats


def _extract(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    rows = registrable_domain(df).orderBy("doc_id").collect()
    return [(r.host, r.registrable, r.is_subdomain) for r in rows]


class TestRegistrableDomain:
    def test_plain_two_label_host(self, spark):
        assert _extract(spark, ["https://example.com/a/b"]) == [
            ("example.com", "example.com", False)]

    def test_subdomain_stripped(self, spark):
        assert _extract(spark, ["https://www.blog.example.com/x"]) == [
            ("www.blog.example.com", "example.com", True)]

    def test_multi_label_public_suffix(self, spark):
        assert _extract(spark, ["https://news.bbc.co.uk/sport"]) == [
            ("news.bbc.co.uk", "bbc.co.uk", True)]

    def test_bare_multi_label_suffix_host(self, spark):
        # exactly registrable.suffix — nothing to strip
        assert _extract(spark, ["http://bbc.co.uk"]) == [
            ("bbc.co.uk", "bbc.co.uk", False)]

    def test_port_userinfo_case_stripped(self, spark):
        assert _extract(
            spark, ["HTTPS://user:pw@WWW.Example.COM:8443/p?q=1#f"]) == [
            ("www.example.com", "example.com", True)]

    def test_single_label_host(self, spark):
        assert _extract(spark, ["http://localhost:9000/health"]) == [
            ("localhost", "localhost", False)]

    def test_extra_suffix_pluggable(self, spark):
        df = spark.createDataFrame(
            [(0, "https://shop.foo.com.sg/")], "doc_id long, url string")
        base = registrable_domain(df).first()
        extended = registrable_domain(
            df, extra_suffixes=("com.sg",)).first()
        assert base.registrable == "com.sg"          # unknown suffix
        assert extended.registrable == "foo.com.sg"  # plugged in


class TestRepetitionStats:
    def _stats(self, spark, text, **kw):
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = repetition_stats(df, **kw).collect()
        return rows[0] if rows else None

    def test_counts_and_ratios(self, spark):
        # 6 tokens, 4 distinct, mode count 3
        r = self._stats(spark, "a a a b  c d")
        assert (r.n_words, r.n_distinct) == (6, 4)
        assert r.top_word_frac == pytest.approx(0.5)
        assert r.distinct_ratio == pytest.approx(round(4 / 6, 6))
        assert not r.keep                          # 0.5 > 0.2 top-word

    def test_diverse_doc_kept(self, spark):
        r = self._stats(spark, "one two three four five six")
        assert r.top_word_frac == pytest.approx(round(1 / 6, 6))
        assert r.distinct_ratio == pytest.approx(1.0)
        assert r.keep

    def test_case_folded_before_counting(self, spark):
        r = self._stats(spark, "The the THE x")
        assert (r.n_words, r.n_distinct) == (4, 2)
        assert r.top_word_frac == pytest.approx(0.75)

    def test_empty_doc_drops_out(self, spark):
        assert self._stats(spark, "   ") is None

    def test_thresholds_parameterised(self, spark):
        r = self._stats(spark, "a a b c d e f g h j",
                        max_top_word_frac=0.2, min_distinct_ratio=0.95)
        assert r.top_word_frac == pytest.approx(0.2)   # at the bound: kept
        assert not r.keep                              # 0.9 < 0.95 distinct


class TestStripBoilerplate:
    def _df(self, spark, rows):
        from pyrate_spark.operators.dedup import strip_boilerplate
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = strip_boilerplate(df, delim="\n", max_df=2)
        return {r.doc_id: (r.text_clean, r.n_spans_kept)
                for r in out.collect()}

    def test_high_df_span_dropped_order_kept(self, spark):
        rows = [(0, "intro\ncookie banner\nbody zero"),
                (1, "cookie banner\nbody one"),
                (2, "body two\ncookie banner"),
                (3, "cookie banner\nbody three\ncookie banner")]
        out = self._df(spark, rows)
        # 'cookie banner' df=4 > max_df=2 -> dropped everywhere
        assert out[0] == ("intro\nbody zero", 2)
        assert out[1] == ("body one", 1)
        assert out[2] == ("body two", 1)
        assert out[3] == ("body three", 1)

    def test_all_boilerplate_doc_vanishes(self, spark):
        rows = [(0, "nav"), (1, "nav"), (2, "nav"), (3, "nav\nreal")]
        out = self._df(spark, rows)
        assert set(out) == {3}
        assert out[3] == ("real", 1)

    def test_empty_spans_normalised(self, spark):
        rows = [(0, "a\n\n\nb"), (1, "c")]
        out = self._df(spark, rows)
        assert out[0] == ("a\nb", 2)

    def test_frac_threshold_path(self, spark):
        from pyrate_spark.operators.dedup import strip_boilerplate
        rows = [(i, f"common\nuniq{i}") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # floor(0.5 * 4) = 2 -> 'common' (df=4) drops, uniq stays
        out = {r.doc_id: r.text_clean
               for r in strip_boilerplate(df, max_df_frac=0.5).collect()}
        assert out == {i: f"uniq{i}" for i in range(4)}


class TestDecontaminate:
    def test_ngram_overlap_flags(self, spark):
        from pyrate_spark.operators.dedup import decontaminate
        docs = spark.createDataFrame(
            [(0, "the quick brown fox jumps high"),
             (1, "a totally different sentence here now"),
             (2, "quick brown fox appears again today")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, "lazy dogs watch the quick brown fox sleep")],
            "doc_id long, text string")
        out = {r.doc_id: r.n_shared_shingles
               for r in decontaminate(docs, bench).collect()}
        # doc 0 shares 'the quick brown' + 'quick brown fox';
        # doc 2 shares 'quick brown fox'; doc 1 is clean (drops out)
        assert out == {0: 2, 2: 1}

    def test_min_shared_threshold(self, spark):
        from pyrate_spark.operators.dedup import decontaminate
        docs = spark.createDataFrame(
            [(0, "the quick brown fox jumps high"),
             (2, "quick brown fox appears again today")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, "lazy dogs watch the quick brown fox sleep")],
            "doc_id long, text string")
        out = decontaminate(docs, bench, min_shared=2).collect()
        assert [(r.doc_id, r.n_shared_shingles) for r in out] == [(0, 2)]


class TestPiiScrub:
    def _scrub(self, spark, text):
        from pyrate_spark.operators.text import pii_scrub
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return pii_scrub(df).first()

    def test_email_ip_number_all_scrubbed(self, spark):
        r = self._scrub(spark,
                        "mail bob.smith+x@corp.example.org from "
                        "192.168.0.17 acct 1234567890 ok")
        assert (r.n_email, r.n_ipv4, r.n_longnum) == (1, 1, 1)
        assert r.text_scrubbed == ("mail <EMAIL> from <IP> acct "
                                   "<NUM> ok")

    def test_clean_text_untouched(self, spark):
        r = self._scrub(spark, "no sensitive content at all")
        assert (r.n_email, r.n_ipv4, r.n_longnum) == (0, 0, 0)
        assert r.text_scrubbed == "no sensitive content at all"

    def test_short_number_kept(self, spark):
        r = self._scrub(spark, "call 12345678 today")   # 8 digits < 9
        assert r.n_longnum == 0
        assert "12345678" in r.text_scrubbed

    def test_multiple_matches_counted(self, spark):
        r = self._scrub(spark, "a@b.co c@d.io and 10.0.0.1 10.0.0.2")
        assert (r.n_email, r.n_ipv4) == (2, 2)
        assert r.text_scrubbed == "<EMAIL> <EMAIL> and <IP> <IP>"
