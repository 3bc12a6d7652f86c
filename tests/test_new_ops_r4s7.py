"""Round-4 session-7 operators: TF-IDF top-m terms (and friends added
later this session). Layer-2 exact pins vs independent scalar
references, degenerate inputs, determinism, validation."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from cesium_spark.operators.textstats import tfidf_topm


def _ref_tfidf(texts: dict[int, str], m: int):
    """Independent scalar reference: sklearn smooth-idf TF-IDF,
    6-dp round BEFORE ranking, ties (tfidf DESC, term ASC)."""
    toks = {i: [t for t in (x or "").lower().split() if t]
            for i, x in texts.items()}
    n_docs = len(texts)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    rows = []
    for i, ts in toks.items():
        if not ts:
            rows.append((i, None, 0, None, None, 1))
            continue
        counts: dict[str, int] = {}
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
        n = len(ts)
        scored = []
        for t, c in counts.items():
            idf = math.log((n_docs + 1.0) / (df[t] + 1.0)) + 1.0
            scored.append((t, c, df[t], round(c / n * idf, 6)))
        scored.sort(key=lambda r: (-r[3], r[0]))
        for rank, (t, c, d, v) in enumerate(scored[:m], 1):
            rows.append((i, t, c, d, v, rank))
    return sorted(rows)


def _rows(out_df):
    return sorted(
        (r.doc_id, r.term, r.tf_count, r.doc_frequency, r.tfidf, r.rank)
        for r in out_df.collect())


def test_tfidf_matches_scalar_reference(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    texts = {i: " ".join(rng.choices(vocab, k=rng.randint(3, 40)))
             for i in range(30)}
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=3))
    ref = _ref_tfidf(texts, 3)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        assert o[:4] == r[:4], (o, r)
        assert o[4] == pytest.approx(r[4], abs=1e-9)
        assert o[5] == r[5]


def test_tfidf_empty_and_null_docs_keep_placeholder_row(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["alpha beta", "", None]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=5))
    by_doc = {}
    for r in out:
        by_doc.setdefault(r[0], []).append(r)
    # empty/NULL docs: exactly one NULL-term row at rank 1
    for d in (1, 2):
        assert by_doc[d] == [(d, None, 0, None, None, 1)]
    # the non-empty doc gets only real terms (no NULL pad row)
    assert all(r[1] is not None for r in by_doc[0])
    assert len(by_doc[0]) == 2


def test_tfidf_trailing_separator_does_not_pad_topm(spark):
    # "a " splits to ["a", ""] — the artifact empty token must not
    # surface as a NULL row when the doc has < m real terms
    pdf = pd.DataFrame({"doc_id": [0], "text": ["solo \t"]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=5))
    assert len(out) == 1 and out[0][1] == "solo" and out[0][5] == 1


def test_tfidf_rank_tiebreak_is_term_asc(spark):
    # two terms with identical counts in identical docs tie on tfidf;
    # rank must break by term ASC deterministically
    pdf = pd.DataFrame({"doc_id": [0, 1],
                        "text": ["zebra apple", "zebra apple"]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=2))
    for d in (0, 1):
        ranks = {r[1]: r[5] for r in out if r[0] == d}
        assert ranks == {"apple": 1, "zebra": 2}


def test_tfidf_validates_m(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    with pytest.raises(ValueError, match="m must be"):
        tfidf_topm(spark.createDataFrame(pdf), m=0)
