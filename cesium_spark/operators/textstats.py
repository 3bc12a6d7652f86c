"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID (marker heuristic), document
fingerprinting. Everything except the winnowing fingerprint is pure
native Spark SQL expressions (codegen, pushdown-friendly); winnowing is
a per-doc kernel in a vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

STOPWORDS = ("the", "a", "of", "to", "and", "in", "for", "on", "with")

# marker words per language for the n-gram/marker language-ID heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|los|de|que|y|es)\b",
    "fr": r"\b(le|la|les|et|est|que|des)\b",
}


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len) — whitespace tokenization
    plus a BPE-ish subword estimate (≈ chars/4 heuristic, bounded below
    by word count)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        F.greatest(n_tokens,
                   F.ceil(n_chars / F.lit(4)).cast("int"))
        .cast("long").alias("est_bpe_tokens"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, n_tokens, punct_ratio, stopword_ratio, upper_ratio, score):
    a deterministic composite quality heuristic (length / punctuation /
    stopword coverage), the usual pre-training filter family."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", "")).cast("double")
    n_upper = F.length(F.regexp_replace(text_col, r"[^A-Z]", "")).cast("double")
    stop_rx = "(?i)\\b(" + "|".join(STOPWORDS) + ")\\b"
    n_stop = F.regexp_count(F.col(text_col), F.lit(stop_rx)).cast("double")
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tokens
    upper_ratio = n_upper / n_chars
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2)
    return docs.select(
        F.col(id_col), n_tokens.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stopword_ratio"),
        upper_ratio.alias("upper_ratio"), score.alias("quality_score"))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, lang_pred, lang_score): argmax of per-language marker-word
    densities — the classic cheap n-gram/marker heuristic. Native
    regexp_count per language; deterministic tie-break by language code.
    """
    counts = [
        F.regexp_count(F.lower(F.col(text_col)), F.lit(rx)).cast("double")
        .alias(f"c_{lang}")
        for lang, rx in LANG_MARKERS.items()
    ]
    d = docs.select(F.col(id_col), F.col(text_col), *counts)
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("double")
    scored = d.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct((F.col(f"c_{lang}") / n_tokens).alias("score"),
                     F.lit(lang).alias("lang"))
            for lang in LANG_MARKERS])).alias("s"))
    from pyspark.sql import Window
    w = (scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col)
                .orderBy(F.desc("s.score"), F.asc("s.lang"))))
         .where(F.col("rn") == 1))
    return w.select(F.col(id_col), F.col("s.lang").alias("lang_pred"),
                    F.col("s.score").alias("lang_score"))


def md5_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, fingerprint): md5 of whitespace-normalized, lowercased,
    punctuation-stripped text — the normalization-dedup fingerprint."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(F.trim(norm)).alias("fingerprint"))


def winnowing_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 5,
                           window: int = 4) -> DataFrame:
    """(id, fingerprints array<bigint>): Schleimer et al. winnowing —
    rolling (Karp–Rabin) hashes of k-grams, min per sliding window,
    dedup'd. Per-doc numpy kernel in a vectorized pandas UDF (the hash
    itself is vectorized via cumulative powers; only the doc loop is
    Python, one iteration per document per batch)."""
    B = np.uint64(1000003)
    MOD_MASK = np.uint64(0xFFFFFFFFFFFF)  # 48-bit ring, overflow-free-ish

    def fp_one(text: str) -> list[int]:
        toks = text.lower().split()
        if len(toks) < k:
            return []
        th = np.array([hash_token(t) for t in toks], dtype=np.uint64)
        n = len(toks) - k + 1
        h = np.zeros(n, dtype=np.uint64)
        # polynomial rolling hash over token hashes (vectorized horner)
        acc = np.zeros(len(toks) - k + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):  # modular arithmetic by design
            for j in range(k):
                acc = (acc * B + th[j:j + n]) & MOD_MASK
        h = acc
        if h.size <= window:
            mins = np.array([h.min()])
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(h, window).min(axis=1)
        return sorted({int(x) for x in mins})

    def hash_token(t: str) -> np.uint64:
        v = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):  # FNV-1a is modular by design
            for ch in t.encode():  # deterministic across processes
                v = (v ^ np.uint64(ch)) * np.uint64(1099511628211)
        return v & MOD_MASK

    @pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(fp_one)

    return docs.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprints"))
