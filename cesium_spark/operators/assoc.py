"""Association-rule mining (A-Priori at pair order, Agrawal & Srikant
1994): which items co-occur in a basket more than chance — the classic
market-basket OLAP workload, here over conversation/session baskets
(e.g. which tools or event kinds co-fire within a user-day). Emits
DIRECTED rules a → b with the three standard measures:

- support    = n_ab / N          (how common the pair is at all)
- confidence = n_ab / n_a        (P(b | a) under the basket measure)
- lift       = n_ab·N / (n_a·n_b) (co-occurrence vs independence;
                                   1 = independent, > 1 = attraction)

Scale shape (10^12 turns): baskets collapse to DISTINCT (basket, item)
rows first (map-side combinable — within-basket repeats are presence,
not weight), so the pair self-join is BASKET-equi: a basket with m
distinct items emits m·(m−1)/2 pair rows, bounded by the item-domain
size squared when items are categorical (tools, event kinds) — never a
corpus × corpus join. Item marginals are a tiny table (one row per
distinct item) and broadcast back; the basket total N rides a 1-row
broadcast (the bm25 corpus-stats idiom — no driver action anywhere).
For UNBOUNDED item domains (raw URLs), cap the per-basket item count
upstream or the quadratic per-basket fan-out is a scale-killer — the
same hot-key analysis as ngram_jaccard_pairs' max_df.

Determinism: all counts are exact integers; ``min_pair_count`` is an
integer threshold (no float support cut, so the rule set cannot flip
between engines); each measure is one fixed division tree over exact
integers — full-value SQL-restatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(df: DataFrame, basket_cols: list[str],
                      item_col: str,
                      min_pair_count: int = 1) -> DataFrame:
    """Directed pair rules over baskets keyed by ``basket_cols``:
    (antecedent, consequent, n_ant, n_cons, n_both, n_baskets,
    support, confidence, lift). NULL items carry no information and
    are dropped up front; baskets whose every item is NULL therefore
    do not count toward N (N = baskets with ≥ 1 item — the
    transaction-table convention)."""
    if not basket_cols:
        raise ValueError("basket_cols must be non-empty")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}")
    b = (df.where(F.col(item_col).isNotNull())
         .select(*basket_cols, F.col(item_col).alias("item"))
         .distinct())
    total = (b.select(*basket_cols).distinct()
             .agg(F.count(F.lit(1)).alias("n_baskets")))
    marg = b.groupBy(F.col("item")).agg(F.count(F.lit(1)).alias("n_item"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, basket_cols)
             .where(F.col("l.item") < F.col("r.item"))
             .groupBy(F.col("l.item").alias("ia"),
                      F.col("r.item").alias("ib"))
             .agg(F.count(F.lit(1)).alias("n_both"))
             .where(F.col("n_both") >= F.lit(min_pair_count)))
    directed = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"),
        "n_both").unionByName(pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"), "n_both"))
    ma = F.broadcast(marg.select(F.col("item").alias("antecedent"),
                                 F.col("n_item").alias("n_ant")))
    mc = F.broadcast(marg.select(F.col("item").alias("consequent"),
                                 F.col("n_item").alias("n_cons")))
    out = (directed.join(ma, "antecedent").join(mc, "consequent")
           .crossJoin(F.broadcast(total)))
    nb = F.col("n_both").cast("double")
    na = F.col("n_ant").cast("double")
    nc = F.col("n_cons").cast("double")
    nn = F.col("n_baskets").cast("double")
    return out.select(
        "antecedent", "consequent",
        F.col("n_ant").cast("long").alias("n_ant"),
        F.col("n_cons").cast("long").alias("n_cons"),
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_baskets").cast("long").alias("n_baskets"),
        (nb / nn).alias("support"),
        (nb / na).alias("confidence"),
        ((nb * nn) / (na * nc)).alias("lift"))
