"""Market-basket affinity operators.

Pairwise association rules (support / confidence / lift) over
basket-item DataFrames — the co-purchase / co-occurrence primitive
behind "frequently bought together", query-term affinity, and
multi-label co-tag QA. Pairs-only by design: at corpus scale the
pairwise pass IS the useful product (Apriori's deeper levels multiply
the candidate space for sharply diminishing rule quality), and it
keeps the whole operator inside Catalyst — one dedup, one frequency
prune, one self-equi-join on the basket key, one pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules with the anti-monotone support prune
    (Agrawal & Srikant 1994, level 1-2 of Apriori).

    Shape, in corpus order: (1) distinct (basket, item) — presence
    semantics, one shuffle; (2) item supports via partial-aggregated
    groupBy; (3) the Apriori prune — items under ``min_support`` cannot
    appear in a frequent pair, so baskets join against the frequent-item
    set (dimension-sized, broadcast) BEFORE pair generation, which is
    what bounds the self-join fan-out on heavy baskets; (4) pairs via
    one self-equi-join on the basket key with a < b dedup; (5) pair
    counts, again partial-aggregated. Confidence and lift are single
    fixed IEEE expressions over exact integer counts (never a float
    sum), so hashed outputs are stable (SURVEY §7.4).

    Emits BOTH rule directions for each surviving pair: (antecedent,
    consequent, pair_support, antecedent_support, consequent_support,
    n_baskets, confidence, lift), confidence/lift rounded 6dp.
    """
    bi = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    bi = materialize(bi)
    item_sup = bi.groupBy("item").agg(F.count(F.lit(1)).alias("sup"))
    # the frequent-item frame is referenced three times (the Apriori
    # semi-join prune and both rule-direction support joins); checkpoint
    # the item-cardinality-sized result so the corpus-scale support
    # aggregate over `bi` runs once, not once per broadcast build
    frequent = materialize(item_sup.filter(F.col("sup") >= min_support))
    pruned = bi.join(F.broadcast(frequent.select("item")), "item", "left_semi")
    pairs = (
        pruned.select("basket", F.col("item").alias("ia"))
        .join(pruned.select("basket", F.col("item").alias("ib")), "basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("pair_sup"))
        .filter(F.col("pair_sup") >= min_support)
    )
    # basket total rides the action as a broadcast 1-row subtree over the
    # checkpointed `bi` instead of a sequential driver count() job
    nb = bi.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__nb__")
    )
    directed = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "pair_sup",
    ).unionAll(
        pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "pair_sup",
        )
    )
    sup_a = frequent.select(
        F.col("item").alias("antecedent"), F.col("sup").alias("antecedent_support")
    )
    sup_c = frequent.select(
        F.col("item").alias("consequent"), F.col("sup").alias("consequent_support")
    )
    return (
        directed.join(F.broadcast(sup_a), "antecedent")
        .join(F.broadcast(sup_c), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("pair_sup").cast("long").alias("pair_support"),
            F.col("antecedent_support").cast("long").alias("antecedent_support"),
            F.col("consequent_support").cast("long").alias("consequent_support"),
            F.col("__nb__").alias("n_baskets"),
            F.round(
                F.col("pair_sup").cast("double") / F.col("antecedent_support"),
                6,
            ).alias("confidence"),
            F.round(
                F.col("pair_sup").cast("double") * F.col("__nb__")
                / (
                    F.col("antecedent_support").cast("double")
                    * F.col("consequent_support")
                ),
                6,
            ).alias("lift"),
        )
    )
