"""Misra-Gries heavy-hitter candidates (deterministic counter sketch).

Per-partition Misra-Gries with K counters: every key whose count within
a partition exceeds n_p/(K+1) is guaranteed to survive that partition's
counter set (the classic undercount bound), and by pigeonhole any key
with GLOBAL count > n/(K+1) must exceed the per-partition threshold in
at least one partition — so the union of per-partition candidates is a
superset of the global heavy hitters for ANY partitioning of the input.
Consumers recount the (tiny) candidate set exactly and filter by the
global threshold, which makes the end-to-end answer exact and
partitioning-independent (q376's oracle-hash contract).

At 100 TB the value is the aggregation this sketch avoids: the recount
semi-joins the fact table down to candidate-key rows before grouping,
so the full key-cardinality shuffle never happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def mg_candidates(df: DataFrame, col: str = "key", k: int = 5) -> DataFrame:
    """Union of per-partition Misra-Gries candidate keys (one string
    column named like the input). Superset of every key with global
    frequency > n/(k+1); at most k keys per input partition."""
    import pandas as pd

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            # nulls/NaN would otherwise occupy counter slots and leak
            # into the candidate rows a downstream exact recount joins
            for key in pdf[col].dropna():
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    counters = {c: v - 1 for c, v in counters.items() if v > 1}
        yield pd.DataFrame({col: list(counters)})

    return df.select(col).mapInPandas(mg, schema=f"{col} string").distinct()
