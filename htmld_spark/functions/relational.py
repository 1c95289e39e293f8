"""Relational operators Spark lacks natively — composed per the preference
order in SURVEY.md §4 / the PySpark guide: built-in ops first, Arrow-batched
``applyInPandas`` when semantics demand it.

``asof_join``: the classic time-series as-of join (each left row picks the
most recent right row with ``right.on <= left.on`` within the same ``by``
group). Implemented as cogrouped ``applyInPandas`` over ``pd.merge_asof`` —
both sides shuffle once on the group key, each group is merged in one Arrow
batch; no cross join, no window over the union. DuckDB's native ASOF JOIN is
the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row by
    ``on`` (direction backward/forward/nearest) within the same ``by`` key.
    Right-side columns (except ``by``/``on``) are suffixed when colliding.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    left_cols = left.schema
    right_value_fields = [f for f in right.schema if f.name not in (by, on)]
    left_names = set(left.columns)
    out_names = {}
    for f in right_value_fields:
        out_names[f.name] = f.name + suffix if f.name in left_names else f.name
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left_cols]
        + [f"{out_names[f.name]} {f.dataType.simpleString()}" for f in right_value_fields]
    )
    # Rename every right column that collides with a left name BEFORE the
    # cogroup: Spark's cogrouped applyInPandas deduplicates name-colliding
    # attributes and silently drops them from the right-side pdf.
    r_on = "__asof_on__"
    r_by = "__asof_by__"
    right_renamed = right.select(
        F.col(by).alias(r_by),
        F.col(on).alias(r_on),
        *[F.col(f.name).alias(out_names[f.name]) for f in right_value_fields],
    )
    out_value_names = [out_names[f.name] for f in right_value_fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for name in out_value_names:
                out[name] = None
            return out
        rpdf = rpdf[[r_on] + out_value_names].sort_values(r_on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=r_on,
            direction=direction,
        )
        return merged.drop(columns=[r_on])

    return (
        left.groupBy(by)
        .cogroup(right_renamed.groupBy(r_by))
        .applyInPandas(lambda _key, l, r: merge(l, r), out_schema)
    )


def recrawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-to-crawl change report (L64): per key, status ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` plus both content digests
    and the byte delta — the refresh-policy input (what to re-extract,
    what to expire) and the dedup shortcut (unchanged pages skip the
    whole curation tail on a re-crawl).

    Content equality is md5-of-text (digests compare, text never
    shuffles twice); each side is digested in a pre-projection so ONLY
    (key, md5, length) reaches the join. One co-partitioned full outer
    join on the key — both sides shuffle once on the same key, AQE
    broadcasts if one crawl slice is small. Inputs must be unique per
    key (run latest-capture dedup first — curate()'s w_url rule);
    duplicate keys would cross-multiply in the join.

    NULL text is digested as the empty string (a captured-but-empty
    page is CONTENT, distinct from an absent key)."""
    from pyspark.sql import functions as F

    def side(df, tag):
        txt = F.coalesce(F.col(text_col), F.lit(""))
        return df.select(
            F.col(key_col),
            F.md5(txt).alias(f"{tag}_md5"),
            F.length(txt).cast("long").alias(f"_{tag}_len"),
        )

    j = side(old, "old").join(side(new, "new"), key_col, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), "added")
        .when(F.col("new_md5").isNull(), "removed")
        .when(F.col("old_md5") == F.col("new_md5"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        key_col,
        status.alias("status"),
        "old_md5",
        "new_md5",
        (
            F.coalesce(F.col("_new_len"), F.lit(0))
            - F.coalesce(F.col("_old_len"), F.lit(0))
        ).alias("len_delta"),
    )
