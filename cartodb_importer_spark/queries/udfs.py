"""UDF surface (SURVEY §2.3): row-at-a-time Python udf (declared, and
declared SLOW — kept off every hot path), Arrow-batched scalar pandas_udf,
grouped-aggregate pandas_udf, and applyInPandas group-map.

Each query computes something a plain SQL oracle can mirror, so the UDF
machinery itself is value-checked, not just smoke-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from . import Tables, query


@query(
    "udf_python_row",
    oracle="""
    SELECT n_nationkey, reverse(upper(n_name)) AS rev_name
    FROM nation
    """,
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the declared slow path, demonstrated on a
    25-row dimension precisely because that's the only place it belongs."""

    @udf("string")
    def rev_upper(s: str) -> str:
        return s.upper()[::-1] if s is not None else None

    t = Tables(spark, sf_dir)
    return t.nation.select(
        "n_nationkey", rev_upper(F.col("n_name")).alias("rev_name")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, round(ln(1 + value) * 2, 6) AS log_score
    FROM events WHERE value >= 0
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas_udf: vectorized numpy math over whole
    batches (the 10-100x-over-row-udf path when JVM built-ins can't express
    the function; here they could — the point is checking the machinery)."""
    import numpy as np

    @pandas_udf("double")
    def log_score(v: pd.Series) -> pd.Series:
        return np.round(np.log1p(v) * 2, 6)

    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value") >= 0).select(
        "event_id", log_score(F.col("value")).alias("log_score")
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_discount) / sum(l_discount), 4)
             AS weighted_avg_price
    FROM lineitem
    WHERE l_discount > 0
    GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (UDAF surface): discount-weighted mean
    price per return flag."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, weight: pd.Series) -> float:
        return float(round((price * weight).sum() / weight.sum(), 4))

    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_discount") > 0)
        .groupBy("l_returnflag")
        .agg(
            weighted_avg(F.col("l_extendedprice"), F.col("l_discount")).alias(
                "weighted_avg_price"
            )
        )
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           floor(CASE WHEN max(value) OVER w = min(value) OVER w THEN 0.5
                 ELSE (value - min(value) OVER w)
                      / (max(value) OVER w - min(value) OVER w) END
                 * 1000000 + 0.5) / 1000000
             AS value_norm
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group-map: per-user min-max normalization — the
    'custom stateful operator per group' shape (each group arrives as one
    pandas frame; output schema declared up front)."""

    def minmax(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        lo, hi = v.min(), v.max()
        # floor(x*1e6+0.5)/1e6, not np.round: numpy rounds half-to-even
        # while DuckDB rounds half-up — exact .5 ties at sf0.1 diverged
        norm = (
            np.full(len(v), 0.5)
            if hi == lo
            else np.floor((v - lo) / (hi - lo) * 1e6 + 0.5) / 1e6
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "value_norm": norm,
            },
            copy=False,
        )

    t = Tables(spark, sf_dir)
    # Explicit projection: Catalyst cannot column-prune through the opaque
    # group-map UDF, so without this the whole row (incl. the wide `props`
    # JSON string) is Arrow-shipped to the Python worker. ~40% of the
    # query's wall time at sf0.1 was serializing columns the UDF never read.
    return (
        t.events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(minmax, "event_id long, user_id long, value_norm double")
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
    SELECT event_id, user_id,
           floor(CASE WHEN max(value) OVER w = min(value) OVER w THEN 0.5
                 ELSE (value - min(value) OVER w)
                      / (max(value) OVER w - min(value) OVER w) END
                 * 1000000 + 0.5) / 1000000
             AS value_norm
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-group min-max normalization as ``udf_apply_in_pandas`` but
    via Spark 4's ``applyInArrow`` group-map: the group arrives as a
    pyarrow Table, skipping the per-group Arrow->pandas->Arrow conversion.
    Measured 3.5x faster at sf0.1 (1.0s vs 3.6s) for identical semantics —
    this is the engine's preferred physical form for custom group ops; the
    pandas variant stays registered as the declared API-surface demo."""
    import pyarrow as pa

    def minmax(tbl: "pa.Table") -> "pa.Table":
        v = tbl.column("value").to_numpy()
        lo, hi = v.min(), v.max()
        norm = (
            np.full(len(v), 0.5)
            if hi == lo
            else np.floor((v - lo) / (hi - lo) * 1e6 + 0.5) / 1e6
        )
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "user_id": tbl.column("user_id"),
                "value_norm": pa.array(norm),
            }
        )

    t = Tables(spark, sf_dir)
    return (
        t.events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInArrow(minmax, "event_id long, user_id long, value_norm double")
    )


@query(
    "udf_pandas_iterator",
    oracle="""
    SELECT doc_id,
           round(ln(1 + length(text)) * 1.5, 6) AS model_score
    FROM documents
    """,
)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas_udf — the MODEL-SERVING pattern: the
    expensive init (here a fake 'model' dict; in production a tokenizer or
    ONNX session) loads ONCE PER PYTHON WORKER, then streams over Arrow
    batches. The per-batch body never re-initializes.

    NB: the Iterator import must live at module scope — postponed annotation
    evaluation resolves the pandas_udf signature against module globals."""
    import numpy as np

    @pandas_udf("double")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = {"coef": 1.5}  # expensive init happens once per worker
        for lengths in batches:
            yield pd.Series(
                np.round(np.log1p(lengths.astype("float64")) * model["coef"], 6)
            )

    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id", model_score(F.length("text")).alias("model_score")
    )


@query(
    "udtf_sentence_split",
    oracle=r"""
    SELECT doc_id, s['i'] - 1 AS sentence_idx, s['s'] AS sentence
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(
                 list_transform(string_split_regex(text, '[.!?]'),
                                x -> trim(x, E' \t\n\r')),
                 x -> x != ''),
               (x, i) -> {'i': i, 's': x})) AS s
      FROM documents
    )
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ table function) splitting documents into
    indexed sentences via a LATERAL join — the one-row-to-N-rows API the
    reference has no analogue for. A UDTF is the right tool when the
    expansion carries per-row Python state (here trivially a counter;
    in production a sentence segmenter model). For a split this simple the
    production form is explode(split(...)) — JVM-side, no Python — so this
    query exists to pin the UDTF API surface and its lateral-join plan.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            import re

            idx = 0
            for part in re.split(r"[.!?]", text or ""):
                s = part.strip(" \t\n\r")
                if s:
                    yield idx, s
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    t = Tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
