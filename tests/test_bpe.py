"""BPE training pinned EXACTLY against a pure-python reference: same
pair counts, same lexicographic tie-break, same merge order, same
left-to-right non-overlapping apply semantics."""

import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

from cartodb_importer_spark.llm import bpe as B

SF = "/root/testdata/sf0.001"


def _ref_train(texts, n_merges, max_chars=80):
    states = [
        list(re.sub(r"\s+", "_", x[:max_chars].lower())) for x in texts
    ]
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for toks in states:
            for a, b in zip(toks, toks[1:]):
                c[(a, b)] += 1
        if not c:
            break
        (l, r), cnt = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, cnt))
        for i, toks in enumerate(states):
            out = []
            for x in toks:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            states[i] = out
    return merges, states


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_train_matches_reference_exactly(spark, docs):
    learned = B.bpe_train(docs, n_merges=6)
    texts = [r[0] for r in docs.select("text").collect()]
    ref, _ = _ref_train(texts, 6)
    assert learned == ref


def test_apply_matches_reference_states(spark, docs):
    texts = [r[0] for r in docs.select("text").orderBy("doc_id").collect()]
    ref_merges, ref_states = _ref_train(texts, 5)
    rules = [(l, r) for l, r, _ in ref_merges]
    applied = (
        docs.select(
            "doc_id",
            B.apply_merges(B.char_tokens(F.col("text")), rules).alias("toks"),
        )
        .orderBy("doc_id")
        .collect()
    )
    for row, ref in zip(applied, ref_states):
        assert row["toks"] == ref


def test_merge_once_nonoverlapping(spark):
    df = spark.createDataFrame([("aaa",)], "s string")
    out = df.select(
        B.merge_once(F.split("s", ""), "a", "a").alias("t")
    ).collect()[0]["t"]
    # left-to-right non-overlap: 'aaa' -> ['aa', 'a'], never ['a', 'aa']
    assert [x for x in out if x] == ["aa", "a"]


def test_train_survives_empty_texts(spark):
    # empty docs produce zero-length token arrays; the adjacent-pair
    # slices must clamp to length 0 rather than raise (review r03)
    df = spark.createDataFrame([("",), ("the the the",), ("",)], "text string")
    learned = B.bpe_train(df, n_merges=3)
    assert learned == [("h", "e", 3), ("t", "he", 3), ("_", "the", 2)]


def test_scan_path_equals_fold_on_adversarial_tokens(spark):
    """apply_merges_scan must equal the exact fold on EVERY input class:
    the fast joined-string path (clean tokens, adjacent repeats, overlap
    chains, rules whose merged symbol feeds a later rule) AND the
    fallback branch (tokens containing the \\x01 separator, empty
    tokens, NULL elements — arrays the joined form cannot represent)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    cases = [
        ["t", "h", "e", "_"],
        ["a", "a", "a"],                      # same-rule overlap chain
        ["t", "h", "t", "h", "h"],            # adjacent pair occurrences
        ["th", "e", "th", "e_"],              # partial-token bait
        ["x"],                                # too short to merge
        [],                                   # empty array
        ["a", "\x01", "a"],                   # separator collision -> fold
        ["a", "", "a"],                       # empty token -> fold
        ["a", None, "a"],                     # NULL element -> fold
        ["_", "t", "h", "e", "_", "t", "h"],  # rule-chain feeding
    ]
    rules = [("t", "h"), ("th", "e"), ("a", "a"), ("_", "the")]
    schema = StructType([StructField("toks", ArrayType(StringType()), True)])
    df = spark.createDataFrame([(c,) for c in cases], schema)
    out = df.select(
        B.apply_merges(F.col("toks"), rules).alias("fold"),
        B.apply_merges_scan(F.col("toks"), rules).alias("scan"),
    ).collect()
    for case, row in zip(cases, out):
        assert row["fold"] == row["scan"], (case, row["fold"], row["scan"])

    # DataFrame-level split form (the large-rule-list path, ADVICE r06):
    # same equivalence, and each slice's plan carries exactly ONE chain.
    # Tag rows so the unordered union can be matched back to its input.
    tagged = spark.createDataFrame(
        [(str(i), c) for i, c in enumerate(cases)],
        StructType(
            [
                StructField("i", StringType(), True),
                StructField("toks", ArrayType(StringType()), True),
            ]
        ),
    )
    expected = {
        r["i"]: r["fold"]
        for r in tagged.select(
            "i", B.apply_merges(F.col("toks"), rules).alias("fold")
        ).collect()
    }
    got = {
        r["i"]: r["toks"]
        for r in B.apply_merges_df(tagged, "toks", rules).collect()
    }
    assert got == expected


def test_apply_merges_df_single_chain_per_slice(spark):
    """The DataFrame split form exists to keep ONE expression chain per
    slice (ADVICE r06): the clean slice's plan must contain exactly one
    regexp_replace per rule and NO aggregate() fold, while the when()
    column form embeds both chains."""
    rules = [("t", "h"), ("th", "e"), ("a", "a"), ("_", "the")]
    df = spark.createDataFrame([(["t", "h", "e"],)], "toks array<string>")
    out = B.apply_merges_df(df, "toks", rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union of two slices: clean = scan chain only, degenerate = fold only
    assert plan.count("regexp_replace") == len(rules), plan
    both = df.select(B.apply_merges_scan(F.col("toks"), rules).alias("t"))
    both_plan = both._jdf.queryExecution().executedPlan().toString()
    assert both_plan.count("regexp_replace") == len(rules)
    assert "aggregate(" in both_plan  # the embedded fold chain
