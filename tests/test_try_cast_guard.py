"""Property-pin for the try_cast pre-guard (VERDICT r12 item 6).

``scalar_try_arith`` guards its string->int ``try_cast`` with
``TRY_INT_GUARD_RX`` so the per-row JVM throw/catch never fires on
definitely-non-numeric rows (r12: 7.88 -> 0.50 s). The guard's
correctness was hand-derived against Spark's UTF8String.toInt grammar
(<= 0x20 lead trim, optional sign, digit) — which means a Spark version
bump that WIDENS the grammar would silently change the guarded query's
values. This test re-derives the equivalence against the live engine:
guarded and bare try_cast must agree on every string of an adversarial
corpus (control chars, unicode digits/whitespace/signs, overflow bounds,
exotic trims) plus a seeded-random sample over an adversarial alphabet.
If the engine's grammar ever drifts past the guard, this fails loudly
and the guard (not the query semantics) must be widened to match.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cartodb_importer_spark.queries.scalars import TRY_INT_GUARD_RX

# Hand-picked adversarial strings: every corner the r12 derivation relied
# on, plus the unicode lookalikes a wider grammar might start accepting.
_ADVERSARIAL = [
    "",
    " ",
    "\t42",  # \t (0x09) is inside the <= 0x20 trim class
    "\n-7",
    "\r\x0b\x0c 9",
    "\x00+3",  # NUL leads the trim class
    "\x1f5",  # last control char inside the class
    "!5",  # 0x21: first char OUTSIDE the trim class — must be NULL both ways
    "42",
    "+42",
    "-42",
    "+-42",
    "--42",
    "+ 42",  # sign then space: toInt rejects, guard admits? (guard needs
    # sign-digit adjacency — regex requires digit right after sign)
    " +42",
    "042",
    "2147483647",  # INT_MAX
    "2147483648",  # overflow -> NULL both ways
    "-2147483648",  # INT_MIN
    "-2147483649",  # underflow -> NULL both ways
    "99999999999999999999",
    "4.5",  # Spark's toInt rejects decimals -> NULL both ways
    "4e2",
    "4,2",
    "42abc",
    "abc",
    "A",
    "N",
    "R",
    "٤٢",  # Arabic-Indic digits: \d in Java regex is ASCII-only by
    # default, and toInt rejects them — NULL both ways today
    "４２",  # fullwidth digits
    " 42",  # NBSP is NOT in the <= 0x20 class and toInt rejects it
    " 42",  # thin space
    "−42",  # unicode minus sign
    "+٠",  # sign then Arabic zero
    "¹²",  # superscripts
    " \t\r\n+0",
    "\x20\x1c5",  # space then 0x1c (inside class) then digit
    "InfInity",
    "NaN",
    "null",
]

_ALPHABET = (
    "0123456789+- \t\r\n\x00\x0b\x1f!aZ.,e٤４ − "
)


def _random_corpus(n: int = 2000, seed: int = 13) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(k)))
    return out


def test_guarded_try_cast_matches_bare_try_cast(spark):
    corpus = _ADVERSARIAL + _random_corpus()
    df = spark.createDataFrame([(s,) for s in corpus], ["s"])
    got = (
        df.select(
            "s",
            F.when(
                F.col("s").rlike(TRY_INT_GUARD_RX), F.col("s").try_cast("int")
            )
            .otherwise(F.lit(None).cast("int"))
            .alias("guarded"),
            F.col("s").try_cast("int").alias("bare"),
        )
        .collect()
    )
    diffs = [
        (repr(r["s"]), r["guarded"], r["bare"])
        for r in got
        if r["guarded"] != r["bare"]
    ]
    assert not diffs, (
        "guard diverges from Spark's try_cast grammar on: "
        f"{diffs[:10]} ({len(diffs)} total) — widen TRY_INT_GUARD_RX"
    )
