"""Pure-Python ports of the reference's identifier sanitization (O21-O24).

Semantics come from /root/reference/lib/core_ext/string.rb and
/root/reference/lib/cartodb-importer/importer.rb:12,562-575. The reference's
quirks are load-bearing (golden column names in its spec suite depend on
them) and are preserved deliberately:

* Ruby (<2.4) ``String#downcase`` only folds ASCII A-Z, so uppercase accented
  characters survive the initial downcase and hit the second, case-insensitive
  half of the translation table — where the reference maps N-with-accents to
  ``M`` (string.rb:61), O-with-accents to ``N`` (string.rb:62), and the
  K-group to ``J`` (string.rb:60).
* ``a-with-ogonek`` folds to ``q`` (string.rb:41).

No Spark here: these run driver-side over column/table names only.
"""

from __future__ import annotations

import re

# string.rb:5-11 — 77-word PostgreSQL reserved list, copied verbatim.
POSTGRESQL_RESERVED_WORDS = frozenset(
    """ALL ANALYSE ANALYZE AND ANY ARRAY AS ASC ASYMMETRIC AUTHORIZATION
    BETWEEN BINARY BOTH CASE CAST CHECK COLLATE COLUMN CONSTRAINT CREATE
    CROSS CURRENT_DATE CURRENT_ROLE CURRENT_TIME CURRENT_TIMESTAMP
    CURRENT_USER DEFAULT DEFERRABLE DESC DISTINCT DO ELSE END EXCEPT FALSE
    FOR FOREIGN FREEZE FROM FULL GRANT GROUP HAVING ILIKE IN INITIALLY INNER
    INTERSECT INTO IS ISNULL JOIN LEADING LEFT LIKE LIMIT LOCALTIME
    LOCALTIMESTAMP NATURAL NEW NOT NOTNULL NULL OFF OFFSET OLD ON ONLY OR
    ORDER OUTER OVERLAPS PLACING PRIMARY REFERENCES RIGHT SELECT SESSION_USER
    SIMILAR SOME SYMMETRIC TABLE THEN TO TRAILING TRUE UNION UNIQUE USER
    USING VERBOSE WHEN WHERE""".split()
)

# importer.rb:12 — Postgres system column names that must be escaped.
RESERVED_COLUMN_NAMES = frozenset(
    ["oid", "tableoid", "xmin", "cmin", "xmax", "cmax", "ctid"]
)

# string.rb:26-48 — lowercase diacritic rules, applied first, in order.
_LOWER_RULES = [
    ("[àáâãäåāă]", "a"),
    ("æ", "ae"),
    ("[ďđ]", "d"),
    ("[çćčĉċ]", "c"),
    ("[èéêëēęěĕė]", "e"),
    ("ƒ", "f"),
    ("[ĝğġģ]", "g"),
    ("[ĥħ]", "h"),
    ("[ììíîïīĩĭ]", "i"),
    ("[įıĳĵ]", "j"),
    ("[ķĸ]", "k"),
    ("[łľĺļŀ]", "l"),
    ("[ñńňņŉŋ]", "n"),
    ("[òóôõöøōőŏŏ]", "o"),
    ("œ", "oe"),
    ("ą", "q"),
    ("[ŕřŗ]", "r"),
    ("[śšşŝș]", "s"),
    ("[ťţŧț]", "t"),
    ("[ùúûüūůűŭũų]", "u"),
    ("ŵ", "w"),
    ("[ýÿŷ]", "y"),
    ("[žżź]", "z"),
]

# string.rb:49-71 — uppercase rules, case-insensitive (quirks preserved:
# K-group to J, N-group to M, O-group to N).
_UPPER_RULES_CI = [
    ("[ÀÁÂÃÄÅĀĂ]", "A"),
    ("Æ", "AE"),
    ("[ĎĐ]", "D"),
    ("[ÇĆČĈĊ]", "C"),
    ("[ÈÉÊËĒĘĚĔĖ]", "E"),
    ("Ƒ", "F"),
    ("[ĜĞĠĢ]", "G"),
    ("[ĤĦ]", "H"),
    ("[ÌÌÍÎÏĪĨĬ]", "I"),
    ("[ĲĴ]", "J"),
    ("[Ķĸ]", "J"),
    ("[ŁĽĹĻĿ]", "L"),
    ("[ÑŃŇŅŉŊ]", "M"),
    ("[ÒÓÔÕÖØŌŐŎŎ]", "N"),
    ("Œ", "OE"),
    ("Ą", "Q"),
    ("[ŔŘŖ]", "R"),
    ("[ŚŠŞŜȘ]", "S"),
    ("[ŤŢŦȚ]", "T"),
    ("[ÙÚÛÜŪŮŰŬŨŲ]", "U"),
    ("Ŵ", "W"),
    ("[ÝŸŶ]", "Y"),
    ("[ŽŻŹ]", "Z"),
]

_LOWER_COMPILED = [(re.compile(p), r) for p, r in _LOWER_RULES]
_UPPER_COMPILED = [
    (re.compile(p, re.IGNORECASE | re.UNICODE), r) for p, r in _UPPER_RULES_CI
]

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_ASCII_UPPER = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _ascii_downcase(s: str) -> str:
    """Ruby <2.4 ``downcase``: folds ASCII only; accents pass through."""
    return s.translate(_ASCII_LOWER)


def is_blank(s: str | None) -> bool:
    """string.rb:14-16 — blank means no non-whitespace character."""
    return s is None or re.search(r"\S", s) is None


def normalize(s: str) -> str:
    """string.rb:22-73 — diacritic folding with the reference's quirk table."""
    n = _ascii_downcase(s)
    if is_blank(n):
        return ""
    for rx, rep in _LOWER_COMPILED:
        n = rx.sub(rep, n)
    for rx, rep in _UPPER_COMPILED:
        n = rx.sub(rep, n)
    return n


def sanitize(s: str) -> str:
    """string.rb:75-80 — strip tags, fold, collapse punctuation to ``_``."""
    if is_blank(s):
        return ""
    n = re.sub(r"<[^>]+>", "", s, flags=re.DOTALL)
    n = _ascii_downcase(normalize(n))
    n = re.sub(r"&.+?;", "-", n)
    n = re.sub(r"[^a-z0-9 _-]", "-", n)
    n = n.strip()
    n = re.sub(r"\s+", "-", n)
    n = re.sub(r"-+", "-", n)
    n = n.replace("-", " ").strip().replace(" ", "-").replace("-", "_")
    return n


def sanitize_column_name(name: str) -> str:
    """string.rb:82-89 — sanitize + ``_`` prefix for bad starts / reserved.

    The reserved-word check runs against the ORIGINAL name upcased, not the
    sanitized one (reference behavior).
    """
    temporal = sanitize(name)
    if not re.match(r"^[a-zA-Z_]", temporal) or (
        name.translate(_ASCII_UPPER) in POSTGRESQL_RESERVED_WORDS
    ):
        return "_" + temporal
    return temporal


def escape_reserved_column_names(names: list[str]) -> list[str]:
    """importer.rb:553-556 — system columns get a ``_`` prefix post-sanitize."""
    return [("_" + n) if n in RESERVED_COLUMN_NAMES else n for n in names]


def sanitize_columns(names: list[str]) -> list[str]:
    """Full column-name pass (O10 + reserved escape), with blank-header
    naming per importer.rb:505-507 (``unknow_name_<n>``, reference typo
    preserved) and duplicate suffixing so the output is usable as a Spark
    schema."""
    out: list[str] = []
    unknown = 0
    for raw in names:
        if is_blank(raw):
            unknown += 1
            out.append(f"unknow_name_{unknown}")
        else:
            out.append(sanitize_column_name(raw))
    out = escape_reserved_column_names(out)
    seen: dict[str, int] = {}
    taken: set[str] = set()
    deduped: list[str] = []
    for n in out:
        if n in seen:
            # first-free suffix that is ALSO not a later column's own
            # sanitized form ('n','n','n_1' must not emit 'n_1' twice)
            i = seen[n] + 1
            while f"{n}_{i}" in taken:
                i += 1
            seen[n] = i
            cand = f"{n}_{i}"
        else:
            seen[n] = 0
            cand = n
            while cand in taken:
                seen[n] += 1
                cand = f"{n}_{seen[n]}"
        taken.add(cand)
        deduped.append(cand)
    return deduped


def get_valid_name(name: str, existing_names: set[str] | list[str]) -> str:
    """importer.rb:562-575 — digit-prefix guard + first-free ``_n`` suffix.

    The exporter variant (exporter.rb:177-189) instead uses max(existing)+1;
    the importer's first-free semantics are the spec'd ones
    (spec/import_spec.rb:54-70) and are what we implement everywhere.
    """
    if name[:1].isdigit():
        name = "_" + name
    existing = set(existing_names)
    if name not in existing:
        return name
    n = 1
    while f"{name}_{n}" in existing:
        n += 1
    return f"{name}_{n}"
