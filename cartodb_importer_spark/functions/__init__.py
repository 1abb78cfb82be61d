"""Scalar function families the engine exposes beyond raw pyspark.sql
functions — currently the WKT geometry accessors (the_geom is a WKT string
column per SURVEY §7 stance 1)."""

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..naming import _LOWER_RULES, _UPPER_RULES_CI


def _flatten_single_char_rules() -> tuple[str, str]:
    """Flatten the reference diacritic table (naming.py) into translate()
    from/to strings. Only 1:1 mappings translate; the multi-char folds
    (ae/oe) are handled by regexp_replace in fold_diacritics."""
    src, dst = [], []
    for pattern, rep in _LOWER_RULES + _UPPER_RULES_CI:
        if len(rep) != 1:
            continue
        chars = pattern[1:-1] if pattern.startswith("[") else pattern
        for ch in chars:
            if ch not in src:
                src.append(ch)
                dst.append(rep)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _flatten_single_char_rules()


def fold_diacritics(col: Column) -> Column:
    """Distributed O22: the reference's diacritic fold (quirks included) as
    a single translate + two regexp_replace passes — the vectorized twin of
    the driver-side naming.normalize used for identifiers. Use this on DATA
    columns at scale (e.g. text normalization before dedup)."""
    out = F.regexp_replace(col, "æ", "ae")
    out = F.regexp_replace(out, "œ", "oe")
    out = F.regexp_replace(out, "Æ", "AE")
    out = F.regexp_replace(out, "Œ", "OE")
    return F.translate(out, _FOLD_SRC, _FOLD_DST)
