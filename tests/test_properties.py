"""Property-based tests (hypothesis) for the pure-Python kernels: the name
sanitizers and the inference lattice. The reference ships no property tests
(SURVEY §5); these pin down the invariants golden tests can't cover."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cartodb_importer_spark import naming

IDENT_RX = re.compile(r"^[a-z0-9_]*$")


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_sanitize_output_charset(s):
    out = naming.sanitize(s)
    # closed alphabet: lowercase alnum + underscore only
    assert IDENT_RX.match(out), out


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_sanitize_idempotent(s):
    once = naming.sanitize(s)
    assert naming.sanitize(once) == once


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_sanitize_column_name_valid_sql_identifier(s):
    out = naming.sanitize_column_name(s)
    # never starts with a digit (reference guarantee, string.rb:84-86)
    assert not out[:1].isdigit()
    # Reference quirk (preserved): the reserved check runs on the ORIGINAL
    # name, so an input that merely SANITIZES to a reserved word (e.g.
    # "ïn" -> "in") stays bare. Only original reserved words get prefixed.
    if s.translate(naming._ASCII_UPPER) in naming.POSTGRESQL_RESERVED_WORDS:
        assert out.startswith("_")


@given(st.lists(st.text(max_size=30), min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_sanitize_columns_unique_and_complete(names):
    out = naming.sanitize_columns(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # usable as a DataFrame schema
    assert all(IDENT_RX.match(c) for c in out)


@given(
    st.text(min_size=1, max_size=30).filter(lambda s: not s[:1].isdigit()),
    st.sets(st.text(min_size=1, max_size=34), max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_get_valid_name_never_collides(name, existing):
    out = naming.get_valid_name(name, existing)
    assert out not in existing


# ---------------------------------------------------------------- inference

_INT_RX = re.compile(r"^[0-9]+$")
_FLOAT_RX = re.compile(r"^\-?[0-9]+[.|,][0-9]+$")


def _reference_lattice(cells):
    """Direct Python transliteration of the §2.2 lattice for comparison."""
    t = None
    for c in cells:
        if c is None or not re.search(r"\S", c):
            continue
        if _INT_RX.match(c):
            o = 1 if float(c) > 2147483647 else 0
        elif _FLOAT_RX.match(c):
            o = 1
        else:
            o = 2
        t = o if t is None else max(t, o)
    return {None: "varchar", 0: "integer", 1: "float", 2: "varchar"}[t]


CELLS = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.integers(0, 10**12).map(str),
    st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
    ).map(lambda f: f"{f:.3f}"),
    st.text(max_size=12),
)


@given(st.lists(CELLS, min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_distributed_inference_matches_reference(spark, cells):
    from cartodb_importer_spark.infer import infer_column_types

    df = spark.createDataFrame([(c,) for c in cells], "v string")
    got = infer_column_types(df)["v"]
    assert got == _reference_lattice(cells)


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(data):
    from cartodb_importer_spark.readers.tiff import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data)) == data


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_packbits_roundtrip_property(data):
    from cartodb_importer_spark.readers.tiff import (
        _packbits_decode,
        _packbits_encode,
    )

    assert _packbits_decode(_packbits_encode(data)) == data


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from(["uint8", "uint16", "int16"]),
)
@settings(max_examples=25, deadline=None)
def test_bmp_ppm_tiff_roundtrip_property(h, w, dtype):
    import numpy as np

    from cartodb_importer_spark.llm import codecs as C
    from cartodb_importer_spark.readers.tiff import decode_tiff, encode_tiff_gray

    rs = np.random.RandomState(h * 13 + w)
    band = rs.randint(0, 200, size=(h, w)).astype(dtype)
    back, _ = decode_tiff(encode_tiff_gray(band, compression="lzw", predictor=2))
    assert np.array_equal(back, band)
    if dtype == "uint8":
        rgb = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(C.decode_bmp(C.encode_bmp(rgb)), rgb)
        assert np.array_equal(C.decode_ppm(C.encode_ppm(rgb)), rgb)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=25, deadline=None)
def test_png_gif_roundtrip_property(h, w, npal):
    """Lossless image codecs added r04: PNG round-trips any uint8 RGB;
    GIF round-trips any paletted image; float TIFF predictor 3
    round-trips exactly."""
    import numpy as np

    from cartodb_importer_spark.llm import codecs as C
    from cartodb_importer_spark.readers.tiff import (
        decode_tiff, encode_tiff_gray,
    )

    rs = np.random.RandomState(h * 31 + w * 7 + npal)
    rgb = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(rgb)), rgb)

    pal = rs.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    indexed = pal[rs.randint(0, npal, size=(h, w))]
    assert np.array_equal(C.decode_gif(C.encode_gif(indexed)), indexed)

    band = (rs.rand(h, w) * 2000 - 1000).astype(np.float32)
    back, _ = decode_tiff(
        encode_tiff_gray(band, compression="deflate", predictor=3)
    )
    assert np.array_equal(back, band)
