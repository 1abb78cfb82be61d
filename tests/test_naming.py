"""Golden tests for naming ports, derived from the reference spec suite
(/root/reference/spec/import_spec.rb) and string.rb semantics."""

from cartodb_importer_spark import naming


def test_twitters_golden_columns():
    # spec/import_spec.rb:84-87 — twitters.csv header sanitization goldens.
    raw = ["URL", "login", "Country", "Followers count", ""]
    assert naming.sanitize_columns(raw) == [
        "url",
        "login",
        "country",
        "followers_count",
        "unknow_name_1",
    ]


def test_reserved_system_column_escape():
    # spec/import_spec.rb:89-104 — "xmin" must become "_xmin".
    assert naming.sanitize_columns(["URL", "xmin"]) == ["url", "_xmin"]


def test_reserved_word_prefix():
    # string.rb:82-89 — reserved words checked against the ORIGINAL upcased.
    assert naming.sanitize_column_name("select") == "_select"
    assert naming.sanitize_column_name("Order") == "_order"
    assert naming.sanitize_column_name("selection") == "selection"


def test_digit_start_prefix():
    assert naming.sanitize_column_name("1column") == "_1column"


def test_sanitize_spaces_and_punct():
    assert naming.sanitize("direccion completa") == "direccion_completa"
    assert (
        naming.sanitize("Food Security Aid Map_projects")
        == "food_security_aid_map_projects"
    )
    assert naming.sanitize("  padded  ") == "padded"
    assert naming.sanitize("a,b") == "a_b"


def test_sanitize_strips_html_and_entities():
    assert naming.sanitize("<b>Name</b>") == "name"
    assert naming.sanitize("a&amp;b") == "a_b"


def test_normalize_diacritics_basic():
    assert naming.normalize("café") == "cafe"
    assert naming.normalize("niño") == "nino"
    assert naming.normalize("æon") == "aeon"


def test_normalize_reference_quirks():
    # Uppercase accents survive the ASCII-only downcase and hit the quirky
    # case-insensitive table: N-group->M, O-group->N (string.rb:61-62),
    # a-ogonek->q (string.rb:41).
    assert naming.normalize("Ñ") == "M"
    assert naming.normalize("Ò") == "N"
    assert naming.normalize("ą") == "q"
    assert naming.normalize("Ķ") == "J"
    # lowercase ñ goes through the sane lowercase rule first
    assert naming.normalize("ñ") == "n"


def test_get_valid_name_collision_suffix():
    # spec/import_spec.rb:54-70 — first-free _n suffix semantics.
    assert naming.get_valid_name("clubbing", set()) == "clubbing"
    assert naming.get_valid_name("clubbing", {"clubbing"}) == "clubbing_1"
    assert (
        naming.get_valid_name("clubbing", {"clubbing", "clubbing_1"})
        == "clubbing_2"
    )
    # digit-start guard (importer.rb:563-566)
    assert naming.get_valid_name("123abc", set()) == "_123abc"


def test_blank():
    assert naming.is_blank("")
    assert naming.is_blank("   ")
    assert not naming.is_blank("x")
