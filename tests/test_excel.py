"""Spreadsheet import tests (O5): minimal xlsx/ods fixtures generated with
the stdlib (no openpyxl in this container), imported end-to-end."""

import zipfile

from cartodb_importer_spark.importer import Importer
from cartodb_importer_spark.sinks.catalog import LocalCatalog

_XLSX_SHEET = """<?xml version="1.0" encoding="UTF-8"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>9.5</v></c></row>
<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>beta</t></is></c><c r="C3"><v>7.25</v></c></row>
</sheetData></worksheet>"""

_XLSX_SHARED = """<?xml version="1.0" encoding="UTF-8"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>ID</t></si><si><t>Name</t></si><si><t>Score</t></si><si><t>alpha</t></si>
</sst>"""


def _make_xlsx(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", "<workbook/>")
        zf.writestr("xl/sharedStrings.xml", _XLSX_SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _XLSX_SHEET)


_ODS_CONTENT = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
<office:body><office:spreadsheet>
<table:table table:name="Sheet1">
<table:table-row>
  <table:table-cell><text:p>city</text:p></table:table-cell>
  <table:table-cell><text:p>pop</text:p></table:table-cell>
</table:table-row>
<table:table-row>
  <table:table-cell><text:p>madrid</text:p></table:table-cell>
  <table:table-cell><text:p>3300000</text:p></table:table-cell>
</table:table-row>
<table:table-row>
  <table:table-cell><text:p>oslo</text:p></table:table-cell>
  <table:table-cell><text:p>700000</text:p></table:table-cell>
</table:table-row>
</table:table>
</office:spreadsheet></office:body></office:document-content>"""


def _make_ods(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", _ODS_CONTENT)


def test_xlsx_import(spark, tmp_path):
    # mirrors spec/import_spec.rb:195 (ngos.xlsx shape)
    p = tmp_path / "Ngos List.xlsx"
    _make_xlsx(p)
    cat = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, cat, str(p)).run()
    assert res.name == "ngos_list"
    assert res.rows_imported == 2
    df = cat.read(spark, "ngos_list")
    assert df.columns == ["id", "name", "score"]
    types = dict(df.dtypes)
    assert types == {"id": "int", "name": "string", "score": "double"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["name"] == "alpha" and rows[1]["score"] == 9.5
    assert rows[2]["name"] == "beta" and rows[2]["score"] == 7.25


_XLSX_DECOY_SHEET = """<?xml version="1.0" encoding="UTF-8"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>wrong_sheet</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>decoy</t></is></c></row>
</sheetData></worksheet>"""

_XLSX_WORKBOOK_REORDERED = """<?xml version="1.0" encoding="UTF-8"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Data" sheetId="1" r:id="rId2"/>
<sheet name="Notes" sheetId="2" r:id="rId1"/>
</sheets></workbook>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""


def test_xlsx_workbook_order_beats_zip_order(spark, tmp_path):
    """VERDICT r3 item 4: the first sheet comes from workbook.xml order
    (roo semantics, importer.rb:124-140), not zip/archive entry order.
    Here workbook order says sheet2.xml ('Data') while zip order and
    numeric naming both point at sheet1.xml (the decoy)."""
    p = tmp_path / "multi.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", _XLSX_WORKBOOK_REORDERED)
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_RELS)
        zf.writestr("xl/sharedStrings.xml", _XLSX_SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _XLSX_DECOY_SHEET)
        zf.writestr("xl/worksheets/sheet2.xml", _XLSX_SHEET)
    cat = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, cat, str(p)).run()
    assert res.rows_imported == 2
    df = cat.read(spark, "multi")
    assert df.columns == ["id", "name", "score"]
    assert {r["name"] for r in df.collect()} == {"alpha", "beta"}


_ODS_SPARSE = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
<office:body><office:spreadsheet>
<table:table table:name="Sheet1">
<table:table-row>
  <table:table-cell><text:p>a</text:p></table:table-cell>
  <table:table-cell><text:p>b</text:p></table:table-cell>
  <table:table-cell><text:p>c</text:p></table:table-cell>
</table:table-row>
<table:table-row>
  <table:table-cell><text:p>left</text:p></table:table-cell>
  <table:table-cell table:number-columns-repeated="1"/>
  <table:table-cell><text:p>right</text:p></table:table-cell>
</table:table-row>
</table:table>
</office:spreadsheet></office:body></office:document-content>"""


def test_ods_repeated_empty_cells_keep_alignment(spark, tmp_path):
    """r03 regression (ODS cell shift): an empty repeated cell between
    values must hold its column position, not shift the following cell
    left."""
    p = tmp_path / "sparse.ods"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", _ODS_SPARSE)
    cat = LocalCatalog(str(tmp_path / "wh"))
    Importer(spark, cat, str(p)).run()
    df = cat.read(spark, "sparse")
    assert df.columns == ["a", "b", "c"]
    row = df.collect()[0]
    assert row["a"] == "left" and row["b"] is None and row["c"] == "right"


def test_ods_import(spark, tmp_path):
    p = tmp_path / "cities.ods"
    _make_ods(p)
    cat = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, cat, str(p)).run()
    assert res.rows_imported == 2
    df = cat.read(spark, "cities")
    assert df.columns == ["city", "pop"]
    assert dict(df.dtypes)["pop"] == "int"
    assert {r["city"] for r in df.collect()} == {"madrid", "oslo"}
