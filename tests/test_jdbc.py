"""Real JDBC staged-publish test against embedded Derby (ships with Spark).
Proves the df.write.jdbc path, the DDL-over-DriverManager path, and the
staging+rename+rollback protocol end-to-end against an actual SQL database
— production-parity with the reference's Postgres flow modulo dialect.
"""

import pytest

from cartodb_importer_spark.importer import Importer
from cartodb_importer_spark.sinks.catalog import JdbcCatalog


@pytest.fixture
def jdbc_catalog(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    return JdbcCatalog(spark, url, dialect="derby", num_partitions=2)


def test_jdbc_publish_and_read(spark, jdbc_catalog):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id int, name string, score double",
    )
    rows = jdbc_catalog.publish(df, "scores")
    assert rows == 3
    assert "scores" in [t.lower() for t in jdbc_catalog.table_names()]
    back = jdbc_catalog.read(spark, "scores")
    assert sorted(r["name"] for r in back.collect()) == ["a", "b", "c"]
    # no staging leftovers
    assert not any(
        t.lower().startswith("importing_") for t in jdbc_catalog.table_names()
    )


def test_jdbc_publish_never_clobbers(spark, jdbc_catalog):
    df = spark.createDataFrame([(1,)], "id int")
    jdbc_catalog.publish(df, "t1")
    with pytest.raises(ValueError, match="already exists"):
        jdbc_catalog.publish(spark.createDataFrame([(9,)], "id int"), "t1")
    back = jdbc_catalog.read(spark, "t1").collect()
    assert [r["id"] for r in back] == [1]
    assert not any(
        t.lower().startswith("importing_") for t in jdbc_catalog.table_names()
    )


def test_importer_to_jdbc_end_to_end(spark, jdbc_catalog, tmp_path):
    """The reference's headline flow: CSV file -> georeferenced SQL table."""
    p = tmp_path / "stores.csv"
    p.write_text("id,city,latitude,longitude\n1,madrid,40.4,-3.7\n2,oslo,59.9,10.7\n")
    res = Importer(spark, jdbc_catalog, str(p)).run()
    assert res.rows_imported == 2
    back = jdbc_catalog.read(spark, res.name)
    rows = {r["city"]: r["the_geom"] for r in back.collect()}
    assert rows["madrid"] == "POINT(-3.7 40.4)"
