"""SQL-database (JDBC-analog) converter over sqlite3."""

import sqlite3

import pyarrow as pa
import pytest

from geomesa_ray.sources.jdbc import read_sqlite


@pytest.fixture(scope="module")
def example_db(tmp_path_factory):
    """Mirror of the reference JdbcConverterTest fixture table
    (JdbcConverterTest.scala:57-58): id BIGINT, name VARCHAR,
    dtg TIMESTAMP, lat/lon DOUBLE."""
    path = str(tmp_path_factory.mktemp("jdbc") / "example.db")
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE example(id INTEGER PRIMARY KEY, name TEXT, "
        "dtg TEXT, lat REAL, lon REAL)"
    )
    conn.executemany(
        "INSERT INTO example VALUES (?, ?, ?, ?, ?)",
        [
            (i, f"name{i}", f"2017-02-03T00:0{i}:01.000Z", 60.0 + i, 40.0)
            for i in range(10)
        ],
    )
    conn.commit()
    conn.close()
    return path


def test_table_read_typed(ray_session, example_db):
    ds, spec = read_sqlite(example_db, table="example", partitions=3)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert "dtg:Date" in spec
    tbl = tbl.sort_by("id")
    assert tbl["id"].to_pylist() == list(range(10))
    assert tbl["name"].to_pylist() == [f"name{i}" for i in range(10)]
    assert pa.types.is_timestamp(tbl.schema.field("dtg").type)
    assert tbl["lat"].to_pylist() == [60.0 + i for i in range(10)]
    # every row exactly once across the 3 rowid-range partitions
    assert len(tbl) == 10


def test_sql_statements_arm(ray_session, example_db):
    """Newline-separated statements, one partition each (StatementIterator
    parity, JdbcConverter.scala:73-101)."""
    sql = "SELECT id, name FROM example WHERE id < 5\nSELECT id, name FROM example WHERE id >= 5"
    ds, spec = read_sqlite(example_db, sql=sql)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("id")
    assert tbl["id"].to_pylist() == list(range(10))
    assert spec.startswith("id:")


def test_explicit_spec_and_empty_table(ray_session, example_db, tmp_path):
    ds, _ = read_sqlite(
        example_db,
        table="example",
        spec="id:Long,name:String,lat:Double",
    )
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.names == ["id", "name", "lat"]
    assert tbl.schema.field("id").type == pa.int64()

    path = str(tmp_path / "empty.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t(a INTEGER)")
    conn.commit()
    conn.close()
    ds, _ = read_sqlite(path, table="t", spec="a:Integer")
    assert sum(len(b) for b in ds.iter_batches(batch_format="pyarrow")) == 0


def test_missing_spec_field_emits_typed_nulls(ray_session, example_db):
    """A spec field absent from one statement's result set must appear as
    a typed null column so every partition shares the declared schema
    (round-3 review finding: silent omission made blocks disagree)."""
    sql = "SELECT id, name FROM example\nSELECT id FROM example WHERE id < 3"
    ds, _ = read_sqlite(example_db, sql=sql, spec="id:Integer,name:String")
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    for t in tables:
        assert t.schema.names == ["id", "name"]
    tbl = pa.concat_tables(tables)
    assert len(tbl) == 13
    assert tbl["name"].null_count == 3


def test_bad_args(example_db):
    with pytest.raises(ValueError):
        read_sqlite(example_db)
    with pytest.raises(ValueError):
        read_sqlite(example_db, table="x; DROP TABLE example")


def test_registry_resolves_jdbc(ray_session, example_db):
    from geomesa_ray.registry import converter

    fn = converter("jdbc")
    ds, _ = fn(example_db, table="example")
    assert sum(len(b) for b in ds.iter_batches(batch_format="pyarrow")) == 10


def test_without_rowid_falls_back_single_statement(ray_session, tmp_path):
    """WITHOUT ROWID tables have no implicit key to range-split on —
    the rowid probe fails and the read must fall back to one full-table
    statement instead of erroring (ADVICE r3)."""
    path = str(tmp_path / "worowid.db")
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE kv(k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID"
    )
    conn.executemany(
        "INSERT INTO kv VALUES (?, ?)", [(f"k{i}", i) for i in range(7)]
    )
    conn.commit()
    conn.close()
    ds, _ = read_sqlite(path, table="kv", partitions=4)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert tbl.sort_by("v")["v"].to_pylist() == list(range(7))


def test_anchored_utc_strip_rejects_midstring_z(ray_session, tmp_path):
    """A 'Z' inside the value (not a trailing UTC designator) must fail
    the timestamp cast loudly, not be silently deleted (ADVICE r3)."""
    path = str(tmp_path / "badts.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t(id INTEGER PRIMARY KEY, dtg TEXT)")
    conn.execute("INSERT INTO t VALUES (1, '2017-02-03TZ00:01:01.000')")
    conn.commit()
    conn.close()
    ds, _ = read_sqlite(path, table="t", spec="id:Integer,dtg:Date")
    with pytest.raises(Exception):
        pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
