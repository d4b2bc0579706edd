"""SQL-database converter (JDBC analog) over stdlib ``sqlite3``.

Behavioral contract mirrored from the reference's JDBC converter
(geomesa-convert-jdbc/.../JdbcConverter.scala:29-147): the converter's
input is a sequence of newline-separated SELECT statements, each executed
against the configured connection, and every result-set row becomes one
feature whose values are typed by the SFT. The environment has no JDBC /
network databases, so the connection string is a sqlite file — the one
SQL engine in the stdlib — and typing reuses the delimited converter's
SFT inference (TypeInference analog) when no spec is given.

Scale path: a *table* read is planned driver-side into rowid ranges and
each Ray task opens the database file read-only and streams its own range
in ``chunk_rows`` fetches, so no task ever holds the table and the read
parallelizes like any other partitioned source (at 100 TB the analog is
one task per shard of the upstream database export). Arbitrary SQL can't
be range-split, so each statement becomes one partition — reference
parity with StatementIterator's statement-per-result-set model
(JdbcConverter.scala:73-101). The per-row fetch loop is inherent to the
sqlite3 C API (same bound as the codec stages); rows land in Arrow in
``chunk_rows`` strides.
"""

from __future__ import annotations

import re

import sqlite3

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from geomesa_ray.sources.sft import infer_spec, parse_spec

# anchored UTC-designator strip: only a *trailing* 'Z' / '+00:00' is a
# zone suffix; stripping it mid-string would corrupt unexpected formats
# instead of failing the downstream cast (ADVICE r3).
_UTC_SUFFIX = re.compile(r"(Z|\+00:00)$")


def _connect_ro(db_path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


def _chunk_to_table(names: list[str], rows: list[tuple], schema: pa.Schema) -> pa.Table:
    """One fetchmany chunk → Arrow table typed by the SFT schema."""
    cols = {}
    by_idx = {n: i for i, n in enumerate(names)}
    for field in schema:
        if field.name not in by_idx:
            # spec field absent from this statement's result set: emit a
            # typed null column so every partition shares the declared
            # schema (silent omission would make blocks disagree)
            cols[field.name] = pa.nulls(len(rows), field.type)
            continue
        vals = [r[by_idx[field.name]] for r in rows]
        if pa.types.is_timestamp(field.type):
            # sqlite stores timestamps as ISO text (UTC); Arrow's zoneless
            # cast rejects explicit offsets, so strip the UTC suffix and
            # stamp the schema's zone after (cf. readers.read_delimited)
            strs = [
                None
                if v is None
                else _UTC_SUFFIX.sub("", str(v))
                for v in vals
            ]
            naive = pc.cast(
                pa.array(strs, pa.string()), pa.timestamp(field.type.unit)
            )
            cols[field.name] = (
                pc.assume_timezone(naive, field.type.tz) if field.type.tz else naive
            )
        elif pa.types.is_binary(field.type):
            cols[field.name] = pa.array(
                [None if v is None else bytes(v) for v in vals], pa.binary()
            )
        else:
            cols[field.name] = pa.array(vals).cast(field.type)
    return pa.table(cols)


class _SqlitePartitionReader:
    """Actor-pool stage: one read-only connection per actor, reused across
    all partition rows it is handed (connection setup once per actor, not
    per statement)."""

    def __init__(self, db_path: str, spec: str, chunk_rows: int):
        self.conn = _connect_ro(db_path)
        self.schema = parse_spec(spec)
        self.chunk_rows = chunk_rows

    def __call__(self, batch: pa.Table):
        for sql in batch["sql"].to_pylist():
            cur = self.conn.execute(sql)
            names = [d[0] for d in cur.description]
            while True:
                rows = cur.fetchmany(self.chunk_rows)
                if not rows:
                    break
                yield _chunk_to_table(names, rows, self.schema)

    def __del__(self):
        try:
            self.conn.close()
        except Exception:
            pass


def _sample_spec(
    conn: sqlite3.Connection, sql: str, infer_sample: int
) -> str:
    cur = conn.execute(f"SELECT * FROM ({sql.rstrip(';')}) LIMIT {infer_sample}")
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return infer_spec(
        {
            n: [None if r[i] is None else str(r[i]) for r in rows]
            for i, n in enumerate(names)
        }
    )


def read_sqlite(
    db_path: str,
    table: str | None = None,
    sql: str | None = None,
    spec: str | None = None,
    partitions: int = 8,
    chunk_rows: int = 20_000,
    infer_sample: int = 100,
    concurrency: int = 4,
) -> "tuple[ray.data.Dataset, str]":
    """SQL-source converter: sqlite database → (typed Dataset, spec used).

    Exactly one of ``table`` / ``sql``:

    - ``table``: distributed arm — the driver plans ``partitions`` rowid
      ranges (rowid is sqlite's implicit clustered key) and each Ray task
      reads one range, so the read scales with the pool. ``WITHOUT
      ROWID`` tables have no implicit key to range-split on; the rowid
      probe fails for them and the read falls back to the
      single-statement path (one partition, still correct).
    - ``sql``: newline-separated SELECT statements, one partition each
      (reference StatementIterator parity — arbitrary SQL can't be
      range-split).
    """
    if (table is None) == (sql is None):
        raise ValueError("exactly one of table= / sql= is required")

    conn = _connect_ro(db_path)
    try:
        if table is not None:
            if not table.replace("_", "").isalnum():
                raise ValueError(f"bad table name: {table!r}")
            try:
                lo, hi = conn.execute(
                    f"SELECT MIN(rowid), MAX(rowid) FROM {table}"
                ).fetchone()
            except sqlite3.OperationalError:
                # WITHOUT ROWID table: no implicit key to range-split on —
                # fall back to one full-table statement (single partition)
                lo = hi = None
            if lo is None:  # empty or WITHOUT ROWID: one statement
                stmts = [f"SELECT * FROM {table}"]
            else:
                n = max(1, min(partitions, hi - lo + 1))
                step = (hi - lo + 1 + n - 1) // n
                stmts = [
                    f"SELECT * FROM {table} WHERE rowid BETWEEN "
                    f"{lo + i * step} AND {min(hi, lo + (i + 1) * step - 1)}"
                    for i in range(n)
                ]
            if spec is None:
                spec = _sample_spec(conn, f"SELECT * FROM {table}", infer_sample)
        else:
            stmts = [s.strip() for s in sql.splitlines() if s.strip()]
            if spec is None:
                spec = _sample_spec(conn, stmts[0], infer_sample)
    finally:
        conn.close()

    parts = ray.data.from_arrow(pa.table({"sql": pa.array(stmts, pa.string())}))
    ds = parts.repartition(len(stmts)).map_batches(
        _SqlitePartitionReader,
        fn_constructor_kwargs={
            "db_path": db_path,
            "spec": spec,
            "chunk_rows": chunk_rows,
        },
        batch_size=1,
        batch_format="pyarrow",
        concurrency=(1, concurrency),  # autoscale; fixed pools starve upstream
    )
    return ds, spec
