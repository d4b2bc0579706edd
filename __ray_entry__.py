"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (plus the corpus operators); ``oracle_sql()`` gives the DuckDB
equivalent where the operation is SQL-expressible with bit-deterministic
results (integer counts, exact double arithmetic, deterministic tie-breaks).
Every entry carries an oracle: the near-dup/fingerprint kernels are built
from explicitly-specified integer arithmetic reproduced bit-for-bit in SQL
(pipelines/oracles.py), the Z2/Z3 encoders and the Z3 histogram sketch are
hash-matched against independent SQL magic-mask implementations, the BIN
layout round-trips against a mirrored FNV fold, and the IVF ANN entry pins
the exhaustive-probe configuration so the brute-force SQL verifies the
full IVF path.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derived geo-points →
    Z2/Z3 + S2 + hex (H3-analog) cell encoding → broadcast
    point-in-polygon join (the input hint's "Z2/Z3-style keys plus H3/S2
    cells via vectorized map_batches over zero-copy Arrow")."""
    import pyarrow as pa

    from geomesa_ray.pipelines.queries import events_points, polygons_table
    from geomesa_ray.stages.encode import EncodeKeys
    from geomesa_ray.stages.join import pip_join_broadcast

    pts = events_points("/root/testdata/sf0.001").map_batches(
        lambda b: b.append_column("url", b["event_id"].cast(pa.string())),
        batch_format="pyarrow",
    )
    encoded = pts.map_batches(
        EncodeKeys(id_col="url", ts_col="ts", s2_level=12, hex_res=9).__call__,
        batch_format="pyarrow",
    )
    return pip_join_broadcast(encoded, polygons_table(), concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    from geomesa_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geomesa_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
