"""Export sinks: BIN packed records, Arrow IPC, CSV, GeoJSON, partitioned
Parquet.

Reference surface: geomesa-tools/.../export/ExportFormat.scala:56-112 and
the feature exporters (geomesa-features/geomesa-feature-exporters). The BIN
format follows BinaryOutputEncoder.scala:101-123 + :177-187 exactly:
little-endian ``[trackId:int32][time_s:int32][lat:f32][lon:f32]`` (16 B), or
24 B with a trailing ``label:int64`` (first 8 utf-8 bytes little-endian for
string labels, BinaryOutputEncoder.convertToLabel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.stages.encode import hash_strings


def _label_to_i64(values) -> np.ndarray:
    """String label → first-8-utf8-bytes little-endian int64
    (BinaryOutputEncoder.convertToLabel)."""
    out = np.zeros(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        if v is None:
            continue
        if isinstance(v, (int, np.integer)):
            out[i] = int(v)
            continue
        acc = 0
        for k, b in enumerate(str(v).encode("utf-8")[:8]):
            acc += (b & 0xFF) << (8 * k)
        out[i] = np.int64(np.uint64(acc).astype(np.int64))
    return out


class BinEncode:
    """map_batches stage: rows → one packed BIN blob per batch.

    Output: single ``bin`` binary column (one blob per batch, like the
    reference's aggregated bin features, BinAggregatingScan.scala:121-199).
    trackId = stable 32-bit hash of the track column (hashCode analog).
    """

    def __init__(self, track_col: str = "url", ts_col: str = "warc_ts",
                 lon_col: str = "lon", lat_col: str = "lat",
                 label_col: str | None = None, sort_by_time: bool = False,
                 track_hash: str = "default"):
        if track_hash not in ("default", "fnv"):
            raise ValueError(track_hash)
        self.track_col = track_col
        self.ts_col = ts_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.label_col = label_col
        self.sort_by_time = sort_by_time
        # "fnv" = explicitly-specified FNV-1a low 32 bits, chosen so a SQL
        # oracle can reproduce track ids; "default" = the engine hash
        self.track_hash = track_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.track_hash == "fnv":
            from geomesa_ray.stages.dedup import fnv1a_utf8

            track = (fnv1a_utf8(batch[self.track_col].cast(pa.string()))
                     & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        else:
            track = (hash_strings(batch[self.track_col]) & np.uint64(0xFFFFFFFF)).astype(
                np.uint32
            )
        from geomesa_ray.functions.convert import to_epoch_millis

        ts_ms = to_epoch_millis(batch[self.ts_col])
        secs = (ts_ms // 1000).astype(np.int64)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float32)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float32)
        order = np.argsort(secs, kind="stable") if self.sort_by_time else np.arange(n)
        if self.label_col is None:
            rec = np.zeros(n, dtype=[("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4")])
        else:
            rec = np.zeros(
                n,
                dtype=[("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4"), ("lb", "<i8")],
            )
            rec["lb"] = _label_to_i64(batch[self.label_col].to_pylist())[order]
        rec["t"] = track[order]
        rec["s"] = secs[order].astype(np.int32)
        rec["la"] = lat[order]
        rec["lo"] = lon[order]
        return pa.table({"bin": pa.array([rec.tobytes()], pa.binary())})


def bin_decode(blob: bytes, has_label: bool = False) -> pa.Table:
    """Decode a BIN blob (BinaryOutputEncoder.decode:177-187)."""
    if has_label:
        dt = np.dtype([("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4"), ("lb", "<i8")])
    else:
        dt = np.dtype([("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4")])
    rec = np.frombuffer(blob, dtype=dt)
    cols = {
        "track_id": pa.array(rec["t"].astype(np.int64), pa.int64()),
        "dtg_ms": pa.array(rec["s"].astype(np.int64) * 1000, pa.int64()),
        "lat": pa.array(rec["la"], pa.float32()),
        "lon": pa.array(rec["lo"], pa.float32()),
    }
    if has_label:
        cols["label"] = pa.array(rec["lb"], pa.int64())
    return pa.table(cols)


def bin_decode_batch(batch: pa.Table, has_label: bool = False) -> pa.Table:
    """Vectorized decode of a whole batch of BIN blobs: the layout is
    fixed-width, so the batch decodes as ONE ``np.frombuffer`` over the
    Arrow binary column's data buffer — no per-blob Python loop. Blob
    boundaries don't matter for decoding (records are self-delimiting by
    width); nulls are rejected loudly."""
    arr = batch.column("bin").combine_chunks()
    if arr.null_count:
        raise ValueError("bin column contains nulls")
    # binary → int32 offsets, large_binary → int64; slice the data buffer
    # by the first/last offsets so sliced arrays (nonzero arr.offset) and
    # leading buffer baggage decode correctly
    off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=off_dt, count=len(arr) + 1, offset=arr.offset * off_dt().itemsize
    )
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0]: offsets[-1]]
    if has_label:
        dt = np.dtype([("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4"), ("lb", "<i8")])
    else:
        dt = np.dtype([("t", "<u4"), ("s", "<i4"), ("la", "<f4"), ("lo", "<f4")])
    if len(data) % dt.itemsize:
        raise ValueError("bin payload is not a whole number of records")
    rec = data.view(dt)
    cols = {
        "track_id": pa.array(rec["t"].astype(np.int64), pa.int64()),
        "dtg_ms": pa.array(rec["s"].astype(np.int64) * 1000, pa.int64()),
        "lat": pa.array(np.ascontiguousarray(rec["la"]), pa.float32()),
        "lon": pa.array(np.ascontiguousarray(rec["lo"]), pa.float32()),
    }
    if has_label:
        cols["label"] = pa.array(np.ascontiguousarray(rec["lb"]), pa.int64())
    return pa.table(cols)


def write_bin(ds: ray.data.Dataset, path: str, **encoder_kwargs) -> int:
    """Stream the dataset into one .bin file; returns record count."""
    enc = BinEncode(**encoder_kwargs)
    total = 0
    rec_size = 24 if encoder_kwargs.get("label_col") else 16
    with open(path, "wb") as f:
        for blob_batch in ds.map_batches(
            enc.__call__, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for blob in blob_batch["bin"].to_pylist():
                f.write(blob)
                total += len(blob) // rec_size
    return total


def _normalize_ipc_batch(t: pa.Table) -> pa.Table:
    """One contiguous zero-offset chunk per column, so the IPC bytes
    depend only on batch contents and row counts — not on incidental
    chunk boundaries, slice offsets, or leftover buffer padding from
    whichever pipeline produced the batch."""
    import pyarrow.compute as pc

    t = t.combine_chunks()
    # The gather is UNCONDITIONAL by design: a zero-offset array can still
    # carry producer-specific buffer padding (measured — skipping the copy
    # for offset==0 arrays broke byte-equality between the k-way-merge and
    # sort-stage export paths). One extra pass on a disk-bound sink is the
    # price of a deterministic output contract.
    idx = pa.array(np.arange(len(t), dtype=np.int64))
    return pa.table(
        {
            n: pc.take(
                t[n].chunk(0) if t[n].num_chunks else pa.array([], t[n].type),
                idx,
            )
            for n in t.schema.names
        },
        schema=t.schema,
    )


def _write_ipc_batches(batches, path: str,
                       dictionary_cols: list[str] | None = None) -> int:
    """Shared IPC stream writer over an iterable of Arrow tables."""
    import pyarrow.ipc as ipc

    total = 0
    writer = None
    opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    try:
        for batch in batches:
            batch = _normalize_ipc_batch(batch)
            if dictionary_cols:
                for c in dictionary_cols:
                    i = batch.schema.get_field_index(c)
                    batch = batch.set_column(
                        i, c, batch[c].combine_chunks().dictionary_encode()
                    )
            if writer is None:
                writer = ipc.new_stream(path, batch.schema, options=opts)
            writer.write_table(batch)
            total += len(batch)
    finally:
        if writer is not None:
            writer.close()
    return total


def write_arrow_ipc(ds: ray.data.Dataset, path: str,
                    dictionary_cols: list[str] | None = None,
                    batch_rows: int | None = None) -> int:
    """Arrow IPC stream export (ArrowScan / arrow exporter analog):
    zero-copy per block — Ray Data blocks already ARE Arrow.

    ``dictionary_cols`` dictionary-encodes the named string columns per
    batch (the reference's per-batch dictionaries + deltas,
    vector/ArrowDictionary.scala / io/DeltaWriter.scala analog — IPC
    handles the delta dictionaries natively). ``batch_rows`` rebatches to
    a fixed size (default: native block boundaries)."""
    kwargs = {} if batch_rows is None else {"batch_size": batch_rows}
    return _write_ipc_batches(
        ds.iter_batches(batch_format="pyarrow", **kwargs),
        path, dictionary_cols,
    )


class _SortedGroupStream:
    """Sequential batch stream over one sorted group's parquet files:
    current head batch + int64 sort keys + cursor."""

    def __init__(self, idx: int, files: list[str], sort_col: str,
                 columns: list[str] | None, read_rows: int):
        import pyarrow.parquet as pq

        self.idx = idx
        self._batches = (
            pa.Table.from_batches([rb])
            for f in files
            for rb in pq.ParquetFile(f).iter_batches(
                batch_size=read_rows, columns=columns
            )
        )
        self._sort_col = sort_col
        self.table: pa.Table | None = None
        self.keys = None
        self.pos = 0
        self._refill()

    def _refill(self) -> None:
        for t in self._batches:
            if len(t):
                self.table = t
                self.keys = t[self._sort_col].to_numpy(zero_copy_only=False)
                self.pos = 0
                return
        self.table = None

    @property
    def head(self):
        return self.keys[self.pos]

    def take_until(self, bound, inclusive: bool) -> pa.Table:
        """Slice rows from the cursor while key < bound (≤ if inclusive),
        advancing the cursor and refilling on exhaustion."""
        side = "right" if inclusive else "left"
        hi = int(np.searchsorted(self.keys[self.pos:], bound, side=side)) + self.pos
        out = self.table.slice(self.pos, hi - self.pos)
        self.pos = hi
        if self.pos >= len(self.table):
            self._refill()
        return out


def iter_sorted_layout_batches(layout_dir: str, sort_col: str = "z2",
                               columns: list[str] | None = None,
                               batch_rows: int = 16_384):
    """Globally-sorted batches from a sorted layout WITHOUT a sort stage.

    K-way merge of the layout's group streams (reference analog: the
    priority-queue merge of pre-sorted dictionary batches in
    io/DeltaWriter.scala): each ``group=*`` directory is written
    key-sorted by ingest, so one cursor per group suffices. The merge is
    vectorized — the winning stream emits every row below the other
    streams' minimum head key in ONE slice (searchsorted), never a
    row-at-a-time heap pop; ties break by group index, deterministically.
    Memory is O(groups × read-batch), so the export streams at any scale.

    ``sort_col`` must be a single int64-ordered column (``z2``, ``xz2``,
    ``cell``); composite z3 keys export per ``z3_bin`` (the major key
    partitions the merge naturally).
    """
    import glob as _glob
    import os

    group_dirs = sorted(_glob.glob(os.path.join(layout_dir, "group=*")))
    if not group_dirs:
        raise ValueError(f"no group=* dirs under {layout_dir!r}")
    streams = []
    for i, d in enumerate(group_dirs):
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        if files:
            streams.append(
                _SortedGroupStream(i, files, sort_col, columns, batch_rows)
            )
    streams = [s for s in streams if s.table is not None]

    pending: list[pa.Table] = []
    pending_rows = 0

    def _flush(final: bool):
        nonlocal pending, pending_rows
        while pending_rows >= batch_rows or (final and pending_rows):
            t = pa.concat_tables(pending).combine_chunks()
            yield t.slice(0, batch_rows)
            rest = t.slice(batch_rows)
            pending = [rest] if len(rest) else []
            pending_rows = len(rest)

    while streams:
        s = min(streams, key=lambda st: (st.head, st.idx))
        others = [st.head for st in streams if st is not s]
        if others:
            bound = min(others)
            # ties on the boundary go to the selected (lowest-idx) stream
            inclusive = s.idx < min(
                st.idx for st in streams if st is not s and st.head == bound
            ) if any(st.head == bound for st in streams if st is not s) else False
            chunk = s.take_until(bound, inclusive=inclusive)
        else:
            chunk = s.table.slice(s.pos)
            s.pos = len(s.table)
            s._refill()
        if len(chunk):
            pending.append(chunk)
            pending_rows += len(chunk)
            yield from _flush(final=False)
        streams = [st for st in streams if st.table is not None]
    yield from _flush(final=True)


def write_arrow_ipc_sorted(layout_dir: str, path: str, sort_col: str = "z2",
                           columns: list[str] | None = None,
                           dictionary_cols: list[str] | None = None,
                           batch_rows: int = 16_384) -> int:
    """Sorted Arrow IPC export of an ingested layout with NO sort stage:
    the group files are already key-sorted, so a k-way merge
    (:func:`iter_sorted_layout_batches`) replaces the all-to-all shuffle
    ``ds.sort`` would run. Byte-equal to ``write_arrow_ipc(ds.sort(key),
    batch_rows=batch_rows)`` for unique keys."""
    return _write_ipc_batches(
        iter_sorted_layout_batches(layout_dir, sort_col, columns, batch_rows),
        path, dictionary_cols,
    )


def write_csv(ds: ray.data.Dataset, path_dir: str) -> None:
    ds.write_csv(path_dir)


def write_orc(ds: ray.data.Dataset, path_dir: str,
              rows_per_file: int = 1_000_000) -> int:
    """ORC export (reference FS-storage ORC format / exporter analog):
    one .orc file per streamed chunk under ``path_dir``."""
    import os

    from pyarrow import orc

    os.makedirs(path_dir, exist_ok=True)
    total = 0
    idx = 0
    import pyarrow as _pa

    buf: list[pa.Table] = []
    buffered = 0

    def flush():
        nonlocal idx, buffered, buf
        if not buf:
            return
        orc.write_table(
            _pa.concat_tables(buf), os.path.join(path_dir, f"part-{idx:05d}.orc")
        )
        idx += 1
        buf, buffered = [], 0

    for batch in ds.iter_batches(batch_format="pyarrow"):
        buf.append(batch)
        buffered += len(batch)
        total += len(batch)
        if buffered >= rows_per_file:
            flush()
    flush()
    return total


def read_orc(path_dir: str) -> ray.data.Dataset:
    """ORC source: read part files back as a Dataset."""
    import glob

    from pyarrow import orc

    tables = [
        orc.read_table(f) for f in sorted(glob.glob(f"{path_dir}/*.orc"))
    ]
    import pyarrow as _pa

    return ray.data.from_arrow(_pa.concat_tables(tables))


def write_geojson(ds: ray.data.Dataset, path: str, lon_col: str = "lon",
                  lat_col: str = "lat", limit_props: list[str] | None = None) -> int:
    """GeoJSON FeatureCollection export (point geometries)."""
    import json

    total = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            props_cols = limit_props or [
                c for c in batch.schema.names if c not in (lon_col, lat_col)
            ]
            lon = batch[lon_col].to_pylist()
            lat = batch[lat_col].to_pylist()
            props = {c: batch[c].to_pylist() for c in props_cols}
            for i in range(len(batch)):
                feat = {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [lon[i], lat[i]]},
                    "properties": {c: props[c][i] for c in props_cols},
                }
                f.write(("" if first else ",") + json.dumps(feat, default=str))
                first = False
                total += 1
        f.write("]}")
    return total


def write_geojson_polygons(ds: ray.data.Dataset, path: str,
                           wkb_col: str = "geom_wkb",
                           limit_props: list[str] | None = None) -> int:
    """GeoJSON FeatureCollection export for polygon geometries (WKB
    column → Polygon features) — the vector side of raster→vector
    surfaces like hex densities. Streams batches; the file write is the
    driver-side sink, like :func:`write_geojson`."""
    import json

    from geomesa_ray.geometry.wkb import from_wkb

    total = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            props_cols = limit_props or [
                c for c in batch.schema.names if c != wkb_col
            ]
            wkbs = batch[wkb_col].to_pylist()
            props = {c: batch[c].to_pylist() for c in props_cols}
            for i in range(len(batch)):
                geom = from_wkb(wkbs[i])
                # all rings, not just the shell — GeoJSON Polygon coordinates
                # are [shell, *holes]; dropping holes silently fills them in
                if hasattr(geom, "shell"):
                    rings = [geom.shell, *getattr(geom, "holes", [])]
                else:
                    rings = list(geom.rings)
                feat = {
                    "type": "Feature",
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [
                            [list(p) for p in ring] for ring in rings
                        ],
                    },
                    "properties": {c: props[c][i] for c in props_cols},
                }
                f.write(("" if first else ",") + json.dumps(feat, default=str))
                first = False
                total += 1
        f.write("]}")
    return total
