"""Micro-batch streaming upsert consumer with checkpointed offsets.

True-streaming analog of the Kafka DataStore's live feature view
(KafkaDataStore.scala:598-614): a SOURCE DIRECTORY of append-only parquet
segments plays the topic (segment file name = offset); each ``poll()``

    1. discovers segments beyond the checkpointed offset,
    2. merges them into the live view with the distributed
       latest-by-event-time reduction (ordered=true late-drop semantics),
    3. applies event-time TTL expiry against ``now``,
    4. atomically checkpoints the new view (parquet generation directory +
       rename) and the consumed offsets,

so a killed consumer resumes exactly after its last completed poll —
segments are re-consumed only if the checkpoint write didn't land, and
re-consumption is idempotent (latest-per-id is a supremum, replays
cannot regress the view).

All heavy work is Dataset operators; the driver handles only file names
and the checkpoint JSON. View size is bounded by the live key set.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa
import ray.data

from geomesa_ray.state.upsert import expire, latest_view


class StreamingUpsert:
    """File-backed micro-batch consumer maintaining a live upsert view."""

    def __init__(self, source_dir: str, state_dir: str,
                 id_col: str = "fid", time_col: str = "event_ts",
                 seq_col: str | None = None, ttl_ms: int | None = None):
        self.source_dir = source_dir
        self.state_dir = state_dir
        self.id_col = id_col
        self.time_col = time_col
        self.seq_col = seq_col
        self.ttl_ms = ttl_ms
        os.makedirs(state_dir, exist_ok=True)
        self._ckpt_path = os.path.join(state_dir, "CHECKPOINT.json")
        if os.path.exists(self._ckpt_path):
            with open(self._ckpt_path) as f:
                self._ckpt = json.load(f)
        else:
            self._ckpt = {"generation": 0, "consumed": []}

    # -- checkpoint state ---------------------------------------------------

    @property
    def consumed(self) -> set[str]:
        return set(self._ckpt["consumed"])

    def _view_dir(self, gen: int) -> str:
        return os.path.join(self.state_dir, f"view-{gen:06d}")

    def view(self) -> ray.data.Dataset | None:
        """The current live view (None before the first poll or when the
        view is empty — TTL expiry can legitimately drain it, in which
        case the generation dir holds no parquet files)."""
        gen = self._ckpt["generation"]
        d = self._view_dir(gen)
        if gen == 0 or not os.path.isdir(d):
            return None
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not files:
            return None
        return ray.data.read_parquet(d)

    # -- consumption --------------------------------------------------------

    def pending_segments(self) -> list[str]:
        names = sorted(
            f for f in os.listdir(self.source_dir) if f.endswith(".parquet")
        )
        return [f for f in names if f not in self.consumed]

    def poll(self, now_ms: int | None = None) -> dict:
        """Consume pending segments; returns {'segments', 'view_rows'}."""
        pending = self.pending_segments()
        if not pending:
            return {"segments": 0, "view_rows": None}
        cur = self.view()
        seq_col = self.seq_col
        if seq_col is None:
            # No caller-supplied sequence: equal-event-time ties would
            # otherwise resolve by block arrival order (nondeterministic
            # after the union+shuffle), breaking replay idempotency.
            # Synthesize a persistent per-segment rank: later segments
            # win ties, and the view carries each row's winning rank so
            # a crash-replay resolves identically.
            import pyarrow as pa

            seq_col = "__seq__"
            base = int(self._ckpt.get("next_seq", 1))

            def stamp(seq_val):
                def f(b: pa.Table) -> pa.Table:
                    if "__seq__" in b.schema.names:
                        return b
                    return b.append_column(
                        "__seq__", pa.array([seq_val] * len(b), pa.int64())
                    )
                return f

            parts = [
                ray.data.read_parquet(
                    os.path.join(self.source_dir, f)
                ).map_batches(stamp(base + i), batch_format="pyarrow")
                for i, f in enumerate(pending)
            ]
            updates = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
            if cur is not None:
                # pre-__seq__ views (older state dirs) default to rank 0
                cur = cur.map_batches(stamp(0), batch_format="pyarrow")
        else:
            updates = ray.data.read_parquet(
                [os.path.join(self.source_dir, f) for f in pending]
            )
        merged = latest_view(
            updates if cur is None else cur.union(updates),
            id_col=self.id_col, time_col=self.time_col, seq_col=seq_col,
        )
        if self.ttl_ms is not None and now_ms is not None:
            merged = expire(merged, now_ms, ttl_ms=self.ttl_ms,
                            time_col=self.time_col)
        new_gen = self._ckpt["generation"] + 1
        out_dir = self._view_dir(new_gen)
        tmp = tempfile.mkdtemp(dir=self.state_dir, prefix=".view-tmp-")
        merged.write_parquet(tmp)
        # a pre-existing generation dir means a prior attempt died between
        # publish and checkpoint — it is uncommitted, so discard it or the
        # rename below raises ENOTEMPTY and wedges the consumer
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)  # atomic publish of the new generation
        # count from the written footers: re-reading would re-execute the
        # merge, and an EMPTY view writes no files at all (read_parquet on
        # the bare dir would raise and wedge the consumer)
        import pyarrow.parquet as _pq

        rows = sum(
            _pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        new_ckpt = {
            "generation": new_gen,
            "consumed": sorted(self.consumed | set(pending)),
            "next_seq": int(self._ckpt.get("next_seq", 1)) + len(pending),
        }
        fd, ctmp = tempfile.mkstemp(dir=self.state_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(new_ckpt, f)
        os.replace(ctmp, self._ckpt_path)
        self._ckpt = new_ckpt
        # old generations are garbage once the checkpoint lands
        for g in range(1, new_gen):
            old = self._view_dir(g)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
        return {"segments": len(pending), "view_rows": rows}


class StreamingWindow:
    """Checkpointed micro-batch tumbling-window aggregator with
    bounded-lateness event-time drops.

    Composes the segment-replay consumer (same atomic
    generation-dir + checkpoint protocol as :class:`StreamingUpsert`)
    with the tumbling-window combiner (stages/sessions.tumbling_counts)
    so a live topic maintains per-``(window, key)`` counts. Event-time
    semantics mirror the reference's Kafka feature-expiry path
    (KafkaDataStore.scala:598-614, ordered=true late-drop):

    - the **watermark** is ``max(event time seen in completed polls) −
      allowed_lateness`` (event times read from parquet footer stats —
      metadata only, no extra pipeline execution);
    - events older than the watermark *at the start of the poll* are
      dropped and counted (``late_dropped``) — the watermark only
      advances after a poll commits, so crash-replay of an uncommitted
      poll filters with the same watermark and is exactly idempotent;
    - windows entirely below the watermark are FINAL
      (:meth:`final_windows`) — no in-flight segment can change them.

    All counting is Dataset combiner work (per-batch partials,
    tree-merged); state per generation is the bounded windows×keys table.
    """

    def __init__(self, source_dir: str, state_dir: str,
                 ts_col: str = "ts", key_col: str | None = "event_type",
                 window_s: int = 3600, allowed_lateness_s: int = 0):
        self.source_dir = source_dir
        self.state_dir = state_dir
        self.ts_col = ts_col
        self.key_col = key_col
        self.window_s = int(window_s)
        self.lateness_us = int(allowed_lateness_s) * 1_000_000
        os.makedirs(state_dir, exist_ok=True)
        self._ckpt_path = os.path.join(state_dir, "CHECKPOINT.json")
        if os.path.exists(self._ckpt_path):
            with open(self._ckpt_path) as f:
                self._ckpt = json.load(f)
        else:
            self._ckpt = {
                "generation": 0,
                "consumed": [],
                "watermark_us": -(1 << 62),
                "late_dropped": 0,
            }

    # -- state ----------------------------------------------------------

    @property
    def consumed(self) -> set[str]:
        return set(self._ckpt["consumed"])

    @property
    def watermark_us(self) -> int:
        return int(self._ckpt["watermark_us"])

    @property
    def late_dropped(self) -> int:
        return int(self._ckpt["late_dropped"])

    def _view_dir(self, gen: int) -> str:
        return os.path.join(self.state_dir, f"win-{gen:06d}")

    def counts(self) -> ray.data.Dataset | None:
        """Current (window_start_us[, key], n_events) view — open AND
        final windows."""
        gen = self._ckpt["generation"]
        d = self._view_dir(gen)
        if gen == 0 or not os.path.isdir(d):
            return None
        if not any(f.endswith(".parquet") for f in os.listdir(d)):
            return None
        return ray.data.read_parquet(d)

    def final_windows(self) -> ray.data.Dataset | None:
        """Windows whose end ≤ watermark: closed — late events beyond the
        watermark are dropped, so these counts can never change."""
        cur = self.counts()
        if cur is None:
            return None
        w_us = self.window_s * 1_000_000
        wm = self.watermark_us
        import pyarrow.compute as pc

        return cur.map_batches(
            lambda b: b.filter(
                pc.less_equal(
                    pc.add(b["window_start_us"], w_us), pa.scalar(wm)
                )
            ),
            batch_format="pyarrow",
        )

    # -- consumption ------------------------------------------------------

    def pending_segments(self) -> list[str]:
        names = sorted(
            f for f in os.listdir(self.source_dir) if f.endswith(".parquet")
        )
        return [f for f in names if f not in self.consumed]

    @staticmethod
    def _ts_to_us(v) -> int:
        """Footer stat → exact epoch µs (datetime arithmetic, never a
        float timestamp: truncating to ms here would put the watermark up
        to 999 µs below the oracle's MAX(epoch_us) and flip boundary
        rows — the engine and the SQL mirror must agree exactly)."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            td = v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        return int(v)

    def _segment_ts_bounds_us(self, paths: list[str]) -> tuple[int, int]:
        """(min, max) event time across segment parquet footers (µs)."""
        import pyarrow.parquet as _pq

        lo, hi = (1 << 62), -(1 << 62)
        for p in paths:
            md = _pq.ParquetFile(p).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema != self.ts_col:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"segment {p} lacks {self.ts_col} footer stats"
                        )
                    lo = min(lo, self._ts_to_us(st.min))
                    hi = max(hi, self._ts_to_us(st.max))
        return lo, hi

    def poll(self) -> dict:
        """Consume pending segments; returns {'segments', 'window_rows',
        'late_dropped' (this poll), 'watermark_us' (after the poll)}."""
        import pyarrow.compute as pc

        from geomesa_ray.stages.corpus import _group_sum, _tree_merge
        from geomesa_ray.stages.sessions import tumbling_counts

        pending = self.pending_segments()
        if not pending:
            return {"segments": 0, "window_rows": None,
                    "late_dropped": 0, "watermark_us": self.watermark_us}
        paths = [os.path.join(self.source_dir, f) for f in pending]
        wm = self.watermark_us  # prior watermark: replay-stable late filter
        _seg_lo, seg_hi = self._segment_ts_bounds_us(paths)

        updates = ray.data.read_parquet(paths)

        def _drop_late(b: pa.Table) -> pa.Table:
            t = b[self.ts_col]
            unit = t.type.unit if pa.types.is_timestamp(t.type) else "us"
            ints = t.cast(pa.int64()).to_numpy(zero_copy_only=False)
            scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
            us = ints // 1_000 if scale is None else ints * scale
            return b.filter(pa.array(us >= wm))

        import pyarrow.parquet as _pq

        # footer row counts: no pipeline execution
        total_in = sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)
        new_counts = tumbling_counts(
            updates.map_batches(_drop_late, batch_format="pyarrow"),
            ts_col=self.ts_col, key_col=self.key_col,
            window_s=self.window_s,
        ).materialize()
        kept = 0
        for b in new_counts.iter_batches(batch_format="pyarrow"):
            kept += int(pc.sum(b["n_events"]).as_py() or 0)
        dropped = total_in - kept

        key_cols = ["window_start_us"] + ([self.key_col] if self.key_col else [])
        schema = pa.schema(
            [pa.field("window_start_us", pa.int64())]
            + ([pa.field(self.key_col, pa.string())] if self.key_col else [])
            + [pa.field("n_events", pa.int64())]
        )

        def merge(batch: pa.Table) -> pa.Table:
            return _group_sum(batch.cast(schema), key_cols, ["n_events"])

        cur = self.counts()
        merged = new_counts if cur is None else cur.union(new_counts)
        merged, converged = _tree_merge(
            merged.map_batches(merge, batch_format="pyarrow"), merge
        )
        if not converged:  # unbounded window×key product: exact shuffle
            from ray.data.aggregate import Sum

            merged = merged.groupby(key_cols).aggregate(
                Sum("n_events", alias_name="n_events")
            )

        new_gen = self._ckpt["generation"] + 1
        out_dir = self._view_dir(new_gen)
        tmp = tempfile.mkdtemp(dir=self.state_dir, prefix=".win-tmp-")
        merged.write_parquet(tmp)
        if os.path.isdir(out_dir):  # uncommitted prior attempt: discard
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
        import pyarrow.parquet as _pq

        rows = sum(
            _pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        new_ckpt = {
            "generation": new_gen,
            "consumed": sorted(self.consumed | set(pending)),
            "watermark_us": max(wm, seg_hi - self.lateness_us),
            "late_dropped": self.late_dropped + int(dropped),
        }
        fd, ctmp = tempfile.mkstemp(dir=self.state_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(new_ckpt, f)
        os.replace(ctmp, self._ckpt_path)
        self._ckpt = new_ckpt
        for g in range(1, new_gen):
            old = self._view_dir(g)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
        return {"segments": len(pending), "window_rows": rows,
                "late_dropped": int(dropped),
                "watermark_us": self.watermark_us}


class ContinuousConsumer:
    """Long-running tailer closing the micro-batch gap vs the reference's
    live consumer (KafkaDataStore.scala:598-614 behavior contract): owns a
    :class:`StreamingUpsert` or :class:`StreamingWindow` and polls it
    continuously on a background thread, so view generations advance as
    segments land — no manual ``poll()`` calls. The checkpoint contract is
    unchanged (every advance is the wrapped consumer's atomic
    publish+checkpoint), so kill/restart resumes exactly like the
    micro-batch path, and a crashed loop surfaces its error on ``stop()``.

    ``now_ms_fn`` supplies the TTL clock for upsert consumers (defaults to
    wall clock when the consumer has a TTL). Run it on the driver, or
    off-driver via :func:`start_consumer_actor`.
    """

    def __init__(self, consumer, poll_interval_s: float = 0.25,
                 now_ms_fn=None):
        import threading

        self.consumer = consumer
        self.poll_interval_s = float(poll_interval_s)
        if now_ms_fn is None and getattr(consumer, "ttl_ms", None) is not None:
            import time as _time

            now_ms_fn = lambda: int(_time.time() * 1000)  # noqa: E731
        self._now_ms_fn = now_ms_fn
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None
        self._lock = threading.Lock()
        self._polls = 0
        self._segments = 0
        self._error: "BaseException | None" = None

    # -- lifecycle ------------------------------------------------------

    def start(self) -> "ContinuousConsumer":
        import threading

        if self._thread is not None:
            raise RuntimeError("consumer already started")
        self._thread = threading.Thread(
            target=self._loop, name="geomesa-ray-consumer", daemon=True
        )
        self._thread.start()
        return self

    def _poll_once(self) -> dict:
        if self._now_ms_fn is not None and isinstance(
            self.consumer, StreamingUpsert
        ):
            return self.consumer.poll(now_ms=self._now_ms_fn())
        return self.consumer.poll()

    def _loop(self):
        while not self._stop.is_set():
            try:
                r = self._poll_once()
            except BaseException as ex:  # surfaced on stop()/status()
                with self._lock:
                    self._error = ex
                return
            with self._lock:
                self._polls += 1
                self._segments += int(r.get("segments") or 0)
            if not r.get("segments"):
                # idle: wait for new segments (interruptible sleep)
                self._stop.wait(self.poll_interval_s)

    def stop(self, timeout_s: float = 60.0) -> dict:
        """Stop the loop, join the thread, re-raise any loop error, and
        return the final status."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout_s)
            if self._thread.is_alive():
                raise TimeoutError("consumer thread did not stop")
        st = self.status()
        if self._error is not None:
            raise RuntimeError("consumer loop failed") from self._error
        return st

    # -- observation ------------------------------------------------------

    def status(self) -> dict:
        with self._lock:
            return {
                "generation": self.consumer._ckpt["generation"],
                "consumed": len(self.consumer._ckpt["consumed"]),
                "polls": self._polls,
                "segments": self._segments,
                "running": self._thread is not None
                and self._thread.is_alive(),
                "error": repr(self._error) if self._error else None,
            }

    def wait_for_generation(self, gen: int, timeout_s: float = 30.0) -> bool:
        """Block until the view generation reaches ``gen`` (True) or the
        timeout/loop-death hits (False) — the test/ops hook for 'the view
        caught up with the topic'."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        while _time.monotonic() < deadline:
            if self.consumer._ckpt["generation"] >= gen:
                return True
            if self._error is not None:
                return False
            _time.sleep(min(0.05, self.poll_interval_s))
        return self.consumer._ckpt["generation"] >= gen


def start_consumer_actor(consumer_cls, consumer_kwargs: dict,
                         poll_interval_s: float = 0.25,
                         use_ttl_clock: bool = False):
    """Run a :class:`ContinuousConsumer` inside a detached-from-driver Ray
    actor (``num_cpus=0`` — the heavy lifting is still Dataset tasks, the
    actor only drives them), so the tailer survives driver-side work and
    multiple topics can be tailed in parallel. Returns the actor handle;
    call ``.status.remote()`` / ``.stop.remote()`` on it. State remains
    file-backed, so the live view is readable from anywhere via
    ``consumer_cls(**consumer_kwargs).view()``/``.counts()``."""

    @ray.remote(num_cpus=0)
    class _ConsumerActor:
        def __init__(self):
            import time as _time

            now_fn = (lambda: int(_time.time() * 1000)) if use_ttl_clock else None
            self._cc = ContinuousConsumer(
                consumer_cls(**consumer_kwargs),
                poll_interval_s=poll_interval_s,
                now_ms_fn=now_fn,
            ).start()

        def status(self) -> dict:
            return self._cc.status()

        def wait_for_generation(self, gen: int, timeout_s: float = 30.0) -> bool:
            return self._cc.wait_for_generation(gen, timeout_s)

        def stop(self) -> dict:
            return self._cc.stop()

    return _ConsumerActor.remote()
