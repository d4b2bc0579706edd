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
