"""Round-13 pins: the r12 ADVICE hardening — checkpoint-spelling
canonicalization for the frame-log sink's manifest namespace, writer-id
scoped orphan reclamation, and stale-symlink verification in the
streaming scratch-dir builders — plus the serial device transport seam
(S1) exercised against a pure-Python fake with only pyserial's
constructor unfaked."""

from __future__ import annotations

import os
import time


def test_framelog_sink_namespace_spelling_invariant(tmp_path):
    """r12 ADVICE (medium): the manifest namespace hashed the RAW
    checkpointLocation spelling, so the same physical checkpoint spelled
    differently across restarts ('file:///c', '/c', '/c/', a symlink)
    landed in a NEW namespace and a crash-replayed batch double-counted.
    Every spelling of one checkpoint must replay into the SAME namespace
    (replace its manifest), while a genuinely different checkpoint still
    appends."""
    from oem_gateway_spark.sinks.framelog_sink import (
        FrameLogStreamWriter,
        committed_manifests,
    )

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt" / "run1")
    os.makedirs(ckpt)
    alias = str(tmp_path / "ckpt-alias")
    os.symlink(os.path.join(str(tmp_path), "ckpt"), alias)

    spellings = [
        ckpt,
        ckpt + "/",
        "file://" + ckpt,
        "file://localhost" + ckpt,
        os.path.join(str(tmp_path), "ckpt", ".", "run1"),
        os.path.join(alias, "run1"),  # via symlinked parent
    ]
    for i, sp in enumerate(spellings):
        w = FrameLogStreamWriter({"path": sink, "checkpointlocation": sp})
        # every spelling replays batch 0: same namespace -> REPLACE
        w.commit([w.write(iter([(i, i)]))], batchId=0)
        assert len(committed_manifests(sink)) == 1, (
            f"spelling {sp!r} opened a new namespace (double-count)"
        )
    # a different checkpoint is a different namespace: APPEND
    other = FrameLogStreamWriter(
        {"path": sink, "checkpointlocation": str(tmp_path / "ckpt" / "run2")}
    )
    other.commit([other.write(iter([(9, 9)]))], batchId=0)
    assert len(committed_manifests(sink)) == 2

    # remote URIs: scheme/authority case-insensitive, path normalized —
    # but path case is significant (case-sensitive stores)
    from oem_gateway_spark.sinks.framelog_sink import _canonical_checkpoint

    assert _canonical_checkpoint("HDFS://NN:8020/ckpt/a/") == (
        _canonical_checkpoint("hdfs://nn:8020/ckpt/b/../a")
    )
    assert _canonical_checkpoint("hdfs://nn:8020/CKPT") != (
        _canonical_checkpoint("hdfs://nn:8020/ckpt")
    )


def test_framelog_sink_reclaim_scoped_to_writer(tmp_path):
    """r12 ADVICE: two streaming queries with different checkpoints
    legally share one sink path, and a straggler's renamed-but-not-yet-
    committed task output can be older than the age bound — reclamation
    must never delete ANOTHER writer's files, however old.  Own aged
    orphans and id-less litter stay reclaimable; a batch OVERWRITE
    (exclusive by semantics) reclaims regardless of id."""
    from oem_gateway_spark.sinks.framelog_sink import (
        _LAST_RECLAIM,
        _TMP_MAX_AGE_SEC,
        FrameLogStreamWriter,
        committed_files,
    )

    sink = str(tmp_path / "sink")
    a = FrameLogStreamWriter({"path": sink, "checkpointlocation": "/ck/a"})
    b = FrameLogStreamWriter({"path": sink, "checkpointlocation": "/ck/b"})
    past = time.time() - _TMP_MAX_AGE_SEC - 60

    # writer B renames a task file but has NOT committed yet (in-flight
    # straggler), and it is already past the age bound
    b_inflight = b.write(iter([(5, 5)]))
    data = os.path.join(sink, "data")
    os.utime(os.path.join(data, b_inflight.file), (past, past))

    # writer A has an aged orphan of its OWN (a replaced re-commit) and
    # there is aged id-less litter from a legacy writer
    a_orphan = a.write(iter([(1, 1)]))
    os.utime(os.path.join(data, a_orphan.file), (past, past))
    litter = os.path.join(data, "part-00000-legacy.log")
    with open(litter, "w") as f:
        f.write("x\n")
    os.utime(litter, (past, past))

    # A commits a fresh batch; reclamation runs scoped to A
    _LAST_RECLAIM.pop(sink, None)
    a.commit([a.write(iter([(2, 2)]))], batchId=7)
    assert not os.path.exists(os.path.join(data, a_orphan.file)), (
        "own aged orphan survived"
    )
    assert not os.path.exists(litter), "id-less litter survived"
    assert os.path.exists(os.path.join(data, b_inflight.file)), (
        "a concurrent writer's in-flight file was reclaimed (row loss)"
    )

    # B finally commits its straggler batch: rows are all there
    b.commit([b_inflight], batchId=0)
    n = sum(
        1
        for p in committed_files(sink)
        for _ in open(p)
    )
    assert n == 2  # A's batch-7 row + B's straggler row


def test_framelog_sink_batch_overwrite_reclaims_all(tmp_path):
    """Overwrite clears every manifest (exclusive ownership), so its
    reclaim pass is unscoped: aged foreign-id orphans go too."""
    from oem_gateway_spark.sinks.framelog_sink import (
        _LAST_RECLAIM,
        _TMP_MAX_AGE_SEC,
        FrameLogBatchWriter,
    )

    sink = str(tmp_path / "sink")
    past = time.time() - _TMP_MAX_AGE_SEC - 60
    first = FrameLogBatchWriter({"path": sink}, overwrite=False)
    m = first.write(iter([(1, 1)]))
    first.commit([m])
    # age the first save's file, then overwrite: its manifest is cleared,
    # so the file is a foreign-id orphan of the overwriting save
    os.utime(os.path.join(sink, "data", m.file), (past, past))
    _LAST_RECLAIM.pop(sink, None)
    ow = FrameLogBatchWriter({"path": sink}, overwrite=True)
    ow.commit([ow.write(iter([(2, 2)]))])
    assert not os.path.exists(os.path.join(sink, "data", m.file)), (
        "overwrite left the replaced save's aged file unreclaimed"
    )


def test_stream_dir_relinks_regenerated_source(tmp_path):
    """r12 ADVICE: _stream_dir reused a scratch dir keyed by sf_dir alone
    and _link_events only checked exists() — a corpus regenerated in
    place (file -> directory, or rewritten parts) left stale/dangling
    links that double-read or failed the stream.  The dir is now
    fingerprint-keyed AND reused links are verified to resolve to the
    current source."""
    import oem_gateway_spark.suite.streaming_batch as sb

    # fake corpus: single-file layout first
    sf = tmp_path / "sf"
    sf.mkdir()
    src = sf / "events.parquet"
    src.write_bytes(b"v1-payload")
    scratch = tmp_path / "scratch"
    d1 = str(scratch / f"stream-events-x-{sb._source_fp(str(sf))}")
    os.makedirs(d1)
    sb._link_events(str(sf), d1)
    assert os.path.realpath(os.path.join(d1, "events.parquet")) == str(src)

    # regenerate IN PLACE as a parquet DIRECTORY (the scale_probe layout)
    src.unlink()
    src.mkdir()
    (src / "part-00000.parquet").write_bytes(b"p0")
    (src / "part-00001.parquet").write_bytes(b"p1")
    sb._link_events(str(sf), d1)
    names = sorted(os.listdir(d1))
    assert names == ["events_0000.parquet", "events_0001.parquet"], (
        f"stale single-file link coexists with part links: {names}"
    )
    for n in names:
        assert os.path.exists(os.path.join(d1, n)), "dangling link reused"

    # shrink the directory (re-replication with fewer parts): the
    # higher-indexed stale link must go
    (src / "part-00001.parquet").unlink()
    sb._link_events(str(sf), d1)
    assert sorted(os.listdir(d1)) == ["events_0000.parquet"]

    # flip back to a single file: part links evicted, file link returns
    import shutil

    shutil.rmtree(src)
    src.write_bytes(b"v2-payload")
    sb._link_events(str(sf), d1)
    assert sorted(os.listdir(d1)) == ["events.parquet"]
    assert os.path.realpath(os.path.join(d1, "events.parquet")) == str(src)


class _FakeSerialModule:
    """Pure-Python pyserial stand-in: scripted readline() chunks, so the
    transport's accumulate/tail/reopen logic runs for real with only the
    serial.Serial constructor unfaked (r12 VERDICT #4)."""

    class SerialException(OSError):
        pass

    def __init__(self, script):
        # script: list of byte chunks; the sentinel Exception instance
        # raises instead of returning.  Shared across reopens so a
        # reopened port resumes the scripted feed.
        self._script = list(script)
        self.opened = []  # (device, baudrate, timeout) per open

    def Serial(self, device, baudrate, timeout):  # noqa: N802 (pyserial API)
        if device == "/dev/missing":
            raise self.SerialException("no such device")
        self.opened.append((device, baudrate, timeout))
        mod = self

        class _Port:
            def readline(self):
                if not mod._script:
                    return b""
                nxt = mod._script.pop(0)
                if isinstance(nxt, Exception):
                    raise nxt
                return nxt

            def close(self):
                pass

        return _Port()


def test_serial_device_transport_accumulate_tail_reopen():
    """S1's device half (ref OemGatewaySerialListener._open_serial_port/
    read ~l.80-100): 9600-baud timeout=0 open, accumulate to newline,
    partial tail buffered across polls AND across an error-triggered
    reopen, complete lines emitted exactly once."""
    from oem_gateway_spark.sources.serial_source import SerialDeviceTransport

    fake = _FakeSerialModule(
        [
            b"10 1",  # partial line
            b"00.5 21.1\r\n10 ",  # completes line 1, starts line 2
            b"",  # nothing available this poll
            _FakeSerialModule.SerialException("unplugged"),  # mid-stream
            b"999.0\r\n",  # after reopen: completes line 2
            b"11 7.0\n",  # bare-\n termination tolerated
        ]
    )
    t = SerialDeviceTransport("/dev/ttyUSB0", serial_module=fake)
    out = []
    for _ in range(6):
        out.extend(t.read_lines())
    assert out == ["10 100.5 21.1", "10 999.0", "11 7.0"]
    # the open contract: non-blocking at the default baud
    assert fake.opened[0] == ("/dev/ttyUSB0", 9600, 0)
    # the error poll closed the port; the next poll REOPENED it
    assert t.reopen_count == 1
    assert len(fake.opened) == 2
    # open failure surfaces as the init error, not a silent None port
    import pytest

    bad = SerialDeviceTransport("/dev/missing", serial_module=fake)
    with pytest.raises(ConnectionError, match="missing"):
        bad.read_lines()


def test_serial_reader_device_mode_spool_replay(tmp_path):
    """Device mode = transport pump + the SAME spool byte-offset protocol
    as path mode: offsets advance only over complete spooled lines, and
    readBetweenOffsets replays a committed range deterministically —
    the recovery contract a raw port cannot offer."""
    import pytest

    from oem_gateway_spark.sources.serial_source import SerialFrameSimpleReader

    fake = _FakeSerialModule(
        [b"5 1.0\r\n5 2.0\r\n5 3", b".0\r\n"]
    )
    spool = str(tmp_path / "spool" / "dev.log")
    r = SerialFrameSimpleReader(
        {"device": "/dev/ttyUSB0", "spool": spool}, serial_module=fake
    )
    o0 = r.initialOffset()
    rows1, o1 = r.read(o0)
    assert [x[0] for x in rows1] == ["5 1.0", "5 2.0"]
    rows2, o2 = r.read(o1)
    assert [x[0] for x in rows2] == ["5 3.0"]
    # exhausted device: offset parks
    rows3, o3 = r.read(o2)
    assert rows3 == [] and o3 == o2
    # recovery replay re-reads the committed spool range byte-for-byte
    assert [x[0] for x in r.readBetweenOffsets(o0, o1)] == ["5 1.0", "5 2.0"]
    assert [x[0] for x in r.readBetweenOffsets(o1, o2)] == ["5 3.0"]
    # device mode without a spool is a loud config error
    with pytest.raises(ValueError, match="spool"):
        SerialFrameSimpleReader({"device": "/dev/x"}, serial_module=fake)


SF = "/root/testdata/sf0.001"


def test_rocksdb_full_outer_provider_live(spark):
    """The RocksDB full-outer twin must actually run on RocksDB with
    changelog checkpointing — not silently fall back to the default
    provider (the result hash alone cannot tell: semantics are
    provider-invariant by design)."""
    from oem_gateway_spark.suite.statestore_extra import (
        STATE_METRICS,
        stream_stream_full_outer_rocksdb,
    )

    out = stream_stream_full_outer_rocksdb(spark, SF)
    assert out.count() > 0
    m = STATE_METRICS["stream_stream_full_outer_rocksdb"]
    assert any(k.startswith("rocksdb") for k in m["custom"]), (
        f"no rocksdb custom metrics — provider not live: {sorted(m['custom'])[:5]}"
    )
    assert m["changelog_files"] > 0, "changelog checkpointing not active"


def test_join_then_window_chain_shape(spark):
    """The chained query must execute BOTH stateful operators in ONE
    streaming query (join + windowed agg), replay the sentinel batch,
    and advance the watermark past all real data (the r13 pushdown-trap
    regression pin: with the sentinel filter pushed into the scans, the
    watermark stalls at the real data's max and the last window never
    emits)."""
    from oem_gateway_spark.suite.streaming_batch import (
        JOIN_WINDOW_CHAIN_METRICS,
        stream_join_then_window,
    )

    out = stream_join_then_window(spark, SF)
    n = out.count()
    assert n == 25  # sf0.001 ground truth (DuckDB join+GROUP BY)
    m = JOIN_WINDOW_CHAIN_METRICS
    assert m["stateful_operators"] == ["stateStoreSave", "symmetricHashJoin"], m
    assert m["n_stateful_operators"] == 2, m
    assert m["n_batches"] >= 3, (
        f"expected data + sentinel + no-data batches, got {m['n_batches']}"
    )
    # watermark must have passed the sentinels (fails if the sentinel
    # rows are filtered at the source by predicate pushdown)
    assert m["final_watermark"] > "2024-02-20", m["final_watermark"]


def test_udtf_table_partition_semantics(spark):
    """The TABLE-argument UDTF's engine contract, pinned on a tiny
    hand-built frame: one instance per PARTITION BY group, rows fed in
    ORDER BY order (max-gap over consecutive rows is order-defined),
    terminate() flushes exactly one row per non-empty group."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_ms bigint")
    class GapStats:
        def __init__(self):
            self._uid, self._n, self._prev, self._max = None, 0, None, None

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            if self._prev is not None:
                g = row["ts_ms"] - self._prev
                if self._max is None or g > self._max:
                    self._max = g
            self._prev = row["ts_ms"]

        def terminate(self):
            if self._n:
                yield self._uid, self._n, self._max

    spark.udtf.register("gap_stats_pin", GapStats)
    rows = [
        (1, 100), (1, 500), (1, 550),   # gaps 400, 50 -> max 400
        (2, 10),                        # single event -> NULL gap
        (3, 900), (3, 100),             # unordered input: sorted gap 800
    ]
    spark.createDataFrame(rows, "user_id long, ts_ms long").createOrReplaceTempView(
        "gap_pin_v"
    )
    got = {
        r["user_id"]: (r["n_events"], r["max_gap_ms"])
        for r in spark.sql(
            """
            SELECT * FROM gap_stats_pin(TABLE(gap_pin_v)
                     PARTITION BY user_id ORDER BY ts_ms)
            """
        ).collect()
    }
    assert got == {1: (3, 400), 2: (1, None), 3: (2, 800)}, got


def test_window_then_window_chain_shape(spark):
    """The window->window cascade must run BOTH aggregations as stateful
    operators in one query, replay the sentinel batch, and flush every
    real 2-hour window; peak_half_hour <= n with strict inequality
    somewhere (the two-level structure is doing work)."""
    from pyspark.sql import functions as F

    from oem_gateway_spark.suite.streaming_batch import (
        WINDOW_CHAIN_METRICS,
        stream_window_then_window,
    )

    out = stream_window_then_window(spark, SF).cache()
    rows = out.collect()
    assert len(rows) > 0
    m = WINDOW_CHAIN_METRICS
    # two stateful aggregations, no join
    assert m["stateful_operators"] == ["stateStoreSave"], m
    assert m["n_stateful_operators"] == 2, m
    assert m["n_batches"] >= 3, m
    assert m["final_watermark"] > "2024-02-20", m["final_watermark"]
    assert all(r["peak_half_hour"] <= r["n"] for r in rows)
    assert any(r["peak_half_hour"] < r["n"] for r in rows), (
        "every 2h window had a single half-hour — peak stat vacuous"
    )
    out.unpersist()


def test_udtf_analyze_table_contracts(spark):
    """The analyze-over-TABLE-schema entrance's three contracts, pinned
    on hand frames: (a) output rows are derived from the input table's
    SCHEMA (adding a numeric column adds profile rows, zero call-site
    change); (b) the function-requested partitionBy makes an explicit
    PARTITION BY at the call site an ERROR; (c) the function-requested
    select PRUNES non-numeric columns before the Python boundary (a
    string column crossing would emit a bogus profile row and break
    the schema contract)."""
    import pytest
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import DoubleType, LongType, StringType, StructType
    from pyspark.sql.udtf import (
        AnalyzeArgument,
        AnalyzeResult,
        PartitioningColumn,
        SelectedColumn,
    )

    @udtf
    class NumericProfile:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            numeric = [
                f.name
                for f in t.dataType.fields
                if isinstance(f.dataType, (DoubleType, LongType))
                and f.name != "bucket"
            ]
            schema = (
                StructType()
                .add("bucket", LongType())
                .add("col_name", StringType())
                .add("n", LongType())
                .add("min_v", DoubleType())
                .add("max_v", DoubleType())
            )
            return AnalyzeResult(
                schema=schema,
                partitionBy=[PartitioningColumn("bucket")],
                select=[SelectedColumn("bucket")]
                + [SelectedColumn(c) for c in numeric],
            )

        def __init__(self):
            self._bucket, self._stats = None, {}

        def eval(self, row):
            d = row.asDict()
            self._bucket = d.pop("bucket")
            for name, v in d.items():
                assert not isinstance(v, str), (
                    f"non-numeric column {name!r} crossed the boundary"
                )
                if v is None:
                    continue
                st = self._stats.setdefault(name, [0, v, v])
                st[0] += 1
                st[1] = min(st[1], v)
                st[2] = max(st[2], v)

        def terminate(self):
            for name in sorted(self._stats):
                n, lo, hi = self._stats[name]
                yield self._bucket, name, n, float(lo), float(hi)

    spark.udtf.register("numeric_profile_pin", NumericProfile)
    spark.createDataFrame(
        [(0, 1.5, "a"), (0, 2.5, "b"), (1, -1.0, "c")],
        "bucket long, x double, label string",
    ).createOrReplaceTempView("prof_narrow")
    got = {
        (r["bucket"], r["col_name"]): (r["n"], r["min_v"], r["max_v"])
        for r in spark.sql(
            "SELECT * FROM numeric_profile_pin(TABLE(prof_narrow))"
        ).collect()
    }
    # (c) label pruned (the eval assert would have fired), (a) one row
    # per (bucket, numeric col)
    assert got == {(0, "x"): (2, 1.5, 2.5), (1, "x"): (1, -1.0, -1.0)}, got

    # (a) widen the schema -> new rows, same call text
    spark.createDataFrame(
        [(0, 1.5, 7, "a")], "bucket long, x double, y long, label string"
    ).createOrReplaceTempView("prof_wide")
    wide = spark.sql(
        "SELECT * FROM numeric_profile_pin(TABLE(prof_wide))"
    ).collect()
    assert {r["col_name"] for r in wide} == {"x", "y"}

    # (b) explicit PARTITION BY conflicts with the function's own
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql(
            """
            SELECT * FROM numeric_profile_pin(
              TABLE(prof_narrow) PARTITION BY bucket)
            """
        ).collect()
