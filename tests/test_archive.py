"""Archive store + replay (cat) + .tri Spark reader tests."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from go_triton_spark.codec.tri import write_tri_bytes
from go_triton_spark.plans.archive_store import ArchiveStore, list_dates_from_range
from go_triton_spark.sources.tri_source import read_tri
from go_triton_spark.types import EVENTS_SCHEMA

UTC = dt.timezone.utc


def test_list_dates_from_range():
    d = dt.date(2015, 7, 1)
    assert list_dates_from_range(d, d) == [d]
    assert len(list_dates_from_range(dt.date(2015, 7, 1), dt.date(2015, 7, 3))) == 3
    with pytest.raises(ValueError):
        list_dates_from_range(dt.date(2015, 7, 2), dt.date(2015, 7, 1))


@pytest.fixture()
def store(spark, tmp_path):
    return ArchiveStore(spark, str(tmp_path / "archive"))


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def test_ingest_and_cat_roundtrip(spark, store, sf_dir):
    ev = _events(spark, sf_dir)
    when = dt.datetime(2015, 6, 30, 2, 45, tzinfo=UTC)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    out = store.cat("events", dt.date(2015, 6, 30))
    assert out.count() == ev.count()
    assert set(ev.columns).issubset(set(out.columns))


def test_cat_date_pruning(spark, store, sf_dir):
    ev = _events(spark, sf_dir).limit(10)
    store.ingest_dataframe(ev, "events", "archive",
                           when=dt.datetime(2015, 6, 29, 5, tzinfo=UTC))
    store.ingest_dataframe(ev, "events", "archive",
                           when=dt.datetime(2015, 6, 30, 5, tzinfo=UTC))
    one_day = store.cat("events", dt.date(2015, 6, 30))
    assert one_day.count() == 10
    both = store.cat("events", dt.date(2015, 6, 29), dt.date(2015, 6, 30))
    assert both.count() == 20
    # partition pruning must reach the scan (not a post-filter)
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_table_format_seam_parquet_roundtrip_and_guards(spark, tmp_path, sf_dir):
    """Round-6 manifest-format seam: table_format='parquet' (explicit)
    must behave byte-for-byte like the default path layout — same
    partition dirs, same cat results, pruning intact — proving the
    format hook disturbs nothing; non-parquet formats route
    maintenance to the table format's own tooling (guarded), and cat
    reads through format(...).load() (exercised via the parquet
    format name itself on the manifest branch)."""
    ev = _events(spark, sf_dir).limit(20)
    when = dt.datetime(2015, 6, 30, 7, tzinfo=UTC)

    plain = ArchiveStore(spark, str(tmp_path / "a"))
    seamed = ArchiveStore(spark, str(tmp_path / "b"), table_format="parquet")
    for st in (plain, seamed):
        st.ingest_dataframe(ev, "events", "archive", when=when)
    # identical partition layout on disk
    rel = "stream=events/client=archive/date=20150630/hour=07"
    assert os.path.isdir(os.path.join(str(tmp_path / "a"), rel))
    assert os.path.isdir(os.path.join(str(tmp_path / "b"), rel))
    got_a = sorted(r[0] for r in plain.cat("events", when.date())
                   .select("event_id").collect())
    got_b = sorted(r[0] for r in seamed.cat("events", when.date())
                   .select("event_id").collect())
    assert got_a == got_b and len(got_b) == 20
    # the default path keeps its listing-level pruning
    plan = (seamed.cat("events", when.date())._jdf.queryExecution()
            .executedPlan().toString())
    assert "PartitionFilters" in plan

    # the manifest read branch runs format(...).load(root) + the shared
    # filter tail; drive it with parquet standing in for delta/iceberg
    # (no connector jars in this sandbox — the branch IS the seam)
    m = ArchiveStore(spark, str(tmp_path / "b"), table_format="parquet")
    src = spark.read.format("parquet").load(str(tmp_path / "b"))
    out = m._filter_cat(src, "events", when.date(), when.date(),
                        "archive", ordered=True)
    assert sorted(r[0] for r in out.select("event_id").collect()) == got_b

    # maintenance on a manifest format routes to that format's tooling
    d = ArchiveStore(spark, str(tmp_path / "b"), table_format="delta")
    with pytest.raises(NotImplementedError, match="OPTIMIZE"):
        d.compact("events", when.date(), "archive")
    with pytest.raises(NotImplementedError, match="rewrite_data_files"):
        d.expire("events", "archive", when.date())


def test_cat_uri_root_prunes_at_listing_level(spark, tmp_path, sf_dir):
    """Round-6: the listing-level date pruning must also work on URI
    roots (object stores) via the Hadoop FS listing — a one-day replay
    must touch only that date's files, never list the whole archive
    (and an expire of an out-of-range date can then never race it)."""
    root = "file://" + str(tmp_path / "uri_archive")
    st = ArchiveStore(spark, root)
    ev = _events(spark, sf_dir).limit(8)
    for day in (28, 29, 30):
        st.ingest_dataframe(ev, "events", "archive",
                            when=dt.datetime(2015, 6, day, 5, tzinfo=UTC))
    out = st.cat("events", dt.date(2015, 6, 29))
    assert out.count() == 8
    files = out.inputFiles()
    assert files and all("date=20150629" in f for f in files), files[:3]


def test_compact_refuses_uri_root_with_pointer(spark, tmp_path):
    """Rename swaps cannot be atomic on object stores; compact on a
    URI root must refuse loudly and point at the manifest seam."""
    st = ArchiveStore(spark, "file://" + str(tmp_path / "uri_c"))
    with pytest.raises(NotImplementedError, match="OPTIMIZE"):
        st.compact("events", dt.date(2015, 6, 30), "archive")


def test_expire_works_on_uri_root(spark, tmp_path, sf_dir):
    """Retention on a URI (object-store) root: dates strictly older
    than the cutoff are deleted via the Hadoop FS, newer kept —
    previously a URI root silently no-op'd and retention never ran."""
    root = "file://" + str(tmp_path / "uri_exp")
    st = ArchiveStore(spark, root)
    ev = _events(spark, sf_dir).limit(5)
    for day in (20, 21, 22):
        st.ingest_dataframe(ev, "events", "archive",
                            when=dt.datetime(2015, 6, day, 5, tzinfo=UTC))
    stats = st.expire("events", "archive", dt.date(2015, 6, 21))
    assert stats == {"dropped": 1, "kept": 2}
    base = str(tmp_path / "uri_exp")
    assert not os.path.isdir(os.path.join(
        base, "stream=events", "client=archive", "date=20150620"))
    assert st.cat("events", dt.date(2015, 6, 21), dt.date(2015, 6, 22)
                  ).count() == 10


def test_cat_unknown_stream_empty_on_uri_root(spark, tmp_path, sf_dir):
    """Unknown-stream parity across filesystems: on a URI root (here
    file://, the cheapest object-store stand-in — '://' routes cat down
    the no-isdir-probe branch) cat() of a stream that was never stored
    must return an EMPTY result through the filters, exactly like the
    local-path fallback, not raise PATH_NOT_FOUND after the retries."""
    root = tmp_path / "archive_uri"
    st = ArchiveStore(spark, "file://" + str(root))
    ev = _events(spark, sf_dir).limit(5)
    st.ingest_dataframe(ev, "events", "archive",
                        when=dt.datetime(2015, 6, 30, 5, tzinfo=UTC))
    out = st.cat("nosuchstream", dt.date(2015, 6, 30))
    assert out.count() == 0


def test_cat_replay_order(spark, store, sf_dir):
    ev = _events(spark, sf_dir).limit(5)
    # two ingests same day, later ts second — replay must preserve file order
    store.ingest_dataframe(ev.withColumn("event_type", F.lit("first")),
                           "events", "archive",
                           when=dt.datetime(2015, 6, 30, 1, tzinfo=UTC))
    store.ingest_dataframe(ev.withColumn("event_type", F.lit("second")),
                           "events", "archive",
                           when=dt.datetime(2015, 6, 30, 2, tzinfo=UTC))
    rows = store.cat("events", dt.date(2015, 6, 30)).select("event_type").collect()
    kinds = [r[0] for r in rows]
    assert kinds[:5] == ["first"] * 5 and kinds[5:] == ["second"] * 5


def test_cat_client_guard(spark, store, sf_dir):
    ev = _events(spark, sf_dir).limit(3)
    when = dt.datetime(2015, 6, 30, tzinfo=UTC)
    store.ingest_dataframe(ev, "events", "client_a", when=when)
    store.ingest_dataframe(ev, "events", "client_b", when=when)
    with pytest.raises(ValueError, match="Multiple clients"):
        store.cat("events", dt.date(2015, 6, 30))
    assert store.cat("events", dt.date(2015, 6, 30), client="client_a").count() == 3


def test_cat_json(spark, store, sf_dir):
    import json
    ev = _events(spark, sf_dir).limit(2)
    store.ingest_dataframe(ev, "events", "archive",
                           when=dt.datetime(2015, 6, 30, tzinfo=UTC))
    rows = store.cat_json("events", dt.date(2015, 6, 30)).collect()
    assert len(rows) == 2
    parsed = json.loads(rows[0]["json"])
    assert "event_id" in parsed


def test_read_tri_spark(spark, tmp_path):
    recs = [
        {"event_id": i, "ts": dt.datetime(2020, 1, 1, 12, 0, i, tzinfo=UTC),
         "user_id": 100 + i, "event_type": "click", "value": i * 1.5,
         "props": "{}"}
        for i in range(50)
    ]
    day_dir = tmp_path / "tri" / "20200101"
    day_dir.mkdir(parents=True)
    (day_dir / "events-archive-1577880000.tri").write_bytes(write_tri_bytes(recs))
    df = read_tri(spark, str(tmp_path / "tri"), EVENTS_SCHEMA)
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 50
    assert rows[0]["event_type"] == "click"
    assert rows[1]["value"] == 1.5
    assert rows[0]["_archive_date"] == "20200101"
    assert rows[0]["_archive_sort"] == 1577880000
    assert rows[3]["ts"] == dt.datetime(2020, 1, 1, 12, 0, 3)


def test_read_tri_corrupt_file_skips(spark, tmp_path):
    from go_triton_spark.codec.msgpack_codec import packb
    from go_triton_spark.codec.snappy_codec import frame_compress
    day_dir = tmp_path / "tri" / "20200101"
    day_dir.mkdir(parents=True)
    good = [{"event_id": 1, "event_type": "ok"}]
    (day_dir / "events-archive-100.tri").write_bytes(write_tri_bytes(good))
    # corrupt: good record then garbage
    body = frame_compress(packb({"event_id": 2, "event_type": "ok2"}) + b"\xc1junk")
    (day_dir / "events-archive-200.tri").write_bytes(body)
    df = read_tri(spark, str(tmp_path / "tri"), EVENTS_SCHEMA)
    rows = df.orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [1, 2]


def test_expire_concurrent_with_cat_of_live_range(spark, store, sf_dir):
    """A retention cron (`expire`) dropping old date partitions must
    not fail readers replaying RECENT dates: Spark's file listing
    treats a directory deleted mid-listing as empty, and pruned-out
    dates are never read. Loops a cat of the kept range while expire
    deletes three old dates."""
    import threading
    import time

    ev = _events(spark, sf_dir).limit(50)
    keep_day = dt.datetime(2026, 8, 10, 12, tzinfo=UTC)
    for off in (30, 20, 10, 0):  # three old dates + the kept one
        store.ingest_dataframe(
            ev, "events", "alpha",
            when=keep_day - dt.timedelta(days=off))
    errors, counts = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                counts.append(store.cat("events", keep_day.date(),
                                        client="alpha",
                                        ordered=False).count())
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.3)
    stats = store.expire("events", "alpha",
                         keep_after=keep_day.date())
    # liveness, not correctness: on a co-loaded machine a single
    # cat().count() can outlast the whole expire window — keep the
    # reader alive until it has recorded an observation landing
    # during-or-after the expire
    n0 = len(counts)
    deadline = time.time() + 60
    while len(counts) <= n0 and not errors and time.time() < deadline:
        time.sleep(0.2)
    stop.set()
    t.join(10)
    assert stats == {"dropped": 3, "kept": 1}
    assert not errors, f"cat of the kept range failed during expire: {errors[:3]}"
    assert counts and set(counts) == {50}
    # the expired range reads as empty, not as an error
    assert store.cat("events", (keep_day - dt.timedelta(days=30)).date(),
                     (keep_day - dt.timedelta(days=10)).date(),
                     client="alpha", ordered=False).count() == 0


def test_exchange_dirs_atomic_swap(tmp_path):
    """renameat2(RENAME_EXCHANGE) path: both directories exist at all
    times, contents swapped. (On kernels/filesystems without the
    syscall the helper returns False and compact uses the rename-pair
    fallback — skip rather than fail there.)"""
    from go_triton_spark.plans.archive_store import _exchange_dirs

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    (a / "fa").write_text("A")
    (b / "fb").write_text("B")
    if not _exchange_dirs(str(a), str(b)):
        pytest.skip("renameat2 RENAME_EXCHANGE unavailable")
    assert os.listdir(a) == ["fb"] and os.listdir(b) == ["fa"]


def test_cat_accepts_string_dates(spark, store, sf_dir):
    """Library callers reasonably pass '2015-06-30' or '20150630'
    where the CLI would have parsed; both must mean the same day."""
    ev = _events(spark, sf_dir).limit(4)
    store.ingest_dataframe(ev, "events", "archive",
                           when=dt.datetime(2015, 6, 30, 2, tzinfo=UTC))
    assert store.cat("events", "2015-06-30").count() == 4
    assert store.cat("events", "20150630", "20150630").count() == 4
    with pytest.raises(ValueError):
        store.cat("events", "2015-07-02", "2015-07-01")


def test_cat_quarantines_crash_residue_but_fails_loud_on_committed(
        spark, store, sf_dir):
    """Round-6 co-load finding: a SIGKILLed store leaves the in-flight
    task's part file at its FINAL name with no parquet trailer, and
    because cat refuses ignoreCorruptFiles, every later replay of the
    range died loudly forever. Contract now: trailer-less part files
    ABSENT from the sink manifest are crash residue — the sweep
    (invoked by StorePipeline.start before its sink writes, or as an
    explicit maintenance op) renames them '.<name>.crash' and reports,
    because their batch replays from the source checkpoint; a
    manifest-COMMITTED file with a bad trailer is real corruption —
    never touched, the read keeps failing loudly. The sweep runs ONLY
    where no live writer exists (it renamed in-flight files when wired
    into cat — the concurrency soak caught TASK_WRITE_FAILED)."""
    from go_triton_spark.reporting import (CollectingReporter,
                                           set_error_reporter)

    ev = _events(spark, sf_dir).limit(10)
    when = dt.datetime(2015, 6, 30, 2, tzinfo=UTC)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    hour_dir = os.path.join(
        store.root, "stream=events", "client=archive",
        "date=20150630", "hour=02")
    # crash residue: one 0-byte and one truncated mid-row-group file
    open(os.path.join(hour_dir, "part-00009-dead.c000.snappy.parquet"),
         "wb").close()
    with open(os.path.join(hour_dir,
                           "part-00010-dead.c000.snappy.parquet"),
              "wb") as fh:
        fh.write(b"PAR1" + b"\x00" * 64)  # header magic, no trailer
    # the ingest dir is older than the sweep's recency cutoff — a
    # sweep pruned to recent activity must still see it once the
    # residue lands (the residue's write updates the dir mtime)
    with pytest.raises(Exception):
        store.cat("events", dt.date(2015, 6, 30)).count()  # poisoned
    rep = CollectingReporter()
    set_error_reporter(rep)
    try:
        assert store.quarantine_crash_residue(stream="events") == 2
        out = store.cat("events", dt.date(2015, 6, 30))
        assert out.count() == 10  # replay healthy, nothing lost
    finally:
        set_error_reporter(None)
    names = sorted(os.listdir(hour_dir))
    assert ".part-00009-dead.c000.snappy.parquet.crash" in names
    assert ".part-00010-dead.c000.snappy.parquet.crash" in names
    kinds = [k for (k, _m, _c) in rep.events]
    assert kinds.count("crash_residue_quarantined") == 2

    # a manifest-committed file with a bad trailer must NOT vanish:
    # fake a sink manifest listing a corrupt file, then corrupt it
    bad = os.path.join(hour_dir, "part-00011-committed.c000.snappy.parquet")
    with open(bad, "wb") as fh:
        fh.write(b"PAR1" + b"\x00" * 32)
    mdir = os.path.join(store.root, "_spark_metadata")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "0"), "w") as fh:
        fh.write('v1\n{"path":"file://%s","size":36,"isDir":false,'
                 '"modificationTime":0,"blockReplication":1,'
                 '"blockSize":1,"action":"add"}\n' % bad)
    assert store.quarantine_crash_residue(stream="events") == 0
    assert os.path.basename(bad) in os.listdir(hour_dir)  # not renamed
    with pytest.raises(Exception, match="PAR1|footer|Parquet|FAILED_READ"):
        store.cat("events", dt.date(2015, 6, 30)).count()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(files=st.lists(
    st.tuples(
        st.sampled_from([0, 5, 12, 13, 40, 4096]),   # size
        st.booleans(),                               # valid PAR1 trailer
        st.booleans()),                              # listed in manifest
    min_size=0, max_size=8))
def test_quarantine_selection_property(spark, tmp_path, files):
    """The sweep touches EXACTLY the files that are (no trailer) AND
    (absent from the manifest); everything else is left byte-for-byte
    in place. Size 12 is the boundary: valid parquet is strictly
    larger (PAR1 + footer + PAR1), so <=12 bytes is trailer-less by
    size alone."""
    import json
    import uuid

    root = tmp_path / f"arch{uuid.uuid4().hex[:8]}"
    hour = root / "stream=events" / "client=archive" / \
        "date=20260101" / "hour=03"
    hour.mkdir(parents=True)
    manifest: list[str] = []
    expect_quarantined, expect_kept = set(), set()
    for i, (size, trailer, listed) in enumerate(files):
        name = f"part-{i:05d}-x.c000.snappy.parquet"
        body = bytearray(size)
        if trailer and size >= 4:
            body[-4:] = b"PAR1"
        (hour / name).write_bytes(bytes(body))
        if listed:
            manifest.append(str(hour / name))
        healthy = size > 12 and trailer and size >= 4
        if healthy or listed:
            expect_kept.add(name)
        else:
            expect_quarantined.add(name)
    if manifest:
        mdir = root / "_spark_metadata"
        mdir.mkdir()
        (mdir / "0").write_text(
            "v1\n" + "\n".join(json.dumps({"path": f"file://{p}"})
                               for p in manifest))
    store = ArchiveStore(spark, str(root))
    n = store.quarantine_crash_residue(stream="events")
    assert n == len(expect_quarantined)
    left = {f for f in os.listdir(hour) if not f.startswith(".")}
    assert left == expect_kept
    crashed = {f for f in os.listdir(hour) if f.startswith(".")}
    assert crashed == {f".{name}.crash" for name in expect_quarantined}


# --- r10 matrix-soak race fixes -------------------------------------------

def test_stable_listdir_detects_concurrent_change(tmp_path, monkeypatch):
    """_stable_listdir must refuse an enumeration that interleaved with
    a directory mutation (torn readdir against a compact swap+rmtree
    returns an EMPTY view with no error — the r10 sink-compact find)."""
    import go_triton_spark.plans.archive_store as A

    d = tmp_path / "hour=05"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    assert A._stable_listdir(str(d)) == ["a.parquet"]

    real_listdir = os.listdir

    def mutating_listdir(path):
        names = real_listdir(path)
        (d / "landed-mid-walk.parquet").write_bytes(b"y")  # mtime bump
        return names

    monkeypatch.setattr(os, "listdir", mutating_listdir)
    with pytest.raises(FileNotFoundError):   # _VanishedMidWalk subclass
        A._stable_listdir(str(d))
    monkeypatch.undo()
    # and a name SWAP (new inode) is likewise refused
    other = tmp_path / "other"
    other.mkdir()

    def swapping_listdir(path):
        names = real_listdir(path)
        os.rename(str(d), str(tmp_path / "gone"))
        os.rename(str(other), str(d))
        return names

    monkeypatch.setattr(os, "listdir", swapping_listdir)
    with pytest.raises(FileNotFoundError):
        A._stable_listdir(str(d))


def test_cat_survives_compact_between_listing_and_plan(
        spark, store, sf_dir, monkeypatch):
    """A compact swap landing in the listdir-to-plan window must not
    silently thin the cat: Spark's InMemoryFileIndex DROPS explicit
    file paths that vanished before its planning stat (swallowed
    FileNotFoundException), so cat verifies the planned file set
    against the handed set and re-lists on any shortfall (r10
    sink-compact soak find — an entire hour vanished with zero
    errors ~1 per 30 swaps before the check)."""
    import go_triton_spark.plans.archive_store as A

    ev = _events(spark, sf_dir).limit(20)
    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=3)
    for i in range(6):   # 6 small files -> compact rewrites to 1
        store.ingest_dataframe(
            ev.where(F.col("event_id") % 6 == i), "events", "archive",
            when=when + dt.timedelta(seconds=i))
    expected = store.cat("events", when.date()).count()
    assert expected == 20

    real = A._prune_retrying
    state = {"raced": False}

    def racy(prune, attempts=8):
        res = real(prune, attempts)
        if not state["raced"]:
            state["raced"] = True
            # the race: compact swaps the hour AFTER the listing was
            # taken but BEFORE Spark plans the read
            store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
        return res

    monkeypatch.setattr(A, "_prune_retrying", racy)
    out = store.cat("events", when.date()).count()
    assert state["raced"], "race hook never fired"
    assert out == expected, "cat silently lost rows to the plan race"


def test_quarantine_never_descends_into_hidden_staging(
        spark, store, sf_dir):
    """The crash-residue sweep must skip hidden/underscore dirs: a
    concurrent compact's staging holds trailer-less, unmanifested
    in-flight files BY DESIGN, and quarantining them destroyed the
    compacted hour (r10 matrix soak, sink-compact pair — permanent
    row loss via an empty-staged swap). Files under hidden dirs are
    invisible to cat, so they are out of the sweep's scope."""
    ev = _events(spark, sf_dir).limit(5)
    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=3)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    ddir = os.path.join(
        store.root, "stream=events", "client=archive",
        f"date={when.strftime('%Y%m%d')}")
    # a compact-staging twin mid-write: trailer-less part at its final
    # name inside a hidden dir + a _temporary task dir
    stage = os.path.join(ddir, f".hour={when.strftime('%H')}"
                               "._compact_tmp.deadbeef")
    task = os.path.join(stage, "_temporary", "0", "task_x")
    os.makedirs(task)
    inflight1 = os.path.join(stage, "part-00000-x.c000.snappy.parquet")
    inflight2 = os.path.join(task, "part-00001-y.c000.snappy.parquet")
    for p in (inflight1, inflight2):
        with open(p, "wb") as fh:
            fh.write(b"\x00" * 64)        # no PAR1 trailer
    # and one REAL residue file in the visible hour dir
    hour_dir = os.path.join(ddir, f"hour={when.strftime('%H')}")
    residue = os.path.join(hour_dir, "part-00009-crash.c000.snappy.parquet")
    with open(residue, "wb") as fh:
        fh.write(b"\x00" * 64)
    n = store.quarantine_crash_residue("events")
    assert n == 1, "exactly the visible residue is swept"
    assert os.path.exists(inflight1) and os.path.exists(inflight2), \
        "staging files must never be touched"
    assert not os.path.exists(residue)
    assert os.path.exists(os.path.join(
        hour_dir, ".part-00009-crash.c000.snappy.parquet.crash"))


def test_sweep_never_deletes_compact_old_residue(tmp_path):
    """A stale ``._compact_old.*`` dir can be the SOLE copy of an hour
    (fallback swap crashed between its two renames) — the sweep must
    RESTORE it when the hour name is free, warn-and-keep when the hour
    was recreated, and still reap stale ``._compact_tmp.*`` (r11
    advice items 1+2)."""
    import time
    import warnings

    parent = tmp_path / "date=20260101"
    parent.mkdir()
    base = "hour=03"
    old = parent / f".{base}._compact_old.abc_1"
    tmp = parent / f".{base}._compact_tmp.abc_1"
    for d in (old, tmp):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    stale = time.time() - 7200
    os.utime(old, (stale, stale))
    os.utime(tmp, (stale, stale))

    ArchiveStore._sweep_stale_staging(str(parent), base)
    assert not tmp.exists(), "stale tmp staging is crash garbage"
    hour = parent / base
    assert hour.is_dir() and (hour / "part-0.parquet").exists(), \
        "sole-copy old residue is restored to the hour name"

    # hour now EXISTS: a second stale old residue must be kept + warned
    old2 = parent / f".{base}._compact_old.abc_2"
    old2.mkdir()
    (old2 / "part-1.parquet").write_bytes(b"y")
    os.utime(old2, (stale, stale))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ArchiveStore._sweep_stale_staging(str(parent), base)
    quarantined = parent / f".{base}._quarantined_old.abc_2"
    assert quarantined.exists() and (quarantined / "part-1.parquet").exists(), \
        "possible sole copy is quarantined, never auto-deleted"
    assert any("reconcile" in str(w.message) for w in caught)
    # quarantined residue is outside the sweep prefix: no re-warn
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter("always")
        ArchiveStore._sweep_stale_staging(str(parent), base)
    assert not again, "quarantine stops per-sweep warning spam"

    # FRESH staging (live concurrent compact) is untouched either way
    fresh_tmp = parent / f".{base}._compact_tmp.abc_3"
    fresh_tmp.mkdir()
    ArchiveStore._sweep_stale_staging(str(parent), base)
    assert fresh_tmp.exists()


def test_vanished_hour_branch_spares_live_peer_staging(
        spark, store, sf_dir, monkeypatch):
    """compact's expire-vanished classification must not rmtree FRESH
    peer staging: "hour absent" is also the transient window of a
    peer's fallback double-rename, and deleting its _compact_old there
    destroyed the hour silently (r11 advice item 1, medium)."""
    import shutil as _sh

    import go_triton_spark.plans.archive_store as A

    ev = _events(spark, sf_dir).limit(8)
    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=5)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    # second file so compact rewrites rather than skips
    store.ingest_dataframe(_events(spark, sf_dir).limit(3),
                           "events", "archive", when=when)
    ddir = os.path.join(
        store.root, "stream=events", "client=archive",
        f"date={when.strftime('%Y%m%d')}")
    base = f"hour={when.strftime('%H')}"
    hour_dir = os.path.join(ddir, base)
    # fresh staging of a hypothetical live peer compact
    peer_old = os.path.join(ddir, f".{base}._compact_old.peer_1")
    os.makedirs(peer_old)
    with open(os.path.join(peer_old, "part-peer.parquet"), "wb") as fh:
        fh.write(b"z")

    orig = A.ArchiveStore._compact_hour

    def exploding(self, hd, mb, stats):
        # simulate: peer's fallback swap has the hour ABSENT while this
        # compact's rewrite fails with a missing-path error
        _sh.rmtree(hd)
        raise FileNotFoundError(f"simulated vanish of {hd}")

    monkeypatch.setattr(A.ArchiveStore, "_compact_hour", exploding)
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    monkeypatch.setattr(A.ArchiveStore, "_compact_hour", orig)
    assert stats["hours_vanished"] == 1
    assert os.path.isdir(peer_old), \
        "fresh peer staging survives the vanished-hour sweep"
    assert not os.path.isdir(hour_dir)


def test_ingest_failure_preserves_staging_for_recovery(
        spark, store, sf_dir, monkeypatch):
    """A mid-loop rename failure must leave the private staging dir in
    place (r11 advice item 4): deleting it forces a full re-ingest
    that duplicates the already-renamed part files."""
    ev = _events(spark, sf_dir).limit(5)
    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        if "/.ingest_tmp." in src and src.endswith(".parquet"):
            calls["n"] += 1
            raise OSError("simulated rename failure (dest dir expired)")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    when = dt.datetime.now(tz=UTC)
    with pytest.raises(OSError, match="simulated"):
        store.ingest_dataframe(ev, "events", "archive", when=when)
    monkeypatch.setattr(os, "rename", real_rename)
    assert calls["n"] >= 1
    staged = [n for n in os.listdir(store.root)
              if n.startswith(".ingest_tmp.")]
    assert staged, "staging preserved for operator/retry recovery"
    # completing the move by hand recovers every staged row exactly
    import shutil as _sh
    stage_root = os.path.join(store.root, staged[0])
    for cur, dirs, files in os.walk(stage_root):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        rel = os.path.relpath(cur, stage_root)
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                dest = (store.root if rel == "." else
                        os.path.join(store.root, rel))
                os.makedirs(dest, exist_ok=True)
                real_rename(os.path.join(cur, fn), os.path.join(dest, fn))
    _sh.rmtree(stage_root)
    got = store.cat("events", when.date(), client="archive").count()
    assert got == 5


def test_compact_old_restore_never_replaces_empty_hour(tmp_path):
    """POSIX rename atomically REPLACES an empty existing directory,
    so a concurrent ingest's fresh makedirs(hour) could be silently
    renamed over by the stale-residue restore (r11 advice): the sweep
    must take the quarantine path whenever the hour name EXISTS, even
    empty."""
    import time
    import warnings

    parent = tmp_path / "date=20260101"
    parent.mkdir()
    base = "hour=07"
    hour = parent / base
    hour.mkdir()        # concurrent ingest just created it — EMPTY
    old = parent / f".{base}._compact_old.race_1"
    old.mkdir()
    (old / "part-0.parquet").write_bytes(b"x")
    stale = time.time() - 7200
    os.utime(old, (stale, stale))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ArchiveStore._sweep_stale_staging(str(parent), base)
    assert hour.is_dir(), "live hour dir survives"
    assert not (hour / "part-0.parquet").exists(), \
        "residue is not merged over the live hour"
    quarantined = parent / f".{base}._quarantined_old.race_1"
    assert quarantined.is_dir() and (quarantined / "part-0.parquet").exists()
    assert any("reconcile" in str(w.message) for w in caught)


def test_ingest_sweep_quarantines_committed_residue(
        spark, store, sf_dir):
    """The age sweep must distinguish part-free write wreckage (safe
    to delete) from residue holding COMMITTED part files — possibly
    the only staged copy of rows a mid-rename failure never moved
    (r11 advice): quarantine + warn, never rmtree."""
    import time
    import warnings

    os.makedirs(store.root, exist_ok=True)
    # residue WITH a committed part file in its partition subtree
    keep = os.path.join(store.root, ".ingest_tmp.dead_1")
    sub = os.path.join(keep, "stream=events", "client=archive",
                       "date=20260101", "hour=00")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-x.parquet"), "wb") as fh:
        fh.write(b"p")
    # residue with only _temporary scratch (crashed before job commit)
    junk = os.path.join(store.root, ".ingest_tmp.dead_2")
    os.makedirs(os.path.join(junk, "_temporary", "0"))
    # fresh staging of a live concurrent ingest
    fresh = os.path.join(store.root, ".ingest_tmp.live_3")
    os.makedirs(fresh)
    stale = time.time() - 7200
    os.utime(keep, (stale, stale))
    os.utime(junk, (stale, stale))

    ev = _events(spark, sf_dir).limit(2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        store.ingest_dataframe(ev, "events", "archive",
                               when=dt.datetime.now(tz=UTC))
    q = os.path.join(store.root, ".ingest_quarantine.dead_1")
    assert os.path.isdir(q), "committed residue quarantined, not deleted"
    assert os.path.exists(os.path.join(
        q, "stream=events", "client=archive", "date=20260101",
        "hour=00", "part-x.parquet"))
    assert not os.path.exists(keep)
    assert not os.path.exists(junk), "part-free wreckage is reaped"
    assert os.path.isdir(fresh), "fresh staging belongs to a live job"
    assert any("reconcile" in str(w.message) for w in caught)
    # quarantined names are outside the sweep prefix: next ingest
    # neither re-warns nor touches them
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter("always")
        store.ingest_dataframe(ev, "events", "archive",
                               when=dt.datetime.now(tz=UTC))
    assert os.path.isdir(q)
    assert not any("reconcile" in str(w.message) for w in again)


def test_ingest_failure_warns_naming_staging_dir(
        spark, store, sf_dir, monkeypatch):
    """The mid-move failure must announce WHERE the staged copy lives
    (r11 advice): the recovery window should not depend on an operator
    knowing the hidden staging naming scheme."""
    import warnings

    ev = _events(spark, sf_dir).limit(3)
    real_rename = os.rename

    def failing_rename(src, dst):
        if "/.ingest_tmp." in src and src.endswith(".parquet"):
            raise OSError("simulated rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with pytest.raises(OSError, match="simulated"):
            store.ingest_dataframe(ev, "events", "archive",
                                   when=dt.datetime.now(tz=UTC))
    monkeypatch.setattr(os, "rename", real_rename)
    staged = [n for n in os.listdir(store.root)
              if n.startswith(".ingest_tmp.")]
    assert len(staged) == 1
    msgs = [str(w.message) for w in caught]
    assert any(staged[0] in m and "preserved" in m for m in msgs), \
        f"warning must name the staging dir; got {msgs}"


@pytest.mark.parametrize("exchange_works", [True, False])
def test_compact_rescues_straggler_ingest_part(
        spark, store, sf_dir, monkeypatch, exchange_works):
    """A part file a concurrent backfill ingest lands in the hour
    between compact's pinned listing and the swap rides the swap into
    the doomed old dir — before the r12 fix the rmtree silently
    destroyed it (found by the ingest-compact race soak). Both swap
    branches must move it back into the live hour."""
    import shutil

    import go_triton_spark.plans.archive_store as A

    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=5)
    ev = _events(spark, sf_dir).limit(10)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    store.ingest_dataframe(ev.limit(5), "events", "archive",
                           when=when + dt.timedelta(seconds=1))
    hour_dir = os.path.join(
        store.root, "stream=events", "client=archive",
        f"date={when.strftime('%Y%m%d')}", f"hour={when.strftime('%H')}")
    parts = [f for f in os.listdir(hour_dir) if f.endswith(".parquet")]
    assert len(parts) >= 2, "need a fragmented hour so compact rewrites"
    straggler_rows = (spark.read.parquet(os.path.join(hour_dir, parts[0]))
                      .count())

    real_ex = A._exchange_dirs

    def exchange_with_straggler(tmp, hour):
        # simulate the concurrent ingest: a job-unique part file lands
        # in the hour AFTER the rewrite's pinned listing, just before
        # the swap
        shutil.copyfile(os.path.join(hour, parts[0]),
                        os.path.join(hour, "part-straggler.parquet"))
        return real_ex(tmp, hour) if exchange_works else False

    monkeypatch.setattr(A, "_exchange_dirs", exchange_with_straggler)
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    monkeypatch.setattr(A, "_exchange_dirs", real_ex)
    assert stats["hours"] == 1
    assert stats["files_rescued"] == 1
    live = os.listdir(hour_dir)
    assert "part-straggler.parquet" in live, \
        "straggler must survive the swap in the live hour"
    got = store.cat("events", when.date(), client="archive").count()
    assert got == 15 + straggler_rows


def test_ingest_failure_exception_carries_staging_dir(
        spark, store, sf_dir, monkeypatch):
    """The mid-move failure's exception exposes the preserved staging
    path machine-readably (triton_staging_dir) so a smarter retry can
    complete the move instead of re-ingesting + duplicating."""
    ev = _events(spark, sf_dir).limit(3)
    real_rename = os.rename

    def failing_rename(src, dst):
        if "/.ingest_tmp." in src and src.endswith(".parquet"):
            raise OSError("simulated rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated") as ei:
        store.ingest_dataframe(ev, "events", "archive",
                               when=dt.datetime.now(tz=UTC))
    monkeypatch.setattr(os, "rename", real_rename)
    staging = getattr(ei.value, "triton_staging_dir", None)
    assert staging and os.path.isdir(staging)
    assert os.path.basename(staging).startswith(".ingest_tmp.")


def _seed_fragmented_hour(spark, store, sf_dir, when):
    ev = _events(spark, sf_dir).limit(10)
    store.ingest_dataframe(ev, "events", "archive", when=when)
    store.ingest_dataframe(ev.limit(5), "events", "archive",
                           when=when + dt.timedelta(seconds=1))
    hour_dir = os.path.join(
        store.root, "stream=events", "client=archive",
        f"date={when.strftime('%Y%m%d')}", f"hour={when.strftime('%H')}")
    parts = sorted(f for f in os.listdir(hour_dir)
                   if f.endswith(".parquet"))
    assert len(parts) >= 2, "need a fragmented hour so compact rewrites"
    return hour_dir, parts


def test_compact_skips_hour_held_by_live_lock(spark, store, sf_dir):
    """Two uncoordinated compact crons on the same hour: the rescue
    made that overlap a silent DUPLICATION (the loser 'rescues' the
    winner's job-unique output back next to its own rewrite of the
    same rows), so the overlap itself is now removed — a fresh
    advisory lock makes the second compactor skip the hour."""
    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=5)
    hour_dir, parts = _seed_fragmented_hour(spark, store, sf_dir, when)
    parent, base = os.path.split(hour_dir)
    lock = os.path.join(parent, f".{base}._compact_lock")
    with open(lock, "w") as fh:
        fh.write("424242\n")    # a live peer holds the hour
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    assert stats["hours_locked"] == 1
    assert stats["hours"] == 0
    assert sorted(f for f in os.listdir(hour_dir)
                  if f.endswith(".parquet")) == parts, \
        "locked hour must be untouched"
    assert os.path.exists(lock), "skipper must not release a peer's lock"
    os.unlink(lock)
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    assert stats["hours"] == 1 and stats["hours_locked"] == 0
    assert not os.path.exists(lock), "owner must release on completion"
    assert store.cat("events", when.date(),
                     client="archive").count() == 15


def test_compact_steals_stale_lock(spark, store, sf_dir):
    """A crashed holder must not wedge compaction forever: a lock
    older than TRITON_COMPACT_LOCK_TTL is CLEARED (inode-verified
    steal) and the hour compacts on the next pass — the stealer does
    not retake in place, which was a two-stealer TOCTOU."""
    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=5)
    hour_dir, parts = _seed_fragmented_hour(spark, store, sf_dir, when)
    parent, base = os.path.split(hour_dir)
    lock = os.path.join(parent, f".{base}._compact_lock")
    with open(lock, "w") as fh:
        fh.write("424242\n")
    stale = dt.datetime.now(tz=UTC).timestamp() - 7200.0
    os.utime(lock, (stale, stale))
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    assert stats["hours_locked"] == 1 and stats["hours"] == 0
    assert not os.path.exists(lock), "stale lock must be cleared"
    assert not any(".stale." in n for n in os.listdir(parent)), \
        "steal must not leave grab-file residue"
    stats = store.compact("events", when.date(), "archive",
                          min_age_hours=1.0)
    assert stats["hours"] == 1 and stats["hours_locked"] == 0
    assert not os.path.exists(lock)
    assert store.cat("events", when.date(),
                     client="archive").count() == 15


@pytest.mark.parametrize("exchange_works", [True, False])
def test_compact_quarantines_unrescuable_straggler(
        spark, store, sf_dir, monkeypatch, exchange_works):
    """When the rescue rename itself fails with the straggler still
    present (hour dir removed by a concurrent expire, EACCES, ...),
    the doomed dir must be QUARANTINED — never rmtree'd over the only
    copy of a concurrently ingested batch (r12 review)."""
    import shutil
    import warnings

    import go_triton_spark.plans.archive_store as A

    when = dt.datetime.now(tz=UTC) - dt.timedelta(hours=5)
    hour_dir, parts = _seed_fragmented_hour(spark, store, sf_dir, when)

    real_ex = A._exchange_dirs

    def exchange_with_straggler(tmp, hour):
        shutil.copyfile(os.path.join(hour, parts[0]),
                        os.path.join(hour, "part-straggler.parquet"))
        return real_ex(tmp, hour) if exchange_works else False

    real_rename = os.rename

    def rename_blocking_rescue(src, dst):
        if src.endswith("/part-straggler.parquet") and \
                dst.startswith(hour_dir):
            raise OSError("simulated destination-side failure")
        return real_rename(src, dst)

    monkeypatch.setattr(A, "_exchange_dirs", exchange_with_straggler)
    monkeypatch.setattr(os, "rename", rename_blocking_rescue)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        stats = store.compact("events", when.date(), "archive",
                              min_age_hours=1.0)
    monkeypatch.setattr(os, "rename", real_rename)
    monkeypatch.setattr(A, "_exchange_dirs", real_ex)
    assert stats["hours"] == 1
    assert stats["files_rescued"] == 0
    assert stats.get("hours_quarantined") == 1
    parent = os.path.dirname(hour_dir)
    quarantined = [n for n in os.listdir(parent)
                   if n.startswith(".") and "._quarantined_old." in n]
    assert len(quarantined) == 1, os.listdir(parent)
    assert "part-straggler.parquet" in os.listdir(
        os.path.join(parent, quarantined[0])), \
        "straggler bytes must survive in the quarantine dir"
    assert any("preserved" in str(w.message) for w in caught)
    # live hour still serves the compacted rows
    assert store.cat("events", when.date(),
                     client="archive").count() == 15


def test_acquire_hour_lock_restores_fresh_lock_grabbed_mid_steal(
        tmp_path, monkeypatch):
    """Steal freshness check: when the stale lock is replaced by a
    NEW holder's fresh lock between the stealer's stat and rename,
    the stealer must detect it grabbed a live lock (by the grabbed
    file's own mtime — inode identity is porous, the fresh lock
    routinely reuses the freed inode, observed in this very test),
    restore it via os.link (which cannot clobber), and yield."""
    from go_triton_spark.plans.archive_store import ArchiveStore

    parent = str(tmp_path)
    base = "hour=03"
    path = os.path.join(parent, f".{base}._compact_lock")
    with open(path, "w") as fh:
        fh.write("dead\n")
    stale = dt.datetime.now(tz=UTC).timestamp() - 7200.0
    os.utime(path, (stale, stale))

    real_rename = os.rename
    fresh_ino = {}

    def rename_with_interleaving(src, dst):
        if src == path and ".stale." in dst:
            # simulate: the stale lock vanishes (another stealer) and
            # a new live holder creates a FRESH lock at the same path
            # between this stealer's stat and its rename
            os.unlink(path)
            with open(path, "w") as fh:
                fh.write("live-holder\n")
            fresh_ino["ino"] = os.stat(path).st_ino
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", rename_with_interleaving)
    got = ArchiveStore._acquire_hour_lock(parent, base)
    monkeypatch.setattr(os, "rename", real_rename)
    assert got is None, "stealer must yield after grabbing a fresh lock"
    assert os.path.exists(path), "fresh lock must be restored"
    assert os.stat(path).st_ino == fresh_ino["ino"], \
        "restored lock must be the live holder's exact inode"
    assert not any(".stale." in n for n in os.listdir(parent)), \
        "no grab-file residue"
    with open(path) as fh:
        assert fh.read() == "live-holder\n"


def test_expire_idempotent_against_concurrent_maintenance(
        spark, store, sf_dir, monkeypatch):
    """Pinned from the four-way soak failure: expire's rmtree raced a
    concurrent compact of the same old date — the straggler rescue /
    hour-dir swap renames entries while expire's deletion walk unlinks
    them, so the walk hits vanished paths (FileNotFoundError) or a
    briefly-nonempty dir (ENOTEMPTY); a peer expire can also drop the
    whole date between listdir and rmtree. Contract: deletion is
    idempotent (already-gone = dropped), one retry re-walks a torn
    tree, and a PERSISTENT failure still surfaces loudly."""
    import errno
    import shutil

    ev = _events(spark, sf_dir).limit(20)
    keep = dt.datetime(2026, 8, 10, 12, tzinfo=UTC)

    def seed(client, *day_offsets):
        for off in day_offsets:
            store.ingest_dataframe(ev, "events", client,
                                   when=keep - dt.timedelta(days=off))

    real = shutil.rmtree

    # leg 1: a peer deleted the date between our listdir and rmtree —
    # already-gone is the goal state, counted dropped, no error
    seed("alpha", 30, 20, 0)
    state = {"n": 0}

    def peer_won(path, *a, **k):
        state["n"] += 1
        if state["n"] == 1:
            real(path)
            raise FileNotFoundError(2, "No such file or directory", path)
        return real(path, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", peer_won)
    assert store.expire("events", "alpha", keep.date()) == \
        {"dropped": 2, "kept": 1}

    # leg 2: torn walk (concurrent compact renaming entries mid-walk)
    # — first pass fails with ENOTEMPTY leaving the tree in place, the
    # retry re-walks and succeeds
    seed("beta", 15)
    state["n"] = 0

    def torn_once(path, *a, **k):
        state["n"] += 1
        if state["n"] == 1:
            raise OSError(errno.ENOTEMPTY, "Directory not empty", path)
        return real(path, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", torn_once)
    assert store.expire("events", "beta", keep.date()) == \
        {"dropped": 1, "kept": 0}

    # leg 3: persistent failure (tree still present after both passes)
    # must surface, not be silently swallowed
    seed("gamma", 15)

    def stuck(path, *a, **k):
        raise OSError(errno.ENOTEMPTY, "Directory not empty", path)

    monkeypatch.setattr(shutil, "rmtree", stuck)
    with pytest.raises(OSError):
        store.expire("events", "gamma", keep.date())
