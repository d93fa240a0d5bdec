"""Canonical archive store: Parquet partitioned by (stream, client, date, hour).

Replaces the reference's S3 ``YYYYMMDD/<stream>-<client>-<ts>.tri``
layout (triton/store.go:97-104) with a partitioned Parquet table:

    <root>/stream=<s>/client=<c>/date=YYYYMMDD/hour=HH/part-*.snappy.parquet

What this buys at 100 TB:
- partition pruning on date/hour replaces the reference's day-prefix
  S3 listing (triton/store_reader.go:55-67) — and has no 1000-key
  truncation bug (store_reader.go:84-87)
- column pruning + predicate pushdown to parquet row groups (the
  reference always reads whole objects)
- vectorized columnar scans instead of record-at-a-time msgpack

Replay-order fidelity (SURVEY S15/S16): every ingested row carries
``_archive_sort`` (ingest unix ts) so ``cat`` can reproduce the
reference's strict (date, file-ts) ordering with an explicit orderBy —
plain ``spark.read`` is unordered by contract.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PARTITION_COLS = ["stream", "client", "date", "hour"]


def coerce_date(d: "_dt.date | str") -> _dt.date:
    """Accept a date, an ISO string (2026-08-14), or the reference's
    compact form (20260814) — the CLI always parses, but library
    callers reasonably pass strings."""
    if isinstance(d, _dt.datetime):
        return d.date()
    if isinstance(d, _dt.date):
        return d
    s = str(d).strip()
    if "-" in s:
        return _dt.date.fromisoformat(s)
    return _dt.datetime.strptime(s, "%Y%m%d").date()


def list_dates_from_range(start: _dt.date, end: _dt.date) -> list[_dt.date]:
    """Expand [start, end] inclusive into days.

    Mirrors triton/store_reader.go:13-29 (which panics on start>end; we
    raise ValueError).
    """
    start, end = coerce_date(start), coerce_date(end)
    if start > end:
        raise ValueError("invalid date range: start after end")
    out = []
    d = start
    while d <= end:
        out.append(d)
        d += _dt.timedelta(days=1)
    return out


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically exchange two directories (Linux renameat2
    RENAME_EXCHANGE). Returns False when the syscall is unavailable or
    fails (non-Linux, old glibc, cross-device) so callers fall back to
    a rename pair. With exchange, a partition under compaction is
    never absent from a concurrent listing — there is no instant where
    neither the old nor the new file set is at the path."""
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        renameat2 = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    rc = renameat2(AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b),
                   RENAME_EXCHANGE)
    return rc == 0


def _holds_committed_parts(root: str) -> bool:
    """Does ``root`` contain any VISIBLE parquet part file (hidden
    dirs/files pruned, the same rules Spark listings apply)? The
    one-place home of the walk idiom the staging sweeps use to decide
    quarantine-vs-delete."""
    for _base, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                return True
    return False


def _hadoop_subdirs(spark: SparkSession, path: str) -> list[str]:
    """Child directory NAMES of ``path`` via the Hadoop FileSystem API —
    the scheme-agnostic twin of ``os.listdir`` that makes the cat
    listing-level pruning work on object stores (s3a://, gs://, ...),
    not just local disk. One listStatus call, driver-side, O(children
    of one dir) — never a recursive tree walk. Returns [] when the
    path does not exist."""
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName()
                  for st in fs.listStatus(jpath) if st.isDirectory())


class _VanishedMidWalk(FileNotFoundError):
    """An IN-RANGE date/hour dir disappeared between listdir calls of
    one pruning walk (a concurrent ``expire`` rmtree). The walk must
    not return the half-built mid-state — callers re-list fresh, which
    converges to the consistent post-expire view (dates expire took
    simply stop being listed). Fail-loud-or-heal, never
    silently-fewer-rows: the same contract the compact-swap fix gave
    the file-level races."""


def _stable_listdir(path: str) -> list[str]:
    """``os.listdir`` with a TORN-ENUMERATION guard.

    A directory enumeration is not atomic against a concurrent
    RENAME_EXCHANGE + rmtree: the walker can opendir the PRE-swap
    inode, compact swaps the name and rmtrees the old contents, and
    the in-flight getdents returns an EMPTY (or partial) view — with
    no error. Empty is the silent-loss case: the hour contributes
    zero files and the cat simply misses its rows (r10 matrix soak,
    sink-compact pair: reproduced ~1 per 20 commits; partial views
    are already loud because the vanished files 404 at read time).
    Guard: snapshot (st_ino, st_mtime_ns) before and after the
    listdir — any change means the name was swapped or an entry
    landed/left mid-enumeration, so the walk must re-list fresh."""
    before = os.stat(path)
    names = sorted(os.listdir(path))
    after = os.stat(path)
    if (before.st_ino, before.st_mtime_ns) \
            != (after.st_ino, after.st_mtime_ns):
        raise _VanishedMidWalk(
            f"{path} changed during enumeration (swap/ingest raced the "
            f"walk); re-listing")
    return names


def _prune_retrying(prune, attempts: int = 8):
    """Run a pruning walk, re-listing from scratch when it observes a
    mid-walk removal. Bounded: a pathological expire loop still ends
    in a loud error, never a silent partial listing."""
    last: Exception | None = None
    for _ in range(attempts):
        try:
            return prune()
        except _VanishedMidWalk as exc:
            last = exc
    raise last


class ArchiveStore:
    """Batch-side archive table: ingest + replay ("cat").

    ``table_format`` (round-6 seam): ``"parquet"`` (default) keeps the
    path-based layout above — listing-level pruning, rename-based
    compaction, rmtree expiry. Any other value (``"delta"``,
    ``"iceberg"``) routes writes and reads through
    ``format(table_format)`` on the SAME root so a cluster deployment
    with the connector on its classpath gets a manifest table —
    snapshot-isolated reads, no rename-swap residue on object stores
    (SCALE.md round-5 compaction note) — without touching any
    operator. Maintenance (compact/expire) is engine-specific there
    (OPTIMIZE / rewrite_data_files / VACUUM) and raises with a
    pointer rather than pretending rename semantics apply.
    """

    def __init__(self, spark: SparkSession, root: str,
                 table_format: str = "parquet"):
        self.spark = spark
        self.root = root
        self.table_format = table_format

    def _require_parquet(self, op: str) -> None:
        if self.table_format != "parquet":
            raise NotImplementedError(
                f"{op} is filesystem-rename based and only applies to the "
                f"parquet layout; for {self.table_format!r} use the table "
                f"format's own maintenance (Delta OPTIMIZE/VACUUM, Iceberg "
                f"rewrite_data_files/expire_snapshots)")

    # ------------------------------------------------------------- write

    def ingest_dataframe(self, df: DataFrame, stream: str, client: str,
                         when: _dt.datetime | None = None,
                         mode: str = "append") -> None:
        """Append records to the archive under processing-time date/hour.

        Date is *processing* day, not event time, exactly like the
        reference (README.md:54-56, triton/store.go:86).
        """
        if when is None:
            when = _dt.datetime.now(tz=_dt.timezone.utc)
        ts = int(when.timestamp())
        out = (
            df.withColumn("stream", F.lit(stream))
            .withColumn("client", F.lit(client))
            .withColumn("date", F.lit(when.strftime("%Y%m%d")))
            .withColumn("hour", F.lit(when.strftime("%H")))
            # cast: F.lit(int) infers INT32 for epoch seconds, but the
            # streaming sink stamps INT64 (unix_timestamp) — mixed
            # physical types across archive files break any read that
            # touches the column (vectorized reader refuses the
            # narrow->wide convert per file)
            .withColumn("_archive_sort", F.lit(ts).cast("long"))
        )
        if mode != "append" or self.table_format != "parquet" \
                or "://" in self.root:
            # overwrite / manifest formats / object stores: the
            # engine-native writer owns the commit protocol
            (out.write.mode(mode)
                .partitionBy(*_PARTITION_COLS)
                .format(self.table_format)
                .save(self.root))
            return
        # CONCURRENT-APPEND SAFETY on local parquet roots (r10
        # expire-compact matrix find): two batch appends to the SAME
        # root share Hadoop's {root}/_temporary staging, and the first
        # job's cleanupJob recursively DELETES it — killing the second
        # job's in-flight task files (loud TASK_WRITE_FAILED here; on
        # a cluster a commit racing the delete can "succeed" having
        # moved NOTHING — silent loss). Each ingest therefore writes
        # to its own hidden staging dir (its private _temporary lives
        # inside) and then RENAMES the part files into the shared
        # partition tree: names are job-unique (part-<uuid>), renames
        # are same-filesystem atomic, and a crash leaves only hidden
        # residue reaped by the inline age-gated sweep below (NOT
        # _sweep_stale_staging — that one owns compact's residue).
        import shutil
        import time as _time
        import uuid
        import warnings

        # sweep CRASH residue of prior ingests (age-gated like the
        # compact staging sweep; fresh dirs belong to live jobs).
        # Residue that still holds COMMITTED part files may be the
        # only staged copy of rows a mid-rename failure never moved
        # (r11 advice) — quarantine it out of the sweep prefix with a
        # warning, mirroring _compact_old; only part-free wreckage
        # (_temporary scratch from a crashed write) is deleted.
        try:
            now = _time.time()
            for name in os.listdir(self.root):
                if not name.startswith(".ingest_tmp."):
                    continue
                p = os.path.join(self.root, name)
                try:
                    if now - os.path.getmtime(p) <= 3600.0:
                        continue
                except OSError:
                    continue    # vanished: a concurrent sweep got it
                if _holds_committed_parts(p):
                    qname = name.replace(".ingest_tmp.",
                                         ".ingest_quarantine.")
                    try:
                        os.rename(p, os.path.join(self.root, qname))
                    except OSError:
                        qname = name    # rename failed: warn in place
                    warnings.warn(
                        f"stale ingest staging {self.root}/{qname} "
                        "still holds committed part files — a prior "
                        "ingest failed mid-move and these may be the "
                        "only staged copy of unmoved rows; reconcile "
                        "manually (never auto-deleted)",
                        RuntimeWarning, stacklevel=2)
                else:
                    shutil.rmtree(p, ignore_errors=True)
        except FileNotFoundError:
            pass    # first-ever ingest: root created by the write below
        staging = os.path.join(
            self.root, f".ingest_tmp.{os.getpid():x}_{uuid.uuid4().hex[:8]}")
        # On FAILURE the staging dir is deliberately LEFT IN PLACE
        # (r11 advice): the rename loop is non-atomic across part
        # files, so a mid-loop error (e.g. concurrent expire removed
        # the destination date dir) leaves some files live and some
        # staged. Deleting the staged remainder would force the loud
        # retry to re-ingest EVERYTHING, duplicating the already-moved
        # rows; preserving it lets an operator (or a smarter retry)
        # complete the move instead. The age-gated sweep above reaps
        # part-free wreckage after an hour and QUARANTINES (with a
        # warning) residue that still holds committed part files —
        # hidden names never list, so readers are unaffected either
        # way, and the only staged copy is never silently destroyed.
        (out.write.mode("overwrite")
            .partitionBy(*_PARTITION_COLS)
            .parquet(staging))
        try:
            for base, dirs, files in os.walk(staging):
                dirs[:] = [d for d in dirs
                           if not d.startswith((".", "_"))]
                rel = os.path.relpath(base, staging)
                for fn in files:
                    if fn.startswith((".", "_")) \
                            or not fn.endswith(".parquet"):
                        continue
                    dest_dir = (self.root if rel == "." else
                                os.path.join(self.root, rel))
                    os.makedirs(dest_dir, exist_ok=True)
                    os.rename(os.path.join(base, fn),
                              os.path.join(dest_dir, fn))
        except Exception as exc:
            # name the preserved staging dir NOW (r11 advice): the
            # age sweep above quarantines rather than deletes it, but
            # the recovery window should not expire unannounced
            warnings.warn(
                f"ingest failed mid-move; staged part files preserved "
                f"in {staging} for recovery (the next ingest's sweep "
                "quarantines, never deletes, non-empty residue)",
                RuntimeWarning, stacklevel=2)
            # machine-readable twin of the warning: a smarter retry
            # (or the race-matrix recovery leg) completes the move
            # from exc.triton_staging_dir instead of re-ingesting
            # everything and duplicating the already-moved rows
            exc.triton_staging_dir = staging
            raise
        shutil.rmtree(staging, ignore_errors=True)

    # -------------------------------------------------------------- read

    def cat(self, stream: str, start_date: _dt.date, end_date: _dt.date | None = None,
            client: str | None = None, ordered: bool = True) -> DataFrame:
        """Batch replay: the reference's ``triton cat`` (triton.go:282-366).

        - date-range partition pruning (S12/S13): the ``date BETWEEN``
          predicate prunes at the file listing, verified by
          PartitionFilters in the scan node
        - client consistency guard (S14): if ``client`` is None and the
          range holds >1 client, raise (the reference errors the same
          way, triton/store_reader.go:90-99)
        - manifest order (S15/S16): orderBy(date, _archive_sort) when
          ``ordered``; skip it for analytical consumers that don't need
          replay fidelity (saves a global sort)

        Read path (round-5): DIRECTORY LISTING, not the streaming
        sink's ``_spark_metadata`` manifest. Reading the root lets
        Spark's FileStreamSink detection take over and restricts the
        scan to manifest-listed files — which (a) silently hides
        batch-ingested rows and (b) breaks the instant ``compact``
        rewrites an hour (the manifest still names the old files; a
        post-compaction cat died with FileNotFoundException). Reading
        the ``stream=`` subdir (``basePath`` preserves the partition
        columns) lists the filesystem instead, so batch, streaming,
        and compacted archives all replay uniformly.
        A file not yet committed to the sink manifest may be replayed
        (at-least-once on crash — the reference's own guarantee,
        store.go:51-67), and a cat racing a micro-batch file
        mid-write can fail transiently (footer not yet on disk) —
        retry, exactly like the documented compact-swap race. The
        read deliberately does NOT set ``ignoreCorruptFiles``: it
        converts ANY per-file read error — including schema
        mismatches — into silent row loss (measured: a stray INT32
        ``_archive_sort`` made an ordered cat silently drop every
        INT64 file, 280 -> 180 rows, while count() said 280). Replay
        integrity fails loudly instead.
        """
        start_date = coerce_date(start_date)
        end_date = coerce_date(end_date) if end_date else start_date
        wanted = {d.strftime("%Y%m%d")
                  for d in list_dates_from_range(start_date, end_date)}
        if self.table_format != "parquet":
            # manifest table (round-6 seam): the format's own log
            # handles file listing, partition pruning, and snapshot
            # isolation — the manual listing/pruning/retry machinery
            # below exists precisely because plain parquet paths lack
            # those. Filters still prune via the manifest's stats.
            src = self.spark.read.format(self.table_format).load(self.root)
            return self._filter_cat(src, stream, start_date, end_date,
                                    client, ordered)
        if not os.path.isdir(self.root) and "://" not in self.root:
            raise FileNotFoundError(
                f"archive root {self.root!r} does not exist — nothing has "
                f"been stored yet (run the store pipeline first)")
        stream_dir = os.path.join(self.root, f"stream={stream}")
        # MANUAL PARTITION PRUNING AT THE LISTING LEVEL: enumerate the
        # in-range date dirs ourselves and hand Spark only those paths.
        # Reading stream_dir would make InMemoryFileIndex list the
        # WHOLE archive before Catalyst prunes — O(all partitions ever)
        # listing cost to replay one day, and a retention `expire`
        # rmtree-ing an old date MID-LISTING kills a reader of a
        # completely different range. Pruned, a cat never touches
        # dates it doesn't read.
        is_uri = "://" in self.root
        if is_uri:
            # object stores have no os.listdir; the Hadoop FS twin
            # keeps the pruning (round-6 — previously a URI root read
            # the whole stream subtree: O(archive) listing per replay)
            def _subdirs(p):
                return _hadoop_subdirs(self.spark, p)
        else:
            def _subdirs(p):
                # torn-enumeration guard here too: expire/compact churn
                # dentries in these dirs, and a torn client/date listing
                # silently drops a whole date (same class as the hour
                # walk — see _stable_listdir)
                try:
                    return _stable_listdir(p)
                except _VanishedMidWalk:
                    raise
                except (FileNotFoundError, NotADirectoryError):
                    # NotADirectoryError keeps the old isdir() guard's
                    # behavior: a stray FILE named like a partition dir
                    # reads as empty, it doesn't crash every cat
                    return []
        def _prune() -> tuple[list[str], bool]:
            pruned: list[str] = []
            exists = (bool(_subdirs(stream_dir)) if is_uri
                      else os.path.isdir(stream_dir))
            if exists:
                cdirs = ([f"client={client}"] if client is not None else
                         [n for n in _subdirs(stream_dir)
                          if n.startswith("client=")])
                for cname in cdirs:
                    cpath = os.path.join(stream_dir, cname)
                    for dname in _subdirs(cpath):
                        if (dname.startswith("date=")
                                and dname[len("date="):] in wanted):
                            pruned.append(os.path.join(cpath, dname))
            if pruned and not is_uri:
                # LOCAL PATHS: hand Spark explicit FILE paths, not the
                # date dirs. The local filesystem's listStatus is
                # list-then-stat (readdir, then a getFileStatus per
                # name) — NOT atomic against compact's
                # RENAME_EXCHANGE swap — and Spark's listLeafFiles
                # SWALLOWS the mid-listing FileNotFoundException,
                # returning an empty hour: a concurrent cat silently
                # LOST the whole partition's rows (caught by the r9
                # four-way soak at full-suite load, reproduced 1-in-
                # ~300 swaps by tools/stress — see test). Explicit
                # files close that hole only PARTIALLY: r10's matrix
                # soak found the same swallow one level deeper
                # (InMemoryFileIndex drops a vanished explicit path at
                # planning — see the post-plan verification below) and
                # a torn readdir that enumerates a swapped-out hour as
                # EMPTY (see _stable_listdir). With all three guards,
                # a racing swap either heals via a fresh re-list or
                # fails LOUDLY (FILE_NOT_EXIST / FAILED_READ_FILE at
                # execution, the documented one-retry class); nothing
                # is ever silently dropped. One os.scandir per hour
                # dir, driver-side — the same cost Spark's own
                # listing pays.
                files: list[str] = []
                for ddir in pruned:
                    try:
                        hours = _stable_listdir(ddir)
                    except FileNotFoundError as exc:
                        # ddir is IN the requested range by construction
                        # (wanted is the prune condition), so the only
                        # legitimate remover is a concurrent expire.
                        # Skipping it here would hand back a half-walked
                        # mid-state (dates listed before the rmtree kept,
                        # this one silently dropped) — raise the
                        # retryable marker instead; the fresh re-list
                        # converges to the consistent post-expire view
                        # (r9-verdict: the old comment overstated the
                        # safety of a silent continue).
                        raise _VanishedMidWalk(str(exc)) from exc
                    for hname in hours:
                        if hname.startswith((".", "_")):
                            continue
                        hdir = os.path.join(ddir, hname)
                        try:
                            names = _stable_listdir(hdir)
                        except (FileNotFoundError, NotADirectoryError) \
                                as exc:
                            # same contract as the date dir above:
                            # compact swaps FILES (never hour dirs), so
                            # a vanished hour dir is an expire/external
                            # removal — re-list fresh, don't skip
                            raise _VanishedMidWalk(str(exc)) from exc
                        files.extend(
                            os.path.join(hdir, n) for n in names
                            if n.endswith(".parquet")
                            and not n.startswith((".", "_")))
                if files:
                    return files, exists
            return pruned, exists

        pruned, stream_exists = _prune_retrying(_prune)
        if pruned or stream_exists or is_uri:
            # planning (listing + schema inference from a footer) can
            # race a compact swap: the listed file is gone by the time
            # its footer is opened. Driver-side and cheap — re-list
            # fresh and retry instead of surfacing the transient.
            last: Exception | None = None
            for _attempt in range(3):
                # the shared FileStatusCache serves STALE listings for
                # a path read before new sink files landed (the
                # manifest read never hit it — the sink log is re-read
                # per query); a replay of a live archive must list
                # fresh every time
                self.spark.catalog.refreshByPath(stream_dir)
                if _attempt:
                    # the failed path may be GONE (expire rmtree'd a
                    # pruned date dir mid-plan) — retrying the stale
                    # list would fail 3x on the same path; re-derive
                    pruned, stream_exists = _prune_retrying(_prune)
                    if not (pruned or stream_exists or is_uri):
                        # stream vanished entirely between attempts:
                        # same semantics as the unknown-stream branch
                        src = self.spark.read.parquet(self.root)
                        last = None
                        break
                try:
                    # when no in-range partitions exist on local disk
                    # (or on an object store), read the stream subtree
                    # — empty-after-filter results keep the schema of
                    # the existing files
                    src = (self.spark.read
                           .option("basePath", self.root)
                           .parquet(*(pruned or [stream_dir])))
                    if pruned and pruned[0].endswith(".parquet"):
                        # POST-PLAN VERIFICATION (r10 matrix soak,
                        # sink-compact pair): handing Spark explicit
                        # file paths is NOT enough — InMemoryFileIndex
                        # stats each path at planning and SILENTLY
                        # DROPS ones a compact swap deleted in the
                        # listdir-to-plan window (it swallows the
                        # FileNotFoundException with a log warning, the
                        # same swallow class the r9 fix closed one
                        # level up). Reproduced: a cat lost an entire
                        # hour with zero errors ~1 per 30 swaps. The
                        # planned set must equal the handed set; any
                        # shortfall re-lists fresh. After planning,
                        # execution-time vanishes stay LOUD
                        # (ignoreMissingFiles=false default).
                        want = {os.path.basename(p) for p in pruned}
                        got = {os.path.basename(p)
                               for p in src.inputFiles()}
                        if got != want:
                            last = FileNotFoundError(
                                "FileNotFound: planning dropped "
                                f"{sorted(want - got)[:3]} (compact/"
                                "expire raced the plan); re-listing")
                            continue
                    last = None
                    break
                except Exception as exc:  # noqa: BLE001
                    msg = str(exc)
                    # UNABLE_TO_INFER_SCHEMA joins the retryable set:
                    # on a live archive it means the plan's listing
                    # raced a compact swap / ingest commit into seeing
                    # zero readable footers — the same transient class
                    # as a vanished path, healed by a fresh re-list.
                    # A genuinely empty stream still errors after the
                    # attempts are exhausted, exactly as before.
                    if ("FileNotFound" not in msg
                            and "FILE_NOT_EXIST" not in msg
                            and "PATH_NOT_FOUND" not in msg
                            and "UNABLE_TO_INFER_SCHEMA" not in msg):
                        raise
                    last = exc
            if last is not None:
                # final PATH_NOT_FOUND on an object-store stream_dir
                # (no local isdir() probe exists there): fall back to
                # the root read — an unknown stream returns an empty
                # result through the filters. URI roots ONLY: a local
                # path that still fails after fresh re-lists is a real
                # integrity problem, and an O(archive) root scan would
                # hide it (round-7 advice)
                if not is_uri:
                    raise last
                src = self.spark.read.parquet(self.root)
        else:
            # unknown stream: keep the old root read (returns an empty
            # result through the filters rather than a listing error)
            src = self.spark.read.parquet(self.root)
        return self._filter_cat(src, stream, start_date, end_date,
                                client, ordered)

    def _manifest_committed_names(self) -> set:
        """Basenames recorded in the streaming sink's _spark_metadata
        manifest (empty set when no manifest exists — a pure batch
        archive). FileStreamSink log v1: one 'v1' header line, then a
        JSON object per committed file carrying a 'path'; periodic
        '<n>.compact' files re-list everything so unioning every
        parseable line is correct for MEMBERSHIP (the sink never
        deletes). Driver-side, bounded by committed-batch count."""
        import json

        mdir = os.path.join(self.root, "_spark_metadata")
        names: set = set()
        if not os.path.isdir(mdir):
            return names
        for fn in sorted(os.listdir(mdir)):
            p = os.path.join(mdir, fn)
            if fn.startswith(".") or not os.path.isfile(p):
                continue
            try:
                with open(p) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line.startswith("{"):
                            continue
                        try:
                            rec = json.loads(line)
                        except ValueError:
                            continue
                        if rec.get("path"):
                            names.add(os.path.basename(rec["path"]))
            except OSError:
                continue
        return names

    def quarantine_crash_residue(self, stream: str | None = None,
                                 max_age_days: int = 14) -> int:
        """Rename never-committed trailer-less part files out of the
        read path — the crash-recovery sweep.

        A SIGKILLed store leaves the in-flight task's part file at its
        FINAL name with no parquet trailer (0 bytes, or truncated
        mid-row-group); because ``cat`` refuses ignoreCorruptFiles,
        one such file makes every later replay of the range fail
        loudly forever. The residue's DATA is not lost: its batch
        never committed, so the source checkpoint replays it on resume
        (at-least-once, store.go:51-67) — quarantining the bytes loses
        nothing. Two safety rules make the sweep sound:

        - Only files ABSENT from the sink's ``_spark_metadata``
          manifest are touched: a manifest-COMMITTED file failing its
          trailer check is real corruption and must keep failing the
          read loudly, never vanish.
        - Only run when NO live writer exists for the stream —
          ``StorePipeline.start`` calls this before starting its query
          (the reference's single-writer-per-stream model), because a
          file a live sink task is STILL WRITING is trailer-less and
          unmanifested too, and renaming it makes the task's commit
          fail (measured: TASK_WRITE_FAILED under the concurrency
          soak when the sweep ran at cat time). Never call it from a
          reader against a live archive.

        Valid parquet ends with the 4-byte 'PAR1' magic; a file
        missing it was never closed by its writer. Scope: one stream's
        subtree (all clients), date dirs whose mtime is within
        ``max_age_days`` — residue only exists in partitions the
        crashed writer was touching, so the walk is bounded by recent
        activity, not archive lifetime. Local roots only; object-store
        deployments route to the manifest table_format seam, whose log
        never lists uncommitted files. Quarantine name =
        '.<name>.crash': the dot prefix hides it from Spark listings
        AND the changed suffix keeps it out of compact's *.parquet
        enumeration. Renames, never deletes — an operator can inspect
        the bytes; ``expire`` reaps the dir."""
        from go_triton_spark.reporting import get_error_reporter, safe_report

        if "://" in self.root or not os.path.isdir(self.root):
            return 0
        streams = ([f"stream={stream}"] if stream is not None else
                   [n for n in sorted(os.listdir(self.root))
                    if n.startswith("stream=")])
        cutoff = _dt.datetime.now().timestamp() - max_age_days * 86400
        dirs: list = []
        for sname in streams:
            sdir = os.path.join(self.root, sname)
            if not os.path.isdir(sdir):
                continue
            for cname in sorted(os.listdir(sdir)):
                if not cname.startswith("client="):
                    continue
                cdir = os.path.join(sdir, cname)
                for dname in sorted(os.listdir(cdir)):
                    ddir = os.path.join(cdir, dname)
                    try:
                        recent = (dname.startswith("date=")
                                  and os.path.getmtime(ddir) >= cutoff)
                    except OSError:
                        continue
                    if recent:
                        dirs.append(ddir)

        committed = None
        n = 0
        for d in dirs:
            for base, _dirs, files in os.walk(d):
                # NEVER descend into hidden/underscore dirs (r10 matrix
                # soak find, sink-compact pair): os.walk was entering a
                # concurrent compact's dot-prefixed staging and its
                # _temporary task dirs, whose in-flight part files are
                # trailer-less + unmanifested BY DESIGN — the sweep
                # renamed them to .crash, compact's commit then staged
                # an empty-looking dir, the exchange put it live, and
                # the post-swap rmtree DESTROYED the hour's rows
                # (permanent loss, reproduced ~1 in 20 commits). Files
                # under hidden dirs are invisible to cat anyway, so
                # they can never poison a replay — out of scope here.
                _dirs[:] = [sub for sub in _dirs
                            if not sub.startswith((".", "_"))]
                for fn in files:
                    if fn.startswith(".") or not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(base, fn)
                    try:
                        ok = os.path.getsize(fp) > 12
                        if ok:
                            with open(fp, "rb") as fh:
                                fh.seek(-4, os.SEEK_END)
                                ok = fh.read(4) == b"PAR1"
                    except OSError:
                        continue  # raced compact/expire; read retry copes
                    if ok:
                        continue
                    if committed is None:
                        committed = self._manifest_committed_names()
                    if fn in committed:
                        continue  # committed + bad trailer: fail loudly
                    try:
                        os.rename(fp, os.path.join(base, f".{fn}.crash"))
                    except OSError:
                        continue
                    n += 1
                    safe_report(
                        get_error_reporter(), "crash_residue_quarantined",
                        f"quarantined never-committed part file {fp} "
                        f"(no parquet trailer; its batch replays from "
                        f"the source checkpoint)",
                        path=fp, root=self.root)
        return n

    def _filter_cat(self, src: DataFrame, stream: str,
                    start_date: _dt.date, end_date: _dt.date,
                    client: str | None, ordered: bool) -> DataFrame:
        """Shared cat tail: range/stream/client filters, the S14 guard,
        replay ordering — identical for path and manifest layouts."""
        df = (
            src
            .where((F.col("stream") == stream)
                   & (F.col("date") >= start_date.strftime("%Y%m%d"))
                   & (F.col("date") <= end_date.strftime("%Y%m%d")))
        )
        if client is not None:
            df = df.where(F.col("client") == client)
        else:
            clients = [r[0] for r in df.select("client").distinct().limit(2).collect()]
            if len(clients) > 1:
                raise ValueError(
                    f"Multiple clients for stream {stream!r} in range; "
                    f"specify one of {sorted(clients)}")
        if ordered:
            df = df.orderBy("date", "_archive_sort")
        return df.drop(*_PARTITION_COLS)

    def cat_json(self, *args, **kwargs) -> DataFrame:
        """``cat`` projected to line-per-record JSON (S17, triton.go:351-366)."""
        df = self.cat(*args, **kwargs)
        cols = [c for c in df.columns if not c.startswith("_archive")]
        return df.select(F.to_json(F.struct(*cols)).alias("json"))

    # --------------------------------------------------------- maintain

    def compact(self, stream: str, date: _dt.date, client: str,
                target_file_mb: int = 128,
                min_age_hours: float = 1.0) -> dict:
        """Compact one (stream, client, date) slice's small files.

        Streaming ingest writes >= 1 file per micro-batch per hour
        partition; at 100 TB that's the classic small-files problem
        (every downstream scan pays per-file open + listing cost, and
        the NameNode/object-store listing grows unbounded). Compaction
        rewrites each hour partition into ``ceil(bytes/target)``
        files, range-partitioned on ``_archive_sort`` so replay order
        stays file-local (SURVEY S15).

        Safety: each hour is written to a HIDDEN sibling tmp dir
        (dot-prefixed basename — Spark listings prune hidden names, so
        staging data is never counted by a concurrent cat) and swapped
        in with one atomic renameat2(RENAME_EXCHANGE) — the partition
        is never half-written and never absent (two plain renames as
        the non-Linux fallback). A reader that LISTED the old files
        just before the swap may still fail its open with
        FILE_NOT_EXIST — path-based filesystems cannot keep replaced
        paths alive — and needs one retry; cat re-lists fresh. On a
        real object store use a table format (Delta/Iceberg
        rewrite-files) instead of rename; this implementation targets
        filesystem-backed archives.

        Live-ingest safety (round-5): hour partitions younger than
        ``min_age_hours`` are SKIPPED (counted in ``hours_skipped``).
        The streaming sink appends to the wall-clock hour — and a
        micro-batch that STARTED just before rollover still lands in
        the previous hour shortly after — so compacting a hot hour
        could read-rewrite-swap while a new file lands in between,
        deleting it with the swapped-out dir. One hour of grace keeps
        ``compact`` safe to run as a cron next to a live ``store``
        with no coordination.
        """
        self._require_parquet("compact")
        if "://" in self.root:
            # rename-based swaps cannot be atomic on object stores
            # (S3 rename = copy+delete, a visible window) — the honest
            # answer is the manifest seam, not a racy emulation
            raise NotImplementedError(
                "compact is rename-based and needs a real filesystem; "
                "on an object store use table_format='delta'/'iceberg' "
                "(ArchiveStore seam) and the format's OPTIMIZE / "
                "rewrite_data_files")
        date = coerce_date(date)
        slice_dir = os.path.join(
            self.root, f"stream={stream}", f"client={client}",
            f"date={date.strftime('%Y%m%d')}")
        if not os.path.isdir(slice_dir):
            raise FileNotFoundError(f"no archive partition at {slice_dir}")
        hot_cutoff = (_dt.datetime.now(tz=_dt.timezone.utc)
                      - _dt.timedelta(hours=min_age_hours))
        stats = {"hours": 0, "hours_skipped": 0, "hours_vanished": 0,
                 "hours_contended": 0, "hours_locked": 0,
                 "hours_quarantined": 0, "files_rescued": 0,
                 "files_before": 0, "files_after": 0, "bytes": 0}
        for hour_name in sorted(os.listdir(slice_dir)):
            hour_dir = os.path.join(slice_dir, hour_name)
            if not (os.path.isdir(hour_dir) and hour_name.startswith("hour=")):
                continue
            part_end = _dt.datetime(
                date.year, date.month, date.day,
                int(hour_name[len("hour="):]),
                tzinfo=_dt.timezone.utc) + _dt.timedelta(hours=1)
            if part_end > hot_cutoff:
                stats["hours_skipped"] += 1
                continue
            try:
                self._compact_hour(hour_dir, target_file_mb, stats)
            except Exception as exc:  # noqa: BLE001 — classified below
                # a concurrent `expire` may rmtree this DATE between
                # the hour listing and any step of the rewrite (the
                # retention cron runs next to the compaction cron by
                # design). If the hour is gone, that's retention
                # winning the race, not an error — count it and move
                # on (round-6 four-way soak found the raw
                # AnalysisException leaking out here). Any failure
                # with the hour still present is real and propagates.
                msg = str(exc)
                vanished_exc = (isinstance(exc, (FileNotFoundError, OSError))
                                or "PATH_NOT_FOUND" in msg
                                or "FileNotFound" in msg)
                if vanished_exc and not os.path.isdir(hour_dir):
                    # drop any staging leftovers: the tmp write may
                    # have RESURRECTED the date path after the rmtree,
                    # and retention's delete must stick. AGE-GATED
                    # (r11 advice): "hour absent" is also the transient
                    # window of a PEER compact's fallback double-rename
                    # — an unconditional rmtree here deleted the peer's
                    # _compact_old (sole copy) and _compact_tmp (new
                    # copy), destroying the hour with zero errors. The
                    # age rule leaves fresh (= live peer) staging alone;
                    # retention is already effective for readers (hidden
                    # names never list) and the residue is reaped by the
                    # next sweep once stale.
                    parent, base = os.path.split(hour_dir)
                    self._sweep_stale_staging(parent, base)
                    try:
                        if not os.listdir(parent):
                            os.rmdir(parent)
                    except OSError:
                        pass  # repopulated concurrently: leave it
                    stats["hours_vanished"] += 1
                    continue
                missing_file = (isinstance(exc, FileNotFoundError)
                                or "FILE_NOT_EXIST" in msg
                                or "FileNotFound" in msg)
                if missing_file and os.path.isdir(hour_dir):
                    # the hour is still THERE but a listed file is
                    # gone: a concurrent compact won the swap while
                    # this one was reading (crons racing the same
                    # slice). The winner rewrote the same logical
                    # rows, so skipping is lossless — count it so
                    # operators see the contention (r10 matrix soak).
                    # STRICTLY missing-file class: a broader OSError
                    # (EACCES/ENOSPC) here is a real failure and must
                    # propagate, not be re-badged as contention
                    stats["hours_contended"] += 1
                    continue
                raise
        return stats

    @staticmethod
    def _sweep_stale_staging(parent: str, base: str,
                             max_age_s: float = 3600.0) -> None:
        """Remove CRASH leftovers of compact staging (unique-suffixed
        hidden dirs) older than ``max_age_s``. Fresh staging belongs
        to a live concurrent compact and must not be touched — the
        old unconditional rmtree of the fixed staging name was
        exactly the cross-process corruption (see _compact_hour).

        Only ``._compact_tmp.*`` dirs are ever DELETED. A stale
        ``._compact_old.*`` dir is an INTEGRITY SIGNAL, not garbage: a
        fallback swap that crashed between rename(hour->old) and
        rename(tmp->hour) leaves old as the SOLE copy of the hour
        (r11 advice — the age sweep used to reap it, a permanent
        silent loss). Recovery: if the hour name is free, rename old
        back into place (lossless — old holds exactly the pre-compact
        rows); if the hour was recreated meanwhile, leave the residue
        and warn loudly so an operator reconciles instead of the
        sweep destroying data."""
        import shutil
        import time as _time
        import warnings

        tmp_prefix = f".{base}._compact_tmp."
        old_prefix = f".{base}._compact_old."
        try:
            names = os.listdir(parent)
        except FileNotFoundError:
            return
        now = _time.time()
        for name in names:
            path = os.path.join(parent, name)
            try:
                stale = now - os.path.getmtime(path) > max_age_s
            except OSError:
                continue    # vanished / being swapped: not ours to clean
            if not stale:
                continue    # fresh: a live concurrent compact owns it
            if name.startswith(tmp_prefix):
                shutil.rmtree(path, ignore_errors=True)
            elif name.startswith(old_prefix):
                try:
                    # explicit existence check first (r11 advice):
                    # POSIX rename atomically REPLACES an empty
                    # existing dir, so a concurrent ingest's fresh
                    # makedirs(hour) would be silently renamed over
                    # (benign merge, but weaker than the quarantine
                    # contract claims). The OSError fallback still
                    # covers the lexists->rename race window.
                    if os.path.lexists(os.path.join(parent, base)):
                        raise OSError(f"{base} exists; quarantine")
                    # fails (ENOTEMPTY/EEXIST) when the hour exists —
                    # exactly the case where restoring would collide
                    os.rename(path, os.path.join(parent, base))
                except OSError:
                    # The residue may be a benign post-swap duplicate
                    # (crash after rename(tmp->hour), before
                    # rmtree(old)) or rows a later ingest diverged
                    # from — indistinguishable without reading, so
                    # QUARANTINE: move it out of the sweep prefix
                    # (warn fires once per incident, not per sweep)
                    # and preserve the bytes for the operator.
                    qname = name.replace("._compact_old.",
                                         "._quarantined_old.")
                    try:
                        os.rename(path, os.path.join(parent, qname))
                    except OSError:
                        qname = name    # rename failed: warn in place
                    warnings.warn(
                        f"stale compact residue {parent}/{qname} could "
                        f"not be restored over an existing {base}; it "
                        "may hold rows from an interrupted swap — "
                        "reconcile manually (never auto-deleted)",
                        RuntimeWarning, stacklevel=2)

    def _compact_hour(self, hour_dir: str, target_file_mb: int,
                      stats: dict) -> None:
        """Rewrite one hour partition in place (see ``compact``).

        Serialized per hour by an advisory lock file (r12): two
        uncoordinated compact crons hitting the same hour used to be
        benign (the swap loser's rmtree discarded the winner's
        same-logical-content output), but the straggler rescue below
        made that interleaving a SILENT DUPLICATION — the loser's
        doomed dir holds the winner's job-unique output parts, which
        are not in the loser's pinned listing and would be "rescued"
        back next to the loser's rewrite of the same rows. A rescue
        keyed on the pinned listing cannot distinguish a peer
        compactor's output from an ingest straggler (both are
        job-unique ``part-*.parquet``), so the overlap itself is
        removed: second compactor skips the hour
        (``stats["hours_locked"]``), next cron pass retakes it. The
        lock is dot-prefixed (invisible to listings) and stolen after
        ``TRITON_COMPACT_LOCK_TTL`` seconds (default 3600 — must
        exceed the worst-case single-hour rewrite) so a crashed
        holder never wedges compaction.

        Irreducible windows, documented not hidden (both a few
        syscalls wide, both bounded by the reader contract "one
        retry/fresh listing heals"): (a) a straggler that rides the
        swap is INVISIBLE between the exchange and its rescue rename
        — a listing in that instant under-counts by the straggler
        until the very next statement restores it; (b) a crash in
        that same instant leaves the straggler inside the stale
        staging dir where the age sweep will reap it with the doomed
        rewrite input — a manifest-less rename design cannot tell a
        straggler from already-rewritten input after the fact (a
        table format's atomic commit is the 100 TB answer, see
        ``compact``)."""
        parent, base = os.path.split(hour_dir)
        lock = self._acquire_hour_lock(parent, base)
        if lock is None:
            stats["hours_locked"] += 1
            return
        lock_path, lock_ino = lock
        try:
            self._compact_hour_locked(hour_dir, target_file_mb, stats)
        finally:
            # ownership-checked release (r12 review): if this rewrite
            # overran the TTL, a stealer cleared our lock and a NEW
            # holder may have created its own at the same path — a
            # blind unlink would delete the live peer's lock and let
            # a third compactor in. Only unlink the inode we created.
            try:
                if os.stat(lock_path).st_ino == lock_ino:
                    os.unlink(lock_path)
            except OSError:
                pass    # stolen after TTL overrun: stealer cleared it

    @staticmethod
    def _acquire_hour_lock(parent: str,
                           base: str) -> "tuple[str, int] | None":
        """Best-effort per-hour advisory lock: O_EXCL-create a hidden
        sibling file. Returns ``(lock_path, lock_inode)`` — release
        must verify the inode before unlinking — or None when the
        hour is unavailable this pass.

        Stale (crashed-holder) locks are REMOVED, not retaken: the
        stealer renames the lock to a stealer-unique name (atomic —
        one winner per inode), verifies BY INODE that it grabbed the
        same file it judged stale, unlinks it, and returns None; the
        hour compacts on the next cron pass through the plain O_EXCL
        path. Retaking in-place was a TOCTOU (r12 review): a second
        stealer whose staleness check predates the first stealer's
        re-create would rename the first stealer's FRESH lock away
        and let two compactors into the hour. The grabbed file is
        judged stale-or-live by its OWN mtime (inode comparison is
        porous — a fresh lock routinely reuses the freed inode); a
        live lock grabbed by mistake is restored with os.link —
        which, unlike rename, cannot clobber a third compactor's
        newly created lock."""
        import time as _time
        import uuid as _uuid

        ttl = float(os.environ.get("TRITON_COMPACT_LOCK_TTL", "3600"))
        path = os.path.join(parent, f".{base}._compact_lock")
        for _attempt in (0, 1):
            try:
                fd = os.open(path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
                os.write(fd, f"{os.getpid()}\n".encode())
                ino = os.fstat(fd).st_ino
                os.close(fd)
                return path, ino
            except FileExistsError:
                try:
                    st = os.stat(path)
                except OSError:
                    continue    # holder just released: one more try
                if _time.time() - st.st_mtime <= ttl:
                    return None
                grab = f"{path}.stale.{_uuid.uuid4().hex[:8]}"
                try:
                    os.rename(path, grab)
                    grabbed = os.stat(grab)
                except OSError:
                    return None    # lost the steal race
                # judge what we grabbed by ITS OWN mtime age, not by
                # inode identity: a fresh lock created between our
                # stat and rename routinely REUSES the freed inode
                # (observed on ext4/tmpfs — an inode compare passed
                # for a different, live file), but it cannot fake an
                # old mtime
                if _time.time() - grabbed.st_mtime <= ttl:
                    # we grabbed a LIVE lock: put it back without
                    # clobbering anyone (link fails on an existing
                    # path, unlike rename), then yield the hour
                    try:
                        os.link(grab, path)
                    except OSError:
                        pass    # a newer lock exists: theirs stands
                    try:
                        os.unlink(grab)
                    except OSError:
                        pass
                    return None
                try:
                    os.unlink(grab)
                except OSError:
                    pass
                return None    # stale lock cleared: next pass takes it
        return None

    def _compact_hour_locked(self, hour_dir: str, target_file_mb: int,
                             stats: dict) -> None:
        import math
        import shutil
        import warnings

        files = [f for f in os.listdir(hour_dir) if f.endswith(".parquet")]
        nbytes = sum(os.path.getsize(os.path.join(hour_dir, f))
                     for f in files)
        n_out = max(1, math.ceil(nbytes / (target_file_mb * 1024 * 1024)))
        if len(files) <= n_out:
            stats["hours"] += 1
            stats["files_before"] += len(files)
            stats["files_after"] += len(files)
            stats["bytes"] += nbytes
            return
        # DOT-PREFIXED basenames: Spark's listing prunes hidden
        # (., _) names, so neither staging dir is ever visible to
        # a concurrent cat. The old `hour=N._compact_tmp` siblings
        # parsed as BOGUS PARTITION VALUES — a reader overlapping
        # the post-commit-pre-swap (or pre-rmtree) window counted
        # the hour twice (measured: 20 rows from a 10-row hour).
        # UNIQUE-PER-ATTEMPT suffix (r10): two compact crons racing
        # the same hour used to share ONE fixed staging name — B's
        # entry rmtree deleted A's staged output mid-write, and A's
        # exchange could put B's HALF-WRITTEN tmp live: silent row
        # loss (reproduced by tools/stress_race_matrix.py before the
        # fix). With unique names each attempt stages privately; the
        # loser of the swap race just rewrites rows the winner
        # already compacted (same logical content) and any mid-swap
        # read fails LOUDLY and retries, never silently thinner.
        import uuid
        parent, base = os.path.split(hour_dir)
        token = f"{os.getpid():x}_{uuid.uuid4().hex[:8]}"
        tmp_dir = os.path.join(parent, f".{base}._compact_tmp.{token}")
        old_dir = os.path.join(parent, f".{base}._compact_old.{token}")
        self._sweep_stale_staging(parent, base)

        def _audit(msg):
            # TRITON_COMPACT_AUDIT=1 traces the swap sequence with
            # monotonic timestamps + inodes — the instrument that
            # localized the r10 torn-enumeration race when correlated
            # against tools/stress_race_matrix.py's watcher timeline.
            # Off (the default) it is a single env check per call.
            if not os.environ.get("TRITON_COMPACT_AUDIT"):
                return
            import time as _t

            def _ino(p):
                try:
                    return os.stat(p).st_ino
                except OSError:
                    return -1
            print(f"AUDIT t={_t.monotonic():.6f} {msg} "
                  f"hour_ino={_ino(hour_dir)} tmp_ino={_ino(tmp_dir)}",
                  flush=True)

        _audit("pre-write")
        # read PINNED to the entry listing (r12 ingest-compact soak):
        # reading the DIRECTORY let the scan pick up part files a
        # concurrent backfill ingest landed after `files` was taken,
        # making "what got rewritten" torn — with an explicit file
        # list, anything not in `files` is by construction a
        # straggler the rescue below must carry across the swap
        (self.spark.read.parquet(
            *[os.path.join(hour_dir, f) for f in files])
             .repartitionByRange(n_out, "_archive_sort")
             .write.parquet(tmp_dir))
        _audit("post-write")

        def _rescue_stragglers(doomed: str) -> int:
            # A concurrent backfill ingest (ingest_dataframe with an
            # old `when`) renames its part files directly into
            # hour_dir; one landing between the pinned listing and
            # the swap rides the swap into the doomed old dir, and
            # the rmtree below silently destroyed it (found by the
            # r12 ingest-compact race soak — the sink never hits this
            # because compact skips hot hours). Move anything not in
            # the rewrite's pinned listing back into the live hour:
            # names are job-unique, so no collisions, and the rows
            # were never in the rewrite, so no duplication. (The
            # peer-compactor's-output case that would alias as a
            # straggler here is excluded by the hour lock above.)
            # Returns the number of stragglers that could NOT be
            # moved yet still exist (destination-side failure: hour
            # dir removed by a concurrent expire, EACCES, ENOSPC) —
            # the caller must then quarantine the doomed dir instead
            # of rmtree'ing the only copy of those rows.
            try:
                names = os.listdir(doomed)
            except OSError:
                return 0    # already gone: nothing rescuable
            stuck = 0
            for fn in names:
                if (fn.endswith(".parquet") and fn not in known
                        and not fn.startswith((".", "_"))):
                    try:
                        os.rename(os.path.join(doomed, fn),
                                  os.path.join(hour_dir, fn))
                        stats["files_rescued"] += 1
                    except OSError:
                        if os.path.lexists(os.path.join(doomed, fn)):
                            stuck += 1
                        # else: straggler vanished — its writer owns it
            return stuck

        def _discard_doomed(doomed: str) -> None:
            # rmtree only when every straggler got out; otherwise
            # quarantine the whole dir (same convention, and same
            # never-auto-deleted prefix, as the stale-residue sweep)
            if _rescue_stragglers(doomed):
                qname = os.path.basename(doomed).replace(
                    "._compact_tmp.", "._quarantined_old.").replace(
                    "._compact_old.", "._quarantined_old.")
                qpath = os.path.join(parent, qname)
                try:
                    os.rename(doomed, qpath)
                except OSError:
                    # second chance under a fresh name (collision is
                    # one failure mode), because a `._compact_tmp.`
                    # name left in place is SWEEP-ELIGIBLE — the age
                    # sweep would rmtree it once stale, silently
                    # destroying the straggler the quarantine exists
                    # to preserve (r12 review)
                    import uuid as _uuid
                    qpath = os.path.join(
                        parent, f"{qname}.{_uuid.uuid4().hex[:8]}")
                    try:
                        os.rename(doomed, qpath)
                    except OSError:
                        qpath = None
                if qpath is None:
                    # cannot leave the sweep prefix: buy a fresh TTL
                    # window and say HONESTLY that preservation is
                    # now time-bounded, not permanent
                    try:
                        os.utime(doomed)
                    except OSError:
                        pass
                    warnings.warn(
                        f"compact could not rescue straggler part "
                        f"files from {doomed} back into {hour_dir}, "
                        "and the quarantine rename also failed — the "
                        "residue still carries a staging name the "
                        "age sweep deletes once stale; reconcile "
                        "WITHIN the sweep TTL (3600s, mtime just "
                        "refreshed)", RuntimeWarning, stacklevel=3)
                else:
                    warnings.warn(
                        f"compact could not rescue straggler part "
                        f"files from {doomed} back into {hour_dir}; "
                        f"preserved at {qpath} — they may be the "
                        "only copy of a concurrently ingested batch; "
                        "reconcile manually (never auto-deleted)",
                        RuntimeWarning, stacklevel=3)
                stats["hours_quarantined"] += 1
            else:
                shutil.rmtree(doomed)

        known = set(files)
        if _exchange_dirs(tmp_dir, hour_dir):
            # atomic exchange: the partition is NEVER absent; the
            # old files (now under the hidden tmp name) vanish only
            # from readers' pre-swap path lists — one retry heals
            _audit("post-exchange pre-rmtree")
            _discard_doomed(tmp_dir)
            _audit("post-rmtree")
        else:
            # fallback pair of renames: a listing in the gap can
            # see the hour briefly absent
            os.rename(hour_dir, old_dir)
            try:
                os.rename(tmp_dir, hour_dir)
            except OSError:
                # old_dir is now the SOLE copy of the hour — put it
                # back before propagating so no crash window leaves
                # the rows only under a hidden name (r11 advice; the
                # stale-old sweep recovery is the backstop if this
                # rename also fails, e.g. the parent vanished)
                try:
                    os.rename(old_dir, hour_dir)
                except OSError:
                    pass
                raise
            _discard_doomed(old_dir)
        stats["hours"] += 1
        stats["files_before"] += len(files)
        stats["files_after"] += len(
            [f for f in os.listdir(hour_dir) if f.endswith(".parquet")])
        stats["bytes"] += nbytes

    def expire(self, stream: str, client: str, keep_after: _dt.date) -> dict:
        """Retention: drop whole date partitions strictly older than
        ``keep_after``. Partition-dir deletion only — never a scan, so
        cost is O(partitions dropped), not O(data); the 100 TB
        lifecycle job this models runs daily next to ``compact``. The
        reference has no retention at all (archives accumulate in S3
        forever); this is north-star data-lifecycle surface.
        """
        import shutil

        self._require_parquet("expire")
        slice_dir = os.path.join(
            self.root, f"stream={stream}", f"client={client}")
        cutoff = coerce_date(keep_after).strftime("%Y%m%d")
        stats = {"dropped": 0, "kept": 0}
        if "://" in self.root:
            # object stores: partition-dir DELETION is valid there
            # (unlike rename-based compact) — Hadoop FS twin of the
            # local walk (round-6; previously a URI root silently
            # no-op'd and retention never ran)
            jvm = self.spark._jvm
            hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
            for name in _hadoop_subdirs(self.spark, slice_dir):
                if not name.startswith("date="):
                    continue
                if name[len("date="):] < cutoff:
                    p = jvm.org.apache.hadoop.fs.Path(
                        os.path.join(slice_dir, name))
                    p.getFileSystem(hconf).delete(p, True)
                    stats["dropped"] += 1
                else:
                    stats["kept"] += 1
            return stats
        if not os.path.isdir(slice_dir):
            return stats
        for name in sorted(os.listdir(slice_dir)):
            if not name.startswith("date="):
                continue
            if name[len("date="):] < cutoff:
                target = os.path.join(slice_dir, name)
                # Deletion must be IDEMPOTENT against concurrent
                # maintenance: a peer expire may have dropped the date
                # between our listdir and here (FileNotFoundError on
                # the root), and a concurrent compact of the same date
                # renames entries (hour-dir swap, straggler rescue,
                # quarantine) WHILE our rmtree walk unlinks them — the
                # walk then hits paths that vanished mid-stream
                # (FileNotFoundError from a child) or a directory that
                # briefly re-gains an entry (ENOTEMPTY). The goal
                # state is simply "date dir gone": swallow
                # already-gone, retry once over a torn walk, and
                # surface anything persistent loudly.
                try:
                    shutil.rmtree(target)
                except FileNotFoundError:
                    pass        # peer got there first — goal state holds
                except OSError:
                    try:
                        shutil.rmtree(target)   # re-walk post-swap state
                    except FileNotFoundError:
                        pass
                if os.path.lexists(target):
                    raise OSError(
                        f"expire: {target} survived two deletion "
                        f"passes (concurrent writer resurrecting it?)")
                stats["dropped"] += 1
            else:
                stats["kept"] += 1
        return stats
