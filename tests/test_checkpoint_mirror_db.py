"""DB-URL checkpoint mirror: scheme dispatch (triton.go:58-83), the
postgres statement shapes (via a DB-API dialect stub — no server in
the sandbox), and the TRITON_DB env wiring (triton.go:200-243).

These run without a SparkSession: the checkpoint layout is fabricated
on disk exactly as Structured Streaming writes it
(<root>/<stream>-<client>/offsets/<batchid>).
"""

import os

import pytest

from go_triton_spark.streaming.checkpoints import (CREATE_TABLE_STMT,
                                                   connect_db,
                                                   mirror_to_db,
                                                   stats_from_db)


def _fake_checkpoints(root, streams=(("events", "archive"),)):
    for stream, client in streams:
        d = os.path.join(str(root), f"{stream}-{client}", "offsets")
        os.makedirs(d)
        for batch in ("0", "1", "7"):
            with open(os.path.join(d, batch), "w") as fh:
                fh.write("v1\n{}")
    return str(root)


def test_sqlite_url_form_round_trip(tmp_path):
    """sqlite:// URLs (the reference's default form, triton.go:203)
    land in the named file and stats read back through the same URL."""
    import sqlite3

    root = _fake_checkpoints(tmp_path / "ck",
                             [("events", "archive"), ("clicks", "etl")])
    db = str(tmp_path / "mirror.db")
    n = mirror_to_db(root, f"sqlite://{db}")
    assert n == 2
    con = sqlite3.connect(db)
    rows = con.execute("SELECT client, stream, seq_num "
                       "FROM triton_checkpoint ORDER BY stream").fetchall()
    con.close()
    assert rows == [("etl", "clicks", "7"), ("archive", "events", "7")]
    ages = stats_from_db(f"sqlite://{db}")
    assert set(ages) == {"etl.clicks.batch.age", "archive.events.batch.age"}
    assert all(0 <= v < 3600 for v in ages.values())
    # client filter matches GetCheckpointStats' WHERE clause
    assert set(stats_from_db(f"sqlite://{db}", client="etl")) \
        == {"etl.clicks.batch.age"}


class _StubCursor:
    def __init__(self, log, rows):
        self.log, self.rows = log, rows

    def execute(self, sql, params=()):
        self.log.append(("execute", sql, params))

    def executemany(self, sql, seq):
        seq = list(seq)
        self.log.append(("executemany", sql, seq))
        self.rows.extend(seq)

    def fetchall(self):
        return [(c, s, sh, up) for (c, s, sh, _seq, up) in self.rows]


class _StubCon:
    """Minimal DB-API connection the way psycopg exposes it: cursor(),
    transaction context manager, close()."""

    def __init__(self):
        self.log, self.rows, self.closed = [], [], False

    def cursor(self):
        return _StubCursor(self.log, self.rows)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        self.closed = True


def test_postgres_dialect_statement_shapes(tmp_path):
    """Through the injected connection, the postgres path must issue
    the verbatim reference DDL and a %s-parameterized upsert keyed on
    (client, stream, shard) — the statement shapes a real psycopg
    connection would receive."""
    root = _fake_checkpoints(tmp_path / "ck")
    con = _StubCon()
    n = mirror_to_db(root, "postgres://db-host/triton",
                     _con=con, _placeholder="%s")
    assert n == 1 and con.closed
    kinds = [k for k, _, _ in con.log]
    assert kinds == ["execute", "executemany"]
    assert con.log[0][1] == CREATE_TABLE_STMT
    upsert = con.log[1][1]
    assert upsert.count("%s") == 5 and "?" not in upsert
    assert "ON CONFLICT (client, stream, shard) DO UPDATE" in upsert
    (row,) = con.log[1][2]
    assert row[0] == "archive" and row[1] == "events" and row[3] == "7"
    # stats through the same stub: %s placeholder in the WHERE clause
    con2 = _StubCon()
    con2.rows.extend(con.rows)
    ages = stats_from_db("postgres://db-host/triton", client="archive",
                         _con=con2, _placeholder="%s")
    assert set(ages) == {"archive.events.batch.age"}
    assert "WHERE client = %s" in con2.log[-1][1]


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError, match="Unknown db scheme"):
        connect_db("mysql://host/db")


def test_postgres_url_needs_driver():
    """Without psycopg installed the postgres scheme fails loudly at
    connect time, not silently at first query."""
    try:
        import psycopg  # noqa: F401
        pytest.skip("psycopg installed — dispatch would try a real connect")
    except ImportError:
        pass
    try:
        import psycopg2  # noqa: F401
        pytest.skip("psycopg2 installed — dispatch would try a real connect")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="psycopg"):
        connect_db("postgres://localhost/triton")


def test_cli_stats_reads_triton_db_env(tmp_path, monkeypatch):
    """`triton-spark stats` with no --mirror-db falls back to
    $TRITON_DB (triton.go:200-243 EnvVar wiring)."""
    from go_triton_spark import cli

    calls = {}

    class _Eng:
        def mirror_checkpoints(self, url):
            calls["url"] = url
            return 0

        def stats(self, client=None):
            return {}

    monkeypatch.setattr(cli, "_engine", lambda *a, **k: _Eng())
    monkeypatch.setenv("TRITON_DB", "sqlite://env-mirror.db")
    assert cli.main(["stats"]) == 0
    assert calls["url"] == "sqlite://env-mirror.db"
    # explicit flag still wins over the env var
    calls.clear()
    assert cli.main(["stats", "--mirror-db", "sqlite://flag.db"]) == 0
    assert calls["url"] == "sqlite://flag.db"


# ---- strict per-flavor statement-stream stubs (round-5 hardening) ----
#
# These model the two postgres drivers' transaction protocols exactly
# and FAIL on any statement drift from the reference Checkpointer
# (triton/checkpoint.go:27-76): implicit BEGIN at the first statement
# in a transaction, COMMIT at `with con:` exit, and — the flavor
# difference — psycopg (v3) also CLOSES the connection at with-exit
# while psycopg2 only commits.

_PG_UPSERT = (
    "INSERT INTO triton_checkpoint "
    "(client, stream, shard, seq_num, updated) "
    "VALUES (%s, %s, %s, %s, %s) "
    "ON CONFLICT (client, stream, shard) DO UPDATE SET "
    "seq_num = excluded.seq_num, updated = excluded.updated")
_PG_SELECT = "SELECT client, stream, shard, updated FROM triton_checkpoint"
_PG_SELECT_CLIENT = _PG_SELECT + " WHERE client = %s"


class _StrictPgCursor:
    def __init__(self, con):
        self.con = con

    def _statement(self, sql, params):
        allowed = (CREATE_TABLE_STMT, _PG_UPSERT,
                   _PG_SELECT, _PG_SELECT_CLIENT)
        assert sql in allowed, f"statement drift from checkpoint.go: {sql!r}"
        assert "?" not in sql, "sqlite placeholder leaked to postgres"
        if not self.con.in_tx:
            self.con.stream.append("BEGIN")  # drivers BEGIN implicitly
            self.con.in_tx = True
        self.con.stream.append(sql)

    def execute(self, sql, params=()):
        self._statement(sql, params)
        self.con.last_params = tuple(params)

    def executemany(self, sql, seq):
        seq = list(seq)
        self._statement(sql, seq)
        self.con.pending.extend(seq)

    def fetchall(self):
        # a SELECT in the same transaction sees its own pending writes
        return [(c, s, sh, up)
                for (c, s, sh, _q, up) in self.con.rows + self.con.pending]


class _StrictPgCon:
    close_on_exit = True  # psycopg (v3) semantics

    def __init__(self):
        self.stream, self.rows = [], []
        self.pending = []  # uncommitted writes; COMMIT lands them,
        self.in_tx = False  # ROLLBACK discards them (real tx semantics)
        self.close_calls = 0

    def cursor(self):
        return _StrictPgCursor(self)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.stream.append("COMMIT")
            self.rows.extend(self.pending)
        else:
            self.stream.append("ROLLBACK")
        self.pending = []
        self.in_tx = False
        if self.close_on_exit:
            self.close_calls += 1
        return False

    def close(self):
        self.close_calls += 1


class _StrictPg2Con(_StrictPgCon):
    close_on_exit = False  # psycopg2: with-exit commits, does NOT close


@pytest.mark.parametrize("con_cls", [_StrictPgCon, _StrictPg2Con],
                         ids=["psycopg3", "psycopg2"])
def test_postgres_full_transaction_stream(tmp_path, con_cls):
    """Exact wire-order a real driver would see for one mirror:
    BEGIN -> verbatim reference DDL -> one %s upsert -> COMMIT, then
    the connection is closed regardless of driver flavor (psycopg2's
    with-exit does not close, so mirror_to_db must close explicitly)."""
    root = _fake_checkpoints(tmp_path / "ck")
    con = con_cls()
    n = mirror_to_db(root, "postgres://db-host/triton",
                     _con=con, _placeholder="%s")
    assert n == 1
    assert con.stream == ["BEGIN", CREATE_TABLE_STMT, _PG_UPSERT, "COMMIT"]
    assert con.close_calls >= 1
    (row,) = con.rows
    assert row[0] == "archive" and row[1] == "events" and row[3] == "7"


class _FakeOperationalError(Exception):
    """Stands in for psycopg.OperationalError (connection dropped)."""


class _DroppingPgCursor(_StrictPgCursor):
    def execute(self, sql, params=()):
        super().execute(sql, params)
        self.con.maybe_drop(sql)

    def executemany(self, sql, seq):
        super().executemany(sql, seq)
        self.con.maybe_drop(sql)


def _dropping_con(base_cls, drop_on: str):
    class _Dropping(base_cls):
        def __init__(self):
            super().__init__()
            self.drop_on = drop_on

        def maybe_drop(self, sql):
            if self.drop_on and self.drop_on in sql:
                self.drop_on = None  # drop once, like a real blip
                raise _FakeOperationalError("server closed the connection")

        def cursor(self):
            return _DroppingPgCursor(self)

    return _Dropping()


@pytest.mark.parametrize("con_cls", [_StrictPgCon, _StrictPg2Con],
                         ids=["psycopg3", "psycopg2"])
@pytest.mark.parametrize("drop_on", ["CREATE TABLE", "INSERT INTO"],
                         ids=["during-ddl", "mid-upsert"])
def test_postgres_connection_drop_rolls_back_then_retry_converges(
        tmp_path, con_cls, drop_on):
    """Failure injection (VERDICT r5 ask #7): the connection drops
    mid-transaction — after the DDL or mid-upsert. Documented contract
    (single Go-style Tx, checkpoint.go:27-76): the error PROPAGATES
    (the caller decides retry policy — the CLI's live-mirror loop
    retries at its next interval), the transaction ROLLS BACK so the
    external table never shows partial state, the connection is still
    closed, and a plain retry of the same mirror converges because the
    upsert is idempotent on (client, stream, shard)."""
    root = _fake_checkpoints(tmp_path / "ck")
    con = _dropping_con(con_cls, drop_on)
    with pytest.raises(_FakeOperationalError):
        mirror_to_db(root, "postgres://db-host/triton",
                     _con=con, _placeholder="%s")
    assert con.stream[-1] == "ROLLBACK"
    assert con.rows == [] and con.pending == []   # no partial state
    assert con.close_calls >= 1                   # no leaked connection
    # the retry (fresh connection, same checkpoint dir) converges
    con2 = con_cls()
    n = mirror_to_db(root, "postgres://db-host/triton",
                     _con=con2, _placeholder="%s")
    assert n == 1
    assert con2.stream == ["BEGIN", CREATE_TABLE_STMT, _PG_UPSERT, "COMMIT"]
    (row,) = con2.rows
    assert row[0] == "archive" and row[1] == "events" and row[3] == "7"


@pytest.mark.parametrize("con_cls", [_StrictPgCon, _StrictPg2Con],
                         ids=["psycopg3", "psycopg2"])
def test_postgres_drop_between_select_and_upsert_in_stats(tmp_path, con_cls):
    """The monitor path: connection dies right after its SELECT —
    stats_from_db must propagate (stale-but-honest beats silently
    empty) and still close the connection."""
    con = _dropping_con(con_cls, "SELECT")
    con.rows.append(("archive", "events", "shardId-0", "7",
                     __import__("time").time()))
    with pytest.raises(_FakeOperationalError):
        stats_from_db("postgres://db-host/triton", client="archive",
                      _con=con, _placeholder="%s")
    assert con.close_calls >= 1


@pytest.mark.parametrize("con_cls", [_StrictPgCon, _StrictPg2Con],
                         ids=["psycopg3", "psycopg2"])
def test_postgres_stats_statement_stream(tmp_path, con_cls):
    """GetCheckpointStats parity (checkpoint.go:127-151): one SELECT,
    %s-parameterized client filter, connection closed after."""
    con = con_cls()
    con.rows.append(("archive", "events", "shardId-0", "7",
                     __import__("time").time()))
    ages = stats_from_db("postgres://db-host/triton", client="archive",
                         _con=con, _placeholder="%s")
    assert set(ages) == {"archive.events.shardId-0.age"}
    assert con.stream == ["BEGIN", _PG_SELECT_CLIENT]
    assert con.last_params == ("archive",)
    assert con.close_calls >= 1
