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
