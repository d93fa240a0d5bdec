"""CLI end-to-end test: store --once -> cat -> stats via the real CLI
entry point (subprocess-free: call main() with env patched)."""

import datetime as dt
import json

import pytest


@pytest.fixture()
def cli_env(tmp_path, monkeypatch):
    cfg = tmp_path / "streams.yaml"
    cfg.write_text(f"""
events:
  name: events
  partition_key: user_id
  source: file
  format: json
  path: {tmp_path}/incoming/events
""")
    monkeypatch.setenv("TRITON_CONFIG", str(cfg))
    monkeypatch.setenv("TRITON_ROOT", str(tmp_path / "root"))
    monkeypatch.setenv("TRITON_CLIENT", "clitest")
    src = tmp_path / "incoming" / "events"
    src.mkdir(parents=True)
    with open(src / "b0.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"event_id": i, "ts": "2024-01-01T00:00:00Z",
                                "user_id": i, "event_type": "click",
                                "value": 1.0, "props": "{}"}) + "\n")
    return tmp_path


def test_cli_store_cat_stats(spark, cli_env, capsys):
    from go_triton_spark import cli

    assert cli.main(["store", "--stream", "events", "--once"]) == 0
    today = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%d")
    assert cli.main(["cat", "--stream", "events", "--start-date", today]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5
    assert json.loads(out[0])["event_type"] == "click"

    assert cli.main(["stats"]) == 0
    out = capsys.readouterr().out
    assert "clitest.events" in out and ".age:" in out


def test_cli_shards_local(spark, cli_env, capsys):
    from go_triton_spark import cli

    assert cli.main(["shards", "--stream", "events"]) == 0
    out = capsys.readouterr().out
    assert "shard-0000" in out


def test_cli_compact_and_expire(spark, cli_env, capsys):
    from go_triton_spark.cli import main

    # three ingests -> small files; compact then expire via the CLI
    for _ in range(3):
        assert main(["store", "--stream", "events", "--once"]) == 0
    today = dt.datetime.now(tz=dt.timezone.utc).strftime("%Y%m%d")
    # ingest is quiesced (store --once finished), so force the live
    # hour past the hot-hour guard with a negative min-age
    assert main(["compact", "--stream", "events", "--date", today,
                 "--min-age-hours", "-1"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["files_after"] <= stats["files_before"]
    assert stats["files_after"] >= 1

    tomorrow = (dt.datetime.now(tz=dt.timezone.utc)
                + dt.timedelta(days=1)).strftime("%Y%m%d")
    assert main(["expire", "--stream", "events", "--keep-after", tomorrow]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"dropped": 1, "kept": 0}


def test_cli_queries_listing(capsys):
    from go_triton_spark import cli

    assert cli.main(["queries", "--tag", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out and "dedup_minhash_lsh" in out
    assert "q1_pricing_summary" not in out  # tag filter applies

    assert cli.main(["queries"]) == 0
    assert "q1_pricing_summary" in capsys.readouterr().out


def test_cli_query_runs_and_limits(spark, capsys):
    from go_triton_spark import cli

    assert cli.main(["query", "agg_basic",
                     "--sf", "/root/testdata/sf0.001", "--limit", "2"]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert "o_orderstatus" in lines[0]

    assert cli.main(["query", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_triton_bucket_env_alias(monkeypatch):
    """TRITON_BUCKET is the reference's env name for the root
    (triton.go:194, :293); accept it as a TRITON_ROOT synonym."""
    from go_triton_spark import cli

    monkeypatch.delenv("TRITON_ROOT", raising=False)
    monkeypatch.delenv("TRITON_BUCKET", raising=False)
    assert cli._root() == "./triton-data"

    monkeypatch.setenv("TRITON_BUCKET", "/bucket/path")
    assert cli._root() == "/bucket/path"

    monkeypatch.setenv("TRITON_ROOT", "/root/path")  # ROOT wins when both set
    assert cli._root() == "/root/path"


def test_store_final_mirror_runs_when_stream_fails(monkeypatch, tmp_path):
    """A failed streaming query raises StreamingQueryException out of
    awaitTermination — the final checkpoint mirror must STILL run (the
    external DB matters most at the exact moment the stream dies), and
    the failure must still propagate to the caller."""
    from go_triton_spark import cli

    calls = {"mirror": 0, "stopped": 0}

    class _FailingQuery:
        def awaitTermination(self, timeout=None):
            raise RuntimeError("simulated StreamingQueryException")

    class _Pipe:
        query = _FailingQuery()

        def stop(self):
            calls["stopped"] += 1

    class _Eng:
        def store(self, *a, **kw):
            return _Pipe()

        def mirror_checkpoints(self, db):
            calls["mirror"] += 1
            return 1

    monkeypatch.setattr(cli, "_engine", lambda: _Eng())
    with pytest.raises(RuntimeError, match="simulated"):
        cli.main(["store", "--stream", "events",
                  "--checkpoint-db", str(tmp_path / "m.db")])
    assert calls["mirror"] == 1 and calls["stopped"] == 1


def test_store_mirrors_checkpoint_db_during_run(spark, cli_env, tmp_path):
    """--checkpoint-db must mirror DURING a long-running store (the
    reference's Checkpointer upserts continuously, checkpoint.go:27-76)
    — an external monitor polling the DB sees live rows, and rows
    survive a kill, not only a clean stop."""
    import sqlite3
    import threading
    import time

    from go_triton_spark import cli

    db = str(tmp_path / "live.db")
    done = threading.Event()

    def run():
        cli.main(["store", "--stream", "events",
                  "--checkpoint-db", db, "--mirror-interval", "0.5"])
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # poll the DB like an external monitor would — rows must appear
    # while the store is still running
    deadline = time.time() + 60
    rows = []
    while time.time() < deadline and not rows:
        if done.is_set():
            raise AssertionError("store exited before it was stopped")
        try:
            con = sqlite3.connect(db)
            rows = con.execute(
                "SELECT stream FROM triton_checkpoint").fetchall()
            con.close()
        except sqlite3.OperationalError:
            pass  # DB/table not created yet
        time.sleep(0.25)
    assert rows and rows[0][0] == "events"
    for q in spark.streams.active:  # terminate -> loop exits -> final mirror
        if q.name and q.name.startswith("store-events"):
            q.stop()
    assert done.wait(60)
    t.join(10)
