"""Producer client tests (tritond/client_test.go + mock.go parity)."""

import threading

import pytest

from go_triton_spark.config import load_config
from go_triton_spark.producer import Client, ClientClosedError, MockClient, NoopClient

YAML = """\
courier_activity:
  name: courier_activity_v2
  partition_key: delivery_uuid
"""


def test_put_and_flush_writes_files(tmp_path):
    c = Client(load_config(YAML), str(tmp_path), batch_size=100)
    rec = {"object_type": "delivery", "delivery_uuid": "u1", "version": 3,
           "data": {"couriers": ["a", "b", "c"]}}
    c.put("courier_activity", "u1", rec)
    c.close()
    files = list((tmp_path / "courier_activity_v2").glob("*.json"))
    assert len(files) == 1
    import json
    lines = files[0].read_text().strip().split("\n")
    assert json.loads(lines[0]) == rec  # nested round-trip equality


def test_put_after_close_raises(tmp_path):
    c = Client(load_config(YAML), str(tmp_path))
    c.close()
    with pytest.raises(ClientClosedError):
        c.put("courier_activity", "u1", {"x": 1})


def test_concurrent_puts_all_delivered(tmp_path):
    # client_test.go:45-80: 50 concurrent puts, all delivered
    c = Client(load_config(YAML), str(tmp_path), batch_size=7)
    def worker(i):
        c.put("courier_activity", f"p{i % 5}", {"i": i})
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(50)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    c.close()
    total = 0
    for f in (tmp_path / "courier_activity_v2").glob("*.json"):
        total += len(f.read_text().strip().split("\n"))
    assert total == 50


def test_mock_client_capture_and_reset():
    m = MockClient()
    m.put("s1", "p1", {"a": 1})
    m.put("s1", "p1", {"a": 2})
    m.put("s2", "p2", {"b": 1})
    assert m.stream_data == {"s1": [{"a": 1}, {"a": 2}], "s2": [{"b": 1}]}
    assert m.partition_count == {"p1": 2, "p2": 1}
    assert m.write_signal.qsize() == 3
    m.reset()
    assert m.stream_data == {} and m.partition_count == {}
    m.close()
    with pytest.raises(ClientClosedError):
        m.put("s1", "p1", {})


def test_noop_client():
    n = NoopClient()
    n.put("s", "p", {"x": 1})
    n.close()


def test_flush_is_atomic_no_visible_partial_on_crash(tmp_path, monkeypatch):
    """The file stream source reads each discovered path exactly once,
    so a batch file must become visible complete or not at all. A
    crash mid-flush must leave only a dot-temp (hidden from Spark
    listings), never a truncated visible .json."""
    import json as _json
    c = Client(load_config(YAML), str(tmp_path), batch_size=100)
    rec = {"object_type": "delivery", "delivery_uuid": "u1", "version": 1,
           "data": {}}
    for i in range(5):
        c.put("courier_activity", f"u{i}", rec)

    calls = {"n": 0}
    real_dumps = _json.dumps

    def exploding_dumps(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # die mid-batch
            raise RuntimeError("simulated crash mid-write")
        return real_dumps(*a, **kw)

    monkeypatch.setattr("go_triton_spark.producer.json.dumps",
                        exploding_dumps)
    with pytest.raises(RuntimeError):
        c.flush()
    out = tmp_path / "courier_activity_v2"
    assert list(out.glob("*.json")) == []  # nothing visible
    assert all(f.name.startswith(".") for f in out.iterdir())

    # recovery: a later flush (process that didn't die) re-delivers
    monkeypatch.setattr("go_triton_spark.producer.json.dumps", real_dumps)
    c.flush()
    files = list(out.glob("*.json"))
    assert len(files) == 1
    assert len(files[0].read_text().strip().split("\n")) == 5
