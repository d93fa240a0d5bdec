"""Stress the cat-vs-compact listing race (round 9).

Mimics test_store_compact_expire_cat_four_way_concurrency at ~30x the
swap rate: a fragmenting ingest + compact loop against two concurrent
readers asserting exact id-window counts every cat.  This harness
reproduced the full-suite soak failure (silent row loss ~1 per 300
swaps: local listStatus is list-then-stat, so Spark's listing could
swallow a mid-swap FileNotFound and return an empty hour) and then
verified the fix (cat now lists explicit file paths; 324 swaps, zero
losses).  NOTE: it deliberately violates compact's min_age contract
by ingesting into the compactable hour, so occasional LOUD
FAILED_READ_FILE transients remain expected here — the invariant this
guards is "never silently fewer rows".

    python tools/stress_cat_compact.py [seconds]
"""
import datetime as dt
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from go_triton_spark.session import get_spark  # noqa: E402
from go_triton_spark.engine import TritonEngine  # noqa: E402
from go_triton_spark.config import load_config  # noqa: E402
from go_triton_spark.types import EVENTS_SCHEMA  # noqa: E402

UTC = dt.timezone.utc
root = "/tmp/stress_cat_root"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)

spark = get_spark("stress-cat")
spark.sparkContext.setLogLevel("ERROR")
cfg = load_config(f"""
events:
  name: events
  source: file
  format: json
  path: {root}/incoming/events
""")
eng = TritonEngine(spark, root, config=cfg, client="archive")

now = dt.datetime.now(tz=UTC)
cold = now - dt.timedelta(hours=3)


def seed(when, start, n, files):
    rows = [(i, dt.datetime(2020, 1, 1, tzinfo=UTC), i % 7, "click",
             float(i), {"k": "v"}) for i in range(start, start + n)]
    df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    for i in range(files):
        eng.archive.ingest_dataframe(
            df.where(f"event_id % {files} = {i}"), "events", "archive",
            when=when + dt.timedelta(seconds=i))


seed(cold, 1000, 120, 6)

stop = threading.Event()
problems = []
swaps = [0]


def compactor():
    # alternate: re-fragment the cold hour by ingesting a tiny extra
    # file, then compact — keeps real swaps happening every loop
    k = [0]
    while not stop.is_set():
        try:
            k[0] += 1
            seed(cold, 5000 + k[0], 1, 1)     # 1-row file -> fragments
            eng.archive.compact("events", cold.date(), "archive",
                                min_age_hours=1.0)
            swaps[0] += 1
        except FileNotFoundError:
            pass
        except Exception as exc:  # noqa: BLE001
            problems.append("compact: " + type(exc).__name__ + ": " + str(exc)[:300])
        time.sleep(0.02)


def reader():
    lo = cold.date()
    hi = now.date()
    prev_base = 0
    while not stop.is_set():
        try:
            df = eng.cat("events", lo, hi, client="archive",
                         ordered=False)
            row = (df.agg(
                F.count(F.when((F.col("event_id") >= 1000)
                               & (F.col("event_id") < 1120), 1))
                 .alias("cold"),
                F.count(F.when(F.col("event_id") >= 5000, 1))
                 .alias("extra")).collect()[0])
            coldn, extran = row["cold"], row["extra"]
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            if "FILE_NOT_EXIST" in msg or "FileNotFound" in msg:
                continue  # documented retry race
            snap = {}
            for base_, dirs_, files_ in os.walk(root + "/archive"):
                rel = base_[len(root):]
                snap[rel] = sorted(files_)[:8]
            problems.append("cat: " + type(exc).__name__ + ": "
                            + str(exc)[:2500] + " TREE=" + repr(snap)[:600])
            continue
        if coldn != 120 or extran < prev_base:
            problems.append(f"LOSS: cold={coldn} extra={extran} "
                            f"(prev_extra={prev_base})")
        prev_base = max(prev_base, extran)


threads = [threading.Thread(target=f, daemon=True)
           for f in (compactor, reader, reader)]
for t in threads:
    t.start()
deadline = time.time() + float(sys.argv[1] if len(sys.argv) > 1 else 60)
while time.time() < deadline and not problems:
    time.sleep(0.5)
stop.set()
for t in threads:
    t.join(15)
print("swaps:", swaps[0], "problems:", problems[:5])
spark.stop()
shutil.rmtree(root, ignore_errors=True)
