"""Scale smoke: run EVERY registry query once at a given SF dir and
report failures and slow queries. The oracle gate proves correctness at
sf0.01; this proves the whole inventory *executes* at the bench scale
(bench.py times only the headline subset).

    python tools/smoke_all.py [sf_dir] [slow_threshold_seconds]
"""

import sys
import time

sys.path.insert(0, ".")

from go_triton_spark.session import get_spark  # noqa: E402
from go_triton_spark.operators import REGISTRY  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    spark = get_spark("smoke-all")
    spark.sparkContext.setLogLevel("ERROR")
    failed, slow = [], []
    for name, qd in REGISTRY.items():
        t0 = time.time()
        try:
            n = qd.spark(spark, sf).count()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failed.append((name, str(e).splitlines()[0][:120]))
            continue
        dt = time.time() - t0
        if dt > thresh:
            slow.append((name, round(dt, 1), n))
    for name, err in failed:
        print(f"FAIL  {name}: {err}")
    for name, dt, n in slow:
        print(f"SLOW  {name}: {dt}s ({n} rows)")
    print(f"{len(REGISTRY) - len(failed)}/{len(REGISTRY)} ran at {sf}; "
          f"{len(slow)} over {thresh}s")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
