#!/usr/bin/env python
"""Verify the mm_jpeg_decode x50 superlinearity attribution (round-7
verdict, Next #5): is the 5.3x wall for 2.5x rows caused by the
per-doc ENCODE scaffolding (the bit-serial SOF2 writer that synthesizes
the gate corpus) growing with task batch size, or does DECODE itself
go superlinear?

Method: single-process, no Spark — isolate the per-doc CPU halves at
the two task-batch sizes the Arrow boundary actually produces at x20
(~3.1k docs/task) and x50 (~7.8k docs/task, 250k docs / 32 tasks).
For each batch size: (a) encode-only pass, (b) decode-only pass over
PRE-BUILT payloads, with gc stats around each. If decode per-doc time
is flat across batch sizes while encode grows, the attribution holds;
if decode grows too, the mm family needs an Arrow batch cap
(spark.sql.execution.arrow.maxRecordsPerBatch).

Usage: python tools/jpeg_scale_profile.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_triton_spark.codec.jpeg import build_jpeg_ycbcr, parse_jpeg  # noqa: E402
from go_triton_spark.operators.multimodal import _jpeg_gate_planes  # noqa: E402


def _run(batch: int) -> dict:
    doc_ids = list(range(batch))

    gc.collect()
    c0 = gc.get_count()
    t0 = time.time()
    payloads = []
    for doc_id in doc_ids:
        y, cb, cr = _jpeg_gate_planes(doc_id)
        prog = bool(doc_id % 2)
        payloads.append(build_jpeg_ycbcr(y, cb, cr, "4:2:0",
                                         progressive=prog,
                                         successive=prog))
    enc = time.time() - t0
    enc_gc = sum(gc.get_stats()[i]["collections"] for i in range(3))

    gc.collect()
    t0 = time.time()
    decoded = 0
    for p in payloads:
        m = parse_jpeg(p)
        decoded += m["n_pixels"]
    dec = time.time() - t0
    del c0
    return {"batch": batch,
            "encode_ms_per_doc": 1000 * enc / batch,
            "decode_ms_per_doc": 1000 * dec / batch,
            "gc_gen012_collections_total": enc_gc,
            "decoded_px": decoded}


def main() -> None:
    for batch in (800, 3100, 7800):
        r = _run(batch)
        print(f"batch={r['batch']:5d}  "
              f"encode {r['encode_ms_per_doc']:.3f} ms/doc  "
              f"decode {r['decode_ms_per_doc']:.3f} ms/doc  "
              f"(px={r['decoded_px']})")


if __name__ == "__main__":
    main()
