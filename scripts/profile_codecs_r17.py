#!/usr/bin/env python
"""Driver-side cProfile of the Python codec hot paths (r17 opt, guide §1).

The multimodal/msgpack bench rows are Arrow-batched Python codec CPU —
the Spark plan is a zero-shuffle mapInPandas, so the win surface is the
per-byte Python, not the plan. This profiles each codec on the same
synthetic inputs the queries build (a bounded id sample), so the top of
the profile IS the bench row's hot loop.

Usage: python scripts/profile_codecs_r17.py [n_docs] [codec ...]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
ONLY = set(sys.argv[2:])

from redpanda_to_parquet_writer_spark.operators import multimodal as M  # noqa: E402
from redpanda_to_parquet_writer_spark.functions import msgpack_codec as MP  # noqa: E402

IDS = [i * 7 + 3 for i in range(N)]


def run(name, fn):
    if ONLY and name not in ONLY:
        return
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"\n=== {name}: {dt:.3f}s for {N} docs ({dt / N * 1e3:.2f} ms/doc)")
    pr = cProfile.Profile()
    pr.enable()
    fn()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(12)


def png_gray():
    for i in IDS:
        blob = M.encode_png_gray8(*M.synth_gray_image(i))
        M.decode_png_features(blob)


def png_adam7():
    for i in IDS:
        blob = M.encode_png_gray8(*M.synth_gray_image(i), interlace=True)
        M.decode_png_features(blob)


def png_rgb():
    for i in IDS:
        blob = M.encode_png_rgb8(*M.synth_rgb_image(i))
        M.decode_png_any_features(blob)


def jpeg_baseline():
    for i in IDS:
        w, h, px = M.synth_gray_image(i)
        blob = M.encode_jpeg_gray8(w, h, px)
        M.decode_jpeg_gray8(blob)


def webp():
    for i in IDS:
        w, h, px = M.synth_rgb_image(i)
        argb = M.rgb_to_argb(px) if hasattr(M, "rgb_to_argb") else None
        blob = M.encode_webp_lossless(w, h, px)
        M.decode_webp_lossless(blob)


def msgpack():
    for i in IDS:
        for j in range(50):  # events are tiny; amplify
            b = MP.packb({"t": f"type_{j % 7}", "v": float(i) + j / 3.0})
            MP.unpackb(b)


def main() -> None:
    run("png_gray_roundtrip", png_gray)
    run("png_adam7_roundtrip", png_adam7)
    run("png_rgb_roundtrip", png_rgb)
    try:
        run("jpeg_baseline_roundtrip", jpeg_baseline)
    except AttributeError as e:
        print("jpeg skip:", e)
    try:
        run("webp_roundtrip", webp)
    except Exception as e:  # noqa: BLE001
        print("webp skip:", type(e).__name__, e)
    run("msgpack_roundtrip", msgpack)


if __name__ == "__main__":
    main()
