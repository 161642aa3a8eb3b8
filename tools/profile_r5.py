"""Round-5 throughput profiling: where does the FT8 decode window go?

Times, on the real chip in THIS process (run it fresh — the axon client
leaks per jit call and a bloated process slows device calls):

  - pass-1 device program alone (decode_arrays_device, block_until_ready)
  - full decode() (depth passes + subtraction + host unpack)
  - optional variants via CLI: --no-refine --topk N --batch N --depth N

Usage: python tools/profile_r5.py [--no-refine] [--topk N] [--batch N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-refine", action="store_true")
    ap.add_argument("--topk", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--bp-iters", type=int, default=0)
    ap.add_argument("--osd-j", type=int, default=-1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cwsl_digi_tpu import jaxcache

    jaxcache.enable()
    import jax

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from bench_sections import make_busy_windows

    from cwsl_digi_tpu.modes import ft8

    dec = ft8.FT8Decoder()
    spec = dec.spec
    if args.no_refine:
        spec = dataclasses.replace(spec, refine=False)
    if args.topk:
        spec = dataclasses.replace(spec, top_k=args.topk)
    if args.depth:
        spec = dataclasses.replace(spec, depth=args.depth)
    if args.bp_iters:
        spec = dataclasses.replace(spec, bp_iters=args.bp_iters)
    if args.osd_j >= 0:
        spec = dataclasses.replace(spec, osd_j=args.osd_j)
    if spec is not dec.spec:
        dec = ft8.FT8Decoder(spec=spec)
    batch = args.batch or dec.max_device_batch
    print(f"spec: refine={spec.refine} top_k={spec.top_k} depth={spec.depth} "
          f"bp_iters={spec.bp_iters} osd_j={spec.osd_j} batch={batch} "
          f"max_device_batch={dec.max_device_batch}", flush=True)

    batches = [make_busy_windows(batch, seed=5 + i)
               for i in range(args.reps + 1)]

    # --- pass-1 device program only ---------------------------------------
    t0 = time.perf_counter()
    out = dec.decode_arrays_device(batches[0])
    np.asarray(out["valid"])            # real sync: force a device fetch
    print(f"pass1 compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for i in range(args.reps):
        a = jax.numpy.asarray(batches[1 + i % args.reps])
        np.asarray(a[0, :1])            # settle the upload
        t0 = time.perf_counter()
        out = dec.decode_arrays_device(a)
        np.asarray(out["valid"])
        ts.append(time.perf_counter() - t0)
    print(f"pass1+validfetch: {1e3 * min(ts) / batch:.2f} ms/win "
          f"(runs: {[round(1e3 * t / batch, 2) for t in ts]})", flush=True)

    # --- full decode() ----------------------------------------------------
    t0 = time.perf_counter()
    res = dec.decode(batches[0])
    print(f"decode() compile+run: {time.perf_counter() - t0:.1f}s "
          f"({sum(len(r) for r in res)} decodes)", flush=True)
    ts = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        dec.decode(batches[1 + i])
        ts.append(time.perf_counter() - t0)
    print(f"decode() full: {1e3 * min(ts) / batch:.2f} ms/win "
          f"(runs: {[round(1e3 * t / batch, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
