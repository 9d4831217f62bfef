#!/usr/bin/env python
"""Loader/decode throughput microbench (items/s at 256², PNG-dir dataset).

Answers the question VERDICT r3 asked: can the host pipeline feed the TPU
step (~2 steps/s x batch 8 = 16 items/s at 256²)?  Measures, per worker
count, items/s for:

  - thread pool (the PrefetchLoader default; PIL/imageio release the GIL
    during PNG decode)
  - process pool (the reference's DataLoader(num_workers=8) analog,
    /root/reference/train.py:16)
  - the actual PrefetchLoader end-to-end (decode + stack into batches)

Usage:
  python tools/make_synthetic_data.py /tmp/loaderbench --num_ids 50 \
      --clips_per_id 2 --frames 16 --size 256
  python tools/microbench_loader.py /tmp/loaderbench [--items 256]
"""
from __future__ import annotations

import argparse
import concurrent.futures as cf
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_pool(dataset, n_items: int, workers: int, kind: str) -> float:
    if kind == "thread":
        pool = cf.ThreadPoolExecutor(max_workers=workers)
    else:
        import multiprocessing as mp
        pool = cf.ProcessPoolExecutor(max_workers=workers,
                                      mp_context=mp.get_context("fork"))
    idxs = [i % len(dataset) for i in range(n_items)]
    with pool:
        # warm (page cache, worker spawn)
        list(pool.map(dataset.__getitem__, idxs[:workers]))
        t0 = time.perf_counter()
        for _ in pool.map(dataset.__getitem__, idxs):
            pass
        dt = time.perf_counter() - t0
    return n_items / dt


def bench_prefetch_loader(dataset, n_items: int, workers: int,
                          batch_size: int = 8) -> float:
    from facevae_tpu.data import PrefetchLoader
    loader = PrefetchLoader(dataset, batch_size=batch_size,
                            num_workers=workers)
    n_batches = min(len(loader), max(1, n_items // batch_size))
    it = iter(loader)
    next(it)                                  # warm the prefetch window
    t0 = time.perf_counter()
    got = 1
    for batch in it:
        got += 1
        if got >= n_batches:
            break
    dt = time.perf_counter() - t0
    return (got - 1) * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir")
    ap.add_argument("--items", type=int, default=256)
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 4, 8, 16])
    ap.add_argument("--uint8", action="store_true",
                    help="bench the uint8 on-device-aug item path")
    args = ap.parse_args()

    from facevae_tpu.data import FramesDataset, DatasetRepeater
    kw = dict(frame_shape=(256, 256, 3))
    if args.uint8:
        kw["on_device_aug"] = True
    else:
        kw["augmentation_params"] = {}
    dataset = DatasetRepeater(FramesDataset(args.root_dir, **kw), 100)

    # single item: decode cost floor
    t0 = time.perf_counter()
    for i in range(16):
        dataset[i]
    per_item = (time.perf_counter() - t0) / 16
    print(f"single-thread item latency: {per_item*1e3:.1f} ms "
          f"({1/per_item:.1f} items/s)")

    for w in args.workers:
        th = bench_pool(dataset, args.items, w, "thread")
        pr = bench_pool(dataset, args.items, w, "process")
        pl = bench_prefetch_loader(dataset, args.items, w)
        print(f"workers={w:3d}  thread {th:7.1f} it/s   process {pr:7.1f} it/s"
              f"   PrefetchLoader {pl:7.1f} it/s")


if __name__ == "__main__":
    main()
