#!/usr/bin/env python
"""Serving latency/throughput bench: boots the serve.py engine + HTTP server
in-process (random-init weights), fires concurrent /drive requests, and
reports p50/p95 latency + frames/s at the configured max_batch.

Usage: python tools/bench_serving.py [--image_size 256] [--bf16 true]
       [--max_batch 8] [--clients 16] [--requests 160]
"""
import argparse
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--tiny", type=lambda s: s.lower().startswith("t"), default=False)
    p.add_argument("--bf16", type=lambda s: s.lower().startswith("t"), default=True)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--window_ms", type=float, default=10.0)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=160)
    args = p.parse_args()

    import serve
    from http.server import ThreadingHTTPServer
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from facevae_tpu.config import Config, ModelConfig, tiny_config
    from facevae_tpu.train import create_train_state

    dtype = "bfloat16" if args.bf16 else "float32"
    cfg = tiny_config(image_size=args.image_size, compute_dtype=dtype) \
        if args.tiny else Config(model=ModelConfig(image_size=args.image_size,
                                                   compute_dtype=dtype))
    size = cfg.model.image_size
    state = create_train_state(cfg, seed=0)
    engine = serve.BatchedEngine(cfg, state, use_efe=True,
                                 max_batch=args.max_batch,
                                 window_ms=args.window_ms)
    print("warming up (compiles the batched graphs)...", flush=True)
    engine.warmup()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve.make_handler(engine, size))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    src = (rng.rand(size, size, 3) * 255).astype(np.uint8).tobytes()

    def post(path, body):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    post("/source?session=bench", src)
    frames = [(rng.rand(size, size, 3) * 255).astype(np.uint8).tobytes()
              for _ in range(8)]

    lat = []
    lock = threading.Lock()
    per_client = args.requests // args.clients

    def client(i):
        for j in range(per_client):
            t0 = time.monotonic()
            post("/drive?session=bench", frames[(i + j) % len(frames)])
            dt = time.monotonic() - t0
            with lock:
                lat.append(dt)

    # warm the serving path once through HTTP, then measure
    client(0)
    lat.clear()
    engine.stats.update(batches=0, frames=0, padded=0)
    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    lat_ms = np.sort(np.array(lat) * 1e3)
    n = len(lat_ms)
    fps = n / wall
    st = engine.stats
    print(f"serving bench: {size}² {dtype}, max_batch {args.max_batch}, "
          f"{args.clients} clients x {per_client} reqs")
    print(f"  p50 {lat_ms[n // 2]:.1f} ms   p95 {lat_ms[int(n * 0.95)]:.1f} ms"
          f"   mean {lat_ms.mean():.1f} ms")
    print(f"  throughput {fps:.2f} frames/s   batches {st['batches']} "
          f"(mean fill {st['frames'] / max(st['batches'], 1):.1f}/"
          f"{args.max_batch}, padded {st['padded']})")
    server.shutdown()
    engine.stop()


if __name__ == "__main__":
    main()
