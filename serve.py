#!/usr/bin/env python
"""Persistent batched inference server (production-serving driver).

The reference has no serving story (evaluate.py is one-shot); this wraps
InferencePipeline in a long-lived process with request microbatching so the
TPU sees full, static-shape batches:

  - requests queue up; a collector thread flushes when --max_batch requests
    are waiting or --batch_window_ms elapsed, pads the batch to max_batch
    (static shapes -> ONE compiled graph, no retraces), and fans results back.
  - sessions: POST /source registers a source face per session id (its
    appearance volume + keypoints are encoded once and cached on device);
    POST /drive?session=<id> animates the session's source with the posted
    driving frame.

stdlib-only HTTP (no extra deps).  Payloads are raw RGB bytes
(H*W*3, uint8, row-major, size from --image_size) or PNG (if imageio can
decode it); responses are raw RGB bytes of the generated frame.

Endpoints:
  GET  /healthz                  -> {"ok": true, "batch": N, ...}
  POST /source?session=<id>      -> register/replace the session's source
  POST /drive?session=<id>       -> animate; returns the generated frame
  POST /frontalize               -> frontalize the posted frame (stateless)

Usage:
  python serve.py --ckp_dir ckp --ckp 10 --port 8760 [--tiny true]
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="face-vae-tpu serving driver")
    p.add_argument("--ckp_dir", type=str, default="ckp")
    p.add_argument("--ckp", type=int, default=0)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--tiny", type=lambda s: s.lower().startswith("t"), default=False)
    p.add_argument("--use_efe", type=lambda s: s.lower().startswith("t"), default=True)
    p.add_argument("--port", type=int, default=8760)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_window_ms", type=float, default=10.0)
    p.add_argument("--random_init", type=lambda s: s.lower().startswith("t"),
                   default=False, help="skip checkpoint loading (smoke tests)")
    p.add_argument("--bf16", type=lambda s: s.lower().startswith("t"),
                   default=False,
                   help="bfloat16 inference (Pallas warp path on TPU; params "
                        "stay fp32)")
    return p.parse_args(argv)


class BatchedEngine:
    """Collects drive requests and runs them as one padded static batch."""

    def __init__(self, cfg, state, use_efe, max_batch, window_ms):
        import jax
        import jax.numpy as jnp
        from facevae_tpu.train.inference import InferencePipeline

        self.jnp = jnp
        self.cfg = cfg
        self.pipe = InferencePipeline(cfg, state, use_efe=use_efe)
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.sessions = {}            # session id -> (fs, kp_c, kp_s, Rs), batch 1
        self.lock = threading.Lock()
        self.requests: "queue.Queue" = queue.Queue()
        self.stats = {"batches": 0, "frames": 0, "padded": 0}
        self._stop = False
        size = cfg.model.image_size
        self._zero = jnp.zeros((1, size, size, 3), jnp.float32)
        self.collector = threading.Thread(target=self._run, daemon=True)
        self.collector.start()

    # -- session management ------------------------------------------------
    def set_source(self, session, img):
        enc = self.pipe.encode_source(img[None])
        with self.lock:
            self.sessions[session] = enc

    def has_session(self, session):
        with self.lock:
            return session in self.sessions

    # -- request path ------------------------------------------------------
    def _submit(self, kind, session, img, timeout):
        done = threading.Event()
        slot = {}
        self.requests.put((kind, session, img, slot, done))
        if not done.wait(timeout):
            raise TimeoutError("inference timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["out"]

    def drive(self, session, img, timeout=30.0):
        """Blocking: returns the generated frame [H,W,3] float32."""
        return self._submit("drive", session, img, timeout)

    def frontalize(self, img, timeout=30.0):
        """Blocking; batched through the collector like /drive (concurrent
        frontalize requests share one padded static-batch graph instead of
        contending with the collector at batch 1)."""
        return self._submit("front", None, img, timeout)

    def warmup(self):
        """Compile the batched graphs before serving traffic (a fresh
        256² compile takes minutes — don't use the serving timeout)."""
        self.set_source("_warm", self._zero[0])
        self.drive("_warm", self._zero[0], timeout=3600.0)
        self.frontalize(self._zero[0], timeout=3600.0)
        with self.lock:
            self.sessions.pop("_warm", None)
        self.stats.update(batches=0, frames=0, padded=0)

    # -- collector ---------------------------------------------------------
    def _run(self):
        # Per-kind pending lists: mixed /drive + /frontalize traffic batches
        # independently per graph instead of degrading to batch-1 flushes on
        # every kind switch.  A kind flushes when it reaches max_batch or its
        # oldest request has waited window_s; fuller kinds flush first.
        pending = {}              # kind -> [requests]
        deadlines = {}            # kind -> monotonic deadline of oldest request
        while not self._stop:
            timeout = 0.1
            if deadlines:
                timeout = min(0.1, max(0.0, min(deadlines.values())
                                       - time.monotonic()))
            try:
                req = self.requests.get(timeout=timeout)
            except queue.Empty:
                req = None
            while req is not None:   # drain everything already queued
                pending.setdefault(req[0], []).append(req)
                deadlines.setdefault(req[0], time.monotonic() + self.window_s)
                try:
                    req = self.requests.get_nowait()
                except queue.Empty:
                    req = None
            now = time.monotonic()
            ready = [k for k, b in pending.items()
                     if len(b) >= self.max_batch or now >= deadlines[k]]
            for kind in sorted(ready, key=lambda k: -len(pending[k])):
                batch = pending[kind][:self.max_batch]
                rest = pending[kind][self.max_batch:]
                if rest:
                    pending[kind] = rest
                    deadlines[kind] = time.monotonic() + self.window_s
                else:
                    del pending[kind], deadlines[kind]
                try:
                    self._flush(kind, batch)
                except Exception as e:                # fan the error out
                    for _, _, _, slot, done in batch:
                        slot["error"] = repr(e)
                        done.set()

    def _flush(self, kind, batch):
        import numpy as np
        jnp = self.jnp
        n = len(batch)
        pad = self.max_batch - n
        imgs = jnp.concatenate(
            [jnp.asarray(img, jnp.float32)[None] for _, _, img, _, _ in batch]
            + [self._zero] * pad, axis=0)
        if kind == "drive":
            with self.lock:
                encs = [self.sessions[s] for _, s, _, _, _ in batch]
            # stack session encodings + driving frames, pad to the static batch
            def cat(i):
                parts = [e[i] for e in encs] + [encs[-1][i]] * pad
                return jnp.concatenate(parts, axis=0)
            fs, kp_c, kp_s, Rs = (cat(i) for i in range(4))
            out = np.asarray(self.pipe.drive_frame(fs, kp_c, kp_s, Rs, imgs))
        else:
            out = np.asarray(self.pipe.frontalize_frame(imgs))
        self.stats["batches"] += 1
        self.stats["frames"] += n
        self.stats["padded"] += pad
        for i, (_, _, _, slot, done) in enumerate(batch):
            slot["out"] = out[i]
            done.set()

    def stop(self):
        self._stop = True


def _decode_image(body, size):
    import numpy as np
    raw_len = size * size * 3
    if len(body) == raw_len:
        a = np.frombuffer(body, np.uint8).reshape(size, size, 3)
        return a.astype(np.float32) / 255.0
    import imageio.v2 as imageio
    a = imageio.imread(io.BytesIO(body))
    if a.shape[:2] != (size, size):
        raise ValueError(f"expected {size}x{size}, got {a.shape}")
    return a[..., :3].astype(np.float32) / 255.0


def make_handler(engine, size):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):          # quiet
            pass

        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"ok": True, **engine.stats,
                                 "sessions": len(engine.sessions)})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            import numpy as np
            u = urlparse(self.path)
            q = parse_qs(u.query)
            session = q.get("session", ["default"])[0]
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            try:
                img = _decode_image(body, size)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            try:
                if u.path == "/source":
                    engine.set_source(session, img)
                    self._json(200, {"ok": True, "session": session})
                elif u.path == "/drive":
                    if not engine.has_session(session):
                        self._json(409, {"error": f"no source for session "
                                                  f"{session!r}; POST /source first"})
                        return
                    out = engine.drive(session, img)
                    self._send(200, (np.clip(out, 0, 1) * 255)
                               .astype(np.uint8).tobytes())
                elif u.path == "/frontalize":
                    out = np.asarray(engine.frontalize(img))
                    self._send(200, (np.clip(out, 0, 1) * 255)
                               .astype(np.uint8).tobytes())
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as e:
                self._json(500, {"error": repr(e)})

    return Handler


def main(argv=None):
    args = parse_args(argv)
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from facevae_tpu.config import Config, ModelConfig, tiny_config
    from facevae_tpu.train import create_train_state, load_checkpoint

    dtype = "bfloat16" if args.bf16 else "float32"
    cfg = tiny_config(image_size=args.image_size, compute_dtype=dtype) \
        if args.tiny else \
        Config(model=ModelConfig(image_size=args.image_size,
                                 compute_dtype=dtype))
    state = create_train_state(cfg, seed=0)
    if not args.random_init:
        state = load_checkpoint(args.ckp_dir, args.ckp, state)

    engine = BatchedEngine(cfg, state, args.use_efe, args.max_batch,
                           args.batch_window_ms)
    print("compiling batched graphs ...", flush=True)
    engine.warmup()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(engine, cfg.model.image_size))
    print(f"serving on {args.host}:{args.port} "
          f"(batch {args.max_batch}, window {args.batch_window_ms}ms)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
