"""End-to-end test of the serving driver (serve.py): boots the HTTP server
in-process at tiny config, registers a source, drives frames (checking
microbatching), and frontalizes."""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _post(port, path, body):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def test_serve_end_to_end(tmp_path):
    import serve
    from http.server import ThreadingHTTPServer
    from facevae_tpu.config import tiny_config
    from facevae_tpu.train import create_train_state

    cfg = tiny_config()
    size = cfg.model.image_size
    state = create_train_state(cfg, seed=0)
    engine = serve.BatchedEngine(cfg, state, use_efe=True, max_batch=4,
                                 window_ms=30.0)
    engine.warmup()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve.make_handler(engine, size))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        src = (rng.rand(size, size, 3) * 255).astype(np.uint8)

        # drive without a source -> 409
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/drive?session=a", src.tobytes())
        assert ei.value.code == 409

        out = json.loads(_post(port, "/source?session=a", src.tobytes()))
        assert out["ok"]

        # several concurrent drives -> served (and microbatched together)
        frames = [(rng.rand(size, size, 3) * 255).astype(np.uint8)
                  for _ in range(3)]
        results = [None] * 3

        def hit(i):
            results[i] = _post(port, "/drive?session=a", frames[i].tobytes())

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for r in results:
            img = np.frombuffer(r, np.uint8).reshape(size, size, 3)
            assert img.min() >= 0 and img.max() <= 255
        assert engine.stats["frames"] == 3

        # concurrent frontalizes -> batched through the collector (not the
        # HTTP thread): frames counter advances, no per-request batch-1 path
        before = engine.stats["batches"]
        fronts = [None] * 3

        def hit_front(i):
            fronts[i] = _post(port, "/frontalize", frames[i].tobytes())

        threads = [threading.Thread(target=hit_front, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for r in fronts:
            assert len(r) == size * size * 3
        assert engine.stats["frames"] == 6
        assert engine.stats["batches"] >= before + 1

        # health endpoint
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                    timeout=10) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["sessions"] == 1
    finally:
        server.shutdown()
        engine.stop()
