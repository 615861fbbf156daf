"""Serving daemon under concurrent load: coalesced vs per-request dispatch.

Measures the thing VERDICT r2 weak #3 called out: N concurrent
single-query HTTP requests used to cost N device dispatches through a
relay with a ~1.5 ms floor. With the BatchCoalescer they merge into ~2
dispatches per window. This bench runs a real ThreadingHTTPServer +
RetrievalService over a DEVICE-GENERATED corpus (the relay cannot upload
a 100k x 512 corpus at 64 KB/s) and fires concurrent /search requests,
printing one JSON line per mode with p50/p95 latency and achieved RPS.

Usage: python benchmarks/bench_serving.py [n_corpus] [clients]
       [requests_per_client] [precision] [proto]

``precision`` (fp32 | int8 | int4) serves the corpus through the
quantized index layouts — the production capacity modes under real
HTTP load. ``proto`` (1.1 | 1.0 | both) pins the server's HTTP
protocol version: clients hold PERSISTENT http.client connections, so
1.0 (server closes after every reply; the pre-round-4 behavior)
measures the per-request TCP handshake wall that 1.1 keep-alive
removes; "both" runs the A/B.
"""

from __future__ import annotations

import json
import sys
import threading
import time


def main() -> None:
    import http.client
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.parallel.retrieval import RetrievalIndex
    from tpualign.serving.server import BatchCoalescer, RetrievalService
    from tpualign.serving import serve

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reqs = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    prec = sys.argv[4] if len(sys.argv) > 4 else "fp32"
    proto_arg = sys.argv[5] if len(sys.argv) > 5 else "1.1"
    protos = ("HTTP/1.0", "HTTP/1.1") if proto_arg == "both" else (
        f"HTTP/{proto_arg}",)
    d = 512

    @jax.jit
    def make_corpus(key):
        c = jax.random.normal(key, (n, d), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        if prec == "int8":
            sc = jnp.maximum(
                jnp.max(jnp.abs(c), axis=1, keepdims=True) / 127.0, 1e-12)
            return (jnp.clip(jnp.rint(c / sc), -127, 127).astype(jnp.int8),
                    sc[:, 0])
        if prec == "int4":
            sc = jnp.maximum(
                jnp.max(jnp.abs(c), axis=1, keepdims=True) / 7.0, 1e-12)
            qv = jnp.clip(jnp.rint(c / sc), -7, 7).astype(jnp.int32) + 8
            return ((qv[:, : d // 2] | (qv[:, d // 2:] << 4)
                     ).astype(jnp.uint8), sc[:, 0])
        return c, None

    corpus, cscales = make_corpus(jax.random.PRNGKey(0))
    keys_dev = jnp.zeros((n,), jnp.int32)

    def make_index() -> RetrievalIndex:
        # corpus stays on device: bypass __init__ (which would fetch to
        # host); this is exactly the resident layout __init__ produces
        index = RetrievalIndex.__new__(RetrievalIndex)
        index.n = n
        index.dim = d
        index.mesh = None
        index.precision = prec
        index.recall_target = None
        index.refine = 0
        index._refine_corpus = None
        index.vocab = {}
        index._corpus_scales = cscales
        index._approx_warned = set()
        index._n_local = n
        index._corpus = corpus
        index._keys = keys_dev
        return index

    rng = np.random.default_rng(1)
    queries = rng.normal(size=(clients * reqs, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    import os
    mode_set = ((None, 0), (2.0, 4), (2.0, 8))
    if os.environ.get("BENCH_SERVING_MODES") == "quick":
        mode_set = ((None, 0), (2.0, 4))  # transport A/B: 2 modes suffice
    modes = [(proto, window_ms, pipeline)
             for proto in protos
             for window_ms, pipeline in mode_set]
    for proto, window_ms, pipeline in modes:
        svc = RetrievalService(
            np.zeros((1, d), np.float32), ["c0"], ["m"], [1],
            coalesce_window_ms=window_ms,
        )
        svc.index = make_index()
        svc.chunk_ids = [f"c{i}" for i in range(n)]
        if window_ms is not None:
            svc.coalescer = BatchCoalescer(
                svc.index.search_encoded, window_ms=window_ms,
                pipeline=pipeline,
            )
        else:
            svc.coalescer = None

        httpd = serve(svc, host="127.0.0.1", port=0)
        # protocol A/B lever: HTTP/1.0 restores the pre-round-4
        # connection-per-request behavior (stdlib closes after every
        # reply); HTTP/1.1 (the shipped default) keeps connections alive
        httpd.RequestHandlerClass.protocol_version = proto
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"

        # warm up the executable
        body = json.dumps({
            "embeddings": queries[:1].tolist(), "k": 10, "global": True,
        }).encode()
        req = urllib.request.Request(
            f"{base}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=900).read()  # first hit compiles remotely (1-3+ min)
        if svc.coalescer is not None:
            # pre-compile every power-of-two batch executable the load can
            # produce — otherwise the first batch of each size pays a
            # multi-minute remote compile inside the measured window
            sz = 8
            while sz <= min(svc.coalescer.max_batch, clients * 2):
                svc.coalescer.search(
                    queries[:sz], np.full(sz, -3, np.int32), 10
                )
                sz *= 2

        lats: list = []
        lock = threading.Lock()
        errors = []
        reconnects = [0]

        def client(ci: int):
            # PERSISTENT connection per client (the production client
            # shape): against an HTTP/1.1 server every request rides the
            # same TCP connection; an HTTP/1.0 server closes after each
            # reply, forcing a reconnect (counted) whose handshake is
            # the measured wall.
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                             timeout=300)
            # auto_open would silently re-handshake on a server-closed
            # connection; disable it so reconnects are COUNTED (and
            # their cost attributed) instead of hidden
            conn.auto_open = 0
            conn.connect()
            my_reconnects = 0
            try:
                for r in range(reqs):
                    q = queries[ci * reqs + r: ci * reqs + r + 1]
                    b = json.dumps({
                        "embeddings": q.tolist(), "k": 10, "global": True,
                    }).encode()
                    t0 = time.perf_counter()
                    for attempt in (0, 1):
                        try:
                            conn.request(
                                "POST", "/search", body=b,
                                headers={"Content-Type":
                                         "application/json"},
                            )
                            resp = conn.getresponse()
                            out = json.loads(resp.read())
                            break
                        except (http.client.NotConnected,
                                http.client.RemoteDisconnected,
                                ConnectionResetError,
                                BrokenPipeError) as e:
                            conn.close()
                            conn = http.client.HTTPConnection(
                                "127.0.0.1", port, timeout=300)
                            conn.auto_open = 0
                            conn.connect()
                            my_reconnects += 1
                            if attempt:
                                with lock:
                                    errors.append(str(e))
                                return
                        except Exception as e:  # pragma: no cover
                            with lock:
                                errors.append(str(e))
                            return
                    assert out["results"][0], "empty result"
                    with lock:
                        lats.append(time.perf_counter() - t0)
            finally:
                conn.close()
                with lock:
                    reconnects[0] += my_reconnects

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        httpd.shutdown()
        httpd.server_close()

        lats.sort()
        def pct(p):
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 2)

        print(json.dumps({
            "metric": "serving_concurrent_search",
            "precision": prec,
            "proto": proto,
            "reconnects": reconnects[0],
            "mode": (f"coalesced_p{pipeline}" if window_ms is not None
                     else "per_request"),
            "corpus": n, "clients": clients, "requests": len(lats),
            "errors": len(errors), "error_sample": errors[:1],
            "rps": round(len(lats) / wall, 1),
            "p50_ms": pct(0.5), "p95_ms": pct(0.95),
            "dispatches": (svc.coalescer.dispatches
                           if svc.coalescer else len(lats)),
        }), flush=True)


if __name__ == "__main__":
    main()
