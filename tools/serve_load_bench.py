"""Concurrent load bench for the scoring daemon (tasks/serve.py).

Fires N worker threads, each posting the same image M times through
``crossscore_tpu.client.ScoreClient``, and reports throughput + latency
percentiles plus the daemon's own dispatch stats (how well micro-batching
coalesced). Works against any running daemon — a CPU smoke daemon locally,
or a TPU host in production.

    python tools/serve_load_bench.py --url http://127.0.0.1:8642 \
        --image path/to/render.png --workers 8 --requests 16
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crossscore_tpu.client import ScoreClient  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8642")
    ap.add_argument("--image", required=True, help="query image file")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16, help="per worker")
    ap.add_argument("--map", action="store_true", help="fetch full npy maps")
    args = ap.parse_args()

    body = Path(args.image).read_bytes()
    client = ScoreClient(args.url)
    h0 = client.health()

    # one untimed warm request (a cold shape would otherwise bill its compile
    # to the first worker)
    client.score(body)

    lat: list[float] = []
    lat_lock = threading.Lock()
    errors: list[str] = []
    barrier = threading.Barrier(args.workers)

    def worker():
        barrier.wait()
        for _ in range(args.requests):
            t0 = time.perf_counter()
            try:
                if args.map:
                    client.score_map(body)
                else:
                    client.score(body)
            except Exception as e:  # keep the run going; report at the end
                with lat_lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            with lat_lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=worker) for _ in range(args.workers)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    h1 = client.health()
    lat.sort()
    n = len(lat)
    pct = lambda p: lat[min(n - 1, int(p * n))] * 1e3 if n else float("nan")
    print(
        json.dumps(
            {
                "requests_ok": n,
                "errors": len(errors),
                "wall_s": round(wall, 3),
                "throughput_rps": round(n / wall, 2) if wall > 0 else None,
                "latency_ms": {
                    "p50": round(pct(0.50), 1),
                    "p95": round(pct(0.95), 1),
                    "p99": round(pct(0.99), 1),
                    "max": round(lat[-1] * 1e3, 1) if n else None,
                },
                "daemon": {
                    "requests": h1["requests"] - h0["requests"],
                    "dispatches": h1["dispatches"] - h0["dispatches"],
                    "max_batch_seen": h1["max_batch_seen"],
                    "backend": h1["backend"],
                },
            }
        )
    )
    for e in errors[:5]:
        print(f"error: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
