"""Serving upload-wall probe (VERDICT r4 next #1).

The chip does ~470k CNV img/s chained; the server delivers ~8.4k because
each served batch pays a host→device input transfer through the axon
tunnel (~25 ms floor + ~30 MB/s effective). Round 4 overlapped only the
device→host FETCH leg; this probe measures the untried UPLOAD leg:

  a) device_put semantics: does the call block until the bytes land?
  b) bandwidth vs transfer size (is 30 MB/s a per-transfer constant or
     a small-transfer artifact?);
  c) concurrent streams: do k parallel device_put threads aggregate
     tunnel bandwidth or serialize?
  d) the serving cycle A/B (same-window, interleaved arms):
       serial    put→compute→fetch per batch
       overlap   put batch t+1 before fetching batch t
       resident  input already on device (upper bound w/o upload)
       threaded  dedicated uploader thread feeding a compute thread
                 (the {upload ∥ compute ∥ fetch} pipeline the server
                 would run)

Rows append to perf_results/upload_probe.jsonl with calib_ms/floor_ms
per docs/session_variance.md. Ref: the reference overlapped DMA with
compute by construction («foldedmv-offload.cpp» burst path, SURVEY C8).
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def calibrate():
    """Session state: 2048^3 bf16 matmul ms + chained-empty-launch ms."""
    import jax
    import jax.numpy as jnp
    a = jnp.zeros((2048, 2048), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return a @ a
    np.asarray(mm(a))
    t0 = time.perf_counter()
    outs = [mm(a) for _ in range(10)]
    np.asarray(outs[-1])
    calib_ms = (time.perf_counter() - t0) / 10 * 1e3

    @jax.jit
    def empty(x):
        return x + 1
    xe = jnp.zeros((8, 128), jnp.int32)
    np.asarray(empty(xe))
    t0 = time.perf_counter()
    outs = [empty(xe) for _ in range(30)]
    np.asarray(outs[-1])
    floor_ms = (time.perf_counter() - t0) / 30 * 1e3
    return round(calib_ms, 3), round(floor_ms, 3)


def _consume_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def consume(xs):
        return sum(x.astype(jnp.int32).sum() for x in xs)
    return consume


def probe_put_blocking(sizes_mb, emit):
    """Time the device_put CALL alone vs call+completion per size."""
    import jax
    consume = _consume_fn()
    for mb in sizes_mb:
        n = int(mb * 1e6)
        rows_call, rows_total = [], []
        for rep in range(3):
            x = np.random.default_rng(rep).integers(
                -128, 128, size=n).astype(np.int8)
            t0 = time.perf_counter()
            xd = jax.device_put(x)
            t_call = time.perf_counter() - t0
            np.asarray(consume([xd]))
            t_total = time.perf_counter() - t0
            rows_call.append(t_call)
            rows_total.append(t_total)
            del xd
        call_ms = sorted(rows_call)[1] * 1e3
        total_ms = sorted(rows_total)[1] * 1e3
        emit({"probe": "put_blocking", "size_mb": mb,
              "call_ms": round(call_ms, 2),
              "call_plus_consume_ms": round(total_ms, 2),
              "call_blocks": bool(call_ms > 0.8 * total_ms),
              "eff_MBps_total": round(mb / (total_ms / 1e3), 1)})


def probe_bw_curve(sizes_mb, emit, nbuf=6):
    """Effective MB/s when streaming nbuf distinct buffers of each size
    back-to-back (one consume launch + one scalar fetch at the end)."""
    import jax
    consume = _consume_fn()
    for mb in sizes_mb:
        n = int(mb * 1e6)
        bufs = [np.random.default_rng(i).integers(-128, 128, size=n)
                .astype(np.int8) for i in range(nbuf)]
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            devs = [jax.device_put(b) for b in bufs]
            np.asarray(consume(devs))
            dt = time.perf_counter() - t0
            rates.append(nbuf * mb / dt)
            del devs
        rates.sort()
        spread = (rates[-1] - rates[0]) / rates[1] if rates[1] else 0
        emit({"probe": "bw_curve", "size_mb": mb, "n_buffers": nbuf,
              "eff_MBps": round(rates[1], 1),
              "spread": round(spread, 3)})


def probe_concurrent(size_mb, emit, ks=(1, 2, 4), nbuf=4, reps=5):
    """k threads each device_put nbuf distinct buffers concurrently;
    aggregate MB/s vs k answers 'does the tunnel aggregate streams?'.
    Arms are INTERLEAVED across reps (decision-grade per
    docs/session_variance.md)."""
    import jax
    consume = _consume_fn()
    n = int(size_mb * 1e6)
    bufs_by_k = {k: [[np.random.default_rng(100 * t + i).integers(
        -128, 128, size=n).astype(np.int8) for i in range(nbuf)]
        for t in range(k)] for k in ks}

    def one(k):
        bufs = bufs_by_k[k]
        outs = [None] * k
        barrier = threading.Barrier(k + 1)

        def worker(t):
            barrier.wait()
            outs[t] = [jax.device_put(b) for b in bufs[t]]

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(k)]
        for th in threads:
            th.start()
        barrier.wait()
        t0 = time.perf_counter()
        for th in threads:
            th.join()
        devs = [d for o in outs for d in o]
        np.asarray(consume(devs))
        dt = time.perf_counter() - t0
        return k * nbuf * size_mb / dt

    rates = {k: [] for k in ks}
    for _ in range(reps):                    # interleave arms
        for k in ks:
            rates[k].append(one(k))
    for k in ks:
        rs = sorted(rates[k])
        med = rs[len(rs) // 2]
        emit({"probe": "concurrent_streams", "size_mb": size_mb,
              "k_threads": k, "n_buffers_each": nbuf,
              "aggregate_MBps": round(med, 1),
              "spread": round((rs[-1] - rs[0]) / med, 3)})


def probe_chunked_single(size_mb, emit, ks=(1, 2, 4), reps=5):
    """Split ONE buffer of size_mb into k chunks device_put from k
    threads in parallel (device-side concat is one cheap int8 op inside
    the consumer jit) — the form a serving batch upload could actually
    use. Interleaved arms; k=1 is the control."""
    import jax
    import jax.numpy as jnp
    n = int(size_mb * 1e6)
    x = np.random.default_rng(7).integers(-128, 128, size=n).astype(np.int8)

    @jax.jit
    def consume_cat(chunks):
        return jnp.concatenate(chunks).astype(jnp.int32).sum()

    def one(k):
        bounds = [(n * i // k, n * (i + 1) // k) for i in range(k)]
        outs = [None] * k
        barrier = threading.Barrier(k + 1)

        def worker(t):
            lo, hi = bounds[t]
            barrier.wait()
            outs[t] = jax.device_put(x[lo:hi])

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(k)]
        for th in threads:
            th.start()
        barrier.wait()
        t0 = time.perf_counter()
        for th in threads:
            th.join()
        np.asarray(consume_cat(outs))
        return size_mb / (time.perf_counter() - t0)

    for k in ks:                              # warm each consume shape
        one(k)
    rates = {k: [] for k in ks}
    for _ in range(reps):
        for k in ks:
            rates[k].append(one(k))
    for k in ks:
        rs = sorted(rates[k])
        med = rs[len(rs) // 2]
        emit({"probe": "chunked_single", "size_mb": size_mb,
              "k_chunks": k, "eff_MBps": round(med, 1),
              "spread": round((rs[-1] - rs[0]) / med, 3)})


def probe_serving_cycle(net, batch, emit, iters=8, reps=3):
    """Interleaved same-window A/B of the full serving cycle."""
    import jax
    from tools.tpu_perf_suite import _engine

    engine, cfg, _ = _engine(net, "s2d", batch)
    engine.batch_buckets = (batch,)
    cls = engine._classify_fn()
    rng = np.random.default_rng(0)
    xs = [rng.integers(-128, 128, size=(batch,) + cfg.input_shape)
          .astype(np.int8) for _ in range(iters)]
    # warm
    np.asarray(cls(engine.params, engine.out_scale, engine.out_bias,
                   jax.device_put(xs[0])))

    def run_serial():
        t0 = time.perf_counter()
        for x in xs:
            xd = jax.device_put(x)
            out = cls(engine.params, engine.out_scale, engine.out_bias, xd)
            np.asarray(out)
        return time.perf_counter() - t0

    def run_overlap():
        t0 = time.perf_counter()
        xd = jax.device_put(xs[0])
        for t in range(iters):
            out = cls(engine.params, engine.out_scale, engine.out_bias, xd)
            if t + 1 < iters:
                xd = jax.device_put(xs[t + 1])
            np.asarray(out)
        return time.perf_counter() - t0

    def run_resident():
        xd = jax.device_put(xs[0])
        np.asarray(cls(engine.params, engine.out_scale, engine.out_bias, xd))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = cls(engine.params, engine.out_scale, engine.out_bias, xd)
            np.asarray(out)
        return time.perf_counter() - t0

    def run_threaded():
        """Dedicated uploader thread: put queue depth 2 ahead of the
        compute+fetch consumer — the {upload ∥ compute ∥ fetch} shape."""
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def uploader():
            for x in xs:
                q.put(jax.device_put(x))
            q.put(None)
        th = threading.Thread(target=uploader)
        t0 = time.perf_counter()
        th.start()
        while True:
            xd = q.get()
            if xd is None:
                break
            out = cls(engine.params, engine.out_scale, engine.out_bias, xd)
            np.asarray(out)
        th.join()
        return time.perf_counter() - t0

    arms = {"serial": run_serial, "overlap": run_overlap,
            "resident": run_resident, "threaded": run_threaded}
    results = {k: [] for k in arms}
    for _ in range(reps):                       # interleave arms per rep
        for name, fn in arms.items():
            results[name].append(fn())
    mb_per_batch = batch * int(np.prod(cfg.input_shape)) / 1e6
    for name, ts in results.items():
        ts.sort()
        med = ts[len(ts) // 2]
        spread = (ts[-1] - ts[0]) / med if med else 0
        emit({"probe": "serving_cycle", "arm": name, "net": net,
              "batch": batch, "iters": iters,
              "img_s": round(batch * iters / med, 0),
              "ms_per_batch": round(med / iters * 1e3, 2),
              "mb_per_batch": round(mb_per_batch, 2),
              "spread": round(spread, 3)})
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="cnv-w1a1")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tag", default="r5-upload")
    ap.add_argument("--out", default="perf_results/upload_probe.jsonl")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    calib_ms, floor_ms = calibrate()

    def emit(row):
        row.update({"calib_ms": calib_ms, "floor_ms": floor_ms,
                    "tag": args.tag})
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    sizes = [1, 6.3, 25] if args.quick else [0.25, 1, 3, 6.3, 12.6, 25, 50]
    probe_put_blocking(sizes, emit)
    probe_bw_curve(sizes, emit)
    probe_concurrent(6.3, emit, ks=(1, 2) if args.quick else (1, 2, 4),
                     reps=3 if args.quick else 5)
    probe_chunked_single(25, emit, ks=(1, 2) if args.quick else (1, 2, 4, 8),
                         reps=3 if args.quick else 5)
    probe_serving_cycle(args.net, args.batch, emit,
                        iters=4 if args.quick else 8,
                        reps=2 if args.quick else 3)


if __name__ == "__main__":
    main()
