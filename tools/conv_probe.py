"""Conv-reformulation probe (round 3, VERDICT ask #1): which dot shape
should CNV's convs run at?

dot_probe.py showed the chip's int8 dot rate is strongly shape-dependent
(19.7 TMAC/s at CNV's native im2col shape K=576/N=64 vs 88 at K=4096/
N=2048), so the conv formulation — not the im2col traffic alone — sets
the ceiling. This probes, at the conv2-class workload (batch 1024,
30x30x64 grid, the CNV hot layer):

  rate_*    raw dot rate at candidate shapes with a PRODUCTION-LIKE
            epilogue (threshold-compare -> int8), prebuilt operands —
            unlike dot_probe's jnp.sum epilogue which added hundreds of
            MB of int32 HBM traffic to small-N cases.
  e2e_im2col   production conv2: sliding_window + dot + multithreshold
  e2e_s2d      space-to-depth 2x2: 3x3 conv becomes a 2x2 conv over
               4C channels with 4 output phases -> one dot of
               K=4*4C=1024, N=4*64=256 (1.78x MACs, ~4x better shape)

Appends to perf_results/conv_probe.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters=30, repeats=3):
    out = launch()
    np.asarray(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [launch() for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2], (ts[-1] - ts[0]) / ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.ops.conv import sliding_window
    from bnn_pynq_tpu.ops.thresholds import multithreshold

    out_path = "perf_results/conv_probe.jsonl"
    os.makedirs("perf_results", exist_ok=True)
    rng = np.random.default_rng(0)
    rows_out = []

    def run(name, fn, arg, macs):
        try:
            t0 = time.time()
            jfn = jax.jit(fn)
            med, spread = chain_time(lambda: jfn(arg))
            row = {"case": name, "ms": round(med * 1e3, 3),
                   "tera_macs_per_s": round(macs / med / 1e12, 1),
                   "spread": round(spread, 3),
                   "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            row = {"case": name, "error": repr(e)[:250]}
        line = json.dumps(row)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")
        rows_out.append(row)

    # ---- raw rates with int8 epilogue (threshold-like compare) ----
    def rate_case(m, k, n):
        a = jnp.asarray(rng.integers(-3, 4, size=(m, k)).astype(np.int8))
        w = jnp.asarray(rng.integers(-3, 4, size=(k, n)).astype(np.int8))
        t = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, n)), 0)
                        .astype(np.int32))

        def f(a, w=w, t=t):
            acc = jax.lax.dot_general(
                a, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc >= t).astype(jnp.int8)
        return f, a, m * k * n

    # shapes: conv2 im2col baseline; conv2/3/4 in s2d2 form
    # (K=4C, N=4N_out); conv1 in s2d4 form (K=2*2*48, N=16*64)
    for (m, k, n) in [(802816, 576, 64), (200704, 1024, 256),
                      (65536, 192, 1024), (36864, 1024, 512),
                      (25600, 2048, 512)]:
        f, a, macs = rate_case(m, k, n)
        run(f"rate_m{m}_k{k}_n{n}", f, a, macs)

    # ---- e2e conv2 variants (input = code grid, output = int8 codes) ----
    b = 1024
    act = jnp.asarray(rng.integers(0, 2, size=(b, 30, 30, 64),
                                   dtype=np.int64).astype(np.int8))
    w_hwio = rng.choice([-1, 1], size=(3, 3, 64, 64)).astype(np.int8)
    wmat = jnp.asarray(w_hwio.reshape(576, 64))
    thr = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, 64)), 0)
                      .astype(np.int32))

    def e2e_im2col(a):
        lev = (2 * a.astype(jnp.int32) - 1).astype(jnp.int8)
        p = sliding_window(lev, 3, 3, 1)
        bb, oh, ow, k = p.shape
        acc = jax.lax.dot_general(
            p.reshape(bb * oh * ow, k), wmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return multithreshold(acc.reshape(bb, oh, ow, 64), thr)

    run("e2e_im2col", e2e_im2col, act, b * 28 * 28 * 576 * 64)

    # space-to-depth: pad 30->32 rows/cols, s2d 2x2 -> [b,16,16,256];
    # 3x3 conv = 2x2 conv over s2d grid with 4 phase outputs.
    # W' [2,2,4C,4N]: phase (pi,pj) output needs input (2i+pi+ki, 2j+pj+kj);
    # s2d block (i+(pi+ki)//2, j+(pj+kj)//2), channel slot
    # ((pi+ki)%2, (pj+kj)%2).
    wp = np.zeros((2, 2, 4, 64, 4, 64), np.int8)  # [bi,bj,slot,c,phase,n]
    for pi in range(2):
        for pj in range(2):
            for ki in range(3):
                for kj in range(3):
                    bi, si = divmod(pi + ki, 2)
                    bj, sj = divmod(pj + kj, 2)
                    wp[bi, bj, si * 2 + sj, :, pi * 2 + pj, :] += \
                        w_hwio[ki, kj]
    wp2 = jnp.asarray(wp.reshape(2 * 2 * 4 * 64, 4 * 64))
    thr4 = jnp.asarray(np.tile(np.asarray(thr), (1, 4)))

    def e2e_s2d(a):
        lev = (2 * a.astype(jnp.int32) - 1).astype(jnp.int8)
        lev = jnp.pad(lev, ((0, 0), (0, 2), (0, 2), (0, 0)))
        bb = lev.shape[0]
        s2d = lev.reshape(bb, 16, 2, 16, 2, 64).transpose(
            0, 1, 3, 2, 4, 5).reshape(bb, 16, 16, 256)
        p = sliding_window(s2d, 2, 2, 1)          # [b,15,15,1024]
        acc = jax.lax.dot_general(
            p.reshape(bb * 15 * 15, 1024), wp2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        codes = multithreshold(acc.reshape(bb, 15, 15, 256), thr4)
        # de-phase: [b,15,15,2,2,64] -> [b,30,30,64] (valid 28x28 inside)
        codes = codes.reshape(bb, 15, 15, 2, 2, 64).transpose(
            0, 1, 3, 2, 4, 5).reshape(bb, 30, 30, 64)
        return codes[:, :28, :28, :]

    run("e2e_s2d", e2e_s2d, act, b * 15 * 15 * 1024 * 256)


if __name__ == "__main__":
    main()
