"""Mosaic legality probes — run on the real TPU to learn which vector ops
lower, before committing to a kernel design. Each probe is a tiny
pallas_call; prints PASS/FAIL + error head per probe.

    python tools/mosaic_probes.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"PASS {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {msg}")
        return False


M, C, O = 1024, 64, 64
K = 9


def probe_lane_concat():
    # concat 9 shifted row-slices along the LANE axis -> [M, 9C], then dot
    x = jnp.ones((M + 128, C), jnp.int8)
    w = jnp.ones((K * C, O), jnp.int8)

    def kern(x_ref, w_ref, o_ref):
        parts = [x_ref[off:off + M, :] for off in range(K)]
        p = jnp.concatenate(parts, axis=1)
        o_ref[:] = jax.lax.dot_general(
            p, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM),
                  pl.BlockSpec(w.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, O), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), jnp.int32))(x, w)


def probe_scratch_lane_store():
    # store shifted row-slices into scratch at 64-lane offsets
    x = jnp.ones((M + 128, C), jnp.int8)
    w = jnp.ones((K * C, O), jnp.int8)

    def kern(x_ref, w_ref, o_ref):
        def body(p_ref):
            for i in range(K):
                p_ref[:, i * C:(i + 1) * C] = x_ref[i:i + M, :]
            o_ref[:] = jax.lax.dot_general(
                p_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        pl.run_scoped(body, pltpu.VMEM((M, K * C), jnp.int8))

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM),
                  pl.BlockSpec(w.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, O), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), jnp.int32))(x, w)


def probe_mid_dim_index():
    # reshape [M, C] -> [M//2, 2, C], take index 0 of the middle dim
    x = jnp.ones((M, C), jnp.int8)

    def kern(x_ref, o_ref):
        v = x_ref[:].reshape(M // 2, 2, C)
        o_ref[:] = v[:, 0, :]

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M // 2, C), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 2, C), jnp.int8))(x)


def probe_pool_reshape_max():
    # full maxpool pattern: [bb*h*w, C] grid, 2x2 pool via two
    # reshape+index+max steps (rows then cols)
    bb, h, w = 4, 16, 16
    m = bb * h * w
    x = jnp.arange(m * C, dtype=jnp.int32).astype(jnp.int8).reshape(m, C)

    def kern(x_ref, o_ref):
        v = x_ref[:].reshape(bb, h // 2, 2, w, C)
        rmax = jnp.maximum(v[:, :, 0], v[:, :, 1])          # [bb, h/2, w, C]
        v2 = rmax.reshape(bb, h // 2, w // 2, 2, C)
        out = jnp.maximum(v2[:, :, :, 0], v2[:, :, :, 1])   # [bb,h/2,w/2,C]
        o_ref[:] = out.reshape(bb * (h // 2) * (w // 2), C)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m // 4, C), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m // 4, C), jnp.int8))(x)


def probe_strided_row_slice():
    # lax.slice with stride 2 on the row dim
    x = jnp.ones((M, C), jnp.int8)

    def kern(x_ref, o_ref):
        o_ref[:] = jax.lax.slice(x_ref[:], (0, 0), (M, C), (2, 1))

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M // 2, C), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 2, C), jnp.int8))(x)


def probe_lane_slice_64():
    # read a [*, 64:128] lane window out of a 256-lane array
    x = jnp.ones((M, 256), jnp.int8)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:, 64:128]

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, 64), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 64), jnp.int8))(x)


def probe_int32_acc_reshape():
    # reshape int32 accumulator rows (fp32-tile layout) across sublane split
    x = jnp.ones((M, C), jnp.int32)

    def kern(x_ref, o_ref):
        v = x_ref[:].reshape(M // 4, 4, C)
        o_ref[:] = jnp.max(v, axis=1)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M // 4, C), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 4, C), jnp.int32))(x)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("lane_concat(9x[M,64] -> [M,576] + dot)", probe_lane_concat)
    run("scratch_lane_store(64-lane offsets)", probe_scratch_lane_store)
    run("mid_dim_index(reshape+[:,0,:])", probe_mid_dim_index)
    run("pool_reshape_max(full 2x2 pool)", probe_pool_reshape_max)
    run("strided_row_slice(stride 2)", probe_strided_row_slice)
    run("lane_slice_64(read [:,64:128])", probe_lane_slice_64)
    run("int32_acc_reshape(max over mid dim)", probe_int32_acc_reshape)
