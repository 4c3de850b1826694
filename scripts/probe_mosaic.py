"""Probe Mosaic capabilities needed by the v4 stream kernel.

1. dynamic lane-offset read from a VMEM ref: x_ref[:, pl.ds(t*128, 128)]
2. jnp.take_along_axis gather on bf16 along lanes
3. nested fori_loop with dynamic inner trip count
4. large (~200KB) scalar-prefetch array in SMEM
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def dyn_lane_slice():
    def kernel(t_ref, x_ref, o_ref):
        t = t_ref[0]
        o_ref[...] = x_ref[:, pl.ds(t * 128, 128)]

    x = jnp.arange(32 * 512, dtype=jnp.float32).reshape(32, 512)
    t = jnp.array([2], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(t, x)
    expect = np.asarray(x)[:, 256:384]
    assert np.array_equal(np.asarray(out), expect), "WRONG VALUES"
    return out


def bf16_gather():
    def kernel(x_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[0][None, :], (32, 128))
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx, axis=1)

    x = jnp.arange(32 * 128, dtype=jnp.bfloat16).reshape(32, 128)
    idx = jnp.asarray((np.arange(128)[::-1]).copy(), jnp.int32)[None]
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.bfloat16),
    )(x, idx)
    expect = np.asarray(x, np.float32)[:, ::-1]
    assert np.array_equal(np.asarray(out, np.float32), expect), "WRONG"
    return out


def nested_dyn_fori():
    def kernel(n_ref, x_ref, o_ref):
        def outer(g, acc):
            n = n_ref[g]

            def inner(s, a):
                return a + x_ref[:, pl.ds((g * 4 + s) * 128, 128)]

            return jax.lax.fori_loop(0, n, inner, acc)

        o_ref[...] = jax.lax.fori_loop(
            0, 2, outer, jnp.zeros((8, 128), jnp.float32))

    x = jnp.ones((8, 8 * 128), jnp.float32)
    n = jnp.array([3, 2], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(n, x)
    assert np.allclose(np.asarray(out), 5.0), "WRONG"
    return out


def big_smem():
    N = 50_000  # 200 KB of scalar-prefetch

    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] + s_ref[N - 1].astype(jnp.float32)

    s = jnp.arange(N, dtype=jnp.int32)
    x = jnp.zeros((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(s, x)
    assert np.allclose(np.asarray(out), N - 1), "WRONG"
    return out


def fused_val_onehot():
    """one-hot with values folded in: where(iota==rows, vals, 0)."""
    def kernel(x_ref, r_ref, v_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        oh = jnp.where(iota == r_ref[0][None, :],
                       v_ref[0][None, :], 0.0).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.ones((32, 128), jnp.float32)
    rows = jnp.asarray(np.arange(128) % 7, jnp.int32)[None]
    vals = jnp.full((1, 128), 2.0, jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(x, rows, vals)
    expect = np.zeros((32, 128))
    for e in range(128):
        expect[:, e % 7] += 2.0
    assert np.allclose(np.asarray(out), expect), "WRONG"
    return out


if __name__ == "__main__":
    print(jax.devices(), file=sys.stderr)
    probe("dyn_lane_slice", dyn_lane_slice)
    probe("bf16_gather", bf16_gather)
    probe("nested_dyn_fori", nested_dyn_fori)
    probe("big_smem_prefetch", big_smem)
    probe("fused_val_onehot", fused_val_onehot)
