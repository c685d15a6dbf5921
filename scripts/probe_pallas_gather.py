"""Probe: which dynamic-index primitives lower in Pallas TPU (Mosaic)?

Round-4 experiment log for the fused march kernel (VERDICT r3 item 2):
establishes which in-VMEM gather/scatter forms Mosaic accepts on this
chip generation before committing to a kernel design.
"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NN = 41616   # 204*204
T = 4096     # samples per tile

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(0, 1, (8, NN)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, NN, (T,)).astype(np.int32))
vals = jnp.asarray(rng.normal(0, 1, (T,)).astype(np.float32))


def try_kernel(name, kernel, out_shape, *args):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        r = f(*args)
        s = float(jnp.sum(r))
        print(f"OK   {name}: sum={s:.3f}")
        return f
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return None


# 1. vector gather via jnp.take on flat table
def k_take(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[0], idx_ref[:], axis=0)
try_kernel("take flat (T,) from (NN,)", k_take,
           jax.ShapeDtypeStruct((T,), jnp.float32), table, idx)

# 2. gather rows: take along axis=1 of (8, NN)
def k_take2(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=1)
try_kernel("take (8,T) from (8,NN) axis=1", k_take2,
           jax.ShapeDtypeStruct((8, T), jnp.float32), table, idx)

# 4. scatter add via .at[].add inside kernel
def k_scat(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] = out_ref[:].at[idx_ref[:]].add(val_ref[:])
try_kernel("scatter .at[].add (T,) into (NN,)", k_scat,
           jax.ShapeDtypeStruct((NN,), jnp.float32), idx, vals)

# 5. scatter-min via .at[].min
def k_smin(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.full_like(out_ref, jnp.inf)
    out_ref[:] = out_ref[:].at[idx_ref[:]].min(val_ref[:])
try_kernel("scatter .at[].min (T,) into (NN,)", k_smin,
           jax.ShapeDtypeStruct((NN,), jnp.float32), idx, vals)

# 6. sort inside kernel
def k_sort(val_ref, out_ref):
    out_ref[:] = jnp.sort(val_ref[:])
try_kernel("jnp.sort (T,)", k_sort, jax.ShapeDtypeStruct((T,), jnp.float32), vals)

# 7. take_along_axis 2D (per-lane indices)
tbl2 = jnp.asarray(rng.normal(0, 1, (8, 128)).astype(np.float32))
idx2 = jnp.asarray(rng.integers(0, 8, (8, 128)).astype(np.int32))
def k_taa(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)
try_kernel("take_along_axis (8,128) axis=0 sublanes", k_taa,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl2, idx2)

tbl3 = jnp.asarray(rng.normal(0, 1, (8, 128)).astype(np.float32))
idx3 = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))
def k_taa2(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)
try_kernel("take_along_axis (8,128) axis=1 lanes", k_taa2,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl3, idx3)

# 8. 2D-shaped vector gather: take (T//128,128) indices from flat (NN,)
idx2d = idx.reshape(T // 128, 128)
def k_take2d(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[0], idx_ref[:], axis=0)
try_kernel("take 2D (T/128,128) from (NN,)", k_take2d,
           jax.ShapeDtypeStruct((T // 128, 128), jnp.float32), table, idx2d)
