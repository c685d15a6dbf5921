"""Probe: which dynamic-index primitives lower in Pallas TPU (Mosaic)?

Round-4 experiment log for the fused march kernel (VERDICT r3 item 2):
establishes which in-VMEM gather/scatter forms Mosaic accepts on this
chip generation before committing to a kernel design.

Run one probe per process (a hanging Mosaic compile must not block the
rest): ``python scripts/probe_pallas_gather.py <index>``.
"""
import sys
import numpy as np
import jax, jax.numpy as jnp

from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache
ensure_compile_cache()  # r5: no longer auto-enabled at package import

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NN = 41616   # 204*204
T = 4096     # samples per tile

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(0, 1, (8, NN)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, NN, (T,)).astype(np.int32))
vals = jnp.asarray(rng.normal(0, 1, (T,)).astype(np.float32))


_PROBE = int(sys.argv[1]) if len(sys.argv) > 1 else -1
_counter = [0]


def try_kernel(name, kernel, out_shape, *args):
    _counter[0] += 1
    if _PROBE >= 0 and _counter[0] - 1 != _PROBE:
        return None
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


# ---------------------------------------------------------------------------
# RESULTS (TPU v5 lite, jax 0.9.0, 2026-08-20 — round 4):
#   FAIL take flat (T,) from (NN,)      NotImplementedError: only 2D gather
#   FAIL take (8,T) from (8,NN) axis=1  shape mismatch (gather form unsupported)
#   FAIL scatter .at[].add              Mosaic TC: scatter-add unimplemented
#   FAIL scatter .at[].min              Mosaic TC: scatter-min unimplemented
#   FAIL jnp.sort                       Mosaic TC: sort unimplemented
#   OK   take_along_axis axis=0 (sublane gather within lane columns)
#   HANG take_along_axis axis=1 (lane gather: Mosaic compile never returns)
#   FAIL take 2D (T/128,128) from flat  only-2D-gather rejection again
#
# Conclusion (documents VERDICT r3 items 2 & 6): the "tile rays into VMEM,
# march in-register, accumulate per-tile cell deltas" fused kernel is NOT
# implementable on this toolchain — a marching kernel needs per-sample
# arbitrary gather (cell reads) and scatter (cell accumulation), and Mosaic
# exposes neither (the only working gather is sublane-aligned
# take_along_axis, which would require a lane-sort that is itself
# unavailable in-kernel). The implementable TPU-native scatter remains the
# MXU one-hot matmul formulation (ops/pallas_scatter.py), which the flat
# march already routes through. The <=1s exact-raycast work therefore
# targets the XLA-level chunk body (see scripts/ablate_flat_march.py).
# ---------------------------------------------------------------------------
