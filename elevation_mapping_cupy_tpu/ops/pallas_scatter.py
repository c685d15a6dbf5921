"""MXU matmul-scatter: point→cell scatter-add as one-hot outer products.

The reference resolves per-point scatter races with CUDA ``atomicAdd``
(custom_kernels.py:174-185). XLA's TPU scatter lowering serializes over
updates (~15-35 ms for 1M points into a 204x204 map on v5e). This kernel
reformulates the scatter as dense matmuls that run on the systolic array:

    out[k] = OneHot_rows(P, Hp)^T  @  (OneHot_cols(P, Wp) * v_k[:, None])

summed over point chunks P. Each chunk contributes a rank-P update to the
whole (Hp, Wp) map held in VMEM; the one-hot operands are generated on the
fly in VMEM (never touching HBM) and are exact in bf16, so the MXU's f32
accumulation makes flag/count streams bit-exact. Value streams are split
into a (hi, mid, lo) bf16 triple carrying ~24 mantissa bits, so their f32
accumulation matches a native f32 scatter up to final-rounding noise.

Cost: N * Hp * Wp * K_eff MACs — for 1M points onto a 256-padded map with
4 streams that is ~0.5e12 bf16 FLOPs ≈ 3-6 ms on one v5e core, ~3x faster
than the XLA scatter, and it stays on the MXU instead of fighting the
vector units for the rest of the update step.

Layout note: cell row/col indices ride as two leading float32 columns of the
packed (chunk, P, 2+K) value tensor, so the whole kernel consumes ONE block
whose last-two dims satisfy the (8, 128)-divisible-or-full constraint; map
cell counts (< 2^24) are exact in f32.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mxu_scatter_add_2d", "supported_backend"]

# Max points per grid step (sublane dim of the one-hot operands). Large
# chunks amortize per-grid-step overhead (256 → 3.4x slower at 1M pts;
# 2048 is ~8% faster than 1024 when it fits); ≥3072 overflows VMEM at the
# reference map scale. The actual chunk is chosen per call from _VMEM_BUDGET
# (see _pick_chunk). The Mosaic compile cost this implies is hidden by the
# persistent compilation cache (enabled package-wide on TPU backends, see
# __init__.py).
_MAX_CHUNK = 2048

# Per-core VMEM by device kind. Every shipped generation we can name is
# 16 MiB/core (the pallas guide's "~16 MB/core"); unknown kinds fall back to
# the same conservative figure, so a newer chip is under-used rather than
# OOM'd. Override with ELEV_TPU_VMEM_MB (total per-core MiB) on chips with
# more.
_VMEM_SIZE_BY_KIND_MIB = {
    "v2": 16, "v3": 16, "v4": 16, "v5": 16, "v5 lite": 16, "v5e": 16,
    "v5p": 16,
}
_VMEM_DEFAULT_MIB = 16

# Headroom left for Mosaic temporaries and double-buffered input blocks.
# On a 16 MiB core this yields the measured v5e envelope: chunk 2048 at
# 8 parts ≈ 12.9 MiB estimated compiles and runs, 3072 ≈ 18 MiB does not.
_VMEM_HEADROOM = 2 * 1024 * 1024


@functools.lru_cache(maxsize=1)
def _vmem_budget() -> int:
    """Per-call VMEM budget: queried device size minus headroom.

    Trace-time decision (cached); ELEV_TPU_VMEM_MB overrides the queried
    size for chips not in the table."""
    env = os.environ.get("ELEV_TPU_VMEM_MB")
    if env:
        return int(float(env) * 1024 * 1024) - _VMEM_HEADROOM
    mib = _VMEM_DEFAULT_MIB
    try:
        kind = jax.devices()[0].device_kind.lower()
        for key, v in _VMEM_SIZE_BY_KIND_MIB.items():
            if key in kind:
                mib = v
                break
    except Exception:
        pass
    return mib * 1024 * 1024 - _VMEM_HEADROOM

# Cap on bf16 value parts per pallas call; wider stream sets are split into
# groups (each group is its own full-MXU launch).
_MAX_PARTS = 12


def _n_parts(exact: Tuple[bool, ...]) -> int:
    return sum(1 if e else 3 for e in exact)


def _pick_chunk(hp: int, wp: int, k_streams: int, parts: int) -> int:
    """Largest power-of-two chunk ≤ _MAX_CHUNK whose working set fits VMEM."""
    budget = _vmem_budget()
    fixed = 4 * hp * parts * wp + 4 * hp * k_streams * wp  # res + out (f32)
    chunk = _MAX_CHUNK
    while chunk > 256:
        per_pt = 2 * (parts * wp + hp + wp) + 4 * (2 + k_streams)
        if fixed + chunk * per_pt <= budget:
            break
        chunk //= 2
    return chunk


# Rejected variant (measured): choosing a chunk that divides n exactly
# (2000 for 1M points) to skip the pad copy (~1.6 ms per scatter) makes the
# whole update 47.8 -> 67 ms — the non-power-of-two sublane extent costs the
# MXU kernel far more than the pad saves. Keep power-of-two chunks.


def fits_vmem(h: int, w: int, exact: Tuple[bool, ...]) -> bool:
    """Trace-time check: can this (h, w, streams) scatter run on the MXU
    kernel at all? For very large maps the whole-map-in-VMEM formulation
    stops fitting even at the minimum chunk (the intended path there is
    spatial sharding, which brings per-shard h back into range); callers
    route to the XLA scatter instead."""
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    parts = min(_n_parts(exact), _MAX_PARTS)
    k = min(len(exact), _MAX_PARTS)  # wide sets split into ≤_MAX_PARTS groups
    fixed = 4 * hp * parts * wp + 4 * hp * k * wp
    per_pt = 2 * (parts * wp + hp + wp) + 4 * (2 + k)
    return fixed + 256 * per_pt <= _vmem_budget()


def supported_backend() -> bool:
    """Pallas TPU lowering available? (trace-time decision)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(vals_ref, out_ref, *, k_streams, exact, hp, wp):
    """out_ref: (1, hp, K*wp) — stream k occupies lanes [k*wp, (k+1)*wp).

    Grid is (batch, chunks): the chunk axis is minor (iterates fastest), so
    each env's output block is initialized at its first chunk and
    accumulated across the rest; batched-envs scatters are ONE pallas
    launch, not a lax.map of per-env launches.

    All value parts ride ONE dot_general per grid step: the per-part
    B-operands (ohc * part) are concatenated along the lane axis so the MXU
    sees a single (P, hp)^T @ (P, n_parts*wp) contraction — same FLOPs as
    per-part dots but one matmul for Mosaic to schedule (minutes less
    compile) and a wider N dim for the systolic array.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = vals_ref.shape[2]
    rows = vals_ref[0, 0, :, 0:1].astype(jnp.int32)  # (P, 1)
    cols = vals_ref[0, 0, :, 1:2].astype(jnp.int32)
    ohr = (rows == jax.lax.broadcasted_iota(jnp.int32, (p, hp), 1)).astype(
        jnp.bfloat16
    )
    ohc = (cols == jax.lax.broadcasted_iota(jnp.int32, (p, wp), 1)).astype(
        jnp.bfloat16
    )

    bs = []
    owners = []  # output stream per part
    for k in range(k_streams):
        v = vals_ref[0, 0, :, 2 + k : 3 + k]  # (P, 1) f32
        if exact[k]:
            parts = (v.astype(jnp.bfloat16),)
        else:
            # 3-way bf16 split: hi+mid+lo carries ~24 mantissa bits; each
            # part is matmul'd separately with f32 accumulation (summing the
            # bf16 operands first would re-round), so the final sum matches
            # a native f32 scatter up to final rounding
            hi = v.astype(jnp.bfloat16)
            r1 = v - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            parts = (hi, mid, lo)
        for part in parts:
            bs.append(ohc * part)
            owners.append(k)

    b_cat = jnp.concatenate(bs, axis=1)  # (P, n_parts*wp)
    res = jax.lax.dot_general(
        ohr,
        b_cat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hp, n_parts*wp)

    # fold part columns into their stream's output block
    updates = []
    for k in range(k_streams):
        mine = [j for j, o in enumerate(owners) if o == k]
        u = res[:, mine[0] * wp : (mine[0] + 1) * wp]
        for j in mine[1:]:
            u = u + res[:, j * wp : (j + 1) * wp]
        updates.append(u)
    out_ref[...] = out_ref[...] + jnp.concatenate(updates, axis=1)[None]


def _call_pallas(rows, cols, values, h, w, exact, interpret):
    """Single-map scatter: (N,) indices, (N, K) values → (K, h, w)."""
    out = _call_pallas_batched(
        rows[None], cols[None], values[None], h, w, exact, interpret
    )
    return out[0]


def _call_pallas_batched(rows, cols, values, h, w, exact, interpret):
    """Batched scatter: (B, N) indices, (B, N, K) values → (B, K, h, w).

    One pallas launch with grid (B, chunks) — the batched-envs path does
    not pay B separate kernel launches."""
    b, n, k_streams = values.shape
    # Output lives as (hp, K*wp): hp is a sublane dim (8-divisible suffices —
    # 208 instead of 256 at the reference's 204-cell scale is ~17% faster),
    # wp a lane dim (must be 128-divisible).
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)

    if _n_parts(exact) > _MAX_PARTS:
        # split wide stream sets (e.g. many-layer semantic features) into
        # VMEM-sized groups; each group is its own chip-filling launch
        groups: list = []
        cur: list = []
        cur_parts = 0
        for k, e in enumerate(exact):
            p = 1 if e else 3
            if cur and cur_parts + p > _MAX_PARTS:
                groups.append(cur)
                cur, cur_parts = [], 0
            cur.append(k)
            cur_parts += p
        groups.append(cur)
        outs = [
            _call_pallas_batched(
                rows,
                cols,
                values[:, :, g],
                h,
                w,
                tuple(exact[k] for k in g),
                interpret,
            )
            for g in groups
        ]
        return jnp.concatenate(outs, axis=1)

    chunk = _pick_chunk(hp, wp, k_streams, _n_parts(exact))
    packed = jnp.concatenate(
        [
            rows.astype(jnp.float32)[:, :, None],
            cols.astype(jnp.float32)[:, :, None],
            values,
        ],
        axis=2,
    )
    n_pad = _round_up(n, chunk)
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n), (0, 0)))
    g = n_pad // chunk
    packed = packed.reshape(b, g, chunk, 2 + k_streams)

    kernel = functools.partial(
        _kernel, k_streams=k_streams, exact=exact, hp=hp, wp=wp
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, 2 + k_streams),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hp, k_streams * wp), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, k_streams * wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * hp * wp * (3 * k_streams - 2 * sum(exact)),
            bytes_accessed=b * (n_pad * 4 * (2 + k_streams) + 4 * k_streams * hp * wp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed)
    # (B, hp, K*wp) -> (B, K, h, w)
    out = out.reshape(b, hp, k_streams, wp).transpose(0, 2, 1, 3)
    return out[:, :, :h, :w]


@functools.lru_cache(maxsize=None)
def _make_impl(h: int, w: int, exact: Tuple[bool, ...], interpret: bool):
    """Per-(h, w, exact) implementation with an explicit vmap rule.

    The in-kernel accumulator init keys on the chunk ``program_id``; letting
    JAX batch the pallas_call generically would prepend a grid axis and
    silently break it. Instead vmap re-dispatches to the natively batched
    launch (grid (B, chunks)) — all envs ride ONE kernel launch.
    """

    @jax.custom_batching.custom_vmap
    def impl(rows, cols, values):
        return _call_pallas(rows, cols, values, h, w, exact, interpret)

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, rows, cols, values):  # noqa: ANN001
        rb, cb, vb = in_batched

        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _call_pallas_batched(
            bcast(rows, rb),
            bcast(cols, cb),
            bcast(values, vb),
            h,
            w,
            exact,
            interpret,
        )
        return out, True

    return impl


def mxu_scatter_add_2d(
    rows: jax.Array,
    cols: jax.Array,
    values: jax.Array,
    h: int,
    w: int,
    exact: Tuple[bool, ...],
    interpret: bool = False,
) -> jax.Array:
    """Scatter-add K value streams into an (h, w) grid on the MXU.

    rows/cols: (N,) int32 cell coordinates, already clamped to range for
    masked-out points (whose values must be pre-zeroed — they then add 0).
    values: (N, K) float32. exact[k]=True marks streams whose values are
    exactly representable in bf16 (0/1 flags, counts) — they skip the
    hi/lo split. ``interpret=True`` runs the Pallas interpreter (any
    backend; used by the CPU test suite).

    Returns (K, h, w) float32.
    """
    assert len(exact) == values.shape[-1]
    if rows.shape[0] == 0:
        # a zero-point chunk would make a zero-step pallas grid (and the
        # i==0 output init would never run); match the XLA path: all zeros
        return jnp.zeros((values.shape[-1], h, w), jnp.float32)
    return _make_impl(h, w, tuple(exact), interpret)(rows, cols, values)
