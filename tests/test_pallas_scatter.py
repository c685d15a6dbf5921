"""MXU matmul-scatter kernel tests (ops/pallas_scatter.py).

Run through the Pallas interpreter so they exercise the exact kernel program
on the CPU test mesh; the real Mosaic lowering is exercised by bench.py /
profile runs on the TPU chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from elevation_mapping_cupy_tpu.ops import scatter
from elevation_mapping_cupy_tpu.ops.pallas_scatter import mxu_scatter_add_2d


def _ref(rows, cols, vals, h, w):
    out = np.zeros((vals.shape[1], h, w), np.float64)
    for i in range(vals.shape[0]):
        out[:, rows[i], cols[i]] += vals[i]
    return out


def test_matches_dense_reference(rng):
    h, w, n, k = 37, 52, 3000, 3
    rows = rng.integers(0, h, n).astype(np.int32)
    cols = rng.integers(0, w, n).astype(np.int32)
    vals = rng.standard_normal((n, k)).astype(np.float32)
    vals[:, 1] = (vals[:, 1] > 0)  # exact flag stream
    out = mxu_scatter_add_2d(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        h, w, (False, True, False), interpret=True,
    )
    ref = _ref(rows, cols, vals, h, w)
    np.testing.assert_allclose(np.asarray(out)[1], ref[1], atol=0)  # bit-exact
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_vmap_rule_matches_per_env(rng):
    """vmapped kernel == per-env loop (guards the custom_vmap lowering)."""
    b, h, w, n, k = 3, 20, 20, 512, 2
    rows = rng.integers(0, h, (b, n)).astype(np.int32)
    cols = rng.integers(0, w, (b, n)).astype(np.int32)
    vals = rng.standard_normal((b, n, k)).astype(np.float32)

    f = lambda r, c, v: mxu_scatter_add_2d(r, c, v, h, w, (False, False), interpret=True)
    out = jax.vmap(f)(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals))
    for i in range(b):
        ref = _ref(rows[i], cols[i], vals[i], h, w)
        np.testing.assert_allclose(np.asarray(out[i]), ref, atol=2e-4)


def test_streams_2d_router_xla_fallback(rng):
    """On the CPU backend the router must take the XLA path and agree with
    the flat scatter used by the golden tests."""
    h = w = 30
    n = 1000
    idx = jnp.asarray(rng.integers(0, h * w, n).astype(np.int32))
    v1 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    v2 = jnp.asarray((rng.random(n) > 0.5).astype(np.float32))
    mask = jnp.asarray(rng.random(n) > 0.3)
    out = scatter.scatter_add_streams_2d(h, w, idx, [v1, v2], mask, (False, True))
    ref = scatter.scatter_add_multi(h * w, idx, [v1, v2], mask).reshape(2, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_wide_stream_group_splitting(rng):
    """>12 bf16 parts (e.g. many-layer semantic features) must split into
    multiple VMEM-sized launches and still match the dense reference."""
    h, w, n, k = 16, 24, 800, 7  # 7 non-exact streams = 21 parts -> 2 groups
    rows = rng.integers(0, h, n).astype(np.int32)
    cols = rng.integers(0, w, n).astype(np.int32)
    vals = rng.standard_normal((n, k)).astype(np.float32)
    out = mxu_scatter_add_2d(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        h, w, (False,) * k, interpret=True,
    )
    ref = _ref(rows, cols, vals, h, w)
    assert out.shape == (k, h, w)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_batched_launch_matches_reference(rng):
    """The natively batched (grid (B, chunks)) launch: per-env accumulator
    init must reset between envs and results must match per-env references."""
    from elevation_mapping_cupy_tpu.ops.pallas_scatter import _call_pallas_batched

    b, h, w, n, k = 4, 12, 18, 600, 3
    rows = rng.integers(0, h, (b, n)).astype(np.int32)
    cols = rng.integers(0, w, (b, n)).astype(np.int32)
    vals = rng.standard_normal((b, n, k)).astype(np.float32)
    vals[..., 1] = (vals[..., 1] > 0)  # the exact stream must be bf16-exact
    out = _call_pallas_batched(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        h, w, (False, True, False), interpret=True,
    )
    assert out.shape == (b, k, h, w)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(out[i]), _ref(rows[i], cols[i], vals[i], h, w), atol=2e-4
        )


def test_vmem_budget_derivation(monkeypatch):
    """Portable VMEM budgeting: the budget is derived (device kind or env
    override), and the v5e envelope still picks chunk 2048 at the reference
    map scale (202+2 cells padded to 208x256, 4 f32 streams -> 10 parts
    capped... exact flags included)."""
    from elevation_mapping_cupy_tpu.ops import pallas_scatter as ps

    ps._vmem_budget.cache_clear()
    monkeypatch.delenv("ELEV_TPU_VMEM_MB", raising=False)
    assert ps._vmem_budget() == 16 * 1024 * 1024 - ps._VMEM_HEADROOM

    # the v5e special case: reference-scale map, error_counting's stream set
    hp, wp = 208, 256
    # 2 inexact f32 streams (3 parts each) + 2 exact = 8 parts
    chunk = ps._pick_chunk(hp, wp, k_streams=4, parts=8)
    assert chunk == 2048

    # env override shrinks the budget -> smaller chunk
    monkeypatch.setenv("ELEV_TPU_VMEM_MB", "8")
    ps._vmem_budget.cache_clear()
    assert ps._vmem_budget() == 8 * 1024 * 1024 - ps._VMEM_HEADROOM
    assert ps._pick_chunk(hp, wp, k_streams=4, parts=8) < 2048
    ps._vmem_budget.cache_clear()


def test_raycast_auto_prefers_polar_at_production_scale():
    """auto mode must not route production configs onto the serialized
    exact march (measured v5e: polar 5-13 ms vs exact 26-1592 ms at all
    cloud sizes with the default 70-step rays)."""
    from unittest import mock

    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.ops import raycast as rc

    for n_pts in (2_000, 100_000, 1_000_000):
        cfg = MapConfig(max_points=n_pts, raycast_mode="auto")
        assert cfg.n_ray_steps > 12
        with mock.patch.object(rc, "visibility_cleanup_polar") as pol, \
             mock.patch.object(rc, "visibility_cleanup_exact") as ex:
            rc.visibility_cleanup(None, None, None, None, None, cfg)
        assert pol.called and not ex.called
