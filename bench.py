"""Benchmark: scatter-fusion throughput on the reference operating envelope.

Runs the full pointcloud→map update (8 m x 8 m @ 0.04 m map, 202x202 cells —
BASELINE.md) with a 1M-point synthetic LiDAR cloud on one chip and reports
points/s/chip. vs_baseline is measured against the BASELINE.json north-star
target of 1M points/s/chip (the reference repo publishes no numbers).

Default (no BENCH_MODE): orchestrated ALL-MODES run — every mode executes as
a sequential subprocess (the chip is exclusive-access), printing one compact
JSON line per mode as it completes and one combined line LAST:
  {"metric": "points/s/chip", "value": N, ..., "extra": {"modes": {...}}}

With BENCH_MODE set, runs exactly that mode and prints its ONE JSON line:
  points | exact | maps | mem | planeseg | scaling | spatial | image | dino
(exact = parity-raycast latency at the deployed YAML; maps = batched
multi-environment maps/s; spatial = shard-local MXU scatter vs XLA fallback
at 1024^2; scaling also carries the composed env x spatial entry).
Env knobs: BENCH_POINTS, BENCH_ITERS, BENCH_BATCH, BENCH_MODE_TIMEOUT.
"""

import json
import os
import sys
import time

import numpy as np


def bench_maps() -> None:
    """Batched datagen: B independent maps updated per step (maps/s).

    Also drives the COMPOSED env x spatial step on the real chip (VERDICT
    r4 item 7): a small batch of row-sharded maps through the shard_map
    path on a (1, 1) device mesh — the same fused program every multi-chip
    shard executes, including the Pallas shard-local scatter the virtual
    CPU dryrun can only interpret — checked against the unsharded batched
    result."""
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.parallel import batched_update, init_batch
    from elevation_mapping_cupy_tpu.runtime.datagen import make_batch_clouds
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    B = int(os.environ.get("BENCH_BATCH", 64))
    n_points = int(os.environ.get("BENCH_POINTS", 100_000))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    cfg = MapConfig(max_points=n_points)
    w = default_weights()
    states = init_batch(cfg, B)
    key = jax.random.PRNGKey(0)
    pts, t, _ = make_batch_clouds(key, B, cfg.cell_n, cfg.resolution, n_points)
    mask = jnp.ones((B, n_points), bool)
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    z = jnp.zeros((B,))

    def step(s):
        return batched_update(s, pts, mask, R, t, z, z, w, cfg)

    t_c = time.perf_counter()
    states = step(states)
    _ = float(jnp.sum(states.layers[:, 2]))
    compile_s = round(time.perf_counter() - t_c, 1)
    # pipelined steady state (see main(): the harness tunnel costs ~45 ms
    # per host sync; datagen streams steps without per-step host fetches)
    t0 = time.perf_counter()
    for _i in range(iters):
        states = step(states)
    _ = float(jnp.sum(states.layers[:, 2]))
    med = (time.perf_counter() - t0) / iters

    # ---- composed env x spatial on the real chip (small B, small map) ----
    composed = {"error": "not run"}
    try:
        from jax.sharding import Mesh
        from elevation_mapping_cupy_tpu.parallel.spatial import (
            batched_spatial_update_pointcloud, shard_states_spatial_batched,
        )

        Bc = int(os.environ.get("BENCH_COMPOSED_BATCH", 4))
        comp_cfg = MapConfig(resolution=0.08, map_length=7.84,
                             max_points=min(n_points, 20_000))
        cpts, ct, _ = make_batch_clouds(
            jax.random.PRNGKey(1), Bc, comp_cfg.cell_n, comp_cfg.resolution,
            comp_cfg.max_points)
        cmask = jnp.ones((Bc, comp_cfg.max_points), bool)
        cR = jnp.broadcast_to(jnp.eye(3), (Bc, 3, 3))
        cz = jnp.zeros((Bc,))
        cargs = (cpts, cmask, cR, ct, cz, cz)

        ref = batched_update(init_batch(comp_cfg, Bc), *cargs, w, comp_cfg)
        ref_layers = np.asarray(ref.layers)

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("env", "x"))
        cstep = batched_spatial_update_pointcloud(mesh, comp_cfg, "env", "x")
        cstates = shard_states_spatial_batched(
            init_batch(comp_cfg, Bc), mesh, "env", "x")
        t_cc = time.perf_counter()
        cout = cstep(cstates, *cargs, w)
        _ = float(jnp.sum(cout.layers[:, 2]))
        comp_compile_s = round(time.perf_counter() - t_cc, 1)
        match = bool(np.allclose(np.asarray(cout.layers), ref_layers,
                                 atol=5e-5))
        lat = []
        for _i in range(max(iters // 2, 3)):
            cstates = shard_states_spatial_batched(
                init_batch(comp_cfg, Bc), mesh, "env", "x")
            t0c = time.perf_counter()
            cout = cstep(cstates, *cargs, w)
            _ = float(jnp.sum(cout.layers[:, 2]))
            lat.append(time.perf_counter() - t0c)
        composed = {
            "batch": Bc,
            "cell_n": comp_cfg.cell_n,
            "mesh": [1, 1],
            "matches_unsharded": match,
            "maps_per_s": round(Bc / float(np.median(lat)), 1),
            "compile_s": comp_compile_s,
        }
    except Exception as e:  # composed failure must not hide the headline
        composed = {"error": f"{type(e).__name__}: {str(e)[:120]}"}

    print(json.dumps({
        "metric": "maps/s (batched, 1 chip)",
        "value": round(B / med, 1),
        "unit": "maps/s",
        "vs_baseline": round((B / med) * n_points / 1_000_000.0, 3),
        "extra": {"batch": B, "points_per_cloud": n_points,
                  "pipelined_step_s": round(med, 4),
                  "compile_s": compile_s,
                  "composed_on_chip": composed},
    }))


def bench_scaling() -> None:
    """Env-sharded scaling evidence on the virtual CPU mesh.

    Multi-chip hardware is not reachable from this harness (one tunneled
    chip), and virtual devices share the host's cores, so measured
    throughput CANNOT honestly demonstrate the BASELINE.md >=90% scaling
    target. What can be verified is the property that guarantees it on
    real hardware: the compiled env-sharded step contains ZERO collective
    ops (envs are independent; XLA inserts no communication), so per-chip
    work is constant as chips are added. This mode compiles the sharded
    step, counts collectives in the optimized HLO, and reports measured
    virtual-mesh throughput as supporting context only.
    """
    n_dev = int(os.environ.get("BENCH_DEVICES", 8))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.parallel import (
        batched_update, init_batch, make_mesh, shard_states,
    )
    from elevation_mapping_cupy_tpu.runtime.datagen import make_batch_clouds

    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()   # routes to the jax-cpu dir on this virtual mesh
    B = int(os.environ.get("BENCH_BATCH", 64))
    n_points = int(os.environ.get("BENCH_POINTS", 20_000))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    cfg = MapConfig(resolution=0.08, map_length=8.0, max_points=n_points)
    w = default_weights()
    key = jax.random.PRNGKey(0)
    pts, t, _ = make_batch_clouds(key, B, cfg.cell_n, cfg.resolution, n_points)
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    z = jnp.zeros((B,))
    mask = jnp.ones((B, n_points), bool)

    mesh = make_mesh((n_dev,), ("env",), devices=jax.devices()[:n_dev])
    sh = lambda spec: NamedSharding(mesh, spec)
    states = shard_states(init_batch(cfg, B), mesh, "env")
    args = [jax.device_put(x, sh(P("env", *([None] * (x.ndim - 1)))))
            for x in (pts, mask, R, t, z, z)]

    def step(s, *a):
        return batched_update(s, *a, w, cfg)

    t_c = time.perf_counter()
    lowered = batched_update.lower(states, *args, w, cfg)
    hlo = lowered.compile().as_text()
    compile_s = time.perf_counter() - t_c
    collectives = [op for op in
                   ("all-reduce", "all-gather", "collective-permute",
                    "reduce-scatter", "all-to-all")
                   if op in hlo]
    n_coll = sum(hlo.count(op) for op in collectives)

    out = step(states, *args)
    _ = float(jnp.sum(out.layers[:, 2]))
    lat = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = step(out, *args)
        _ = float(jnp.sum(out.layers[:, 2]))
        lat.append(time.perf_counter() - t0)
    tn = float(np.median(lat))

    # COMPOSED env x spatial (BASELINE config #5 literally): a batch of
    # spatially-sharded maps on an (env, rows) mesh — here the halo
    # exchanges MUST be live (collectives > 0 is the demonstration)
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        batched_spatial_update_pointcloud, shard_states_spatial_batched,
    )

    ne = 2
    mesh_ex = make_mesh((ne, n_dev // ne), ("env", "x"),
                        devices=jax.devices()[:n_dev])
    # map extent divisible by the row axis: 8.08 m @0.08 -> cell_n = 103+...
    comp_cfg = MapConfig(resolution=0.08, map_length=7.84, max_points=n_points)
    assert comp_cfg.cell_n % (n_dev // ne) == 0
    Bc = int(os.environ.get("BENCH_COMPOSED_BATCH", 8))
    comp_states = shard_states_spatial_batched(
        init_batch(comp_cfg, Bc), mesh_ex, "env", "x")
    comp_step = batched_spatial_update_pointcloud(mesh_ex, comp_cfg, "env", "x")
    cargs = (pts[:Bc], mask[:Bc], R[:Bc], t[:Bc], z[:Bc], z[:Bc])
    t_c = time.perf_counter()
    chlo = comp_step.lower(comp_states, *cargs, w).compile().as_text()
    compile_s += time.perf_counter() - t_c
    c_coll = sum(chlo.count(op) for op in
                 ("all-reduce", "all-gather", "collective-permute",
                  "reduce-scatter", "all-to-all"))
    comp_out = comp_step(comp_states, *cargs, w)
    _ = float(jnp.sum(comp_out.layers[:, 2]))
    lat_c = []
    for _i in range(max(iters // 2, 3)):
        t0 = time.perf_counter()
        comp_out = comp_step(comp_out, *cargs, w)
        _ = float(jnp.sum(comp_out.layers[:, 2]))
        lat_c.append(time.perf_counter() - t0)
    tc = float(np.median(lat_c))

    print(json.dumps({
        "metric": f"env-sharded step collective ops ({n_dev} devices)",
        "value": n_coll,
        "unit": "collectives/step (0 => communication-free => linear scaling)",
        "vs_baseline": 1.0 if n_coll == 0 else 0.0,
        "extra": {"batch": B, "points_per_cloud": n_points,
                  "collective_kinds": collectives,
                  "compile_s": round(compile_s, 1),
                  "maps_per_s_virtual_mesh": round(B / tn, 1),
                  "note": "virtual CPU devices share host cores; throughput "
                          "here is context, not a scaling claim",
                  "backend": "virtual-cpu-mesh",
                  "composed_env_x_spatial": {
                      "mesh": [ne, n_dev // ne],
                      "batch": Bc,
                      "cell_n": comp_cfg.cell_n,
                      "collectives_per_step": c_coll,
                      "halo_exchange_live": c_coll > 0,
                      "maps_per_s_virtual_mesh": round(Bc / tc, 1),
                  }},
    }))


def bench_spatial() -> None:
    """Shard-local MXU scatter vs the XLA fallback at a 1024x1024 map.

    Maps beyond the VMEM-fit bound can't run the whole-map-in-VMEM Pallas
    kernel, so the unsharded path falls back to XLA's serialized scatter
    (ops/scatter.py VMEM guard; VERDICT r1 item 5). Under spatial sharding
    each of n chips runs the Pallas MXU scatter on its own (h/n, w) row
    block with points masked to its rows — an exact partition, zero
    collectives in the scatter (parallel/sharded_scatter.py). Only one chip
    is reachable from this harness, so the "sharded" number is the measured
    per-shard block program: ownership mask + local MXU scatter on
    (h/n, w) — exactly what every chip executes concurrently in
    deployment. The baseline is the XLA full-map scatter the same update
    would otherwise serialize on every chip. Stream set mirrors
    point_fusion's (4 streams, mixed exact flags, ops/pointcloud.py:162).
    Correctness (sharded == unsharded full update at 1024^2) is pinned by
    tests/test_parallel.py::test_spatial_sharding_matches_unsharded_1024.
    """
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu.ops import scatter as sc
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    h = w = int(os.environ.get("BENCH_MAP", 1024))
    n_shards = int(os.environ.get("BENCH_SHARDS", 8))
    n_points = int(os.environ.get("BENCH_POINTS", 1_000_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    h_loc = h // n_shards
    exact = (False, False, True, True)

    rng = np.random.default_rng(0)
    flat_idx = jnp.asarray(rng.integers(0, h * w, n_points).astype(np.int32))
    mask = jnp.asarray(rng.random(n_points) < 0.95)
    values = [jnp.asarray(rng.normal(0, 1, n_points).astype(np.float32))
              for _ in range(2)]
    values += [jnp.asarray(rng.integers(0, 2, n_points).astype(np.float32))
               for _ in range(2)]

    # force the XLA branch while TRACING xla_full (the flag is read at
    # trace time): what the unsharded update runs at this size anyway —
    # the VMEM-fit guard routes 1024² maps off the MXU kernel
    @jax.jit
    def xla_full(flat_idx, mask, *values):
        return sc._scatter_add_streams_2d_local(
            h, w, flat_idx, values, mask, exact)

    t_c = time.perf_counter()
    prev = sc.USE_MXU_SCATTER
    sc.USE_MXU_SCATTER = False
    try:
        xla_full(flat_idx, mask, *values)  # trace+compile under the flag
    finally:
        sc.USE_MXU_SCATTER = prev
    compile_s = time.perf_counter() - t_c

    @jax.jit
    def shard_block(flat_idx, mask, *values):
        # per-shard program (shard 0's block; all blocks are isomorphic):
        # ownership binning + MXU scatter on the (h/n, w) row block
        row = flat_idx // w
        own = mask & (row < h_loc)
        local_idx = jnp.where(own, flat_idx, 0)
        return sc._scatter_add_streams_2d_local(
            h_loc, w, local_idx, values, own, exact)

    def time_fn(fn):
        # scalar fetch: on the tunneled backend block_until_ready can
        # return before execution finishes (see main()); subtract the
        # dispatch+fetch floor measured on a trivial program below
        nonlocal compile_s
        t_w = time.perf_counter()
        _ = float(jnp.sum(fn(flat_idx, mask, *values)))
        compile_s += time.perf_counter() - t_w
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(flat_idx, mask, *values)))
            lat.append(time.perf_counter() - t0)
        return float(np.median(lat))

    triv = jax.jit(lambda v: v + 1.0)
    _ = float(triv(jnp.float32(0.0)))
    floor_lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(triv(jnp.float32(0.0)))
        floor_lat.append(time.perf_counter() - t0)
    floor = float(np.median(floor_lat))

    t_xla = time_fn(xla_full)
    t_shard = time_fn(shard_block)
    # compare compute time: both measurements carry the same tunnel
    # dispatch+fetch floor, which would mask the kernel-time ratio
    speedup = max(t_xla - floor, 1e-9) / max(t_shard - floor, 1e-9)
    print(json.dumps({
        "metric": f"sharded-scatter speedup over XLA fallback ({h}x{w}, "
                  f"{n_shards}-way row shards)",
        "value": round(speedup, 2),
        "unit": "x (per-chip step time ratio; >2 = VERDICT item-5 target met)",
        "vs_baseline": round(speedup / 2.0, 3),
        "extra": {
            "points": n_points,
            "streams": len(values),
            "xla_full_map_s": round(t_xla, 4),
            "per_shard_block_s": round(t_shard, 4),
            "host_sync_floor_s": round(floor, 4),
            "compile_s": round(compile_s, 1),
            "note": "one reachable chip: per-shard block program measured "
                    "directly (all shards run it concurrently; the scatter "
                    "needs zero collectives — ownership is an exact "
                    "partition)",
            "device": str(jax.devices()[0]),
        },
    }))


def bench_image() -> None:
    """Image fusion path: projection + Bresenham occlusion + color fusion.

    The reference's image callback projects every map cell through P=K[R|t],
    checks occlusion with a per-cell Bresenham march over the height map,
    and gathers image pixels into semantic layers (custom_image_kernels.py).
    Measures full input_image dispatches at VGA resolution on the reference
    202x202 map; vs_baseline against a 30 Hz camera budget.
    """
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig, core, init_state
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    iters = int(os.environ.get("BENCH_ITERS", 30))
    H, W = 480, 640
    channels = ("rgb", "mask")
    cfg = MapConfig(semantic_layers=channels,
                    image_channel_fusions=(("rgb", "color"),
                                           ("default", "exponential")))
    rng = np.random.default_rng(0)
    state = init_state(cfg)
    h = rng.uniform(-0.05, 0.05, (cfg.cell_n, cfg.cell_n)).astype(np.float32)
    state = state._replace(
        layers=state.layers.at[0].set(jnp.asarray(h)).at[2].set(1.0))
    img = jnp.asarray(rng.uniform(0, 1, (4, H, W)).astype(np.float32))
    K = jnp.asarray([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]])
    R = jnp.asarray([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    t = jnp.asarray([0.0, 0.0, 1.5], jnp.float32)
    D = jnp.zeros(5)

    def step(s):
        return core.input_image(s, img, R, t, K, D, cfg, channels)

    t_c = time.perf_counter()
    state = step(state)
    _ = float(jnp.sum(state.semantic))
    compile_s = round(time.perf_counter() - t_c, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    _ = float(jnp.sum(state.semantic))
    per = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"image fusion ({W}x{H} rgb+mask onto {cfg.cell_n}x{cfg.cell_n})",
        "value": round(1.0 / per, 1),
        "unit": "frames/s",
        "vs_baseline": round((1.0 / per) / 30.0, 2),
        "extra": {
            "pipelined_update_s": round(per, 4),
            "occlusion_mode": cfg.image_occlusion_mode,
            "compile_s": compile_s,
            "device": str(jax.devices()[0]),
        },
    }))


def bench_dino() -> None:
    """Semantic-sensor sidecar throughput: DINO ViT featurization on-device.

    The reference's semantic_sensor runs a DINO ViT per camera frame on the
    robot GPU (networks.py registry, no committed numbers). This measures
    the JAX ViT (sensor/dino.py) end-to-end (patch embed -> blocks ->
    STEGO projection head) at BENCH_BATCH images of 224x224, bf16 compute.
    vs_baseline is frames/s against a 30 Hz camera budget per stream.
    """
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu.sensor.dino import (
        ViTConfig, dino_featurize, init_vit_params,
    )
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    B = int(os.environ.get("BENCH_BATCH", 16))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    variant = os.environ.get("BENCH_DINO", "vit_small")
    cfg = ViTConfig(variant=variant, patch_size=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (B, 3, 224, 224)).astype(np.float32))

    # params as ARGUMENTS, not closure: closed-over params are baked into
    # the HLO as giant constants, which defeats the persistent compile
    # cache (measured: dino re-compiled 500-850 s on every all-modes run)
    fn = jax.jit(lambda p, im: dino_featurize(p, im, cfg)[1])
    t_c = time.perf_counter()
    _ = float(jnp.sum(fn(params, imgs)))
    compile_s = round(time.perf_counter() - t_c, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, imgs)
    _ = float(jnp.sum(out))
    per_batch = (time.perf_counter() - t0) / iters
    fps = B / per_batch
    print(json.dumps({
        "metric": f"DINO {variant}/16 featurization (224x224, B={B})",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "extra": {
            "batch": B,
            "compile_s": compile_s,
            "batch_latency_s": round(per_batch, 4),
            "compute_dtype": str(cfg.compute_dtype.__name__ if hasattr(cfg.compute_dtype, "__name__") else cfg.compute_dtype),
            "device": str(jax.devices()[0]),
        },
    }))


def bench_mem() -> None:
    """MEM multi-modal fusion (BASELINE config #3): geometric update + RGB
    color fusion + two class_average semantic channels from one multi-modal
    cloud, sharing a single association pass (the reference's p-buffer reuse,
    custom_kernels.py:260-262)."""
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig, core, init_state
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    n_points = int(os.environ.get("BENCH_POINTS", 1_000_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    channels = ("rgb", "grass", "obstacle")
    cfg = MapConfig(max_points=n_points, semantic_layers=channels)
    state = init_state(cfg)
    w = default_weights()

    rng = np.random.default_rng(0)
    pts = rng.uniform(-4, 4, (n_points, 3 + 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.2, 0.5, n_points).astype(np.float32)
    rgbs = rng.integers(0, 255, (n_points, 3)).astype(np.uint32)
    pts[:, 3] = ((rgbs[:, 0] << 16) | (rgbs[:, 1] << 8) | rgbs[:, 2]).view(np.float32)
    pts[:, 4:6] = rng.uniform(0, 1, (n_points, 2)).astype(np.float32)
    points = jnp.asarray(pts)
    mask = jnp.ones((n_points,), bool)
    R = jnp.eye(3)
    t = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
    zero = jnp.float32(0.0)

    def step(s):
        return core.update_pointcloud_semantic(
            s, points, mask, R, t, zero, zero, w, cfg, channels
        )

    t_c = time.perf_counter()
    state = step(state)
    _ = float(jnp.sum(state.layers[2]) + jnp.sum(state.semantic))
    compile_s = round(time.perf_counter() - t_c, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    _ = float(jnp.sum(state.layers[2]) + jnp.sum(state.semantic))
    pipelined = (time.perf_counter() - t0) / iters
    pps = n_points / pipelined
    print(json.dumps({
        "metric": "multi-modal points/s/chip (MEM: rgb + 2 class channels)",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / 1_000_000.0, 3),
        "extra": {
            "map": f"{cfg.cell_n}x{cfg.cell_n}@{cfg.resolution}m",
            "points_per_cloud": n_points,
            "channels": list(channels),
            "pipelined_update_s": round(pipelined, 4),
            "compile_s": compile_s,
            "device": str(jax.devices()[0]),
        },
    }))


def bench_planeseg() -> None:
    """Plane decomposition at reference scale (202x202 @ 0.04 m).

    The reference's second headline benchmark is the per-stage timer table
    its ROS node prints at shutdown (ConvexPlaneDecompositionRos.cpp:28-48).
    vs_baseline compares against a 50 ms budget (a 20 Hz map stream — the
    reference pipeline runs at map-publish rate on a robot CPU).

    Placement study (VERDICT r1 item 10): a single map on the tunneled TPU
    pays a ~30-40 ms dispatch+fetch round-trip per update, so per-map the
    host-CPU JAX backend wins. The batched path (update_batch, one vmapped
    dispatch for B maps) amortizes the round-trip; this bench measures
    per-map time for (a) single-map default backend, (b) single-map host
    CPU, (c) batched default backend at B maps, and reports the placement
    verdict in extras.
    """
    import jax
    import numpy as np

    from elevation_mapping_cupy_tpu.planeseg.pipeline import PlaneDecompositionPipeline
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    iters = int(os.environ.get("BENCH_ITERS", 10))
    B = int(os.environ.get("BENCH_BATCH", 16))
    n = 202
    rng = np.random.default_rng(0)
    h = np.zeros((n, n), np.float32)
    h[60:120, 40:160] = 0.3
    h[140:190, 20:90] = 0.15
    h += rng.normal(0, 0.002, (n, n)).astype(np.float32)
    h[rng.random((n, n)) < 0.02] = np.nan   # sensor holes

    pipe = PlaneDecompositionPipeline(resolution=0.04)
    t_c = time.perf_counter()
    terr = pipe.update(h)                    # compile
    compile_s = time.perf_counter() - t_c
    pipe._stats = {}
    for _ in range(iters):
        terr = pipe.update(h)
    total_ms = 1e3 * float(np.median(np.asarray(pipe._stats["total"])))

    # (c) batched on the default backend: B distinct maps, one dispatch
    hb = np.stack([h] * B)
    hb += rng.normal(0, 0.002, hb.shape).astype(np.float32)
    t_c = time.perf_counter()
    pipe.update_batch(hb)                    # compile
    compile_s += time.perf_counter() - t_c
    # full iters + median: the tunneled fetch of B terrains dominates and
    # is bimodal run-to-run (observed 38-98 ms/map at B=64) — more samples
    # stabilize the median
    batch_lat = []
    for _ in range(max(iters, 5)):
        t0 = time.perf_counter()
        terrs = pipe.update_batch(hb)
        batch_lat.append(time.perf_counter() - t0)
    batch_per_map_ms = 1e3 * float(np.median(batch_lat)) / B

    # (b) single map on the host-CPU JAX backend (the reference placement:
    # a robot-CPU node); jit follows input placement
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pipe_cpu = PlaneDecompositionPipeline(resolution=0.04)
        pipe_cpu.update(h)                   # compile
        pipe_cpu._stats = {}
        for _ in range(iters):
            pipe_cpu.update(h)
    cpu_ms = 1e3 * float(np.median(np.asarray(pipe_cpu._stats["total"])))

    # headline = the RECOMMENDED placement's per-map cost (the placement
    # study's whole point): batched TPU when it wins, else host CPU. The
    # single-map TPU figure is dominated by this harness's ~30-40 ms
    # tunnel dispatch+fetch (not device compute) and stays in extra.
    best_ms = min(batch_per_map_ms, cpu_ms)
    print(json.dumps({
        "metric": "plane decomposition per map (best placement, 202x202)",
        "value": round(best_ms, 2),
        "unit": "ms",
        "vs_baseline": round(50.0 / best_ms, 3),
        "extra": {
            "single_map_tpu_ms": round(total_ms, 2),
            "regions": len(terr.regions),
            "stage_ms": {k: round(1e3 * float(np.median(np.asarray(v))), 2)
                         for k, v in pipe._stats.items()},
            "host_cpu_single_map_ms": round(cpu_ms, 2),
            "batched_per_map_ms": round(batch_per_map_ms, 2),
            "compile_s": round(compile_s, 1),
            "batch": B,
            "placement": (
                "batched TPU (update_batch) beats per-map host CPU"
                if batch_per_map_ms < cpu_ms else
                "host CPU remains the single-map placement; batch to amortize"
            ),
            "device": str(jax.devices()[0]),
        },
    }))


def bench_sol() -> None:
    """Speed-of-light microbench floors (VERDICT r3 item 4/6 evidence).

    Re-runnable justification for the roofline claims in docs/DEPLOYMENT.md:
    the hot raycast/scatter path is priced against the chip's measured
    random-access memory floors, not against hopes. Measures, on the live
    device:

      * random scatter-add floors: 1M points into the polar cube's bins
        (A*R*S ~ 4.85M at the deployed YAML) and into the 204^2 map cells —
        the two scatter workloads of the datagen step;
      * random gather floor: the flat march's 4M-sample (7, cells) pack
        column gather;
      * delta+cumsum row reconstruction vs owner-recovery + gather at 4M
        samples (the two chunk-body formulations, ops/raycast.py);
      * sort-based per-cell min vs XLA scatter-min at 4M samples.

    One JSON line; value = ms per 1M random scatter-adds into the cube
    (the binding floor for the polar datagen step).
    """
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    compile_s = 0.0
    iters = int(os.environ.get("BENCH_ITERS", 10))
    F = int(os.environ.get("BENCH_SOL_SAMPLES", 1 << 22))   # flat-march chunk
    N = int(os.environ.get("BENCH_SOL_RAYS", 1 << 20))      # rays / points
    n = 204
    NN = n * n
    A, R, S = 512, 355, 128            # deployed-YAML polar cube (A*R*S=23.3M
    cube_bins = A * R * S              # bins at A=512; r3 used 4.85M at A=256)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # On the tunneled backend block_until_ready can return before execution
    # finishes (see main()); every timing therefore forces a scalar fetch
    # and subtracts the dispatch+fetch floor measured on a trivial program.
    triv = jax.jit(lambda v: v + 1.0)
    _ = float(triv(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(max(iters, 10)):
        _ = float(triv(jnp.float32(0.0)))
    floor = (time.perf_counter() - t0) / max(iters, 10)

    def timeit(fn, *args, n_it=iters):
        nonlocal compile_s
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        t_w = time.perf_counter()
        _ = float(f(*args))
        compile_s += time.perf_counter() - t_w
        t0 = time.perf_counter()
        for _ in range(n_it):
            _ = float(f(*args))
        per = (time.perf_counter() - t0) / n_it
        return round(max(per - floor, 0.0) * 1e3, 2)

    # --- random scatter-add floors ---
    vals = jax.random.normal(key, (N,), jnp.float32)
    cube_idx = jnp.asarray(rng.integers(0, cube_bins, N).astype(np.int32))
    map_idx = jnp.asarray(rng.integers(0, NN, N).astype(np.int32))
    scat_cube = timeit(
        lambda i, v: jnp.zeros((cube_bins,), jnp.float32).at[i].add(v),
        cube_idx, vals)
    scat_map = timeit(
        lambda i, v: jnp.zeros((NN,), jnp.float32).at[i].add(v),
        map_idx, vals)

    # --- random gather floor: flat-march pack gather at F samples ---
    pack = jax.random.normal(key, (7, NN), jnp.float32)
    nidx_f = jnp.asarray(rng.integers(0, NN, F).astype(np.int32))
    gather_pack = timeit(lambda t, o: t[:, o], pack, nidx_f)

    # --- chunk-body row reconstruction: delta+cumsum vs owner gather ---
    k = np.clip(rng.poisson(99, N), 1, 353).astype(np.int64)
    offs = np.cumsum(k)
    starts = jnp.asarray((offs - k).astype(np.int32))
    raytbl = jax.random.normal(key, (8, N), jnp.float32)
    MAXR = 1 << 16

    def delta_cumsum(t, st, lo):
        base = jnp.searchsorted(st, lo, side="right").astype(jnp.int32) - 1
        base = jnp.maximum(base, 0)
        sl = jax.lax.dynamic_slice(st, (base,), (MAXR,))
        rows = jax.lax.dynamic_slice(t, (0, base), (8, MAXR))
        bits = jax.lax.bitcast_convert_type(rows, jnp.int32)
        d = bits - jnp.pad(bits[:, :-1], ((0, 0), (1, 0)))
        pos = sl - lo
        ok = (pos > 0) & (pos < F)
        posc = jnp.where(ok, pos, F)
        buf = jnp.zeros((8, F + 1), jnp.int32)
        buf = buf.at[:, posc].add(jnp.where(ok, d, 0),
                                  indices_are_sorted=True)
        buf = buf.at[:, 0].add(bits[:, 0])
        return jnp.cumsum(buf[:, :F], axis=1)

    def owner_gather(t, st, lo):
        base = jnp.searchsorted(st, lo, side="left").astype(jnp.int32)
        pos = st - lo
        in_chunk = (pos >= 0) & (pos < F)
        ind = jnp.zeros((F,), jnp.int32).at[jnp.where(in_chunk, pos, 0)].add(
            jnp.where(in_chunk, 1, 0))
        ray = jnp.clip(base + jnp.cumsum(ind) - 1, 0, N - 1)
        return t[:, ray]

    recon_delta = timeit(delta_cumsum, raytbl, starts, jnp.int32(0))
    recon_gather = timeit(owner_gather, raytbl, starts, jnp.int32(0))

    # --- per-cell min: 2-key sort vs XLA scatter-min at F samples ---
    nz = jax.random.normal(key, (F,))
    msk = jax.random.uniform(key, (F,)) < 0.05

    def sort_min(ni, z, m):
        key2 = jnp.where(m, z, jnp.inf)
        skey, snz = jax.lax.sort((ni, key2), num_keys=2)
        cells = jnp.arange(NN, dtype=ni.dtype)
        p = jnp.searchsorted(skey, cells, side="left")
        pc = jnp.minimum(p, F - 1)
        return jnp.where(skey[pc] == cells, snz[pc], jnp.inf)

    def scat_min(ni, z, m):
        return jnp.full((NN,), jnp.inf).at[jnp.where(m, ni, NN - 1)].min(
            jnp.where(m, z, jnp.inf))

    t_sortmin = timeit(sort_min, nidx_f, nz, msk)
    t_scatmin = timeit(scat_min, nidx_f, nz, msk)

    print(json.dumps({
        "metric": "random scatter-add floor (1M -> polar cube bins)",
        "value": scat_cube,
        "unit": "ms",
        "vs_baseline": round(12.2 / max(scat_cube, 1e-9), 3),
        "extra": {
            "floors_ms": {
                "scatter_add_1M_to_cube": scat_cube,
                "scatter_add_1M_to_map": scat_map,
                "pack_gather_4M": gather_pack,
                "recon_delta_cumsum_4M": recon_delta,
                "recon_owner_gather_4M": recon_gather,
                "sort_min_4M": t_sortmin,
                "xla_scatter_min_4M": t_scatmin,
            },
            "cube_bins": cube_bins,
            "samples": F,
            "rays": N,
            "compile_s": round(compile_s, 1),
            "floors_note": "net of host-sync floor; 0.0 = at/below it",
            "host_sync_floor_s": round(floor, 4),
            "vs_baseline_note": "ratio vs the r3 measured 12.2 ms floor "
                                "(PARITY.md); >1 = this chip is faster",
            "device": str(jax.devices()[0]),
        },
    }))


def bench_exact() -> None:
    """Exact-parity raycast: full update latency at the deployed YAML
    (raycast_mode="exact", 353 ray steps) — the parity-replay operating
    mode. Uses the aux update + AdaptiveExactRouter exactly as the mapper
    does: fresh maps run the gated march; once the aged/no-cull regime
    drives the gate survivor fraction past the routing threshold, the NEXT
    update runs the ungated flat march (VERDICT r4 item 5 — under `auto`
    the aged workload must stop paying the gated worst case). Aged figures
    are averaged over 2 updates (ADVICE r4: the old single-shot number
    carried one-shot dispatch noise)."""
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import core, init_state
    from elevation_mapping_cupy_tpu.config import load_config
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.ops.raycast import AdaptiveExactRouter
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    compile_s = 0.0
    iters = int(os.environ.get("BENCH_ITERS", 3))
    sizes = [int(s) for s in
             os.environ.get("BENCH_EXACT_SIZES", "100000,1000000").split(",")]
    aged_min = int(os.environ.get("BENCH_EXACT_AGED_MIN", 1_000_000))
    yaml_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "configs", "core_param.yaml")
    w = default_weights()
    rng = np.random.default_rng(0)
    out = {}
    aged_routing = {}
    steps = None
    for n_pts in sizes:
        # slim in-bench workload (VERDICT r3 item 1): the 1M cloud is slow
        # enough that one warm iteration pins the number — the update is a
        # single deterministic dispatch, not a noisy microsecond kernel
        n_iters = iters if n_pts < 1_000_000 else max(1, iters // 3)
        cfg = load_config(yaml_path).replace(
            raycast_mode="exact", max_points=n_pts)
        steps = cfg.n_ray_steps
        router = AdaptiveExactRouter(cfg)
        pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.2, 0.5, n_pts).astype(np.float32)
        points = jnp.asarray(pts)
        mask = jnp.ones((n_pts,), bool)
        R = jnp.eye(3)
        t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
        zero = jnp.float32(0.0)

        def routed_update(state):
            impl = router.route()
            cfg_step = (cfg.replace(raycast_exact_impl=impl)
                        if impl else cfg)
            state, aux = core.update_pointcloud_aux(
                state, points, mask, R, t, zero, zero, w, cfg_step)
            router.observe(impl, aux["gate_survivor_frac"])
            return state, impl, aux

        state = init_state(cfg)
        # Untimed warmup: 3 routed updates settle the router into its
        # steady state (the empty-map first update can read a transient
        # high fraction), plus ONE pinned-flat update so the flat program
        # is compiled BEFORE the aged phase no matter what the router did
        # (r5 warm run: the 50 s flat compile leaked into the first aged
        # figure because warmup never happened to route flat).
        t_c = time.perf_counter()
        for _i in range(3):
            state, _, _ = routed_update(state)
            _ = float(jnp.sum(state.layers[2]))
        if n_pts >= aged_min and router._eligible:
            state, _ = core.update_pointcloud_aux(
                state, points, mask, R, t, zero, zero, w,
                cfg.replace(raycast_exact_impl="flat"))
            _ = float(jnp.sum(state.layers[2]))
        compile_s += time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _i in range(n_iters):
            state, impl_f, _ = routed_update(state)
        _ = float(jnp.sum(state.layers[2]))
        out[str(n_pts)] = round((time.perf_counter() - t0) / n_iters, 4)
        if n_pts >= aged_min:
            # worst-case companion: age the time layer so every cell is
            # hit-eligible — the gate culls ~nothing (91% of samples
            # genuinely penetrate on this adversarial cloud). The FIRST
            # aged update is the gated probe (it measures the survivor
            # fraction); the router then sends the next updates to flat.
            def age(state):
                for _i in range(7):
                    state = core.update_time(state, cfg)
                _ = float(jnp.sum(state.layers[4]))
                return state

            state = age(state)
            t0 = time.perf_counter()
            state, impl0, aux0 = routed_update(state)
            _ = float(jnp.sum(state.layers[2]))
            probe_s = round(time.perf_counter() - t0, 4)
            surv = float(aux0["gate_survivor_frac"])
            # post-probe aged updates until 2 land on flat (the router's
            # probe backoff interleaves confirming gated probes; their cost
            # is the documented +14%/period and is reported in the impl
            # sequence). Averaged over 2 flats (ADVICE r4); re-aging
            # between updates is data-only. Flat was compiled in warmup.
            flat_lat, impls, all_lat = [], [], []
            for _i in range(6):
                state = age(state)
                t_c = time.perf_counter()
                state, impl_i, _ = routed_update(state)
                _ = float(jnp.sum(state.layers[2]))
                dt_i = time.perf_counter() - t_c
                impls.append(impl_i)
                all_lat.append(round(dt_i, 4))
                if impl_i == "flat":
                    flat_lat.append(dt_i)
                    if len(flat_lat) >= 2:
                        break
            out[f"{n_pts}_aged_nocull"] = round(
                float(np.mean(flat_lat if flat_lat else all_lat)), 4)
            aged_routing = {
                "probe_impl": impl0,
                "probe_s": probe_s,
                "gate_survivor_frac": round(surv, 3),
                "routed_impls": impls,
                "routed_s_each": all_lat,
            }
    headline = out[str(sizes[-1])]
    r2_scan_s = 7.51  # round-2 step-serialized scan at the same operating point
    print(json.dumps({
        "metric": "exact-raycast full update (deployed YAML)",
        "value": round(headline * 1000, 1),
        "unit": "ms/update",
        "vs_baseline": round(r2_scan_s / headline, 2),
        "extra": {
            "latency_s_by_points": out,
            "n_ray_steps": steps,
            "impl": "auto (gated; router sends aged/no-cull to flat)",
            "aged_routing": aged_routing,
            "compile_s": round(compile_s, 1),
            "vs_baseline_note": "speedup vs the r2 scan march (7.51 s) at "
                                "the same deployed YAML + 1M uniform cloud",
        },
    }))


# orchestrated all-modes run: (mode, env overrides sized for a compact
# driver-visible summary). The TPU chip is exclusive-access on this
# harness, so the orchestrator never imports jax itself and runs the modes
# as SEQUENTIAL subprocesses. Ordering: cheap warm modes first so their
# figures land early, the two headliners (points, exact) next, and dino
# LAST — its cold ViT compile is the single most expensive (measured 850 s
# in r3) and its number is the most skippable (ADVICE r4).
_ALL_MODES = (
    ("mem", {"BENCH_ITERS": "5"}),
    ("sol", {"BENCH_ITERS": "10"}),
    ("image", {"BENCH_ITERS": "10"}),
    ("spatial", {"BENCH_ITERS": "5"}),
    ("planeseg", {"BENCH_ITERS": "10", "BENCH_BATCH": "64"}),
    ("maps", {"BENCH_ITERS": "5", "BENCH_BATCH": "64", "BENCH_POINTS": "100000"}),
    ("scaling", {"BENCH_ITERS": "3", "BENCH_BATCH": "16", "BENCH_POINTS": "4096"}),
    ("points", {}),
    ("exact", {"BENCH_ITERS": "3"}),
    ("dino", {"BENCH_ITERS": "10", "BENCH_BATCH": "16"}),
)

# measured WARM per-mode wall seconds (r5 builder warm run on v5e:
# per-mode slot minus compile_s), padded ~40% for cache-load + jax-init:
# the budget planner reserves this much for every not-yet-run mode so one
# cold compile can take the whole slack without starving the warm modes
# behind it. Sum = 800 s, leaving ~520 s slack in the default 1320 budget.
_EXPECTED_WARM_S = {
    "mem": 45, "sol": 40, "image": 35, "spatial": 30, "planeseg": 80,
    "maps": 120, "scaling": 80, "points": 140, "exact": 170, "dino": 60,
}

# extra keys worth carrying into the RICH cumulative line, per mode
_MODE_EXTRA_KEYS = {
    "points": ("latency_matrix", "meets_30hz_100k_pipelined", "host_sync_floor_s"),
    "exact": ("latency_s_by_points", "n_ray_steps", "aged_routing"),
    "scaling": ("composed_env_x_spatial",),
    "planeseg": ("placement", "batched_per_map_ms", "host_cpu_single_map_ms",
                 "single_map_tpu_ms"),
    "maps": ("batch", "points_per_cloud", "composed_on_chip"),
    "sol": ("floors_ms",),
}


def _compact_summary(modes: dict) -> str:
    """The FINAL stdout line — sized for the driver's 2000-char tail capture.

    r4's rich cumulative line grew past the capture window and the
    scoreboard parsed null (VERDICT r4 weak #2). This line carries only the
    headline metric plus per-mode {value, unit[, vs_baseline, compile_s]},
    errors truncated to 60 chars, no matrices; a unit test pins it <1500
    bytes even when every mode errors."""
    pts = modes.get("points") or {}
    comp = {}
    for m, d in modes.items():
        if "error" in d:
            comp[m] = {"error": str(d["error"])[:60]}
        elif "skipped" in d:
            comp[m] = {"skipped": str(d["skipped"])[:24]}
        else:
            e = {"value": d.get("value"), "unit": str(d.get("unit", ""))[:28]}
            if d.get("vs_baseline") is not None:
                e["vs_baseline"] = d.get("vs_baseline")
            if d.get("compile_s") is not None:
                e["compile_s"] = d.get("compile_s")
            comp[m] = e
    return json.dumps({
        "metric": str(pts.get("metric", "points/s/chip"))[:24],
        "value": pts.get("value"),
        "unit": str(pts.get("unit", "points/s"))[:16],
        "vs_baseline": pts.get("vs_baseline"),
        "extra": {"modes": comp},
    }, separators=(",", ":"))


def _cache_entry_counts() -> dict:
    """File counts of the persistent compile caches (no jax import): the
    orchestrator diffs these around each mode to report cache_new — whether
    a mode's slot went to compiles that at least LANDED in the cache
    (VERDICT r4 weak #3: nothing recorded compile-vs-measure)."""
    root = os.path.expanduser(
        os.environ.get("ELEV_TPU_CACHE_ROOT", "~/.cache/elevation_mapping_tpu")
    )
    out = {}
    for name in ("jax", "jax-cpu"):
        n = 0
        for _r, _d, files in os.walk(os.path.join(root, name)):
            n += len(files)
        out[name] = n
    return out


def run_all_modes() -> None:
    """Default `python bench.py`: every mode as a sequential subprocess,
    one compact JSON line per mode as it completes, a RICH cumulative line
    after each, and the <1500-byte compact summary as the very last line —
    so the driver's 2000-char tail always ends with a parseable scoreboard
    (VERDICT r4 item 1a).

    Budget policy (VERDICT r4 item 1b): a GLOBAL wall-clock budget
    (BENCH_TOTAL_BUDGET, default 1320 s) bounds the run. Each mode's slot is
    ALL the remaining budget minus the warm-run reservations of the modes
    after it (_EXPECTED_WARM_S) — so the first cold mode gets one long slot
    (its compile lands in the persistent cache for every later run) instead
    of every cold mode getting a slot none can finish in (r4: 830 s spent
    on four TimeoutExpired modes). Modes that still can't fit land as
    explicit {"skipped": "budget"} entries.
    """
    import subprocess
    import sys

    here = os.path.abspath(__file__)
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 1320))
    mode_cap = int(os.environ.get("BENCH_MODE_TIMEOUT", 1200))
    # minimum useful allocation per mode: below this, compile alone would
    # eat the slot, so skip explicitly rather than burn the tail
    min_slot = float(os.environ.get("BENCH_MIN_SLOT", 75))

    modes = {}

    # test hook: BENCH_MODES overrides the mode list (tests/test_bench_summary
    # drives the REAL orchestrator end-to-end with no-op modes — the r4
    # scoreboard loss was in exactly this delivery layer)
    only = os.environ.get("BENCH_MODES")
    all_modes = (tuple((m, {}) for m in only.split(",")) if only
                 else _ALL_MODES)

    # Tunnel-attach warmer: on this harness the FIRST device dispatch after
    # an idle period pays a ~5-minute tunnel attach (measured 285 s tiny-jit
    # vs 0.9 s for the next dispatch). Absorb it in an explicit untimed
    # subprocess so mode 1's compile_s is a measurement, not the attach.
    # BENCH_ATTACH_CAP=0 skips it (tests; CPU-only hosts).
    attach_cap = float(os.environ.get("BENCH_ATTACH_CAP", 420))
    if attach_cap > 0:
        t_a = time.perf_counter()
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jax.jit(lambda v: v + 1.0)(jnp.float32(0.0))))"],
                capture_output=True, text=True,
                timeout=min(attach_cap, budget * 0.4),
            )
        except Exception:
            pass  # a failed warmer just means mode 1 pays the attach instead
        print(json.dumps({"attach_s": round(time.perf_counter() - t_a, 1)}),
              flush=True)

    def emit(m):
        print(json.dumps({"mode": m, **modes[m]}), flush=True)
        # rich cumulative line after EVERY mode (for humans reading full
        # stdout / logs) ...
        pts = modes.get("points", {})
        print(json.dumps({
            "metric": pts.get("metric", "points/s/chip"),
            "value": pts.get("value"),
            "unit": pts.get("unit", "points/s"),
            "vs_baseline": pts.get("vs_baseline"),
            "extra": {"modes": modes},
        }), flush=True)
        # ... and the compact scoreboard LAST, always (driver tail capture)
        print(_compact_summary(modes), flush=True)

    for mi, (m, envkv) in enumerate(all_modes):
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < min_slot:
            modes[m] = {"skipped": "budget"}
            emit(m)
            continue
        # slot = remaining minus the warm reservations of everything after
        # this mode (a cold mode takes the slack; warm modes behind it stay
        # funded), clamped to [min_slot, mode_cap, remaining]
        reserve = sum(_EXPECTED_WARM_S.get(mm, 80)
                      for mm, _ in all_modes[mi + 1:])
        slot = min(mode_cap, remaining, max(min_slot, remaining - reserve))
        env = dict(os.environ)
        env.update(envkv)
        env["BENCH_MODE"] = m
        last_err = None
        cache_before = _cache_entry_counts()
        for _attempt in range(2):  # one retry: the tunneled chip throws
            remaining = budget - (time.perf_counter() - t_start)
            if remaining < min_slot:
                break              # out of budget mid-retry: keep last_err
            try:                   # transient INTERNAL errors occasionally
                p = subprocess.run(
                    [sys.executable, here], env=env, capture_output=True,
                    text=True,
                    timeout=min(slot, max(remaining, min_slot)),
                )
                lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
                if not lines:
                    raise RuntimeError(
                        f"rc={p.returncode}: {p.stderr.strip().splitlines()[-1][:160] if p.stderr.strip() else 'no output'}"
                    )
                d = json.loads(lines[-1])
                compact = {k: d.get(k) for k in ("metric", "value", "unit", "vs_baseline")}
                for k in _MODE_EXTRA_KEYS.get(m, ()):
                    if k in d.get("extra", {}):
                        compact[k] = d["extra"][k]
                if "compile_s" in d.get("extra", {}):
                    compact["compile_s"] = d["extra"]["compile_s"]
                compact["wall_s"] = round(time.perf_counter() - t_start, 1)
                modes[m] = compact
                last_err = None
                break
            except subprocess.TimeoutExpired as e:
                # a timeout is budget exhaustion, not a transient chip
                # error: retrying would burn another full cap
                last_err = f"TimeoutExpired after {slot:.0f}s slot"
                break
            except Exception as e:  # keep going: one broken mode must not hide the rest
                last_err = f"{type(e).__name__}: {str(e)[:200]}"
        if last_err is not None:
            modes[m] = {"error": last_err}
        elif m not in modes:
            # budget expired between the outer check and the in-retry check
            # (reserve sum / env copy / cache walk ate the margin): record
            # the skip instead of KeyError-ing the whole scoreboard away
            modes[m] = {"skipped": "budget"}
        cache_after = _cache_entry_counts()
        modes[m]["cache_new"] = sum(cache_after.values()) - sum(cache_before.values())
        emit(m)


def main() -> None:
    mode = os.environ.get("BENCH_MODE")
    if mode is None:
        run_all_modes()
        return
    # test-only modes (tests/test_bench_summary.py drives the real
    # orchestrator end-to-end with these; no jax import)
    if mode == "_noop":
        print(json.dumps({"metric": "noop", "value": 1.0, "unit": "x",
                          "vs_baseline": 1.0,
                          "extra": {"compile_s": 0.0}}))
        return
    if mode == "_noop_err":
        print("this mode fails before emitting json", file=sys.stderr)
        sys.exit(3)
    if mode == "exact":
        bench_exact()
        return
    if mode == "scaling":
        bench_scaling()
        return
    if mode == "planeseg":
        bench_planeseg()
        return
    if mode == "mem":
        bench_mem()
        return
    if mode == "spatial":
        bench_spatial()
        return
    if mode == "dino":
        bench_dino()
        return
    if mode == "image":
        bench_image()
        return
    if mode == "sol":
        bench_sol()
        return

    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig, init_state
    from elevation_mapping_cupy_tpu import core
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    if mode == "maps":
        bench_maps()
        return

    ensure_compile_cache()
    compile_s = 0.0
    n_points = int(os.environ.get("BENCH_POINTS", 1_000_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    w = default_weights()
    rng = np.random.default_rng(0)

    def sync_scalar(s):
        # force full materialization with a scalar fetch: on tunneled
        # backends block_until_ready can return before execution finishes
        return float(jnp.sum(s.layers[2]))

    # host->device round-trip floor (the axon tunnel costs ~40 ms per
    # dispatch+fetch; real deployments stream updates without a per-frame
    # host scalar fetch, so throughput is measured pipelined below and the
    # floor is reported for interpreting the synced latencies)
    triv = jax.jit(lambda v: v + 1.0)
    _ = float(triv(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(triv(jnp.float32(0.0)))
    sync_floor = (time.perf_counter() - t0) / 5

    def measure(n_pts, n_iters):
        """Pipelined + synced latency of the full update at one cloud size."""
        cfg = MapConfig(max_points=n_pts)  # 0.04 m, 8 m -> 202x202, ray 2 m
        state = init_state(cfg)
        pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.2, 0.5, n_pts).astype(np.float32)
        points = jnp.asarray(pts)
        mask = jnp.ones((n_pts,), bool)
        R = jnp.eye(3)
        t = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
        zero = jnp.float32(0.0)

        def step(s):
            return core.update_pointcloud(s, points, mask, R, t, zero, zero, w, cfg)

        nonlocal compile_s
        t_c = time.perf_counter()
        state = step(state)           # warmup/compile
        sync_scalar(state)
        compile_s += time.perf_counter() - t_c

        # per-update latency with a full sync every iteration (upper bound;
        # includes the tunnel round-trip on this harness)
        lat = []
        for _ in range(max(n_iters // 2, 5)):
            t0 = time.perf_counter()
            state = step(state)
            sync_scalar(state)
            lat.append(time.perf_counter() - t0)
        lat = np.asarray(lat)

        # pipelined steady-state throughput: chain the updates back-to-back
        # (state feeds the next step; XLA dispatches asynchronously) and
        # sync once — the sensor-streaming operating mode
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state = step(state)
        sync_scalar(state)
        pipelined = (time.perf_counter() - t0) / n_iters
        return {
            "pipelined_update_s": round(pipelined, 4),
            "synced_median_update_s": round(float(np.median(lat)), 4),
            "synced_p99_update_s": round(float(np.percentile(lat, 99)), 4),
            "map": f"{cfg.cell_n}x{cfg.cell_n}@{cfg.resolution}m",
        }

    # latency matrix across real sensor workloads: 10k (sparse LiDAR ring),
    # 100k (the reference's own profiling workload, elevation_mapping.py:951),
    # and the 1M headline cloud. Smaller sizes get more iters (they're fast).
    matrix = {}
    for n_pts in (10_000, 100_000, n_points):
        if n_pts in matrix or n_pts <= 0:
            continue
        matrix[n_pts] = measure(n_pts, iters if n_pts >= 1_000_000 else max(iters, 30))

    headline = matrix[n_points]
    pipelined = headline["pipelined_update_s"]
    pps = n_points / pipelined
    target = 1_000_000.0  # BASELINE.json: >=1M points/s/chip
    m100k = matrix.get(100_000, headline)
    result = {
        "metric": "points/s/chip",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / target, 3),
        "extra": {
            "points_per_cloud": n_points,
            **headline,
            "compile_s": round(compile_s, 1),
            "host_sync_floor_s": round(sync_floor, 4),
            "latency_matrix": {str(k): v for k, v in matrix.items()},
            # 30 Hz depth camera at the reference's 100k profiling workload:
            # met when a fully-synced update fits the 33 ms frame budget
            "meets_30hz_100k_synced": bool(m100k["synced_p99_update_s"] < 1 / 30),
            "meets_30hz_100k_pipelined": bool(m100k["pipelined_update_s"] < 1 / 30),
            # polar-vs-exact raycast fidelity (committed trajectory bound,
            # tests/test_raycast_modes.py::test_polar_trajectory_divergence_bound)
            "polar_vs_exact_bound": {
                "elevation_max_m": 1e-3,
                "validity_iou_min": 0.95,
                "trav_frac_gt_0p1_max": 0.10,
                "trav_p99_max": 0.45,
                "source": "24-frame recentering trajectory, transient obstacle",
            },
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
