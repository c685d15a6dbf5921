"""Loop-based NumPy golden model of the reference update semantics.

This is an *independent re-implementation* of the behavior of the reference
CUDA kernels (custom_kernels.py) and orchestration (elevation_mapping.py:316-391),
used as the numeric oracle for the TPU engine. The reference itself has no
numeric goldens (SURVEY.md §4), so this model defines them.

Where the reference's atomics make results order-dependent (races), this model
fixes a deterministic resolution, and the TPU engine implements the same one:

  R1. All per-point reads of the map during one update see a single snapshot
      (pre-update for error counting; post-drift for fusion decisions;
      post-fusion for raycast).
  R2. The racy last-writer-wins upper_bound write in add_points
      (custom_kernels.py:191) becomes the *mean* of the per-point Kalman
      heights of the cell (same value average_map publishes as elevation).
  R3. The racy raycast upper_bound write (custom_kernels.py:231,254) becomes
      the *min* of all candidate ray heights for the cell.
  R4. Outlier variance contributions are summed from the snapshot decision
      (each outlier point contributes exactly one `outlier_variance`).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

F = np.float32


# ----------------------------------------------------------------------------
# geometry (mirrors custom_kernels.py:20-108)
# ----------------------------------------------------------------------------

def axis_idx(v, center, res, n):
    return int(F(F(v - center) / F(res) + F(0.5 * n)))  # C trunc-toward-zero


def get_idx(x, y, cx, cy, res, n):
    ix = min(max(axis_idx(x, cx, res, n), 0), n - 1)
    iy = min(max(axis_idx(y, cy, res, n), 0), n - 1)
    return n * ix + iy


def is_inside_flat(idx, n):
    ix, iy = idx // n, idx % n
    return 0 < ix < n - 1 and 0 < iy < n - 1


def is_valid_point(x, y, z, sx, sy, sz, cfg):
    d = (x - sx) ** 2 + (y - sy) ** 2 + (z - sz) ** 2
    dxy = max(math.sqrt(x * x + y * y) - cfg.ramped_height_range_b, 0.0)
    if d < cfg.min_valid_distance**2:
        return False
    if (z - sz) > dxy * cfg.ramped_height_range_a + cfg.ramped_height_range_c:
        return False
    if (z - sz) > cfg.max_height_range:
        return False
    return True


def associate(points, R, t, cfg):
    """Returns world pts, noise, flat idx, valid, inside  (custom_kernels.py:160-167,260-262)."""
    n = cfg.cell_n
    world = (points[:, :3].astype(F) @ R.astype(F).T + t.astype(F)).astype(F)
    noise = (cfg.sensor_noise_factor * points[:, 2] * points[:, 2]).astype(F)
    N = len(points)
    idx = np.zeros(N, np.int64)
    valid = np.zeros(N, bool)
    inside = np.zeros(N, bool)
    for i in range(N):
        x, y, z = world[i]
        idx[i] = get_idx(x, y, 0.0, 0.0, cfg.resolution, n)
        valid[i] = is_valid_point(x, y, z, t[0], t[1], t[2], cfg)
        inside[i] = is_inside_flat(idx[i], n)
    return world, noise, idx, valid, inside


# ----------------------------------------------------------------------------
# error counting (custom_kernels.py:280-345)
# ----------------------------------------------------------------------------

def error_counting(m, world, noise, idx, valid, inside, cfg):
    n = cfg.cell_n
    h, v, va, tr = (x.reshape(-1) for x in m[:4])
    inlier_cnt = np.zeros(n * n, F)
    point_cnt = np.zeros(n * n, F)
    error = F(0.0)
    error_cnt = 0
    for i in range(len(world)):
        if not (valid[i] and inside[i]):
            continue
        j = idx[i]
        z = world[i, 2]
        if (
            va[j] > 0.5
            and abs(h[j] - z) < v[j] * cfg.mahalanobis_thresh
            and v[j] < cfg.drift_compensation_variance_inlier / 2.0
            and tr[j] > cfg.traversability_inlier
        ):
            error += z - h[j]
            error_cnt += 1
            inlier_cnt[j] += 1
        point_cnt[j] += 1
    return inlier_cnt.reshape(n, n), point_cnt.reshape(n, n), error, error_cnt


# ----------------------------------------------------------------------------
# point fusion (custom_kernels.py:160-196) under R1/R2/R4
# ----------------------------------------------------------------------------

def point_fusion(m, world, noise, idx, valid, inside, point_cnt, cfg):
    """Returns (updated m, newmap sums (3,H,W))."""
    n = cfg.cell_n
    m = m.copy()
    h0 = m[0].reshape(-1).copy()   # snapshot reads (R1)
    v0 = m[1].reshape(-1).copy()
    pc = point_cnt.reshape(-1)
    sum_h = np.zeros(n * n, F)
    sum_v = np.zeros(n * n, F)
    cnt = np.zeros(n * n, F)
    outlier_add = np.zeros(n * n, F)
    for i in range(len(world)):
        if not (valid[i] and inside[i]):
            continue
        j = idx[i]
        z = F(world[i, 2])
        nz = F(noise[i])
        if abs(h0[j] - z) > v0[j] * cfg.mahalanobis_thresh:
            outlier_add[j] += cfg.outlier_variance
            continue
        if (
            cfg.enable_edge_sharpen
            and pc[j] > cfg.wall_num_thresh
            and z < h0[j] - v0[j] * cfg.mahalanobis_thresh / pc[j]
        ):
            continue
        new_h = (h0[j] * nz + z * v0[j]) / (v0[j] + nz)
        new_v = (v0[j] * nz) / (v0[j] + nz)
        sum_h[j] += new_h
        sum_v[j] += new_v
        cnt[j] += 1
    m[1] = (m[1].reshape(-1) + outlier_add).reshape(n, n)
    has = cnt > 0
    flat_valid = m[2].reshape(-1)
    flat_time = m[4].reshape(-1)
    flat_ub = m[5].reshape(-1)
    flat_iub = m[6].reshape(-1)
    flat_valid[has] = 1.0
    flat_time[has] = 0.0
    flat_ub[has] = (sum_h[has] / cnt[has]).astype(F)  # R2: mean of new_h
    flat_iub[has] = 0.0
    m[2] = flat_valid.reshape(n, n)
    m[4] = flat_time.reshape(n, n)
    m[5] = flat_ub.reshape(n, n)
    m[6] = flat_iub.reshape(n, n)
    newmap = np.stack([sum_h.reshape(n, n), sum_v.reshape(n, n), cnt.reshape(n, n)])
    return m, newmap


# ----------------------------------------------------------------------------
# raycast visibility cleanup (custom_kernels.py:198-259) under R1/R3
# ----------------------------------------------------------------------------

def raycast(m, normal, world, idx, valid, inside, inlier_cnt, t, cfg):
    n = cfg.cell_n
    m = m.copy()
    snap = m.copy()  # R1: all reads from the post-fusion snapshot
    h = snap[0].reshape(-1)
    v = snap[1].reshape(-1)
    va = snap[2].reshape(-1)
    tm = snap[4].reshape(-1)
    ub = snap[5].reshape(-1)
    iub = snap[6].reshape(-1)
    nx_, ny_, nz_ = (x.reshape(-1) for x in normal)
    ic = inlier_cnt.reshape(-1)

    dec_valid = np.zeros(n * n, F)
    add_var = np.zeros(n * n, F)
    ub_min = np.full(n * n, np.inf, F)

    step = cfg.resolution / math.sqrt(2.0)
    for i in range(len(world)):
        x, y, z = (F(c) for c in world[i])
        vx, vy, vz = x - t[0], y - t[1], z - t[2]
        norm = math.sqrt(vx * vx + vy * vy + vz * vz)
        if norm > 0:
            rx, ry, rz = vx / norm, vy / norm, vz / norm
        else:
            rx = ry = rz = 0.0
        ray_length = min(norm, cfg.max_ray_length)
        last_nidx = -1
        s = step
        while s < ray_length:
            nxp = t[0] + rx * s
            nyp = t[1] + ry * s
            nzp = t[2] + rz * s
            nidx = get_idx(nxp, nyp, 0.0, 0.0, cfg.resolution, n)
            s += step
            if nidx == last_nidx:
                continue
            last_nidx = nidx
            if not is_inside_flat(nidx, n):
                continue
            d = (x - nxp) ** 2 + (y - nyp) ** 2 + (z - nzp) ** 2
            if d < 0.1 or not valid[i]:
                continue
            if va[nidx] < 0.5:
                if nzp < ub[nidx] or iub[nidx] < 0.5:
                    ub_min[nidx] = min(ub_min[nidx], nzp)  # R3
                continue
            if tm[nidx] < 0.5:
                continue
            if h[nidx] > nzp + 0.01 - min(v[nidx], 1.0) * 0.05:
                product = rx * nx_[nidx] + ry * ny_[nidx] + rz * nz_[nidx]
                if abs(product) < cfg.cleanup_cos_thresh:
                    continue
                if ic[nidx] > cfg.wall_num_thresh and tm[nidx] < 1.0:
                    continue
                dec_valid[nidx] += cfg.cleanup_step / (ray_length / cfg.max_ray_length)
                add_var[nidx] += cfg.outlier_variance
                if nzp < ub[nidx] or iub[nidx] < 0.5:
                    ub_min[nidx] = min(ub_min[nidx], nzp)

    m[2] = (m[2].reshape(-1) - dec_valid).reshape(n, n)
    m[1] = (m[1].reshape(-1) + add_var).reshape(n, n)
    wrote = np.isfinite(ub_min)
    fub = m[5].reshape(-1)
    fiub = m[6].reshape(-1)
    fub[wrote] = ub_min[wrote]
    fiub[wrote] = 1.0
    m[5] = fub.reshape(n, n)
    m[6] = fiub.reshape(n, n)
    return m


# ----------------------------------------------------------------------------
# average map (custom_kernels.py:348-389)
# ----------------------------------------------------------------------------

def average_map(m, newmap, cfg):
    m = m.copy()
    valid_pre = m[2].copy()
    sum_h, sum_v, cnt = newmap
    has = cnt > 0
    overflow = np.zeros_like(has)
    overflow[has] = (sum_v[has] / cnt[has]) > cfg.max_variance
    ok = has & ~overflow
    bad = has & overflow
    m[0][ok] = sum_h[ok] / cnt[ok]
    m[1][ok] = sum_v[ok] / cnt[ok]
    m[2][ok] = 1.0
    m[0][bad] = 0.0
    m[1][bad] = cfg.initial_variance
    m[2][bad] = 0.0
    reset = valid_pre < 0.5
    m[0][reset] = 0.0
    m[1][reset] = cfg.initial_variance
    m[2][reset] = 0.0
    return m


# ----------------------------------------------------------------------------
# overlap clearance (elevation_mapping.py:393-410)
# ----------------------------------------------------------------------------

def clear_overlap(m, t, cfg):
    m = m.copy()
    lo, hi = cfg.overlap_cell_range
    hmin = t[2] - cfg.overlap_clear_range_z
    hmax = t[2] + cfg.overlap_clear_range_z
    near = m[:, lo:hi, lo:hi]
    ok = ~((near[0] < hmin) | (near[0] > hmax))
    near[0] = np.where(ok, near[0], 0.0)
    near[1] = np.where(ok, near[1], cfg.initial_variance)
    near[2] = np.where(ok, near[2], 0.0)
    ok5 = ~((near[5] < hmin) | (near[5] > hmax))
    near[5] = np.where(ok5, near[5], 0.0)
    near[6] = np.where(ok5, near[6], 0.0)
    m[:, lo:hi, lo:hi] = near
    return m


# ----------------------------------------------------------------------------
# dilation filter (custom_kernels.py:392-449) — faithful incl. the dx+dy
# "distance" quirk and flat-index row wraparound
# ----------------------------------------------------------------------------

def dilation(map2d, mask, size, n):
    newmap = map2d.reshape(-1).copy()
    newmask = mask.reshape(-1).copy()
    fm = map2d.reshape(-1)
    fmask = mask.reshape(-1)
    for i in range(n * n):
        if fmask[i] >= 0.5:
            newmap[i] = fm[i]
            continue
        newmap[i] = fm[i]
        distance = 100.0
        near_value = 0.0
        for dy in range(-size, size + 1):
            for dx in range(-size, size + 1):
                j = i + n * dy + dx
                if j < 0 or j >= n * n:
                    continue
                jx, jy = j // n, j % n
                if jx <= 0 or jx >= n - 1 or jy <= 0 or jy >= n - 1:
                    continue
                if fmask[j] > 0.5 and dx + dy < distance:
                    distance = dx + dy
                    near_value = fm[j]
        if distance < 100:
            newmap[i] = near_value
            newmask[i] = 1.0
    return newmap.reshape(n, n), newmask.reshape(n, n)


# ----------------------------------------------------------------------------
# normal filter (custom_kernels.py:452-506)
# ----------------------------------------------------------------------------

def normals(map2d, mask, res, n):
    out = np.zeros((3, n * n), F)
    fm = map2d.reshape(-1)
    fmask = mask.reshape(-1)
    for i in range(n * n):
        if fmask[i] <= 0.5:
            continue
        jx_idx = i + 1
        jy_idx = i + n
        ok = True
        for j in (jx_idx, jy_idx):
            if j >= n * n:
                ok = False
                break
            jx, jy = j // n, j % n
            if jx <= 0 or jx >= n - 1 or jy <= 0 or jy >= n - 1:
                ok = False
        if not ok:
            continue
        h = fm[i]
        dzdx = fm[jx_idx] - h
        dzdy = fm[jy_idx] - h
        nx = -dzdy / res
        ny = -dzdx / res
        norm = math.sqrt(nx * nx + ny * ny + 1.0)
        out[0, i] = nx / norm
        out[1, i] = ny / norm
        out[2, i] = 1.0 / norm
    return out.reshape(3, n, n)


# ----------------------------------------------------------------------------
# full update orchestration (elevation_mapping.py:316-391)
# ----------------------------------------------------------------------------

def traversability_cnn(x, w1, w2, w3, w_out):
    """NumPy dilated CNN (traversability_filter.py:12-44). x: (H, W)."""
    import numpy as np

    def conv2d(img, w, dil):
        co, ci, kh, kw = w.shape
        H, W = img.shape[-2:]
        oh = H - dil * (kh - 1)
        ow = W - dil * (kw - 1)
        out = np.zeros((co, oh, ow), F)
        for o in range(co):
            acc = np.zeros((oh, ow), F)
            for a in range(kh):
                for b in range(kw):
                    acc += w[o, 0, a, b] * img[a * dil : a * dil + oh, b * dil : b * dil + ow]
            out[o] = acc
        return out

    o1 = conv2d(x, w1, 1)[:, 2:-2, 2:-2]
    o2 = conv2d(x, w2, 2)[:, 1:-1, 1:-1]
    o3 = conv2d(x, w3, 3)
    cat = np.abs(np.concatenate([o1, o2, o3], axis=0))
    out = np.einsum("oc,chw->ohw", w_out[:, :, 0, 0].astype(F), cat)[0]
    return np.exp(-out)


@dataclasses.dataclass
class GoldenState:
    m: np.ndarray                  # (7, H, W)
    normal: np.ndarray             # (3, H, W)
    mean_error: float = 0.0
    additive_mean_error: float = 0.0


def update_pointcloud(
    st: GoldenState,
    points,
    R,
    t,
    position_noise,
    orientation_noise,
    cfg,
    weights=None,
):
    """Full deterministic golden update. ``t`` is in world frame; caller is
    responsible for pre-shifting by map center (we assume center=0 here)."""
    m = st.m.astype(F).copy()
    world, noise, idx, valid, inside = associate(points, R, t, cfg)
    inlier_cnt, point_cnt, error, error_cnt = error_counting(
        m, world, noise, idx, valid, inside, cfg
    )
    mean_error = st.mean_error
    additive = st.additive_mean_error
    if (
        cfg.enable_drift_compensation
        and error_cnt > cfg.min_height_drift_cnt
        and (
            position_noise > cfg.position_noise_thresh
            or orientation_noise > cfg.orientation_noise_thresh
        )
    ):
        mean_error = error / error_cnt
        additive += mean_error
        if abs(mean_error) < cfg.max_drift:
            m[0] += F(mean_error * cfg.drift_compensation_alpha)
    m, newmap = point_fusion(m, world, noise, idx, valid, inside, point_cnt, cfg)
    if cfg.enable_visibility_cleanup:
        m = raycast(m, st.normal, world, idx, valid, inside, inlier_cnt, t, cfg)
    m = average_map(m, newmap, cfg)
    if cfg.enable_overlap_clearance:
        m = clear_overlap(m, t, cfg)
    trav_in, _ = dilation(m[5], m[2] + m[6], cfg.dilation_size, cfg.cell_n)
    if weights is not None:
        trav = traversability_cnn(trav_in, *weights)
        m[3][3:-3, 3:-3] = trav
    normal = normals(trav_in, m[2], cfg.resolution, cfg.cell_n)
    return GoldenState(m=m, normal=normal, mean_error=mean_error, additive_mean_error=additive), {
        "newmap": newmap,
        "inlier_cnt": inlier_cnt,
        "point_cnt": point_cnt,
        "trav_input": trav_in,
        "assoc": (world, noise, idx, valid, inside),
    }
